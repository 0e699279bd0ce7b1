"""Bare-session contract: every suite query must ANALYZE on a plain
``SparkSession.builder.getOrCreate()`` that never went through
``session.get_spark``.

Why this exists (round-7 driver failure): ``get_spark`` pre-registers
the pandas-UDF families (``register_strdist``/``register_randdist``),
and every builder-side harness — ``tools/check_correctness.py``, the
pytest ``spark`` fixture, the 3-scale sweep — goes through it. So
q234, whose translated SQL referenced the ``ch_extract_text_from_html``
pandas UDF but only called ``register_sql_aliases`` (the SQL scalar
aliases), was green everywhere locally and red at the driver with
UNRESOLVED_ROUTINE on the driver's own bare session. This test is the
driver's session model: a subprocess builds a bare session (same conf
shape as the driver's: master/shuffle/UTC only — NO UDF
pre-registration) and constructs every suite query's DataFrame, which
forces full analysis; any ch_* name a query's plan references but
fails to register surfaces as UNRESOLVED_ROUTINE here, not at the
driver.

Construction (not collection) is enough: Spark analyzes eagerly at
``spark.sql``/DataFrame build time, so unresolved functions raise
before any execution — keeping the subprocess cheap even over all
registered queries. Queries that internally materialize small
metadata (IVF centroids etc.) run at sf0.001.
"""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SUBPROC = r"""
import sys
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession

# the driver's session shape: bare builder, no ed_clickhouse_spark
# registration side effects
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import importlib
entry = importlib.import_module("__spark_entry__")
failures = []
for name, fn in entry.queries().items():
    try:
        df = fn(spark, "/root/testdata/sf0.001")
        df.schema  # force analysis if the builder deferred it
    except Exception as e:  # noqa: BLE001 - report every analysis break
        failures.append((name, f"{type(e).__name__}: {e}"))
for name, err in failures:
    print(f"BARE-SESSION-FAIL {name}: {err[:500]}", flush=True)
print(f"BARE-SESSION-DONE {len(failures)}", flush=True)
"""


def test_every_suite_query_analyzes_on_bare_session():
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC.replace("@REPO@", str(REPO))],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=str(REPO),
    )
    tail = "\n".join(out.stdout.splitlines()[-40:])
    assert "BARE-SESSION-DONE" in out.stdout, (
        f"subprocess died:\nstdout tail:\n{tail}\n"
        f"stderr tail:\n{out.stderr[-2000:]}"
    )
    assert "BARE-SESSION-FAIL" not in out.stdout, tail
