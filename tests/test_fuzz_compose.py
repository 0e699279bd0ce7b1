"""Suite pin for the composition fuzzer (tools/fuzz_compose.py).

A bounded, FIXED-SEED run of both fuzzer modes so the residual
composition-bug class (lambda-variable capture by the alias inliner,
type-widening call spellings, polymorphic length routing — all found
by this fuzzer in r11) stays covered in the suite. The standalone tool
runs bigger budgets / fresh seeds out-of-band.
"""

from __future__ import annotations

import importlib.util
import random
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    "fuzz_compose",
    Path(__file__).resolve().parent.parent / "tools" / "fuzz_compose.py",
)
fz = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fz)


@pytest.fixture(scope="module")
def fuzz_env(spark):
    import duckdb

    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    spark.createDataFrame(
        fz.ROWS,
        "i BIGINT, j BIGINT, f DOUBLE, s STRING, b BOOLEAN,"
        " arr ARRAY<BIGINT>, d DATE",
    ).createOrReplaceTempView("t")
    spark.createDataFrame(
        fz.ROWS_U, "i BIGINT, s2 STRING, f2 DOUBLE"
    ).createOrReplaceTempView("u")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (i BIGINT, j BIGINT, f DOUBLE, s VARCHAR,"
        " b BOOLEAN, arr BIGINT[], d DATE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?, ?, ?)", fz.ROWS)
    con.execute("CREATE TABLE u (i BIGINT, s2 VARCHAR, f2 DOUBLE)")
    con.executemany("INSERT INTO u VALUES (?, ?, ?)", fz.ROWS_U)
    return spark, con


def _run(spark, con, n, seed, exec_only):
    from ed_clickhouse_spark.chsql import translate

    rng = random.Random(seed)
    fails = []
    for q in range(n):
        diff_mode = (not exec_only) and rng.random() < 0.6
        ch, duck = fz.build_query(rng, diff=diff_mode)
        try:
            t = translate(ch)
        except ValueError:
            continue  # loud refusal is a pass
        except Exception as e:  # noqa: BLE001
            fails.append(f"[{q}] {ch}\n  translate CRASH: {e!r}")
            continue
        try:
            got = fz.norm_rows(
                [tuple(r) for r in spark.sql(t.sql).collect()])
        except Exception as e:  # noqa: BLE001
            lines = [x for x in str(e).splitlines() if x.strip()]
            msg = (lines[0] if lines else repr(e))[:300]
            if ('resolve "length(' in msg or 'resolve "(length('
                    in msg) and "ARRAY" in msg:
                continue  # documented deviation: bare-column length()
            if "ARITHMETIC_OVERFLOW" in msg or "CAST_OVERFLOW" in msg:
                continue  # documented: ANSI loud error over CH wrap
            fails.append(f"[{q}] {ch}\n  OPAQUE: {msg}")
            continue
        if duck is None:
            continue
        try:
            want = fz.norm_rows(con.execute(duck).fetchall())
        except Exception:  # noqa: BLE001 — oracle render gap, not a bug
            continue
        if not fz.rows_match(got, want):
            fails.append(
                f"[{q}] {ch}\n  spark={got[:3]}\n  duck ={want[:3]}")
    assert not fails, "\n".join(fails)


def test_fuzz_differential_seed_1(fuzz_env):
    spark, con = fuzz_env
    _run(spark, con, n=60, seed=1, exec_only=False)


def test_fuzz_exec_or_refuse_seed_11(fuzz_env):
    spark, con = fuzz_env
    _run(spark, con, n=40, seed=11, exec_only=True)
