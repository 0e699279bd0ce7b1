"""Dump `.explain("formatted")` for the bench-covered queries.

Usage: python tools/dump_plans.py <out_dir> [suffix] [query ...]
       (default: all HEADLINE + EXTRA bench queries, suffix "before")

Writes <out_dir>/<query>_<suffix>.txt per query — the optimization-round
evidence files (plans/r11/*_before.txt / *_after.txt). Plans are built
lazily (no execution), so this is safe to run on a loaded host.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from ed_clickhouse_spark.session import get_spark
from ed_clickhouse_spark.suite import QUERIES


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/plans/r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    if not names:
        import bench

        names = bench.HEADLINE + bench.EXTRA
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
