"""Time individual suite queries with the bench methodology (cold +
3 steady .count() runs, clearCache between queries) plus a noop-sink
steady run (guide §1.4) so the computation is timed with every column
materialized, not just the count.

Usage: python tools/time_queries.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ed_clickhouse_spark.session import get_spark
from ed_clickhouse_spark.suite import QUERIES


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")
    spark.range(1).count()
    for name in sys.argv[1:]:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        cold = time.perf_counter() - t0
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        noop = time.perf_counter() - t0
        print(
            f"{name}: cold {cold:.3f}s steady {runs[0]:.3f}s "
            f"best {min(runs):.3f}s noop {noop:.3f}s"
        )
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
