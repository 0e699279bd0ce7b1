"""Count-min sketch bounds: never undercounts; overcount stays within
the eps*N guarantee with margin."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.sketch import cm_build, cm_query
from ed_clickhouse_spark.operators.text import tokens
from ed_clickhouse_spark.suite._util import t


def test_cm_sketch_bounds(spark, sf_dir):
    tok = t(spark, sf_dir, "documents").select(F.explode(tokens("text")).alias("token"))
    n_total = tok.count()
    width, depth = 2048, 4
    sketch = cm_build(tok, "token", width, depth).cache()
    assert sketch.count() <= width * depth
    truth = tok.groupBy("token").agg(F.count("*").alias("true_count"))
    est = cm_query(sketch, truth.select("token"), "token", width, depth)
    joined = est.join(truth, "token").collect()
    eps_n = (2.718 / width) * n_total
    for r in joined:
        assert r["est_count"] >= r["true_count"], r  # one-sided: never under
        assert r["est_count"] - r["true_count"] <= 3 * eps_n, r


def test_cm_sketch_unknown_key_small(spark):
    df = spark.createDataFrame([("a",)] * 100 + [("b",)] * 5, "k string")
    sk = cm_build(df, "k", width=1024, depth=4)
    q = spark.createDataFrame([("a",), ("b",), ("never-seen",)], "k string")
    got = {r["k"]: r["est_count"] for r in cm_query(sk, q, "k", 1024, 4).collect()}
    assert got["a"] >= 100 and got["b"] >= 5
    # with 2 distinct keys in 1024 buckets, collisions are ~impossible:
    assert got["a"] == 100 and got["b"] == 5 and got["never-seen"] == 0
