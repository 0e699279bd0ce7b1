"""Unit tests for the training-data-pipeline operators (llmdata)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.llmdata import (
    hash_bucket,
    mixture_weights,
    pack_sequences,
    repetition_ratio,
    scrub_pii,
    train_split,
)


def test_hash_bucket_matches_portable_md5(spark):
    rows = spark.range(50).select(
        F.col("id"), hash_bucket("id", 100).alias("b")
    ).collect()
    for r in rows:
        expect = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:4], 16) % 100
        assert r["b"] == expect


def test_train_split_stable_and_complete(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in train_split(df).collect()}
    s2 = {r["doc_id"]: r["split"] for r in train_split(df.repartition(7)).collect()}
    assert s1 == s2  # pure function of the id
    counts = {v: list(s1.values()).count(v) for v in ("train", "val", "test")}
    assert sum(counts.values()) == 1000
    assert counts["train"] > 700  # ~80/10/10
    assert counts["val"] > 50 and counts["test"] > 50


def test_repetition_ratio_values(spark):
    df = spark.createDataFrame(
        [("a b c a b c a b c",), ("w x y z q r s t",)], "text string"
    )
    got = [
        round(r["rr"], 4)
        for r in df.select(repetition_ratio("text", n=3).alias("rr")).collect()
    ]
    # 7 3-grams, 3 distinct ("a b c","b c a","c a b") -> 1 - 3/7
    assert got[0] == round(1 - 3 / 7, 4)
    assert got[1] == 0.0  # all distinct


def test_scrub_pii_order_and_counts(spark):
    df = spark.createDataFrame(
        [("mail bob@h1.example.com ip 10.1.2.3 tel 555-123-4567",)], "text string"
    )
    p = scrub_pii("text")
    row = df.select(
        p["n_email"].alias("e"), p["n_phone"].alias("p"),
        p["n_ipv4"].alias("i"), p["clean"].alias("c"),
    ).collect()[0]
    assert (row["e"], row["p"], row["i"]) == (1, 1, 1)
    assert row["c"] == "mail <email> ip <ipv4> tel <phone>"
    # the email host must NOT be re-matched as another entity
    assert "<ipv4>>" not in row["c"] and "h1.example.com" not in row["c"]


def test_pack_sequences_chunk_boundaries(spark):
    df = spark.createDataFrame(
        [("s", i, 100) for i in range(10)], "source string, doc_id int, n_tok int"
    )
    out = pack_sequences(df, budget=250, token_col="n_tok").collect()
    packs = {r["doc_id"]: r["pack_id"] for r in out}
    # preceding cumsum: 0,100,...,900 -> floor(/250): 0,0,0,1,1,2,2,2,3,3
    assert [packs[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]


def test_mixture_weights_uniform_target(spark):
    df = spark.createDataFrame(
        [("en",)] * 6 + [("fr",)] * 3 + [("de",)] * 1, "lang string"
    )
    w = {r["lang"]: r for r in mixture_weights(df, "lang").collect()}
    assert w["en"]["share"] == 0.6
    # weight * n_docs is equal across groups (uniform resampled mass)
    masses = {k: round(v["weight"] * v["n_docs"], 3) for k, v in w.items()}
    assert len(set(masses.values())) == 1
