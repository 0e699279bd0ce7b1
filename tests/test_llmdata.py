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


def test_decontaminate_flags_exact_overlap(spark):
    from ed_clickhouse_spark.operators.llmdata import decontaminate

    # bench doc shares its full 4-gram with doc 1 only
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta tail words here pad pad pad"),
            (2, "completely different words with no shared grams at all ok"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(corpus, bench, n=4).collect()
    }
    assert 1 in got and 2 not in got
    # doc 1 contains exactly one distinct contaminated 4-gram
    assert got[1] == 1


def test_quality_rules_each_rule_fires(spark):
    from ed_clickhouse_spark.operators.llmdata import quality_rules

    good = "the cat sat of the mat and it was a fine day to nap in sun"
    rows = spark.createDataFrame(
        [
            (1, good),                            # passes all
            (2, "too short"),                     # fails r_wordcount
            (3, " ".join(["the", "a", "of", "and", "to", "in"] + ["x y z"] * 2)
                + " " + "ab " * 5),               # short words OK
            (4, " ".join(["spam ham"] * 40)),     # fails r_repetition (+stopword)
            (5, " ".join(["zq"] * 30)),           # fails r_stopword (+repetition)
        ],
        ["doc_id", "text"],
    )
    r = quality_rules("text")
    got = {
        x["doc_id"]: x
        for x in rows.select(
            "doc_id",
            *[r[k].alias(k) for k in ("r_wordcount", "r_stopword", "r_repetition", "q_pass")],
        ).collect()
    }
    assert got[1]["q_pass"]
    assert not got[2]["r_wordcount"]
    assert not got[4]["r_repetition"] and not got[4]["q_pass"]
    assert not got[5]["r_stopword"]


def test_stratified_sample_exact_k_and_deterministic(spark):
    from ed_clickhouse_spark.operators.llmdata import stratified_sample

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    s1 = stratified_sample(df, k=7, strata_col="lang", id_col="doc_id")
    s2 = stratified_sample(df, k=7, strata_col="lang", id_col="doc_id")
    c = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert c == {"0": 7, "1": 7, "2": 7}
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )
    # membership is the md5-smallest ids per stratum, verifiable offline
    import hashlib as _h

    ids0 = sorted(
        (i for i in range(200) if i % 3 == 0),
        key=lambda i: (_h.md5(str(i).encode()).hexdigest(), i),
    )[:7]
    assert sorted(r["doc_id"] for r in s1.collect() if r["lang"] == "0") == sorted(ids0)


def test_ngram_topk_counts_and_tiebreak(spark):
    from ed_clickhouse_spark.operators.text import ngram_topk

    rows = spark.createDataFrame(
        [
            (1, "en", "b c b c a a"),
            (2, "en", "b c x y"),
        ],
        ["doc_id", "lang", "text"],
    )
    got = [
        (r["gram"], r["n"], r["rank"])
        for r in ngram_topk(rows, k=2, n=2, group_col="lang").collect()
    ]
    # "b c" appears 3x (twice in doc1, once in doc2); tie between others
    assert got[0] == ("b c", 3, 1)
    assert got[1][2] == 2
