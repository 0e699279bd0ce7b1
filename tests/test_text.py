"""Tests for text-analysis operators (language ID, token counting,
quality features, fingerprint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_features,
    token_count,
)


def test_language_id_on_handcrafted_sentences(spark):
    rows = [
        (1, "the cat sat on the mat and it is happy"),
        (2, "el gato es un animal que no se ve"),
        (3, "der hund ist von den kindern nicht gesehen"),
        (4, "qwerty zxcvb asdfgh"),  # no stopwords -> undetermined
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang"] for r in df.select("id", language_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, 42 times!")], "id long, text string")
    r = df.select(
        token_count("text").alias("ws"), bpe_ish_token_count("text").alias("bpe")
    ).collect()[0]
    assert r["ws"] == 4
    # hello / world / , / 42 / times / !
    assert r["bpe"] == 6


def test_quality_features_bounds(spark, sf_dir):
    from ed_clickhouse_spark.suite._util import t

    d = quality_features(t(spark, sf_dir, "documents").select("doc_id", "text"))
    stats = d.agg(
        F.min("quality_score").alias("lo"), F.max("quality_score").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc"), (2, " a b c ")], "id long, text string"
    )
    fps = [r["fp"] for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
