"""Streaming corpus quality gate (streaming/corpus.py): smoke + semantic
tests so the module is exercised in CI (it was previously import-dead).

Covers: import, batch-level gating (quality split, PII scrub,
within-batch dedup, against-warehouse dedup across batches), and the
end-to-end readStream wiring."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ed_clickhouse_spark.streaming.corpus import gate_batch, start_corpus_gate


def _doc(doc_id, text, lang="en", source="crawl"):
    return {"doc_id": doc_id, "text": text, "lang": lang, "source": source}


GOOD = (
    "The quick brown fox jumps over the lazy dog while the sun is high "
    "and the river runs through the quiet valley for many long miles."
)


def test_gate_batch_splits_and_dedups(spark, tmp_path):
    wh = str(tmp_path / "wh")
    batch1 = spark.createDataFrame(
        [
            _doc(1, GOOD),
            _doc(2, GOOD),  # exact dup of 1 within the batch -> dropped
            _doc(3, "short"),  # fails quality rules -> rejected
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    gate_batch(batch1, wh)
    acc = spark.read.parquet(wh + "/docs_accepted")
    rej = spark.read.parquet(wh + "/docs_rejected")
    assert [r.doc_id for r in acc.collect()] == [1]  # first doc_id wins
    assert [r.doc_id for r in rej.collect()] == [3]

    # second batch: dup-vs-warehouse dropped, new doc accepted
    batch2 = spark.createDataFrame(
        [_doc(4, GOOD), _doc(5, GOOD + " Entirely new tail of content here.")],
        "doc_id bigint, text string, lang string, source string",
    )
    gate_batch(batch2, wh)
    acc = spark.read.parquet(wh + "/docs_accepted")
    assert sorted(r.doc_id for r in acc.collect()) == [1, 5]


def test_gate_batch_scrubs_pii(spark, tmp_path):
    wh = str(tmp_path / "wh")
    batch = spark.createDataFrame(
        [_doc(1, GOOD + " Contact me at someone@example.com for details.")],
        "doc_id bigint, text string, lang string, source string",
    )
    gate_batch(batch, wh)
    text = spark.read.parquet(wh + "/docs_accepted").first().text
    assert "someone@example.com" not in text


def test_start_corpus_gate_end_to_end(spark, tmp_path):
    src = tmp_path / "drop"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for d in [_doc(1, GOOD), _doc(2, "tiny")]:
            f.write(json.dumps(d) + "\n")
    wh = str(tmp_path / "wh")
    q = start_corpus_gate(
        spark, str(src), wh, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(wh + "/docs_accepted").count() == 1
    assert spark.read.parquet(wh + "/docs_rejected").count() == 1


def test_gate_batch_neardup_drops_edited_duplicates(spark, tmp_path):
    """near_dup=True: a later batch's lightly-edited copy of an accepted
    doc collides in an LSH band, estimates Jaccard >= 0.5, and is
    dropped; a genuinely novel doc still lands."""
    wh = str(tmp_path / "wh")
    schema = "doc_id bigint, text string, lang string, source string"
    base = (
        "the alpha and beta of gamma delta epsilon zeta eta theta iota "
        "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        "psi omega one two three four five six seven eight nine ten"
    )
    gate_batch(
        spark.createDataFrame([_doc(1, base)], schema), wh, near_dup=True
    )
    # one-word edit: high Jaccard, DIFFERENT exact fingerprint
    edited = base.replace("omicron", "edited")
    novel = "the red and blue of green " + " ".join(
        f"tok{i} word{i} item{i}" for i in range(12)
    )
    gate_batch(
        spark.createDataFrame([_doc(2, edited), _doc(3, novel)], schema),
        wh,
        near_dup=True,
    )
    acc = sorted(r.doc_id for r in spark.read.parquet(wh + "/docs_accepted").collect())
    assert acc == [1, 3]
    # the survivors' bands are indexed; the dropped doc's are not
    bands = spark.read.parquet(wh + "/docs_bands")
    assert sorted({r.id for r in bands.collect()}) == [1, 3]


def test_gate_batch_neardup_matches_batch_lsh(spark, tmp_path):
    """Stream/batch parity: docs the BATCH LSH query pairs up are
    exactly the ones the streaming gate drops when fed one at a time."""
    from ed_clickhouse_spark.operators.dedup import minhash_lsh_pairs

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
        (3, "the completely different content of rivers mountains and valleys here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    batch_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df).filter(F.col("est_jaccard") >= 0.5).collect()
    }
    assert batch_pairs == {(1, 2)}

    wh = str(tmp_path / "wh")
    schema = "doc_id bigint, text string, lang string, source string"
    for doc_id, text in docs:
        # pad so quality_rules passes; padding is identical across docs
        gate_batch(
            spark.createDataFrame([_doc(doc_id, text)], schema), wh, near_dup=True
        )
    acc = sorted(r.doc_id for r in spark.read.parquet(wh + "/docs_accepted").collect())
    assert acc == [1, 3]
