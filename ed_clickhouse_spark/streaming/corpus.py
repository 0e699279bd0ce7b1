"""Streaming corpus intake: the training-data quality gate as a
Structured Streaming stage.

A 100 TB corpus is not built in one batch job — new crawl/dump drops
arrive continuously. This stage runs the SAME per-row operators the
batch suite verifies (quality_rules, scrub_pii, exact-dedup
fingerprints — all codegen expressions, so batch/stream parity is free)
inside a foreachBatch loop:

  readStream (docs)
    -> quality_rules -> accepted / rejected split
    -> scrub_pii on the accepted half
    -> exact-dedup WITHIN the batch and AGAINST the already-accepted
       warehouse (md5 fingerprint anti-join — only the 16-byte
       fingerprint column of the warehouse is scanned, and the join is
       left un-hinted so Spark broadcasts it while small and switches
       to a shuffle anti-join once the corpus outgrows the threshold)
    -> append accepted docs + a rejected audit table

Checkpointed source offsets + append sinks give the same at-least-once
(effectively-once per batch) contract as the event-ingest pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.llmdata import quality_rules, scrub_pii
from ed_clickhouse_spark.operators.text import fingerprint


def _warehouse_exists(spark: SparkSession, path_str: str) -> bool:
    """Hadoop-FS existence check (local/HDFS/s3a uniformly) — explicit,
    instead of catching the read error, so transient FS failures and
    permission problems propagate rather than silently skipping the
    against-warehouse dedup step."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def gate_batch(batch: DataFrame, warehouse: str, near_dup: bool = False) -> None:
    """Quality-gate one micro-batch of documents into accepted/rejected.

    With ``near_dup=True`` the gate additionally drops batch docs that
    are NEAR duplicates (estimated Jaccard >= 0.5 from minhash
    signatures) of anything already accepted — the streaming twin of the
    batch MinHash+LSH ladder. The warehouse keeps a compact side table
    ``docs_bands`` of (band, band_hash, doc signature) rows; each batch
    joins its own bands against it keyed on (band, band_hash), so the
    incremental check shuffles band hashes, never text, and scales with
    bucket collisions, not corpus size."""
    spark = batch.sparkSession
    rules = quality_rules("text")
    flagged = batch.withColumn("q_pass", rules["q_pass"]).cache()
    try:
        rejected = flagged.where(~F.col("q_pass")).drop("q_pass")
        rejected.write.mode("append").parquet(os.path.join(warehouse, "docs_rejected"))

        accepted = flagged.where(F.col("q_pass")).drop("q_pass")
        scrub = scrub_pii("text")
        accepted = accepted.withColumn("text", scrub["clean"]).withColumn(
            "__fp", fingerprint("text")
        )
        # dedup within the batch (first doc_id wins, deterministic) ...
        from pyspark.sql import Window as W

        w = W.partitionBy("__fp").orderBy("doc_id")
        accepted = (
            accepted.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        # ... and against the warehouse: anti-join on the fingerprint only.
        # No broadcast hint: the warehouse side grows without bound, so
        # Spark must stay free to pick a shuffle anti-join once it exceeds
        # the broadcast threshold (AQE still broadcasts it while small).
        # Column pruning keeps the scan to the 16-byte __fp column.
        acc_path = os.path.join(warehouse, "docs_accepted")
        if _warehouse_exists(spark, acc_path):
            seen = spark.read.parquet(acc_path).select("__fp")
            accepted = accepted.join(seen, "__fp", "left_anti")
        if near_dup:
            accepted = _neardup_filter_and_index(accepted, warehouse)
        accepted.write.mode("append").parquet(acc_path)
    finally:
        flagged.unpersist()


def _neardup_filter_and_index(accepted: DataFrame, warehouse: str) -> DataFrame:
    """Drop accepted docs whose minhash signature estimates Jaccard >=
    0.5 against any already-indexed doc, then append the survivors'
    bands to the ``docs_bands`` index. Returns the surviving docs
    (materialized — the filter must be decided before the index append
    so a batch can't race with its own writes)."""
    from ed_clickhouse_spark.operators.dedup import _N_HASHES, banded_signatures

    spark = accepted.sparkSession
    bands_path = os.path.join(warehouse, "docs_bands")
    batch_bands = banded_signatures(accepted, id_col="doc_id", text_col="text")
    if _warehouse_exists(spark, bands_path):
        wh_bands = spark.read.parquet(bands_path).select(
            F.col("band"), F.col("bh"), F.col("sig").alias("wh_sig")
        )
        est = F.size(
            F.filter(F.zip_with("sig", "wh_sig", lambda x, y: x == y), lambda v: v)
        ) / F.lit(float(_N_HASHES))
        dup_ids = (
            batch_bands.join(wh_bands, ["band", "bh"])
            .filter(est >= 0.5)
            .select("id")
            .distinct()
        )
        accepted = accepted.join(
            dup_ids.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
        )
        batch_bands = batch_bands.join(dup_ids, "id", "left_anti")
    # Materialize the decision, then index the survivors' bands.
    accepted = accepted.localCheckpoint()
    batch_bands.write.mode("append").parquet(bands_path)
    return accepted


def start_corpus_gate(
    spark: SparkSession,
    source_dir: str,
    warehouse: str,
    checkpoint: str,
    schema: str = "doc_id bigint, text string, lang string, source string",
    max_files_per_trigger: int = 10,
):
    """Start the streaming quality gate over a JSON-lines document drop
    directory. Any readStream source with the same columns slots in."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda b, _eid: gate_batch(b, warehouse)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="1 second")
        .start()
    )
