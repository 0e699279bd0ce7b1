"""Streaming heavy hitters: a count-min sketch plus a candidate set
maintained across micro-batches — the streaming twin of the batch
sketch family (operators/sketch.py), in the same insert-time
partial-state / read-time merge shape as StreamingMatView.

Why this shape at 100 TB: the exact (key, count) table for a hot
event/token stream is itself too large to keep hot, but heavy-hitter
monitoring ("which URLs / tokens / users dominate the last N hours")
only needs (a) a fixed-size mergeable counter structure and (b) a
bounded candidate set to enumerate. Per micro-batch this appends

  * the batch's CMS partial — at most depth x width rows regardless of
    batch size (cm_build's one bounded map-side-combined shuffle), and
  * the batch's exact top-``m_candidates`` keys — one bounded
    per-batch top-k.

Read-time merges sum the sketch partials (counter matrices are
mergeable by cell-wise addition — the CMS property that makes this
work distributed) and scores the deduped candidate union against the
merged sketch with cm_query's broadcast point-lookups.

Coverage contract (standard for this design, worth stating honestly):
a key is FINDABLE iff it entered the candidate set, i.e. was a top-m
key of at least one micro-batch. A global heavy hitter whose arrivals
are spread so thin that it never ranks top-m in any single batch is
missed; estimates for found keys keep the CMS one-sided guarantee
(never undercount, overcount <= eps*N w.p. 1-delta).

Reference context: the reference stack would run this as a ClickHouse
topK()/AggregatingMergeTree MV fed by the ingest tier
(/root/reference/migrations/*.up.sql define the raw tables); topK's
in-memory space-saving sketch has the same found-iff-locally-heavy
caveat.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.sketch import cm_build, cm_query


class StreamingTopK:
    """Maintain heavy-hitter state for ``key_col`` across batches.

    Wire ``on_batch`` into a foreachBatch pipeline (or call it directly
    per ingest batch); ``topk(k)`` answers at any time from state only.
    """

    def __init__(
        self,
        spark: SparkSession,
        dest_path: str,
        key_col: str,
        width: int = 2048,
        depth: int = 4,
        m_candidates: int = 200,
    ):
        self.spark = spark
        self.key_col = key_col
        self.width = width
        self.depth = depth
        self.m_candidates = m_candidates
        self.sketch_path = os.path.join(dest_path, "sketch")
        self.cand_path = os.path.join(dest_path, "candidates")

    # -- insert time -------------------------------------------------------
    def on_batch(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Write this batch's CMS partial (<= depth*width rows) and its
        exact top-m candidate keys. Two bounded jobs; the stored state
        is never read on the insert path.

        With ``epoch_id`` (foreachBatch epoch) both writes land in
        ``__epoch=<id>`` partitions via dynamic overwrite — a replayed
        batch overwrites its own partial, making the sketch EXACTLY-once
        under at-least-once delivery (same contract as
        StreamingMatView.on_batch). Use one mode per state directory."""
        sketch = cm_build(batch, self.key_col, self.width, self.depth)
        cands = (
            batch.groupBy(self.key_col)
            .agg(F.count("*").alias("__n"))
            .orderBy(F.col("__n").desc(), self.key_col)
            .limit(self.m_candidates)
            .select(self.key_col)
        )
        if epoch_id is None:
            sketch.write.mode("append").parquet(self.sketch_path)
            cands.write.mode("append").parquet(self.cand_path)
            return
        # per-write dynamic-overwrite option (foreachBatch clones the
        # session, so session conf would not reach these writes)
        for df, path in ((sketch, self.sketch_path), (cands, self.cand_path)):
            (
                df.withColumn("__epoch", F.lit(int(epoch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__epoch")
                .parquet(path)
            )

    # -- read time ---------------------------------------------------------
    def merged_sketch(self) -> DataFrame:
        """Cell-wise sum of the stored CMS partials — the -Merge read.
        The shuffle is bounded by depth*width, not by history length."""
        return (
            self.spark.read.parquet(self.sketch_path)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def topk(self, k: int) -> DataFrame:
        """Top-k candidates by CMS estimate (ties broken by key).
        Estimates carry the one-sided CMS guarantee over ALL ingested
        rows, including batches whose exact counts are long gone."""
        cands = (
            self.spark.read.parquet(self.cand_path)
            .select(self.key_col)
            .distinct()
        )
        est = cm_query(
            self.merged_sketch(), cands, self.key_col, self.width, self.depth
        )
        return est.orderBy(F.col("est_count").desc(), self.key_col).limit(k)

    def compact(self) -> int:
        """Rewrite state at its floor size: one sketch row per cell and
        the deduped candidate set (ClickHouse background merges).
        Lossless — estimates before and after are identical. Returns the
        compacted sketch row count."""
        merged = self.merged_sketch().collect()
        cands = (
            self.spark.read.parquet(self.cand_path)
            .select(self.key_col)
            .distinct()
        ).collect()
        sk_schema = self.spark.read.parquet(self.sketch_path).schema
        c_schema = self.spark.read.parquet(self.cand_path).schema
        self.spark.createDataFrame(merged, sk_schema).write.mode(
            "overwrite"
        ).parquet(self.sketch_path)
        self.spark.createDataFrame(cands, c_schema).write.mode(
            "overwrite"
        ).parquet(self.cand_path)
        return len(merged)

    def _compact_epochs(self, sk: DataFrame) -> int:
        """Archive-fold for epoch-partitioned state: everything below
        the max epoch merges into __epoch=-1; the max epoch's partition
        (the only one a crash can replay) survives untouched."""
        import os
        import shutil

        def fold(df, merge):
            e_max = df.agg(F.max("__epoch")).first()[0]
            return merge(
                df.withColumn(
                    "__epoch",
                    F.when(F.col("__epoch") == e_max, F.col("__epoch"))
                    .otherwise(F.lit(-1)),
                )
            )

        def swap(df, path):
            tmp = path.rstrip("/") + "__compacting"
            df.write.mode("overwrite").partitionBy("__epoch").parquet(tmp)
            shutil.rmtree(path)
            os.rename(tmp, path)

        swap(
            fold(sk, lambda d: d.groupBy("row", "bucket", "__epoch")
                 .agg(F.sum("cnt").alias("cnt"))),
            self.sketch_path,
        )
        swap(
            fold(self.spark.read.parquet(self.cand_path),
                 lambda d: d.distinct()),
            self.cand_path,
        )
        return self.spark.read.parquet(self.sketch_path).count()
