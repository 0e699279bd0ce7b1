"""Streaming materialized views — ClickHouse ``CREATE MATERIALIZED VIEW
... ENGINE = AggregatingMergeTree`` parity for the ingestion path.

ClickHouse MVs run at INSERT time: each inserted block is aggregated to
partial states and appended to the target table; reads merge states
(`-Merge` combinators), and background merges compact parts. The
reference's deployment style pairs its raw MergeTree event tables
(migrations/*.sql) with exactly such rollup MVs. The Spark retelling:

  ClickHouse                          this engine
  ----------                          -----------
  MV SELECT over the inserted block   :meth:`StreamingMatView.on_batch`
                                        inside foreachBatch (per
                                        micro-batch partial aggregate)
  AggregatingMergeTree target,        append-only parquet of partial
    partial -State rows                 state rows (sum/count/min/max +
                                        DataSketches HLL binary state)
  read with -Merge combinators        :meth:`read` — groupBy + sum /
    (uniqMerge, sumMerge, ...)          min / max / hll_union_agg
  background part merges / OPTIMIZE   :meth:`compact` — rewrite the
                                        state table to one row per group

Why states, not finals: appends stay O(batch) with NO read-modify-write
of the target (the ingest hot path never reads history), while any
read can still merge to any coarser grouping — including distinct
counts, which plain rollup finals cannot merge. At 100 TB the state
table is the only thing growing, and it grows by one small partial row
per (batch x group), reclaimed by ``compact()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamingMatView:
    """Maintain an append-only partial-state table for
    groupBy(*dims).agg(count, sums, mins, maxs, approx-distinct).

    ``sums``/``mins``/``maxs``: source expression (any SQL scalar
    expression, e.g. ``"unix_timestamp(ts)"``) -> state column name.
    ``distinct_entity``: source column whose distinct count is tracked
    via a mergeable HLL state (ClickHouse ``uniqState``).
    """

    def __init__(
        self,
        spark: SparkSession,
        dest_path: str,
        dims: list[str],
        sums: dict[str, str] | None = None,
        mins: dict[str, str] | None = None,
        maxs: dict[str, str] | None = None,
        avgs: dict[str, str] | None = None,
        quantiles: dict[str, str] | None = None,
        distinct_entity: str | None = None,
        lg_k: int = 12,
    ):
        self.spark = spark
        self.dest_path = dest_path
        self.dims = dims
        self.sums = sums or {}
        self.mins = mins or {}
        self.maxs = maxs or {}
        # avg keeps a MERGEABLE (sum, non-null count) state pair per
        # alias (ClickHouse avgState); the final value derives at read
        self.avgs = avgs or {}
        # quantile keeps a DDSketch log-bucket histogram (map<int,
        # bigint>) per alias — mergeable cell-wise, ~1% relative error
        # (Masson/Rim/Lee, VLDB 2019); read out with chDDQuantile /
        # the ch_sql quantileMerge(p)(state) spelling
        self.quantiles = quantiles or {}
        self.distinct_entity = distinct_entity
        self.lg_k = lg_k

    # DDSketch constants: gamma = (1+a)/(1-a) at a = 1% relative
    # accuracy; B offsets positive buckets clear of the negative mirror
    _DD_GAMMA = 1.0202020202020203
    _DD_B = 1048576

    def _dd_bucket(self, src: str):
        import math

        lg = math.log(self._DD_GAMMA)
        x = F.expr(src)
        return (
            F.when(x == 0, F.lit(0))
            .when(x > 0, F.lit(self._DD_B) + F.ceil(F.log(x) / F.lit(lg)))
            .otherwise(-(F.lit(self._DD_B) + F.ceil(F.log(-x) / F.lit(lg))))
            .cast("int")
        )

    # -- insert-time (the MV trigger) -------------------------------------
    def _partial(self, batch: DataFrame) -> DataFrame:
        aggs = [F.count("*").alias("n_rows")]
        aggs += [F.sum(F.expr(src)).alias(dst) for src, dst in self.sums.items()]
        aggs += [F.min(F.expr(src)).alias(dst) for src, dst in self.mins.items()]
        aggs += [F.max(F.expr(src)).alias(dst) for src, dst in self.maxs.items()]
        for src, dst in self.avgs.items():
            aggs.append(F.sum(F.expr(src)).alias(f"__avg_{dst}_s"))
            aggs.append(F.count(F.expr(src)).alias(f"__avg_{dst}_c"))
        if self.distinct_entity:
            aggs.append(
                F.expr(
                    f"hll_sketch_agg({self.distinct_entity}, {self.lg_k})"
                ).alias("hll_state")
            )
        out = batch.groupBy(*self.dims).agg(*aggs)
        # quantile sketches: bucket within the batch first (the second
        # shuffle carries one row per group x bucket, never raw rows),
        # then fold each group's buckets into its histogram map
        for src, dst in self.quantiles.items():
            sk = (
                batch.where(F.expr(src).isNotNull())
                .withColumn("__qb", self._dd_bucket(src))
                .groupBy(*self.dims, "__qb")
                .agg(F.count("*").alias("__qc"))
                .groupBy(*self.dims)
                .agg(
                    F.map_from_entries(
                        F.collect_list(F.struct("__qb", "__qc"))
                    ).alias(dst)
                )
            )
            out = out.join(sk, list(self.dims), "left")
        return out

    def on_batch(self, batch: DataFrame, epoch_id: int | None = None) -> None:
        """Aggregate one micro-batch to partial states — the ClickHouse
        MV insert trigger. One map-side-combined shuffle over the batch
        (not history); the target is never read.

        ``epoch_id`` (the foreachBatch epoch, stable across restarts of
        the same checkpoint) upgrades the write from at-least-once to
        EXACTLY-ONCE: the partial lands in an ``__epoch=<id>`` partition
        via dynamic overwrite, so a replayed batch overwrites its own
        partial instead of double-appending — the failure mode ClickHouse
        MVs themselves have on insert retries. Without it (direct batch
        use) the write is a plain append. Use one mode consistently per
        state directory: the layouts (partitioned vs flat) don't mix."""
        part = self._partial(batch)
        if epoch_id is None:
            part.write.mode("append").parquet(self.dest_path)
            return
        # per-write option, not session conf: inside foreachBatch the
        # batch runs on a CLONED session, so a conf set on the main
        # session would not reach this write (static overwrite would
        # silently wipe every other epoch)
        (
            part.withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(self.dest_path)
        )

    # -- read-time (the -Merge combinators) --------------------------------
    def _merge_aggs(self) -> list:
        aggs = [F.sum("n_rows").cast("bigint").alias("n_rows")]
        aggs += [F.sum(dst).alias(dst) for dst in self.sums.values()]
        aggs += [F.min(dst).alias(dst) for dst in self.mins.values()]
        aggs += [F.max(dst).alias(dst) for dst in self.maxs.values()]
        for dst in self.avgs.values():
            aggs.append(F.sum(f"__avg_{dst}_s").alias(f"__avg_{dst}_s"))
            aggs.append(F.sum(f"__avg_{dst}_c").alias(f"__avg_{dst}_c"))
        return aggs

    def _merge_quantile_expr(self, dst: str):
        """Cell-wise histogram merge as ONE aggregate expression —
        used by compact(), which must stay a single groupBy. O(d^2) in
        the group's distinct buckets; read() takes the explode path
        instead, which scales linearly."""
        fl = f"flatten(collect_list(map_entries({dst})))"
        return F.expr(
            f"map_from_entries(array_sort(transform("
            f"array_distinct(transform({fl}, e -> e.key)),"
            f" k -> struct(k AS key,"
            f" aggregate(filter({fl}, e -> e.key = k),"
            f" CAST(0 AS BIGINT), (s, e) -> s + e.value) AS value))))"
        ).alias(dst)

    def read(self, keys: list[str] | None = None) -> DataFrame:
        """Merge stored states to ``keys`` (default: the full dim set) —
        ``uniqMerge``/``sumMerge`` at read time. The shuffle carries one
        partial row per (batch x group), never raw events; any subset of
        dims works because every state is mergeable."""
        keys = self.dims if keys is None else keys
        st = self.spark.read.parquet(self.dest_path)
        aggs = self._merge_aggs()
        if self.distinct_entity:
            aggs.append(
                F.expr("hll_sketch_estimate(hll_union_agg(hll_state))")
                .cast("bigint")
                .alias("est_distinct")
            )
        out = st.groupBy(*keys).agg(*aggs)
        for dst in self.avgs.values():
            out = out.withColumn(
                dst, F.col(f"__avg_{dst}_s") / F.col(f"__avg_{dst}_c")
            ).drop(f"__avg_{dst}_s", f"__avg_{dst}_c")
        # quantile histograms merge by exploding entries (linear in
        # buckets — one (key x bucket)-row shuffle, never the O(d^2)
        # in-expression fold)
        for dst in self.quantiles.values():
            m = (
                st.select(*keys, F.explode(F.map_entries(dst)).alias("__e"))
                .groupBy(*keys, F.col("__e.key").alias("__k"))
                .agg(F.sum("__e.value").alias("__c"))
                .groupBy(*keys)
                .agg(
                    F.map_from_entries(
                        F.collect_list(F.struct("__k", "__c"))
                    ).alias(dst)
                )
            )
            out = out.join(m, list(keys), "left")
        return out

    def compact(self) -> int:
        """Merge state rows down to one per group and rewrite the state
        table (ClickHouse background merges / OPTIMIZE FINAL). Returns
        the row count after compaction. HLL states union WITHOUT
        estimating, so compaction is lossless and repeatable.

        Epoch-partitioned state (the exactly-once mode) folds every
        epoch EXCEPT the newest into one archive partition
        (``__epoch=-1``) and keeps the newest epoch's partition intact.
        Replay-safe by the Structured Streaming commit protocol: only
        the latest epoch can ever be replayed after a crash (earlier
        ones are committed in the checkpoint), and that epoch's
        partition survives compaction, so its replay still overwrites
        exactly itself. State is thereby bounded at ~2 rows per group
        regardless of history length."""
        import os
        import shutil

        st = self.spark.read.parquet(self.dest_path)
        aggs = self._merge_aggs()
        for dst in self.quantiles.values():
            aggs.append(self._merge_quantile_expr(dst))
        if self.distinct_entity:
            aggs.append(F.expr("hll_union_agg(hll_state)").alias("hll_state"))
        epoch_mode = "__epoch" in st.columns
        if epoch_mode:
            e_max = st.agg(F.max("__epoch")).first()[0]
            st = st.withColumn(
                "__epoch",
                F.when(F.col("__epoch") == e_max, F.col("__epoch")).otherwise(
                    F.lit(-1)
                ),
            )
            keys = [*self.dims, "__epoch"]
        else:
            keys = list(self.dims)
        merged = st.groupBy(*keys).agg(*aggs)
        # stage-then-swap (the operators/mutate.py rewrite pattern): the
        # merged result is written distributed to a staging dir — never
        # collected — then swapped in, so a mid-compaction crash leaves
        # the old state table intact.
        tmp = self.dest_path.rstrip("/") + "__compacting"
        w = merged.write.mode("overwrite")
        if epoch_mode:
            w = w.partitionBy("__epoch")
        w.parquet(tmp)
        shutil.rmtree(self.dest_path)
        os.rename(tmp, self.dest_path)
        return self.spark.read.parquet(self.dest_path).count()
