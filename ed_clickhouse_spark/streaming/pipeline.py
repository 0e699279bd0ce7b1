"""The ingestion pipeline: streaming source -> route -> decode -> append.

Spark retelling of the reference dataflow (SURVEY.md §3 EP1):

  reference                         this engine
  ---------                         -----------
  NATS JetStream pull consumer      readStream (file source in tests;
    (src/nats.rs:63-83)               any readStream source in prod)
  subject routing match             registry-driven filter per family
    (src/handler.rs:15-55)            (sources/registry.py)
  unknown subject -> Term/discard   -> _dlq table (strict upgrade)
    (src/main.rs:68-72)
  per-subject micro-batcher,        micro-batch trigger
    rows/bytes/1s triggers            (processingTime='1 second';
    (src/handler.rs:57-204)           rows-cap via maxFilesPerTrigger —
                                      no bytes knob, documented deviation)
  ClickHouse INSERT FORMAT          foreachBatch: decode_json + date-
    Protobuf (src/click_house.rs)     partitioned sorted parquet append
  ack/Nak/Term at-least-once        checkpointed offsets + append sink
    (src/handler.rs:119-135)          = at-least-once (stronger:
                                      effectively-once per batch)

The wire format of the test harness is JSON lines with columns
(subject, payload); payload is the JSON-encoded event (FIXTURES.md §B).
"""

from __future__ import annotations

import inspect

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ed_clickhouse_spark.sources.decode import decode_json
from ed_clickhouse_spark.sources.registry import FAMILIES
from ed_clickhouse_spark.sources.writer import append_dlq, append_events

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType(), True),
        T.StructField("payload", T.StringType(), True),
    ]
)


def process_batch(
    batch: DataFrame,
    warehouse: str,
    views: dict | None = None,
    epoch_id: int | None = None,
) -> None:
    """Route one micro-batch: per family, decode + append; everything
    unroutable or undecodable lands in the DLQ.

    ``views``: table name -> list of StreamingMatView — ClickHouse-MV
    insert triggers (streaming/matview.py). Each view's partial-state
    append runs over the SAME cached decoded batch, right after the raw
    append — the MV-fires-on-insert contract.

    The routing split is a set of subject filters over one cached batch —
    each family's filter prunes on the subject value; with a partitioned
    source (e.g. Kafka keyed by subject) each filter reads only its
    partitions. The reference's equivalent is the per-subject buffer map
    (src/handler.rs:93-104)."""
    # Pin the batch for the routing probe + per-family filters, but only
    # if the CALLER hasn't already (foreachBatch hands us an uncached
    # frame; tests/benches may pre-cache the same plan). Tracking
    # ownership keeps the unpersist from evicting a caller-held cache
    # and stops the per-call "Asked to cache already cached data" churn.
    from pyspark import StorageLevel

    owned = batch.storageLevel == StorageLevel.NONE
    if owned:
        batch = batch.cache()
    try:
        known = {f.subject for f in FAMILIES}
        # ONE action discovers which subjects this batch actually carries —
        # every other job below runs only for present families. (The naive
        # per-family probe-and-write costs ~20 Spark jobs per batch even
        # for single-subject batches; this shape measured ~6x higher
        # ingest throughput.)
        present = {
            r["subject"]
            for r in batch.select("subject").distinct().collect()
        }
        if present - known or None in present:
            unroutable = batch.filter(
                ~F.col("subject").isin(list(known)) | F.col("subject").isNull()
            )
            append_dlq(unroutable, warehouse, reason="unroutable_subject")
        for fam in FAMILIES:
            if fam.subject not in present:
                continue
            sub = batch.filter(F.col("subject") == fam.subject)
            fam_views = (views or {}).get(fam.table, [])
            decoded = decode_json(sub, fam)
            if fam_views:
                # the decoded frame is re-read per view — worth pinning
                decoded = decoded.cache()
            # Count corrupt rows DURING the append job (Observation
            # metric at the decode node) instead of a separate probe
            # scan: the clean-batch fast path — by far the common case —
            # decodes and writes in ONE pass with no cache
            # materialization (measured ~1.7x ingest throughput). Only a
            # batch that actually carries corrupt rows pays a second
            # decode pass to extract them for the DLQ.
            obs = Observation(f"ingest_{fam.table}")
            good = (
                decoded.observe(
                    obs, F.count(F.when(F.col("_corrupt"), 1)).alias("bad")
                )
                .filter(~F.col("_corrupt"))
                .drop("_corrupt", "_raw")
            )
            try:
                append_events(good, warehouse, fam.table)
                if obs.get["bad"] > 0:
                    bad = decode_json(sub, fam).filter(F.col("_corrupt"))
                    append_dlq(
                        bad.select(
                            F.lit(fam.subject).alias("subject"),
                            F.col("_raw").alias("payload"),
                        ),
                        warehouse,
                        reason="decode_error",
                    )
                for view in fam_views:
                    # insert hooks that accept the foreachBatch epoch get
                    # it — their state writes become replay-idempotent
                    # (StreamingMatView/StreamingTopK exactly-once mode)
                    if "epoch_id" in inspect.signature(view.on_batch).parameters:
                        view.on_batch(good, epoch_id=epoch_id)
                    else:
                        view.on_batch(good)
            finally:
                if fam_views:
                    decoded.unpersist()
    finally:
        if owned:
            batch.unpersist()


def files_per_trigger_for_bytes(
    spark: SparkSession, source_dir: str, bytes_per_trigger: int
) -> int:
    """Approximate the reference's bytes-based flush cap
    (``batcher.max_bytes=60MB``, src/handler.rs:145,188) for Spark's file
    source, which only has a files-per-trigger knob: observe the average
    size of the files currently in ``source_dir`` (Hadoop FS listing, any
    scheme) and return how many such files fit under the cap. Producers
    that roll files at a roughly constant size make this a tight bound;
    re-derive when file sizing changes."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(source_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return 1
    sizes = [
        st.getLen()
        for st in fs.listStatus(path)
        if st.isFile() and not st.getPath().getName().startswith(("_", "."))
    ]
    if not sizes:
        return 1
    avg = max(1, sum(sizes) // len(sizes))
    return max(1, int(bytes_per_trigger // avg))


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    warehouse: str,
    checkpoint: str,
    max_files_per_trigger: int = 100,
    bytes_per_trigger: int | None = None,
    trigger_interval_ms: int = 1000,
    views: dict | None = None,
):
    """Start the streaming ingestion query.

    File-source stand-in for JetStream: JSON-lines files dropped into
    ``source_dir``. ``maxFilesPerTrigger`` is the rows-cap analog of the
    reference's 100k-row batch limit; ``bytes_per_trigger`` approximates
    its 60 MB bytes cap (config/default.toml:42) by deriving a files cap
    from observed file sizes — the smaller of the two wins. The trigger
    interval defaults to the reference's ``batcher.flush_interval_ms=1000``
    (config/default.toml:43). The checkpoint dir plays the
    durable-consumer role (at-least-once across restarts ≙ the JetStream
    durable name, config/default.toml:18)."""
    if bytes_per_trigger is not None:
        max_files_per_trigger = min(
            max_files_per_trigger,
            files_per_trigger_for_bytes(spark, source_dir, bytes_per_trigger),
        )
    stream = (
        spark.readStream.schema(WIRE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda batch, epoch: process_batch(
                batch, warehouse, views=views, epoch_id=epoch
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_interval_ms} milliseconds")
        .start()
    )


def kafka_to_wire(df: DataFrame) -> DataFrame:
    """Map a Kafka-shaped frame (key/value binary, topic string — the
    fixed schema of Spark's Kafka source) onto the wire contract
    ``(subject, payload)`` that :func:`process_batch` routes on.

    Subject = the record key when present (≙ JetStream subject carried
    per message), else the topic — so either keyed single-topic or
    topic-per-family layouts route identically."""
    return df.select(
        F.coalesce(F.col("key").cast("string"), F.col("topic")).alias("subject"),
        F.col("value").cast("string").alias("payload"),
    )


def start_ingest_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    warehouse: str,
    checkpoint: str,
    max_offsets_per_trigger: int = 100_000,
    starting_offsets: str = "earliest",
    trigger_interval_ms: int = 1000,
    views: dict | None = None,
):
    """Kafka ingestion mode — the production stand-in for the reference's
    NATS JetStream durable pull consumer (src/nats.rs:63-83). Knob map:

      JetStream (reference)              Spark Kafka source (here)
      ---------------------              -------------------------
      durable consumer name              checkpointLocation (offsets
        (config/default.toml:18)           committed after each batch)
      max_ack_pending=200k /             maxOffsetsPerTrigger
        batcher.max_rows=100k              (rows cap per micro-batch)
      max_deliver=3 (redelivery)         spark.task.maxFailures retries;
                                           poison batches -> DLQ rows
                                           instead of redelivery loops
      filter_subjects                    subscribe=<topics> + key routing
      ack after ClickHouse insert        offset commit after foreachBatch
        (at-least-once)                    returns (at-least-once)

    Requires the spark-sql-kafka connector on the classpath; the plan
    construction itself is connector-agnostic and covered by
    :func:`kafka_to_wire` + :func:`process_batch` tests."""
    stream = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return (
        kafka_to_wire(stream)
        .writeStream.foreachBatch(
            lambda batch, epoch: process_batch(
                batch, warehouse, views=views, epoch_id=epoch
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_interval_ms} milliseconds")
        .start()
    )
