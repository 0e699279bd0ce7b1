"""Multimodal column plumbing (Layer C).

Image/audio/video travel as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
Pandas UDFs over ``mapInPandas`` so bytes never cross the Python
boundary row-at-a-time.

The actual codec step is STUBBED (image/audio libraries are not in this
environment): ``decode_image`` raises ``NotImplementedError`` unless a
decoder callable is injected, and ``fake_decode`` provides the
deterministic stand-in used by tests. Everything Spark-side — schema,
batch iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media rows are wide (MBs of bytes each): cap Arrow batch size so a
# batch of decoded frames fits comfortably in executor memory at scale
MEDIA_ARROW_BATCH_ROWS = 64

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feat array<double>"
)


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real codec: 8 features derived from
    byte statistics. Replace with a real decoder via ``decoder=``."""
    if not payload:
        return [0.0] * 8
    n = len(payload)
    return [
        float(n),
        payload[0] / 255.0,
        payload[-1] / 255.0,
        sum(payload[:64]) / (min(n, 64) * 255.0),
        float(payload[n // 2] if n else 0) / 255.0,
        float(min(payload)) / 255.0,
        float(max(payload)) / 255.0,
        (sum(payload) % 997) / 997.0,
    ]


def decode_image(payload: bytes) -> Any:  # pragma: no cover - stub
    """Real image decode — requires an imaging library not present in
    this environment. Inject your decoder into extract_features()."""
    raise NotImplementedError(
        "no image codec in this environment; pass decoder=... explicitly"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = fake_decode,
    arrow_batch_rows: int = MEDIA_ARROW_BATCH_ROWS,
) -> DataFrame:
    """binary column -> feature vectors via mapInPandas (Arrow batches).

    Scale notes: the UDF is per-partition streaming (never materializes
    the whole partition), batch size is capped for wide rows, and the
    output drops the payload bytes so downstream stages shuffle only
    features. Repartition upstream by size, not count, when media skews.

    The Arrow batch cap (``spark.sql.execution.arrow.maxRecordsPerBatch``,
    default 10k rows — GBs of media per batch) is session-wide and read
    at EXECUTION time, so it cannot be restored around a lazy result
    without silently losing the cap. Instead the decoded feature frame —
    payload already dropped, so it's narrow — is materialized (persist +
    count) while the cap is active, and the previous conf value is
    restored before returning. Eager materialization is what a real
    pipeline does after an expensive decode anyway: every downstream
    consumer reuses the cached features instead of re-decoding.
    """
    import pandas as pd

    from ed_clickhouse_spark.operators.rollup import _conf

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["bytes"].map(lambda b: len(b) if b is not None else 0),
                    "feat": pdf["bytes"].map(
                        lambda b: decoder(bytes(b)) if b is not None else None
                    ),
                }
            )

    from pyspark import StorageLevel

    spark = media.sparkSession
    sized = media.repartition(max(spark.sparkContext.defaultParallelism, 1))
    with _conf(spark, "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows)):
        out = sized.mapInPandas(op, schema=FEATURE_SCHEMA).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        out.count()  # decode under the batch cap, before the conf restores
    return out


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, duration_ms) into
    one row per sample timestamp JVM-side (sequence+explode); the frame
    grab itself would run in extract_features with a video decoder."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("sample_ms"),
    )
