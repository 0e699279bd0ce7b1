"""Multimodal column plumbing (Layer C).

Image/audio/video travel as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
Pandas UDFs over ``mapInPandas`` so bytes never cross the Python
boundary row-at-a-time.

Codecs: ``decode_image`` really decodes the uncompressed formats a
dependency-free engine can own (24-bit BI_RGB BMP, binary P6 PPM) and
``image_features`` is the real bytes->pixels->features path over it;
compressed formats (JPEG/PNG/...) raise ``NotImplementedError`` unless
a decoder callable is injected (image/audio libraries are not in this
environment), and ``fake_decode`` remains the format-agnostic
deterministic stand-in. Everything Spark-side — schema, batch
iteration, partition sizing — is real and tested.
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


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Real image decode for the UNCOMPRESSED formats a dependency-free
    engine can own: 24-bit BI_RGB BMP and binary PPM (P6). Returns
    (width, height, row-major RGB bytes). Compressed formats (JPEG/PNG/
    WebP/...) still raise — decoding those honestly needs a codec
    library, and a fake would poison downstream features."""
    if payload[:2] == b"BM":
        import struct

        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if hdr_size < 40 or bpp != 24 or compression != 0:
            raise NotImplementedError(
                f"only 24-bit uncompressed BI_RGB BMP decodes here"
                f" (got bpp={bpp}, compression={compression});"
                " pass decoder=... for other formats"
            )
        flipped = height > 0  # positive height = bottom-up row order
        height = abs(height)
        stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
        out = bytearray(width * height * 3)
        for y in range(height):
            src = data_off + (height - 1 - y if flipped else y) * stride
            row = payload[src: src + width * 3]
            if len(row) < width * 3:
                raise ValueError("truncated BMP pixel data")
            # BMP stores BGR; emit RGB
            for x in range(width):
                o = (y * width + x) * 3
                out[o] = row[x * 3 + 2]
                out[o + 1] = row[x * 3 + 1]
                out[o + 2] = row[x * 3]
        return width, height, bytes(out)
    if payload[:2] == b"P6":
        import re as _re

        m = _re.match(
            rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", payload
        )
        if not m:
            raise ValueError("malformed PPM header")
        width, height, maxval = (int(g) for g in m.groups())
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        pix = payload[m.end(): m.end() + width * height * 3]
        if len(pix) < width * height * 3:
            raise ValueError("truncated PPM pixel data")
        return width, height, pix
    raise NotImplementedError(
        "no codec for this format in this environment (built-in decode"
        " covers uncompressed BMP/P6-PPM); pass decoder=... explicitly"
    )


def image_features(payload: bytes) -> list[float]:
    """The real bytes -> pixels -> features path over the built-in
    BMP/PPM decoder: 8 features [width, height, mean R, mean G, mean B,
    min/max/mean luma (Rec.601)], channel means in [0, 1]."""
    width, height, rgb = decode_image(payload)
    n = width * height
    if n == 0:
        return [0.0] * 8
    sr = sg = sb = 0
    lmin, lmax, lsum = 255.0, 0.0, 0.0
    for i in range(0, n * 3, 3):
        r, g, b = rgb[i], rgb[i + 1], rgb[i + 2]
        sr += r
        sg += g
        sb += b
        luma = 0.299 * r + 0.587 * g + 0.114 * b
        lmin = min(lmin, luma)
        lmax = max(lmax, luma)
        lsum += luma
    return [
        float(width),
        float(height),
        sr / (n * 255.0),
        sg / (n * 255.0),
        sb / (n * 255.0),
        lmin / 255.0,
        lmax / 255.0,
        lsum / (n * 255.0),
    ]


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

    from ed_clickhouse_spark.operators._cache import pin

    spark = media.sparkSession
    sized = media.repartition(max(spark.sparkContext.defaultParallelism, 1))
    with _conf(spark, "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows)):
        out = pin(sized.mapInPandas(op, schema=FEATURE_SCHEMA))
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
