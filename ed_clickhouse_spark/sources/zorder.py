"""Z-order (Morton-curve) clustered writes: multi-dimensional data
skipping for parquet scans.

The reference's MergeTree tables sort by ``(timestamp, event_name)``
(migrations/*.sql) — one clustering order, so the primary index prunes
timestamp ranges but a ``user_id = X`` query scans everything. The
lakehouse answer (Delta/Iceberg OPTIMIZE ZORDER) is to sort by an
interleaved-bit curve over several columns, making every file's min/max
box tight on ALL of them; parquet row-group stats then prune scans on
any single dimension. Spark has no built-in Z-order — this implements
it as a write policy:

  1. per column, map values to a quantile-bucket rank in [0, 2^bits)
     (boundaries from one bounded ``approxQuantile`` driver action —
     the same corpus-stats pattern as IVF seeding; ranks, not raw
     values, keep skewed/negative/string domains curve-friendly);
  2. interleave the rank bits into one Morton value (pure codegen
     arithmetic);
  3. ``repartitionByRange`` + ``sortWithinPartitions`` on the z value
     and write — each output file covers a compact curve segment.

Scale shape: one quantile sketch pass + one range shuffle — exactly
what the plain sorted write costs; no extra passes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, boundaries: list[float]) -> Column:
    """Quantile-bucket rank of ``col``: the number of boundaries <= v
    (codegen'd array filter over a literal array; null -> bucket 0)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    v = F.col(col).cast("double")
    return F.when(v.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(arr, lambda b: b <= v))
    )


def z_value(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton z-value column over ``cols`` (each quantile-bucketed to
    ``bits`` bits). len(cols) * bits must be <= 63."""
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a BIGINT")
    n_buckets = (1 << bits) - 1
    probs = [i / n_buckets for i in range(1, n_buckets)]
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        bounds = df.stat.approxQuantile(c, probs, 0.001)
        rank = _bucket_expr(c, bounds).cast("bigint")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftrightunsigned(rank, b).bitwiseAND(F.lit(1)),
                b * len(cols) + i,
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols``: every output file covers a compact curve segment, so its
    min/max stats are tight on every clustered column and a predicate
    on ANY of them prunes files/row-groups at scan time."""
    z = z_value(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stat_coverage(path: str, col: str) -> float:
    """Data-skipping quality metric: mean fraction of the column's
    global [min, max] range covered per parquet file (footer stats
    only — no data read). 1.0 = every file spans the whole domain
    (no pruning possible); ~1/n_files = perfectly clustered."""
    import os

    import pyarrow.parquet as pq

    spans = []
    gmin, gmax = None, None
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None:
            continue
        spans.append((fmin, fmax))
        gmin = fmin if gmin is None else min(gmin, fmin)
        gmax = fmax if gmax is None else max(gmax, fmax)
    if not spans or gmin == gmax:
        return 1.0
    width = gmax - gmin
    return sum((hi - lo) / width for lo, hi in spans) / len(spans)
