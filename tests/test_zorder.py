"""Z-order write policy: per-file stat tightness on BOTH clustered
columns beats a single-column sort, and row counts survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.sources.zorder import file_stat_coverage, zorder_write


def _frame(spark):
    # two independent uniform dims: the adversarial case for single sort
    return spark.range(40_000).select(
        (F.col("id") % 200).alias("ts_like"),
        F.pmod(F.xxhash64("id"), F.lit(200)).alias("user_like"),
        F.col("id").alias("payload"),
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _frame(spark)
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    zorder_write(df, zpath, ["ts_like", "user_like"], bits=8, n_files=16)
    # baseline: MergeTree-style single-column sort, same file count
    (
        df.repartitionByRange(16, "ts_like")
        .sortWithinPartitions("ts_like")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    assert spark.read.parquet(zpath).count() == 40_000

    z_ts = file_stat_coverage(zpath, "ts_like")
    z_user = file_stat_coverage(zpath, "user_like")
    l_ts = file_stat_coverage(lpath, "ts_like")
    l_user = file_stat_coverage(lpath, "user_like")
    # the linear layout prunes only its sort column
    assert l_ts < 0.2
    assert l_user > 0.9
    # z-order: BOTH dimensions materially tighter than unpruned
    assert z_ts < 0.5
    assert z_user < 0.5
    # the worst-dimension (the one an arbitrary point query hits) is
    # where z-order wins: linear cannot prune its non-sort column at all
    assert max(z_ts, z_user) < 0.5 < max(l_ts, l_user)


def test_zorder_rejects_too_many_bits(spark):
    import pytest

    from ed_clickhouse_spark.sources.zorder import z_value

    with pytest.raises(ValueError):
        z_value(_frame(spark), ["ts_like", "user_like"], bits=32)
