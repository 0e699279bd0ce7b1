"""pin() — the shared persist discipline (operators/_cache.py)."""

from pyspark import StorageLevel

from ed_clickhouse_spark.operators._cache import pin


def test_pin_persists_once_and_reuses_equivalent_plan(spark):
    df = spark.range(10).selectExpr("id", "id * 2 AS y")
    pinned = pin(df)
    assert pinned.storageLevel != StorageLevel.NONE
    # an EQUIVALENT plan built later is recognized as already cached:
    # pin returns it without a second persist (no "Asked to cache
    # already cached data" churn on steady re-runs)
    again = spark.range(10).selectExpr("id", "id * 2 AS y")
    repinned = pin(again)
    assert repinned is again  # not re-persisted
    assert again.storageLevel != StorageLevel.NONE  # served by the cache
    spark.catalog.clearCache()
    assert df.storageLevel == StorageLevel.NONE


def test_pin_jaccard_steady_rerun_emits_no_recache_warning(spark, tmp_path):
    """Re-building the same jaccard_pairs query while the previous pin is
    still cached must not re-persist (the r11 bench tail logged one
    CacheManager warning per steady re-run)."""
    from ed_clickhouse_spark.operators.dedup import jaccard_pairs

    rows = [(i, "a b c d e f g h") for i in range(20)] + [
        (100, "x y z w v u t s"), (101, "x y z w v u t s")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    first = jaccard_pairs(df, threshold=0.5, max_df=30)
    n1 = first.count()
    second = jaccard_pairs(df, threshold=0.5, max_df=30)
    n2 = second.count()
    assert n1 == n2 > 0
    spark.catalog.clearCache()
