"""Shared persist discipline for operators that pin intermediate frames.

Several operators persist a narrow intermediate that feeds two or more
consumers inside the (lazy) DataFrame they return (posting lists, minhash
signatures, per-doc term frequencies). The pin lives as long as derived
frames may be re-executed, so the LIFECYCLE is caller-owned:
long-lived sessions should ``spark.catalog.clearCache()`` after
materializing results (bench.py does, between queries).

``pin`` additionally makes re-building the same query a no-op persist:
``DataFrame.storageLevel`` consults the session CacheManager for an
equivalent cached plan, so re-running an operator while its previous
pin is still cached reuses the entry instead of re-persisting it (which
logs "Asked to cache already cached data" per call — VERDICT r11 #5).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def pin(df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """persist(level) unless an equivalent plan is already cached."""
    if df.storageLevel != StorageLevel.NONE:
        return df
    return df.persist(level)
