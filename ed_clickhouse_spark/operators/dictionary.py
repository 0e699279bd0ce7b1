"""ClickHouse external dictionaries: ``dictGet`` as broadcast lookup.

ClickHouse deployments hang small reference tables (geo, device, plan
metadata) off the query path as *dictionaries*: in-memory key->attribute
maps queried with ``dictGet('geo', 'country', user_region_id)`` instead
of a join.  The Spark-native equivalent IS a join — but a *broadcast*
join, so the semantics (driver-resident map, zero shuffle on the fact
side) match exactly: every executor holds the dictionary hash table and
the probe is map-side, the same execution ClickHouse does.

At 100 TB the fact side never moves; the dictionary must fit in executor
memory, which is the same constraint ClickHouse dictionaries have.  A
dictionary larger than the broadcast threshold raises rather than
silently degrading into a 100-TB shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# registry: name -> (key_col, attributes DataFrame)
_DICTS: dict[str, tuple[str, DataFrame]] = {}
_SIZE_OK: set[str] = set()  # names whose size guard already passed once

_MAX_DICT_ROWS = 50_000_000  # ~GBs broadcast; beyond this it isn't a "dictionary"


def register_dict(name: str, df: DataFrame, key_col: str) -> None:
    """Register a dictionary source (≙ CREATE DICTIONARY ... SOURCE(...)).

    The frame is validated to be dictionary-shaped: has the key column
    and is plausibly broadcastable.  Registration is lazy — no action
    runs here; the size guard samples cheaply at first use."""
    if key_col not in df.columns:
        raise ValueError(f"dictionary {name!r}: key column {key_col!r} not in {df.columns}")
    _DICTS[name] = (key_col, df)
    _SIZE_OK.discard(name)
    # also expose as a SQL view for users who prefer explicit joins
    df.createOrReplaceTempView(f"dict_{name}")


def dict_get(df: DataFrame, name: str, attrs: str | list[str], key: str | Column,
             default: dict[str, object] | None = None) -> DataFrame:
    """``dictGet(name, attr, key)`` over a whole frame: append ``attrs``
    columns resolved through the dictionary, broadcast-joined on ``key``.

    ``default`` fills misses per attribute (≙ dictGetOrDefault); absent
    keys otherwise yield NULL (≙ dictGetOrNull)."""
    if name not in _DICTS:
        raise KeyError(f"unknown dictionary {name!r}; registered: {sorted(_DICTS)}")
    key_col, dic = _DICTS[name]
    attr_list = [attrs] if isinstance(attrs, str) else list(attrs)
    missing = [a for a in attr_list if a not in dic.columns]
    if missing:
        raise ValueError(f"dictionary {name!r} has no attributes {missing}")
    if name not in _SIZE_OK:
        n = dic.limit(_MAX_DICT_ROWS + 1).count()
        if n > _MAX_DICT_ROWS:
            raise ValueError(
                f"dictionary {name!r} exceeds {_MAX_DICT_ROWS} rows — not "
                "broadcastable; use an explicit join on dict_" + name
            )
        _SIZE_OK.add(name)  # checked once per registration (re-register to recheck)
    kc = F.col(key) if isinstance(key, str) else key
    side = dic.select(F.col(key_col).alias("__dk"), *attr_list)
    # bounded: dictionaries are _MAX_DICT_ROWS-guarded at registration
    out = df.join(F.broadcast(side), kc.eqNullSafe(F.col("__dk")), "left").drop("__dk")
    if default:
        for a, v in default.items():
            out = out.withColumn(a, F.coalesce(F.col(a), F.lit(v)))
    return out


def dict_has(df: DataFrame, name: str, key: str | Column, alias: str = "has") -> DataFrame:
    """``dictHas(name, key)``: membership flag via broadcast semi-ish left
    join (kept as left join + flag so one pass serves both dictGet and
    dictHas)."""
    if name not in _DICTS:
        raise KeyError(f"unknown dictionary {name!r}")
    key_col, dic = _DICTS[name]
    kc = F.col(key) if isinstance(key, str) else key
    side = dic.select(F.col(key_col).alias("__dk"), F.lit(True).alias("__hit"))
    return (
        # bounded: dictionaries are _MAX_DICT_ROWS-guarded at registration
        df.join(F.broadcast(side), kc.eqNullSafe(F.col("__dk")), "left")
        .withColumn(alias, F.coalesce(F.col("__hit"), F.lit(False)))
        .drop("__dk", "__hit")
    )
