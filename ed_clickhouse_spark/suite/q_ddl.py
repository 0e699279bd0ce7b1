"""MergeTree engine-variant merge semantics as suite queries.

The reference provisions plain MergeTree tables
(migrations/002..011_*.up.sql — append-only facts), but ClickHouse
deployments routinely pair them with ReplacingMergeTree (latest-state
tables read with FINAL) and SummingMergeTree (pre-aggregated counters).
ddl.py translates those engines into read-time views; these queries prove
the semantics against a SQL oracle on the events table.

Scale: both are a single shuffle on the merge key — exactly the shuffle a
ClickHouse FINAL read pays — and the underlying append path stays
shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark import ddl
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t

_REPLACING_DDL = """
CREATE TABLE user_latest (
    user_id String,
    event_type String,
    ver String,
    value Float64,
    ts DateTime
) ENGINE = ReplacingMergeTree(ver)
ORDER BY (user_id, event_type);
"""

_SUMMING_DDL = """
CREATE TABLE daily_activity (
    day Date,
    event_type String,
    total Decimal(18, 2),
    n UInt64
) ENGINE = SummingMergeTree((total, n))
ORDER BY (day, event_type);
"""


@query(
    "q105_replacing_final",
    oracle="""
    SELECT user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
           CAST(ts AS TIMESTAMP) AS last_ts
    FROM (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1 AND user_id <= 100
    """,
)
def q105_replacing_final(spark, sf_dir):
    """ReplacingMergeTree FINAL: latest event per (user_id, event_type).

    The events log plays the append-only table; ``ver`` is the
    (ts, event_id) pair serialized to one sortable string so the merge is
    fully deterministic under timestamp ties — the same trick a real
    deployment uses for a version column.  Runs through
    ddl.final_read on a parsed CREATE TABLE (ddl.py), i.e. the exact code
    path Engine.migrate provisions."""
    spec = ddl.parse_clickhouse_ddl(_REPLACING_DDL)
    e = t(spark, sf_dir, "events").where(F.col("user_id") <= 100)
    log = e.select(
        "user_id",
        "event_type",
        # zero-padded epoch + event_id: lexicographic == (ts, event_id) order
        F.concat_ws(
            "|",
            F.lpad(F.unix_timestamp("ts").cast("string"), 12, "0"),
            F.col("event_id").cast("string"),
        ).alias("ver"),
        "value",
        "ts",
    )
    fin = ddl.final_read(log, spec)
    return fin.select(
        "user_id",
        "event_type",
        # cents-exact decimal, surfaced as DOUBLE: the driver's result
        # canonicalizer cannot hash Decimal cells (round-3 finding), and
        # two-decimal values are exactly representable in binary64.
        F.col("value").cast("decimal(18,2)").cast("double").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


@query(
    "q106_summing_merge",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def q106_summing_merge(spark, sf_dir):
    """SummingMergeTree: counters collapse to one row per ORDER BY key.

    Each event becomes a (day, event_type, total=value, n=1) counter row;
    final_read sums the declared columns per key — the ClickHouse merge,
    expressed as one partial-aggregated shuffle."""
    spec = ddl.parse_clickhouse_ddl(_SUMMING_DDL)
    e = t(spark, sf_dir, "events")
    counters = e.select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("total"),
        F.lit(1).cast("long").alias("n"),
    )
    fin = ddl.final_read(counters, spec)
    # merge stays exact DECIMAL(18,2); only the surfaced column is DOUBLE
    # (driver hash cannot canonicalize Decimal — round-3 finding), with an
    # explicit (18,2) downcast first so Spark's SUM-widened (28,2) never
    # leaks into the output schema.
    return fin.select(
        "day",
        "event_type",
        F.col("total").cast("decimal(18,2)").cast("double").alias("total"),
        "n",
    )


_COLLAPSING_DDL = """
CREATE TABLE order_state (
    o_orderkey Int64,
    sign Int8,
    price Decimal(18, 2)
) ENGINE = CollapsingMergeTree(sign)
ORDER BY o_orderkey;
"""

_VCOLLAPSING_DDL = """
CREATE TABLE order_versions (
    o_orderkey Int64,
    sign Int8,
    ver UInt32,
    price Decimal(18, 2)
) ENGINE = VersionedCollapsingMergeTree(sign, ver)
ORDER BY o_orderkey;
"""


def _collapsing_log(spark, sf_dir, with_version: bool):
    """Deterministic collapsing log built from orders — the write pattern
    a ClickHouse collapsing table actually sees: every order inserts a
    +1 state row; keys with o_orderkey % 4 == 0 are later deleted
    (a matching -1 cancel), keys with % 4 == 1 are updated (a -1 cancel
    plus a new +1 state at 1.1x the price).  All prices go through exact
    DECIMAL(18,2) arithmetic so Spark and the oracle agree bit-for-bit."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    b = F.col("o_orderkey") % 4
    new_price = (
        F.round(F.col("price") * F.lit("1.1").cast("decimal(2,1)"), 2)
        .cast("decimal(18,2)")
    )

    def row(df, sign, ver, price):
        cols = [F.col("o_orderkey"), F.lit(sign).cast("tinyint").alias("sign")]
        if with_version:
            cols.append(F.lit(ver).cast("int").alias("ver"))
        cols.append(price.alias("price"))
        return df.select(*cols)

    state0 = row(o, 1, 0, F.col("price"))
    cancel = row(o.where(b.isin(0, 1)), -1, 0, F.col("price"))
    state1 = row(o.where(b == 1), 1, 1, new_price)
    return state0.unionByName(cancel).unionByName(state1)


@query(
    "q192_collapsing_final",
    oracle="""
    WITH log AS (
      SELECT o_orderkey, 1 AS sign, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
      UNION ALL
      SELECT o_orderkey, -1, CAST(o_totalprice AS DECIMAL(18,2))
      FROM orders WHERE o_orderkey % 4 IN (0, 1)
      UNION ALL
      SELECT o_orderkey, 1,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2) AS DECIMAL(18,2))
      FROM orders WHERE o_orderkey % 4 = 1
    )
    SELECT o_orderkey,
           CAST(MAX(price) FILTER (WHERE sign = 1) AS DOUBLE) AS final_price
    FROM log
    GROUP BY o_orderkey
    HAVING SUM(sign) > 0
    """,
)
def q192_collapsing_final(spark, sf_dir):
    """CollapsingMergeTree FINAL: +1/-1 state/cancel pairs collapse.

    Deleted keys (net sign 0) vanish; updated keys keep the newest state
    row.  Runs through ddl.final_read on a parsed CollapsingMergeTree
    DDL — one shuffle on the merge key, exactly what a ClickHouse FINAL
    read pays.  The oracle spells the collapse as the canonical
    GROUP BY key HAVING sum(sign) > 0 query from the ClickHouse docs —
    different formulation, same fixpoint."""
    spec = ddl.parse_clickhouse_ddl(_COLLAPSING_DDL)
    log = _collapsing_log(spark, sf_dir, with_version=False)
    fin = ddl.final_read(log, spec)
    # collapse is exact DECIMAL; surface as DOUBLE for the driver hash
    return fin.select(
        "o_orderkey", F.col("price").cast("double").alias("final_price")
    )


@query(
    "q193_versioned_collapsing",
    oracle="""
    WITH log AS (
      SELECT o_orderkey, 1 AS sign, 0 AS ver,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
      UNION ALL
      SELECT o_orderkey, -1, 0, CAST(o_totalprice AS DECIMAL(18,2))
      FROM orders WHERE o_orderkey % 4 IN (0, 1)
      UNION ALL
      SELECT o_orderkey, 1, 1,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2) AS DECIMAL(18,2))
      FROM orders WHERE o_orderkey % 4 = 1
    )
    SELECT o_orderkey, ver,
           CAST(MAX(price) FILTER (WHERE sign = 1) AS DOUBLE) AS price
    FROM log
    GROUP BY o_orderkey, ver
    HAVING SUM(sign) > 0
    """,
)
def q193_versioned_collapsing(spark, sf_dir):
    """VersionedCollapsingMergeTree FINAL: pairs cancel per (key, ver).

    The explicit version column makes the collapse insertion-order-free
    (the reason the engine exists): the v0 state and its v0 cancel
    annihilate regardless of arrival order, and every uncancelled
    version survives.  One shuffle on (key, version)."""
    spec = ddl.parse_clickhouse_ddl(_VCOLLAPSING_DDL)
    log = _collapsing_log(spark, sf_dir, with_version=True)
    fin = ddl.final_read(log, spec)
    # collapse is exact DECIMAL; surface as DOUBLE for the driver hash
    return fin.select(
        "o_orderkey", "ver", F.col("price").cast("double").alias("price")
    )


_AGG_ROLLUP_DDL = """
CREATE TABLE flag_rollup (
    l_returnflag String,
    uo AggregateFunction(uniqExact, Int64),
    sp AggregateFunction(sum, Decimal(18, 2)),
    aq AggregateFunction(avg, Float64),
    n AggregateFunction(count, UInt64)
) ENGINE = AggregatingMergeTree()
ORDER BY (l_returnflag);
"""


@query(
    "q233_aggregating_merge_tree",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           SUM(l_quantity) / COUNT(l_quantity) AS avg_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q233_aggregating_merge_tree(spark, sf_dir):
    """The AggregatingMergeTree loop end-to-end (round-7 batch 43):
    two -State partial batches (split by l_linestatus, ClickHouse's
    two inserted parts) written through the dialect's combinator
    spellings, merged per key by ddl.final_read's
    AggregatingMergeTree branch (states stay states — the FINAL
    semantics), then read back with the -Merge spellings. The values
    must equal the direct one-level aggregates — the homomorphism
    ClickHouse's whole matview architecture rests on. Exactness by
    construction: uniqExact states are exact element sets, prices
    ride DECIMAL(18,2), quantities are integer-valued doubles, and
    the avg division is the same double / bigint in both engines.
    Scale shape: each part is one map-side-combined exchange; the
    merge is one more exchange on the key — never a re-read of
    facts."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    spec = ddl.parse_clickhouse_ddl(_AGG_ROLLUP_DDL)
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    parts = [
        spark.sql(
            translate(
                "SELECT l_returnflag,"
                " uniqExactState(l_orderkey) AS uo,"
                " sumState(toDecimal64(l_extendedprice, 2)) AS sp,"
                " avgState(l_quantity) AS aq,"
                " countState() AS n"
                f" FROM lineitem WHERE {pred} GROUP BY l_returnflag"
            ).sql
        )
        for pred in ("l_linestatus = 'O'", "l_linestatus <> 'O'")
    ]
    states = parts[0].unionByName(parts[1])
    ddl.final_read(states, spec).createOrReplaceTempView("flag_rollup")
    return spark.sql(
        translate(
            "SELECT l_returnflag,"
            " uniqExactMerge(uo) AS n_orders,"
            " CAST(sumMerge(sp) AS DOUBLE) AS sum_price,"
            " avgMerge(aq) AS avg_qty,"
            " countMerge(n) AS n_rows"
            " FROM flag_rollup GROUP BY l_returnflag"
        ).sql
    )
