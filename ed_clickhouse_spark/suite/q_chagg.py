"""ClickHouse specialty aggregates: sumMap, deltaSum, intervalLengthSum.

These are the aggregate spellings a ClickHouse event-analytics user
reaches for beyond plain sums (the reference's tables are built for
exactly this usage — watch/play events with durations and positions,
migrations/006:26-28).  Each maps to a shuffle-minimal Spark composition:
explode+two-phase agg (sumMap), one window pass (deltaSum), a sweep
window (intervalLengthSum).  Map-valued output is serialized to a sorted
``k:v`` string so the driver's canonicalizer (scalar columns only)
hashes it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.functions.clickhouse import sum_map_entries
from ed_clickhouse_spark.operators.windows import (
    delta_sum,
    funnel_strict,
    interval_length_sum,
    max_intersections,
)
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q107_sum_map",
    oracle="""
    WITH per_key AS (
      SELECT user_id % 10 AS bucket, event_type AS k,
             SUM(CAST(value AS DECIMAL(18,2))) AS s
      FROM events GROUP BY 1, 2
    )
    SELECT bucket,
           string_agg(k || ':' || CAST(s AS VARCHAR), ',' ORDER BY k) AS summed
    FROM per_key GROUP BY bucket
    """,
)
def q107_sum_map(spark, sf_dir):
    """sumMap: per user-bucket, element-wise sum of {event_type: value}
    maps.  Exercises the scalable explode -> (group,key) partial agg ->
    map_from_entries reassembly (functions/clickhouse.py:sum_map_entries);
    never holds a group's maps in memory at once."""
    e = t(spark, sf_dir, "events")
    maps = e.select(
        (F.col("user_id") % 10).alias("bucket"),
        F.create_map(
            F.col("event_type"), F.col("value").cast("decimal(18,2)")
        ).alias("m"),
    )
    summed = sum_map_entries(maps, ["bucket"], "m")
    # serialize sorted entries to "k:v,..." for the scalar-only canonicalizer
    return summed.select(
        "bucket",
        F.array_join(
            F.transform(
                F.map_entries("summed"),
                lambda kv: F.concat_ws(":", kv["key"], kv["value"].cast("string")),
            ),
            ",",
        ).alias("summed"),
    )


@query(
    "q108_delta_sum",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,2))
               - LAG(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS step
      FROM events
    )
    SELECT user_id,
           CAST(CAST(COALESCE(SUM(CASE WHEN step > 0 THEN step END), 0)
                     AS DECIMAL(18,2)) AS DOUBLE) AS delta_sum
    FROM steps GROUP BY user_id
    """,
)
def q108_delta_sum(spark, sf_dir):
    """deltaSum: per user, sum of positive increments of ``value`` along
    the (ts, event_id) order — counter-rate semantics over the event log.
    One window shuffle + one matching groupBy (operators/windows.py:
    delta_sum)."""
    e = t(spark, sf_dir, "events").withColumn(
        "v", F.col("value").cast("decimal(18,2)")
    )
    out = delta_sum(e, ["user_id"], ["ts", "event_id"], "v")
    # exact decimal arithmetic internally; DOUBLE surfaced for the driver
    # hash (it cannot canonicalize Decimal cells — round-3 finding)
    return out.select(
        "user_id",
        F.col("delta_sum").cast("decimal(18,2)").cast("double").alias("delta_sum"),
    )


@query(
    "q109_interval_union",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + CAST(ROUND(value * 60) AS BIGINT) AS e
      FROM events
    ),
    sweep AS (
      SELECT user_id, s, e,
             MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS hwm
      FROM iv
    )
    SELECT user_id,
           CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(hwm, s)), 0)) AS BIGINT) AS covered
    FROM sweep GROUP BY user_id
    """,
)
def q109_interval_union(spark, sf_dir):
    """intervalLengthSum: per user, seconds covered by the UNION of
    activity intervals [ts, ts + value minutes) — overlapping sessions
    counted once.  Sweep-window plan (operators/windows.py:
    interval_length_sum), no quadratic overlap self-join."""
    e = t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (
            F.unix_timestamp("ts")
            + F.round(F.col("value") * 60).cast("long")
        ).alias("e"),
    )
    return interval_length_sum(iv, ["user_id"], "s", "e")


@query(
    "q110_dict_get",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(n.n_name, 'UNKNOWN') AS nation_name,
           COALESCE(r.r_name, 'UNKNOWN') AS region_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE c.c_custkey <= 500
    """,
)
def q110_dict_get(spark, sf_dir):
    """dictGet: nation/region as ClickHouse-style dictionaries over the
    customer table — two chained broadcast lookups, zero shuffle on the
    fact side (operators/dictionary.py). The dictionaries are the
    nation->name and nation->region maps a deployment would hang off its
    geo dimension."""
    from ed_clickhouse_spark.operators import dictionary as D

    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    # nation dictionary carries its region's name resolved at registration
    # (dictionaries may themselves be dictGet-enriched — they're tiny)
    D.register_dict("region_d", region.select("r_regionkey", "r_name"), "r_regionkey")
    nation_attrs = D.dict_get(
        nation.select("n_nationkey", "n_name", "n_regionkey"),
        "region_d",
        "r_name",
        "n_regionkey",
    ).select("n_nationkey", "n_name", "r_name")
    D.register_dict("nation_d", nation_attrs, "n_nationkey")

    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    out = D.dict_get(
        c.select("c_custkey", "c_nationkey"),
        "nation_d",
        ["n_name", "r_name"],
        "c_nationkey",
        default={"n_name": "UNKNOWN", "r_name": "UNKNOWN"},
    )
    return out.select(
        "c_custkey",
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
    )


@query(
    "q111_with_totals",
    oracle="""
    SELECT event_type,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__totals__' AS event_type,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM events
    """,
)
def q111_with_totals(spark, sf_dir):
    """GROUP BY ... WITH TOTALS: per-group rows plus one all-groups total
    row.  Expressed as rollup() keeping only levels 0 and 1 — Catalyst
    expands the rollup into a single two-level aggregate (one scan, one
    shuffle), cheaper than the UNION ALL a naive port would write (the
    oracle spells it that way precisely to prove value equivalence)."""
    e = t(spark, sf_dir, "events")
    return (
        e.rollup("event_type")
        .agg(
            # exact decimal sum, surfaced as DOUBLE (driver-hash safe)
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total"),
            F.count("*").alias("n"),
        )
        # rollup emits (group) and (null)=grand-total levels; label the latter
        .select(
            F.coalesce("event_type", F.lit("__totals__")).alias("event_type"),
            "total",
            "n",
        )
    )


@query(
    "q112_sample_clause",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total
    FROM events
    WHERE substring(md5(CAST(user_id AS VARCHAR)), 1, 15) < '333333333333340'
    GROUP BY user_id
    """,
)
def q112_sample_clause(spark, sf_dir):
    """SELECT ... SAMPLE 0.2 over a SAMPLE BY user_id table: the
    deterministic md5 hash-range sample (ddl.py:sample_read) — same 20%
    of users on every engine/run, so per-user aggregates stay coherent.
    Scan-level codegen predicate; no shuffle, no sample table."""
    from ed_clickhouse_spark import ddl

    spec = ddl.parse_clickhouse_ddl(
        """
        CREATE TABLE events_s (
            event_id Int64, ts DateTime, user_id Int64,
            event_type String, value Float64, props String
        ) ENGINE = MergeTree()
        ORDER BY (ts) SAMPLE BY user_id;
        """
    )
    e = t(spark, sf_dir, "events")
    sampled = ddl.sample_read(e, spec, 0.2)
    return sampled.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        # exact decimal sum, surfaced as DOUBLE (driver-hash safe)
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("total"),
    )


@query(
    "q113_funnel_strict_order",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list(event_type ORDER BY ts, event_id) AS evs
      FROM events GROUP BY user_id
    ),
    anchored AS (
      SELECT user_id, evs,
             COALESCE(list_position(evs, 'view'), 0) AS i
      FROM seq
    )
    SELECT user_id,
           CASE WHEN i = 0 THEN 0
                WHEN evs[i + 1] IS DISTINCT FROM 'click' THEN 1
                WHEN evs[i + 2] IS DISTINCT FROM 'purchase' THEN 2
                ELSE 3 END AS funnel_steps
    FROM anchored
    """,
)
def q113_funnel_strict_order(spark, sf_dir):
    """windowFunnel strict_order: view -> click -> purchase must be
    CONSECUTIVE events (any intervening event breaks the chain), anchored
    at each user's first view.  One shuffle on user_id, JVM array ops
    (operators/windows.py:funnel_strict)."""
    e = t(spark, sf_dir, "events")
    return funnel_strict(
        e, "user_id", "ts", "event_id", "event_type", ["view", "click", "purchase"]
    )


@query(
    "q114_max_intersections",
    oracle="""
    WITH deltas AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, 1 AS d FROM events
      UNION ALL
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + CAST(ROUND(value * 60) AS BIGINT) AS t, -1 AS d
      FROM events
    ),
    running AS (
      SELECT user_id,
             SUM(d) OVER (PARTITION BY user_id ORDER BY t, d
                          ROWS UNBOUNDED PRECEDING) AS open
      FROM deltas
    )
    SELECT user_id, CAST(MAX(open) AS BIGINT) AS max_concurrent
    FROM running GROUP BY user_id
    """,
)
def q114_max_intersections(spark, sf_dir):
    """maxIntersections: per user, peak number of simultaneously-open
    activity intervals [ts, ts + value minutes) — +1/-1 delta sweep with
    a running sum, one shuffle, no quadratic overlap join
    (operators/windows.py:max_intersections)."""
    e = t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (
            F.unix_timestamp("ts")
            + F.round(F.col("value") * 60).cast("long")
        ).alias("e"),
    )
    out = max_intersections(iv, ["user_id"], "s", "e")
    return out.select("user_id", F.col("max_concurrent").cast("bigint").alias("max_concurrent"))


@query(
    "q157_group_bit",
    oracle="""
    SELECT event_type,
           BIT_AND(user_id) AS band,
           BIT_OR(user_id) AS bor,
           BIT_XOR(user_id) AS bxor
    FROM events GROUP BY event_type
    """,
)
def q157_group_bit(spark, sf_dir):
    """ClickHouse groupBitAnd/groupBitOr/groupBitXor: bitwise fold of
    user ids per event type (flag-mask audits). Native two-phase
    aggregates — map-side combine, one shuffle."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("bit_and(user_id)").alias("band"),
        F.expr("bit_or(user_id)").alias("bor"),
        F.expr("bit_xor(user_id)").alias("bxor"),
    )


@query(
    "q158_min_max_map",
    oracle="""
    WITH per_key AS (
      SELECT user_id % 10 AS bucket, event_type AS k,
             MIN(CAST(value AS DECIMAL(18,2))) AS lo,
             MAX(CAST(value AS DECIMAL(18,2))) AS hi
      FROM events GROUP BY 1, 2
    )
    SELECT bucket,
           string_agg(k || ':' || CAST(lo AS VARCHAR), ',' ORDER BY k) AS minned,
           string_agg(k || ':' || CAST(hi AS VARCHAR), ',' ORDER BY k) AS maxed
    FROM per_key GROUP BY bucket
    """,
)
def q158_min_max_map(spark, sf_dir):
    """ClickHouse minMap/maxMap: element-wise min and max of
    {event_type: value} maps per user bucket — the same scalable
    explode -> (group,key) partial agg -> reassembly as sumMap (q107),
    with min/max folds."""
    from ed_clickhouse_spark.functions.clickhouse import (
        max_map_entries,
        min_map_entries,
    )

    e = t(spark, sf_dir, "events")
    maps = e.select(
        (F.col("user_id") % 10).alias("bucket"),
        F.create_map(
            F.col("event_type"), F.col("value").cast("decimal(18,2)")
        ).alias("m"),
    )

    def _ser(col, alias):
        return F.array_join(
            F.transform(
                F.map_entries(col),
                lambda kv: F.concat_ws(":", kv["key"], kv["value"].cast("string")),
            ),
            ",",
        ).alias(alias)

    lo = min_map_entries(maps, ["bucket"], "m")
    hi = max_map_entries(maps, ["bucket"], "m")
    return lo.join(hi, "bucket").select(
        "bucket", _ser("minned", "minned"), _ser("maxed", "maxed")
    )


@query(
    "q159_topk_weighted",
    oracle="""
    SELECT user_id, w FROM (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS w
      FROM events GROUP BY 1
    )
    ORDER BY w DESC, user_id ASC LIMIT 10
    """,
)
def q159_topk_weighted(spark, sf_dir):
    """ClickHouse topKWeighted(10)(user_id, value): heaviest users by
    total event value. Exact two-phase weighted counting (ClickHouse's
    is approximate SpaceSaving; exact is strictly better and the same
    one-shuffle shape) + TakeOrderedAndProject, deterministic
    tiebreak."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("w"))
        .orderBy(F.desc("w"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "q160_sequence_next_node",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    first_click AS (
      SELECT user_id, nxt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM ordered WHERE event_type = 'click'
    )
    SELECT user_id, nxt AS next_event
    FROM first_click WHERE rn = 1 AND nxt IS NOT NULL
    """,
)
def q160_sequence_next_node(spark, sf_dir):
    """ClickHouse sequenceNextNode('forward', 'first_match'): the event
    that immediately follows each user's FIRST 'click' — where does the
    journey go after the entry action. One user-keyed window pass
    (lead + first-match row_number), no self-join."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.withColumn("nxt", F.lead("event_type").over(w))
    clicks = ordered.filter(F.col("event_type") == "click").withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        clicks.filter((F.col("rn") == 1) & F.col("nxt").isNotNull())
        .select("user_id", F.col("nxt").alias("next_event"))
    )


@query(
    "q161_quantiles_exact",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 6) AS q25,
           ROUND(quantile_cont(value, 0.5), 6) AS q50,
           ROUND(quantile_cont(value, 0.75), 6) AS q75,
           ROUND(quantile_cont(value, 0.95), 6) AS q95
    FROM events GROUP BY event_type
    """,
)
def q161_quantiles_exact(spark, sf_dir):
    """ClickHouse quantilesExact(0.25,0.5,0.75,0.95): exact linear-
    interpolated quantiles per event type (q07 is the approx
    percentile_approx twin — CH `quantiles`). Spark's native exact
    percentile: two-phase, per-group value buffers — exact is viable
    when group value cardinality is bounded; at open cardinality use
    q104/q133's constant-memory paths."""
    e = t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.95))").alias("qs")
    )
    return agg.select(
        "event_type",
        F.round(F.element_at("qs", 1), 6).alias("q25"),
        F.round(F.element_at("qs", 2), 6).alias("q50"),
        F.round(F.element_at("qs", 3), 6).alias("q75"),
        F.round(F.element_at("qs", 4), 6).alias("q95"),
    )


@query(
    "q170_max_intersections_position",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) // 1000000 AS s,
             epoch_us(ts) // 1000000 + CAST(ROUND(value * 60) AS BIGINT) AS e
      FROM events WHERE event_type = 'view'
    ),
    deltas AS (
      SELECT user_id, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT user_id, e AS t, -1 AS d FROM iv
    ),
    run AS (
      SELECT user_id, t, d,
             SUM(d) OVER (PARTITION BY user_id ORDER BY t, d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
      FROM deltas
    ),
    best AS (
      SELECT user_id, t, open,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY open DESC, t ASC) AS rn
      FROM run
    )
    SELECT user_id, CAST(open AS BIGINT) AS max_concurrent,
           CAST(t AS BIGINT) AS at_epoch
    FROM best WHERE rn = 1
    """,
)
def q170_max_intersections_position(spark, sf_dir):
    """ClickHouse maxIntersectionsPosition: WHEN does each user's peak
    view concurrency occur (the earliest instant attaining the max) —
    q114's sweep plus an argmax over the same running sum; still one
    shuffle, no pairwise overlap join."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    s = (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("bigint")
    iv = e.select(
        "user_id",
        s.alias("s"),
        (s + F.round(F.col("value") * 60).cast("long")).alias("e"),
    )
    deltas = iv.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("x"),
    ).select("user_id", F.col("x.t").alias("t"), F.col("x.d").alias("d"))
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "d")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = deltas.withColumn("open", F.sum("d").over(w))
    sel = W.partitionBy("user_id").orderBy(F.desc("open"), F.asc("t"))
    return (
        run.withColumn("rn", F.row_number().over(sel))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("open").cast("bigint").alias("max_concurrent"),
            F.col("t").cast("bigint").alias("at_epoch"),
        )
    )


@query(
    "q171_uniq_up_to",
    oracle="""
    SELECT event_type,
           LEAST(COUNT(DISTINCT user_id % 4), 6) AS cohorts_capped,
           LEAST(COUNT(DISTINCT user_id), 6) AS users_capped
    FROM events GROUP BY event_type
    """,
)
def q171_uniq_up_to(spark, sf_dir):
    """ClickHouse uniqUpTo(5)(x): exact distinct count that saturates
    at N+1 ("more than 5") — the cheap cardinality-class check (is this
    column an enum or an id?) without a full distinct count's memory.
    Two probes per event type: the 4-cohort key stays exact (4 <= 5);
    raw user_id saturates to 6 ("more than 5")."""
    from ed_clickhouse_spark.functions.clickhouse import uniqUpTo

    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        uniqUpTo(F.col("user_id") % 4, 5).alias("cohorts_capped"),
        uniqUpTo(F.col("user_id"), 5).alias("users_capped"),
    )


@query(
    "q182_conditional_argmax",
    oracle="""
    WITH m AS (
      SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
    ),
    maj AS (
      SELECT user_id, event_type AS majority_type
      FROM m QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY c DESC, event_type ASC) = 1
    ),
    agg AS (
      SELECT user_id,
             MAX(ROW(value, event_id)) FILTER (WHERE event_type = 'purchase') AS tp,
             MAX(value) FILTER (WHERE event_type = 'purchase') AS top_value,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS np
      FROM events GROUP BY 1
    )
    SELECT agg.user_id, agg.tp[2] AS top_purchase, agg.top_value,
           maj.majority_type
    FROM agg JOIN maj USING (user_id)
    WHERE agg.np > 0
    """,
)
def q182_conditional_argmax(spark, sf_dir):
    """ClickHouse aggregate combinators: argMaxIf (the event id of each
    user's highest-value PURCHASE — conditional argMax with a
    deterministic (value, event_id) tiebreak) and anyHeavy's exact twin
    (the modal event type — spelled as an explicit count + row_number
    because native mode() breaks ties arbitrarily in BOTH engines; the
    deterministic form is the only oracle-able one). Two grouped passes
    sharing the user-keyed exchange."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    purchase = F.col("event_type") == "purchase"
    agg = (
        e.groupBy("user_id")
        .agg(
            F.max_by(
                "event_id",
                F.when(purchase, F.struct(F.col("value"), F.col("event_id"))),
            ).alias("top_purchase"),
            F.max(F.when(purchase, F.col("value"))).alias("top_value"),
            F.count(F.when(purchase, 1)).alias("__np"),
        )
        .filter(F.col("__np") > 0)
        .drop("__np")
    )
    maj = (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.desc("c"), F.asc("event_type"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("majority_type"))
    )
    return agg.join(maj, "user_id")


@query(
    "q207_dd_quantile_sketch",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(1048576 + ceil(ln(value) / ln(1.0202020202020203)) AS INT) AS k,
             COUNT(*) AS c
      FROM events WHERE value > 0 GROUP BY 1, 2
    ),
    t AS (SELECT event_type, SUM(c) AS total FROM b GROUP BY 1),
    w AS (
      SELECT b.event_type, k, c, t.total,
             SUM(c) OVER (PARTITION BY b.event_type ORDER BY k) AS cum
      FROM b JOIN t USING (event_type)
    )
    SELECT event_type,
           ROUND(POWER(1.0202020202020203,
             (SELECT MIN(k) FROM w w2 WHERE w2.event_type = w.event_type
                AND w2.cum >= GREATEST(CEIL(0.5 * w2.total), 1))
             - 1048576 - 0.5), 4) AS p50,
           ROUND(POWER(1.0202020202020203,
             (SELECT MIN(k) FROM w w2 WHERE w2.event_type = w.event_type
                AND w2.cum >= GREATEST(CEIL(0.95 * w2.total), 1))
             - 1048576 - 0.5), 4) AS p95
    FROM w GROUP BY event_type ORDER BY event_type
    """,
)
def q207_dd_quantile_sketch(spark, sf_dir):
    """DDSketch quantiles as a DETERMINISTIC approximate aggregate —
    the only quantile sketch in the suite an oracle can hash-match,
    because bucket assignment (ceil(ln x / ln gamma)) and the rank walk
    are pure functions of the data, not of merge order. This is the
    batch twin of the streaming quantileState/quantileMerge MV state
    (streaming/matview.py): one shuffle per (group, bucket), then the
    chDDQuantile read-out; ~1% relative error at any scale, and the
    state column is what a 100 TB latency dashboard stores instead of
    raw durations."""
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("""
        WITH b AS (
          SELECT event_type,
                 CAST(1048576 + ceil(ln(value) / ln(1.0202020202020203)) AS INT) AS k,
                 COUNT(*) AS c
          FROM events WHERE value > 0 GROUP BY 1, 2
        ),
        m AS (
          SELECT event_type,
                 map_from_entries(array_sort(collect_list(struct(k, c)))) AS sk
          FROM b GROUP BY event_type
        )
        SELECT event_type,
               ROUND(chDDQuantile(sk, 0.5), 4) AS p50,
               ROUND(chDDQuantile(sk, 0.95), 4) AS p95
        FROM m ORDER BY event_type
    """)


@query(
    "q211_sample_offset_panels",
    oracle="""
    WITH h AS (
      SELECT user_id, value,
             substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS hk
      FROM events
    ),
    p AS (
      SELECT 0 AS panel, user_id, value FROM h
      WHERE hk < '400000000000000'
      UNION ALL
      SELECT 1, user_id, value FROM h
      WHERE hk >= '400000000000000' AND hk < '800000000000000'
      UNION ALL
      SELECT 2, user_id, value FROM h
      WHERE hk >= '800000000000000' AND hk < 'c00000000000000'
      UNION ALL
      SELECT 3, user_id, value FROM h WHERE hk >= 'c00000000000000'
    )
    SELECT panel, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total
    FROM p GROUP BY panel
    """,
)
def q211_sample_offset_panels(spark, sf_dir):
    """SAMPLE 1/4 OFFSET k/4 panels spelled VERBATIM in the dialect —
    the parallel-worker idiom where four jobs each take a disjoint
    quarter of the sampling key space. The four branches must partition
    the users exactly (the oracle re-derives the same md5 hash ranges),
    and each branch stays a scan-level codegen predicate — no shuffle,
    no sample table."""
    from ed_clickhouse_spark import ddl
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    spec = ddl.parse_clickhouse_ddl(
        """
        CREATE TABLE events (
            event_id Int64, ts DateTime, user_id Int64,
            event_type String, value Float64, props String
        ) ENGINE = MergeTree()
        ORDER BY (ts) SAMPLE BY user_id;
        """
    )
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    branches = " UNION ALL ".join(
        f"SELECT {k} AS panel, count(DISTINCT user_id) AS n_users,"
        f" count() AS n_events,"
        f" CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))"
        f" AS DOUBLE) AS total"
        f" FROM events SAMPLE 1/4 OFFSET {k}/4"
        for k in range(4)
    )
    return spark.sql(translate(branches, {"events": spec}).sql)
