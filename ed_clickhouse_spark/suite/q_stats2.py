"""Nonparametric / rank-statistics queries (ClickHouse
mannWhitneyUTest / rankCorr / kolmogorovSmirnovTest / sequenceCount /
theilsU / boundingRatio) over the events table, DuckDB-oracled.

Rank tests compress to per-distinct-value counts before the one
ordered pass (see operators/stats.py), so the oracles mirror the same
count-then-window decomposition — both engines aggregate exact
integers/halves and only the final scalar division runs in floating
point, absorbed by ROUND(..., 6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.stats import (
    auc,
    avg_weighted,
    skew_kurt,
    student_ttest,
    bounding_ratio,
    kolmogorov_smirnov,
    mann_whitney_u,
    rank_corr,
    sequence_count,
    theils_u,
)
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q142_mann_whitney",
    oracle="""
    WITH f AS (
      SELECT value AS v, event_type FROM events
      WHERE event_type IN ('click', 'error')
    ),
    c AS (
      SELECT v, COUNT(*) AS c,
             COUNT(*) FILTER (WHERE event_type = 'click') AS ca
      FROM f GROUP BY 1
    ),
    r AS (
      SELECT c, ca,
             COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS rank
      FROM c
    ),
    a AS (
      SELECT SUM(ca) AS n_a, SUM(c - ca) AS n_b,
             SUM(ca * rank) AS r_a, SUM(c * c * c - c) AS tie
      FROM r
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(r_a - n_a * (n_a + 1) / 2.0, 6) AS u,
           ROUND((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                 / sqrt(n_a * n_b / 12.0
                        * ((n_a + n_b + 1)
                           - tie / ((n_a + n_b) * (n_a + n_b - 1.0)))), 6) AS z
    FROM a
    """,
)
def q142_mann_whitney(spark, sf_dir):
    """ClickHouse mannWhitneyUTest: do 'click' and 'error' events draw
    their values from the same distribution? Tie-corrected U/z from
    per-distinct-value counts — rows shuffle once, keyed on the
    measure; the ordered pass runs over value cardinality."""
    return mann_whitney_u(
        t(spark, sf_dir, "events"), "value", "event_type", "click", "error"
    )


@query(
    "q143_rank_corr",
    oracle="""
    WITH d AS (SELECT value AS x, user_id % 100 AS y FROM events),
    cx AS (SELECT x, COUNT(*) AS c FROM d GROUP BY 1),
    rx AS (
      SELECT x, COALESCE(SUM(c) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS rx
      FROM cx
    ),
    cy AS (SELECT y, COUNT(*) AS c FROM d GROUP BY 1),
    ry AS (
      SELECT y, COALESCE(SUM(c) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS ry
      FROM cy
    ),
    j AS (
      SELECT CAST(rx AS DECIMAL(28,1)) AS rx, CAST(ry AS DECIMAL(28,1)) AS ry
      FROM d JOIN rx USING (x) JOIN ry USING (y)
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy,
             CAST(SUM(rx * rx) AS DOUBLE) AS sxx,
             CAST(SUM(ry * ry) AS DOUBLE) AS syy,
             CAST(SUM(rx * ry) AS DOUBLE) AS sxy
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((sxy - sx * sy / n)
                 / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS rho
    FROM m
    """,
)
def q143_rank_corr(spark, sf_dir):
    """ClickHouse rankCorr: Spearman correlation between event value
    and user cohort (≈0 on this synthetic data). Midranks from two
    distinct-value count tables joined back by value; Pearson over the
    rank pairs from one exact decimal moment aggregate."""
    e = t(spark, sf_dir, "events").select(
        F.col("value").alias("x"), (F.col("user_id") % 100).alias("y")
    )
    return rank_corr(e, "x", "y")


@query(
    "q144_ks_test",
    oracle="""
    WITH f AS (
      SELECT value AS v, event_type FROM events
      WHERE event_type IN ('click', 'view')
    ),
    c AS (
      SELECT v,
             COUNT(*) FILTER (WHERE event_type = 'click') AS ca,
             COUNT(*) FILTER (WHERE event_type = 'view') AS cb
      FROM f GROUP BY 1
    ),
    tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM c),
    cum AS (
      SELECT SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cum_a,
             SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cum_b
      FROM c
    ),
    d AS (
      SELECT MAX(ABS(cum_a / n_a - cum_b / n_b)) AS d, n_a, n_b
      FROM cum CROSS JOIN tot GROUP BY n_a, n_b
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(d, 6) AS d,
           ROUND(sqrt(n_a * n_b / (n_a + n_b)) * d, 6) AS ks
    FROM d
    """,
)
def q144_ks_test(spark, sf_dir):
    """ClickHouse kolmogorovSmirnovTest: sup-distance between the
    'click' and 'view' value ECDFs. ECDFs step only at observed values,
    so the sup is computed on the distinct-value grid — one grouped
    count, one cardinality-bounded window, one max."""
    return kolmogorov_smirnov(
        t(spark, sf_dir, "events"), "value", "event_type", "click", "view"
    )


@query(
    "q145_sequence_count",
    oracle="""
    WITH f AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    l AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM f
    )
    SELECT user_id, COUNT(*) AS matches
    FROM l WHERE event_type = 'purchase' AND prev = 'click'
    GROUP BY 1
    """,
)
def q145_sequence_count(spark, sf_dir):
    """ClickHouse sequenceCount('(?1)(?2)')(ts, click, purchase): how
    many click→purchase conversions per user, greedy non-overlapping.
    Reduces to a lag over the A/B-filtered event stream (see
    operators/stats.py:sequence_count for the equivalence proof) — one
    user-keyed window, no state machine, no quadratic self-join."""
    return sequence_count(
        t(spark, sf_dir, "events"),
        "ts",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
        group_col="user_id",
        tiebreak_col="event_id",
    )


@query(
    "q146_theils_u",
    oracle="""
    WITH cells AS (
      SELECT event_type AS a, user_id % 5 AS b, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT SUM(o) AS n, SUM(o * ln(o)) AS cab FROM cells
    ),
    ma AS (
      SELECT SUM(c * ln(c)) AS ca
      FROM (SELECT SUM(o) AS c FROM cells GROUP BY a)
    ),
    mb AS (
      SELECT SUM(c * ln(c)) AS cb
      FROM (SELECT SUM(o) AS c FROM cells GROUP BY b)
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(((ln(n) - ca / n) - (cb - cab) / n) / (ln(n) - ca / n), 6) AS u
    FROM agg CROSS JOIN ma CROSS JOIN mb
    """,
)
def q146_theils_u(spark, sf_dir):
    """ClickHouse theilsU(a, b): how much does knowing the user cohort
    reduce the entropy of the event type (asymmetric association, ≈0
    here). Contingency cells + two marginals, zero cells never
    materialize (0·ln0 = 0) — the cramersV shuffle shape."""
    e = t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 5).alias("cohort")
    )
    return theils_u(e, "event_type", "cohort")


@query(
    "q147_bounding_ratio",
    oracle="""
    WITH s AS (
      SELECT event_type, epoch(ts) AS x,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type,
             FIRST_VALUE(y) OVER (PARTITION BY event_type ORDER BY x DESC) AS y_hi,
             FIRST_VALUE(y) OVER (PARTITION BY event_type ORDER BY x ASC) AS y_lo,
             MAX(x) OVER (PARTITION BY event_type) AS x_hi,
             MIN(x) OVER (PARTITION BY event_type) AS x_lo
      FROM s
    )
    SELECT DISTINCT event_type,
           ROUND((y_hi - y_lo) / (x_hi - x_lo), 6) AS ratio
    FROM w
    """,
)
def q147_bounding_ratio(spark, sf_dir):
    """ClickHouse boundingRatio(x, y): chord slope between the first
    and last point of each event type's per-second value series. The
    series is pre-aggregated to one row per (type, second) — x is
    unique within the group, so max_by/min_by are deterministic — then
    one grouped aggregate."""
    e = t(spark, sf_dir, "events")
    s = e.groupBy(
        "event_type", F.unix_timestamp("ts").alias("x")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("y"))
    return bounding_ratio(s, "x", "y", ["event_type"])


@query(
    "q148_auc",
    oracle="""
    WITH d AS (
      SELECT CAST(embedding[1] AS DOUBLE) AS s,
             CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    c AS (SELECT s, COUNT(*) AS c, SUM(y) AS cp FROM d GROUP BY 1),
    r AS (
      SELECT c, cp,
             COALESCE(SUM(c) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (c + 1) / 2.0 AS rank
      FROM c
    ),
    a AS (
      SELECT SUM(cp) AS n_pos, SUM(c - cp) AS n_neg,
             SUM(cp * rank) AS r_pos
      FROM r
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           ROUND((r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6) AS auc
    FROM a
    """,
)
def q148_auc(spark, sf_dir):
    """ClickHouse arrayAUC as a dataset aggregate: can the first
    embedding component separate label<5 from label>=5? (≈0.5 on this
    synthetic data — no signal.) Rank-sum identity over per-distinct-
    score counts; the ordered pass is cardinality-bounded."""
    e = t(spark, sf_dir, "embeddings").select(
        F.element_at("embedding", 1).cast("double").alias("s"),
        (F.col("label") < 5).alias("y"),
    )
    return auc(e, "s", "y")


@query(
    "q149_skew_kurt",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(28,4))
                      * CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS s2,
             SUM(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                 * CAST(value AS DOUBLE)) AS s3,
             SUM(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                 * CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS s4
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT event_type, n, s1 / n AS m1,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * s2 / n + 2 * pow(s1 / n, 3) AS m3,
             s4 / n - 4 * (s1 / n) * s3 / n
               + 6 * (s1 / n) * (s1 / n) * s2 / n - 3 * pow(s1 / n, 4) AS m4
      FROM s
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(m3 / pow(m2, 1.5), 6) AS skew,
           ROUND(m4 / (m2 * m2) - 3, 6) AS kurt
    FROM m
    """,
)
def q149_skew_kurt(spark, sf_dir):
    """ClickHouse skewPop/kurtPop per event type: one grouped pass of
    raw power sums, central-moment identities on the aggregated cells.
    (The synthetic value column is near-uniform: skew ≈ 0, kurt ≈
    −1.2.)"""
    return skew_kurt(t(spark, sf_dir, "events"), "value", ["event_type"])


@query(
    "q150_student_ttest",
    oracle="""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(28,4))
                      * CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sx2
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY 1
    ),
    m AS (
      SELECT event_type, n, sx / n AS m, sx2 - sx * sx / n AS ss FROM s
    ),
    a AS (SELECT n AS n_a, m AS m_a, ss AS ss_a FROM m WHERE event_type = 'view'),
    b AS (SELECT n AS n_b, m AS m_b, ss AS ss_b FROM m WHERE event_type = 'purchase')
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND((m_a - m_b) / sqrt((ss_a + ss_b) / (n_a + n_b - 2)
                 * (1.0 / n_a + 1.0 / n_b)), 6) AS t_stat,
           CAST(n_a + n_b - 2 AS BIGINT) AS df
    FROM a CROSS JOIN b
    """,
)
def q150_student_ttest(spark, sf_dir):
    """ClickHouse studentTTest (pooled variance, the equal-variance
    sibling of q128's Welch): same exact-decimal single-shuffle power
    sums, df = n_a + n_b − 2."""
    return student_ttest(
        t(spark, sf_dir, "events"), "value", "event_type", "view", "purchase"
    )


@query(
    "q151_avg_weighted",
    oracle="""
    SELECT source,
           ROUND(CAST(SUM(CAST(q AS DECIMAL(28,4)) * CAST(n_chars AS DECIMAL(28,0)))
                      AS DOUBLE)
                 / CAST(SUM(CAST(n_chars AS DECIMAL(28,0))) AS DOUBLE), 6) AS wavg
    FROM (
      SELECT source, n_chars,
             len(string_split(text, ' ')) * 1.0 / n_chars AS q
      FROM documents
    )
    GROUP BY source
    """,
)
def q151_avg_weighted(spark, sf_dir):
    """ClickHouse avgWeighted(x, w): tokens-per-char ratio per source,
    weighted by document length — the char-weighted mean, one exact
    decimal aggregate. (Weighting by length answers "what fraction of
    the CORPUS BYTES is word-like", not "of the documents".)"""
    from ed_clickhouse_spark.operators.text import token_count

    d = t(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        (token_count("text") * 1.0 / F.col("n_chars")).alias("q"),
    )
    return avg_weighted(d, "q", "n_chars", ["source"])


@query(
    "q152_zipf_slope",
    oracle="""
    WITH c AS (
      SELECT tok, COUNT(*) AS c
      FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      )
      WHERE tok <> ''
      GROUP BY tok
      ORDER BY c DESC, tok ASC
      LIMIT 1000
    ),
    r AS (
      SELECT ln(ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC)) AS lx,
             ln(c) AS ly
      FROM c
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
             SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_tokens,
           ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope,
           ROUND(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n,
                 6) AS intercept
    FROM m
    """,
)
def q152_zipf_slope(spark, sf_dir):
    """Zipf-law corpus audit: OLS slope of ln(freq) vs ln(rank) over
    the top-1000 tokens — a one-number distribution-shift detector for
    training-data intake (natural text ≈ −1; templated/synthetic text
    drifts toward 0). Token counts shuffle once; the regression runs on
    the 1000-row top-N."""
    from ed_clickhouse_spark.operators.text import zipf_slope

    return zipf_slope(t(spark, sf_dir, "documents"), "text", top_n=1000)


@query(
    "q153_linear_regression",
    oracle="""
    WITH d AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             value AS y
      FROM events
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(28,4)))
                  AS DOUBLE) AS sxy
      FROM d GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope,
           ROUND(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n,
                 6) AS intercept
    FROM m
    """,
)
def q153_linear_regression(spark, sf_dir):
    """ClickHouse simpleLinearRegression: drift of mean event value
    over time (slope per day, ≈0 on stationary synthetic data) per
    event type. One grouped pass of exact decimal moment sums."""
    from ed_clickhouse_spark.operators.stats import simple_linear_regression

    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias("x"),
        F.col("value").alias("y"),
    )
    return simple_linear_regression(e, "x", "y", ["event_type"])


@query(
    "q163_contingency",
    oracle="""
    WITH cells AS (
      SELECT event_type AS a, user_id % 5 AS b, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    ra AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
    cb AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
    tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT a) AS r,
                   COUNT(DISTINCT b) AS c FROM cells),
    j AS (
      SELECT cells.o, ra.ra * cb.cb / tot.n AS e, tot.n, tot.r, tot.c
      FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
    ),
    p AS (
      SELECT n, r, c,
             SUM((o - e) * (o - e) / e) + (n - SUM(e)) AS chi2
      FROM j GROUP BY 1, 2, 3
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(chi2, 6) AS chi2,
           ROUND(sqrt(chi2 / (chi2 + n)), 6) AS contingency,
           ROUND(sqrt(GREATEST(0.0, chi2 / n - (r-1)*(c-1)/(n-1.0))
                 / LEAST(r - (r-1)*(r-1)/(n-1.0) - 1,
                         c - (c-1)*(c-1)/(n-1.0) - 1)), 6) AS v_bc
    FROM p
    """,
)
def q163_contingency(spark, sf_dir):
    """ClickHouse contingency(a,b) + cramersVBiasCorrected: the
    χ²-family association coefficients between event type and user
    cohort (both ≈0 here; the bias-corrected V clamps small-sample
    noise to exactly 0). Observed-cells-only shuffle, q127's shape."""
    from ed_clickhouse_spark.operators.stats import contingency_coefficients

    e = t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 5).alias("cohort")
    )
    return contingency_coefficients(e, "event_type", "cohort")


@query(
    "q164_nonneg_derivative",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id,
             SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS gauge
      FROM events
    ),
    d AS (
      SELECT user_id, ts, event_id,
             CAST(gauge AS DOUBLE)
               - CAST(LAG(gauge) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS DOUBLE) AS dv,
             (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)) / 1000000.0 AS dt
      FROM s
    )
    SELECT user_id, COUNT(*) AS n,
           ROUND(MAX(GREATEST(0.0, dv / dt * 3600)), 6) AS peak_rate
    FROM d WHERE dt > 0
    GROUP BY 1
    """,
)
def q164_nonneg_derivative(spark, sf_dir):
    """ClickHouse nonNegativeDerivative over each user's cumulative
    value gauge: the peak per-hour accumulation rate. One window pass
    builds the gauge, one lag pass the clamped rate — no self-join."""
    from pyspark.sql import Window as W

    from ed_clickhouse_spark.operators.windows import non_negative_derivative

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gauge = e.withColumn(
        "gauge",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"),
    )
    rated = non_negative_derivative(
        gauge, "ts", "gauge", ["user_id"], per_seconds=3600.0,
        tiebreak_col="event_id",
    )
    return (
        rated.filter(F.col("rate").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("rate"), 6).alias("peak_rate"),
        )
    )


@query(
    "q168_exponential_moving_average",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, d, x,
             date_diff('day', MIN(d) OVER (PARTITION BY event_type), d) AS j
      FROM daily
    ),
    g AS (
      SELECT event_type, d, x, pow(2.0, j / 7.0) AS gr FROM idx
    )
    SELECT event_type, d,
           ROUND(SUM(x * gr) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / SUM(gr) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS ema
    FROM g
    """,
)
def q168_exponential_moving_average(spark, sf_dir):
    """ClickHouse exponentialMovingAverage(7d) over each event type's
    daily revenue: the trend line a dashboards user actually plots.
    Two cumulative window sums via the cancelled-factor closed form
    (see operators/windows.py:exponential_moving_average) — one
    shuffle, no sequential fold."""
    from ed_clickhouse_spark.operators.windows import exponential_moving_average

    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("x"))
    out = exponential_moving_average(daily, "d", "x", ["event_type"], 7)
    return out.select("event_type", "d", F.round("ema", 6).alias("ema"))


@query(
    "q169_corr_matrix",
    oracle="""
    WITH d AS (
      SELECT CAST(value AS DECIMAL(28,4)) AS a,
             CAST(user_id % 10 AS DECIMAL(28,4)) AS b,
             CAST(EXTRACT(hour FROM ts) AS DECIMAL(28,4)) AS c
      FROM events
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(a) AS DOUBLE) sa, CAST(SUM(b) AS DOUBLE) sb,
             CAST(SUM(c) AS DOUBLE) sc,
             CAST(SUM(a*a) AS DOUBLE) saa, CAST(SUM(b*b) AS DOUBLE) sbb,
             CAST(SUM(c*c) AS DOUBLE) scc,
             CAST(SUM(a*b) AS DOUBLE) sab, CAST(SUM(a*c) AS DOUBLE) sac,
             CAST(SUM(b*c) AS DOUBLE) sbc
      FROM d
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((sab - sa*sb/n) / sqrt((saa - sa*sa/n) * (sbb - sb*sb/n)), 6) AS r_ab,
           ROUND((sac - sa*sc/n) / sqrt((saa - sa*sa/n) * (scc - sc*sc/n)), 6) AS r_ac,
           ROUND((sbc - sb*sc/n) / sqrt((sbb - sb*sb/n) * (scc - sc*sc/n)), 6) AS r_bc
    FROM m
    """,
)
def q169_corr_matrix(spark, sf_dir):
    """ClickHouse corrMatrix(a, b, c): all pairwise Pearson
    correlations in ONE pass — a single grouped aggregate of the exact
    decimal moment sums feeds every cell (k measures cost one shuffle
    of k(k+3)/2 sums, not k² scans)."""
    e = t(spark, sf_dir, "events")
    a = F.col("value").cast("decimal(28,4)")
    b = (F.col("user_id") % 10).cast("decimal(28,4)")
    c = F.hour("ts").cast("decimal(28,4)")
    m = e.agg(
        F.count("*").alias("n"),
        F.sum(a).cast("double").alias("sa"),
        F.sum(b).cast("double").alias("sb"),
        F.sum(c).cast("double").alias("sc"),
        F.sum(a * a).cast("double").alias("saa"),
        F.sum(b * b).cast("double").alias("sbb"),
        F.sum(c * c).cast("double").alias("scc"),
        F.sum(a * b).cast("double").alias("sab"),
        F.sum(a * c).cast("double").alias("sac"),
        F.sum(b * c).cast("double").alias("sbc"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        num = F.col(sxy) - F.col(sx) * F.col(sy) / F.col("n")
        den = F.sqrt(
            (F.col(sxx) - F.col(sx) * F.col(sx) / F.col("n"))
            * (F.col(syy) - F.col(sy) * F.col(sy) / F.col("n"))
        )
        return F.round(num / den, 6)

    return m.select(
        F.col("n").cast("bigint").alias("n"),
        corr("sab", "sa", "sb", "saa", "sbb").alias("r_ab"),
        corr("sac", "sa", "sc", "saa", "scc").alias("r_ac"),
        corr("sbc", "sb", "sc", "sbb", "scc").alias("r_bc"),
    )


@query(
    "q179_median_abs_deviation",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY 1
    )
    SELECT e.event_type,
           ROUND(quantile_cont(ABS(e.value - med.m), 0.5), 6) AS mad,
           ROUND(ANY_VALUE(med.m), 6) AS median
    FROM events e JOIN med ON med.event_type = e.event_type
    GROUP BY 1
    """,
)
def q179_median_abs_deviation(spark, sf_dir):
    """ClickHouse medianAbsoluteDeviation-style robust dispersion: the
    median of |x − median(x)| per event type (outlier-immune, unlike
    stddev). Two exact percentile passes; the per-group medians
    broadcast back for the deviation pass — both shuffles keyed on the
    5-value group column."""
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    # bounded: med has one row per event type (5-value group column)
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("m")).alias("ad"), "m"
    )
    return dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(ad, 0.5)"), 6).alias("mad"),
        F.round(F.first("m"), 6).alias("median"),
    )


@query(
    "q212_ab_test_ztest",
    oracle="""
    WITH v AS (
      SELECT CAST(SUM(CASE WHEN user_id % 2 = 0
                            AND event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS DOUBLE) AS s_a,
             CAST(SUM(CASE WHEN user_id % 2 = 1
                            AND event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS DOUBLE) AS s_b,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) AS t_a,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) AS t_b
      FROM events
    ),
    z AS (
      SELECT s_a, s_b, t_a, t_b,
             (s_a / t_a - s_b / t_b)
             / sqrt((s_a / t_a) * (1 - s_a / t_a) / t_a
                    + (s_b / t_b) * (1 - s_b / t_b) / t_b) AS zs
      FROM v
    ),
    q AS (SELECT *, abs(zs) / sqrt(2.0) AS qq FROM z),
    u AS (SELECT *, 1.0 / (1.0 + 0.3275911 * qq) AS uu FROM q)
    SELECT CAST(s_a AS BIGINT) AS conv_a, CAST(s_b AS BIGINT) AS conv_b,
           CAST(t_a AS BIGINT) AS events_a, CAST(t_b AS BIGINT) AS events_b,
           ROUND(zs, 6) AS z_statistic,
           ROUND((0.254829592 * uu - 0.284496736 * pow(uu, 2)
                  + 1.421413741 * pow(uu, 3) - 1.453152027 * pow(uu, 4)
                  + 1.061405429 * pow(uu, 5)) * exp(-qq * qq), 6) AS p_value
    FROM u
    """,
)
def q212_ab_test_ztest(spark, sf_dir):
    """A/B purchase-share z-test, spelled END-TO-END in the ClickHouse
    dialect: events split into two variants by user-id parity, success
    = a purchase event, then ``proportionsZTest`` over the aggregated
    counts (functions/clickhouse.py — two-sided p via the A&S erfc
    polynomial the DuckDB oracle reproduces literally). One partial-
    aggregated scan reduces the corpus to a single 4-number row; the
    test itself is scalar math — nothing here grows with corpus size
    except the first scan."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        translate(
            """
            WITH v AS (
              SELECT CAST(countIf(user_id % 2 = 0
                                  AND event_type = 'purchase')
                          AS DOUBLE) AS s_a,
                     CAST(countIf(user_id % 2 = 1
                                  AND event_type = 'purchase')
                          AS DOUBLE) AS s_b,
                     CAST(countIf(user_id % 2 = 0) AS DOUBLE) AS t_a,
                     CAST(countIf(user_id % 2 = 1) AS DOUBLE) AS t_b
              FROM events
            )
            SELECT CAST(s_a AS BIGINT) AS conv_a,
                   CAST(s_b AS BIGINT) AS conv_b,
                   CAST(t_a AS BIGINT) AS events_a,
                   CAST(t_b AS BIGINT) AS events_b,
                   round((proportionsZTest(s_a, s_b, t_a, t_b, 0.95,
                          'unpooled')).z_statistic, 6) AS z_statistic,
                   round((proportionsZTest(s_a, s_b, t_a, t_b, 0.95,
                          'unpooled')).p_value, 6) AS p_value
            FROM v
            """
        ).sql
    )
