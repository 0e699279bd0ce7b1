"""Statistical-aggregate queries (ClickHouse entropy / cramersV /
welchTTest) over the events table, DuckDB-oracled."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.stats import cramers_v, entropy, welch_ttest
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q126_entropy",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id % 20 AS v, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    a AS (
      SELECT event_type, SUM(c) AS n, SUM(c * ln(c)) AS clnc
      FROM c GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(ln(n) - clnc / n, 6) AS entropy
    FROM a
    """,
)
def q126_entropy(spark, sf_dir):
    """ClickHouse entropy(x): Shannon entropy of the user-cohort
    distribution within each event type (a uniformity audit — near
    ln(20) means traffic spreads evenly over cohorts). Two two-phase
    counts; the shuffle carries distinct cohorts, not events."""
    e = t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 20).alias("v")
    )
    return entropy(e, "v", ["event_type"])


@query(
    "q127_cramers_v",
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
             SUM((o - e) * (o - e) / e) AS obs, SUM(e) AS esum
      FROM j GROUP BY 1, 2, 3
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(obs + (n - esum), 6) AS chi2,
           ROUND(sqrt((obs + (n - esum)) / (n * LEAST(r - 1, c - 1))), 6) AS v
    FROM p
    """,
)
def q127_cramers_v(spark, sf_dir):
    """ClickHouse cramersV(a, b): association between event type and
    user cohort (≈0 on this synthetic data — independence). χ² over the
    full contingency table WITHOUT materializing zero cells (unobserved
    cells contribute Σe = n - Σ_observed e); only observed cells and the
    two marginal vectors shuffle."""
    e = t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 5).alias("cohort")
    )
    return cramers_v(e, "event_type", "cohort")


@query(
    "q128_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(28,4)) * CAST(value AS DECIMAL(28,4)))
                  AS DOUBLE) AS sx2
      FROM events WHERE event_type IN ('click', 'error')
      GROUP BY 1
    ),
    m AS (
      SELECT event_type, n, sx / n AS m,
             (sx2 - sx * sx / n) / (n - 1) AS var
      FROM s
    ),
    a AS (SELECT n AS n_a, m AS m_a, var AS v_a FROM m WHERE event_type = 'click'),
    b AS (SELECT n AS n_b, m AS m_b, var AS v_b FROM m WHERE event_type = 'error')
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(m_a, 6) AS mean_a, ROUND(m_b, 6) AS mean_b,
           ROUND((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 6) AS t_stat,
           ROUND(POW(v_a / n_a + v_b / n_b, 2) /
                 (POW(v_a / n_a, 2) / (n_a - 1) + POW(v_b / n_b, 2) / (n_b - 1)),
                 6) AS df
    FROM a CROSS JOIN b
    """,
)
def q128_welch_ttest(spark, sf_dir):
    """ClickHouse welchTTest: does mean event value differ between
    'click' and 'error' events? t statistic + Welch–Satterthwaite df
    from exact decimal power sums — one grouped aggregate, one shuffle,
    order-independent."""
    e = t(spark, sf_dir, "events")
    return welch_ttest(e, "value", "event_type", "click", "error")
