"""Set operations + the all-events envelope union (SURVEY.md §2 B7).

The reference's nine event tables share a 16-field envelope
(``dto.proto:7-22``); UNION ALL over envelope projections is the natural
"all events" view. Here the stand-ins are type-sliced event cohorts."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q34_union_all_envelope",
    oracle="""
    SELECT src, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM (
      SELECT 'clicks' AS src, user_id FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT 'views' AS src, user_id FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT 'purchases' AS src, user_id FROM events WHERE event_type = 'purchase'
    ) u
    GROUP BY src
    """,
)
def q34_union_all_envelope(spark, sf_dir):
    """unionByName over per-family projections — the all-events view."""
    e = t(spark, sf_dir, "events")

    def fam(et: str, src: str):
        return e.filter(F.col("event_type") == et).select(
            F.lit(src).alias("src"), "user_id"
        )

    u = (
        fam("click", "clicks")
        .unionByName(fam("view", "views"))
        .unionByName(fam("purchase", "purchases"))
    )
    return u.groupBy("src").agg(
        F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users")
    )


@query(
    "q35_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q35_intersect(spark, sf_dir):
    """Cohort intersection: users who both viewed and purchased."""
    e = t(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("user_id")
    p = e.filter(F.col("event_type") == "purchase").select("user_id")
    return v.intersect(p)


@query(
    "q36_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q36_except(spark, sf_dir):
    """Cohort difference: viewers who never purchased."""
    e = t(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("user_id")
    p = e.filter(F.col("event_type") == "purchase").select("user_id")
    return v.subtract(p)  # EXCEPT (set semantics), not EXCEPT ALL
