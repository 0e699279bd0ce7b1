"""Similarity search suite (Layer C) over the ``embeddings`` table:
brute-force cosine top-k (exact, oracle-able) and the LSH-bucketed
approximate variant (rows-only; recall measured in unit tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    lsh_bucket_topk,
)
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


def _q_and_corpus(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec"))
    return queries, corpus


@query(
    "q48_ann_cosine_topk",
    oracle="""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                  ROUND(list_cosine_similarity(q.vec, c.vec), 6) AS cos_sim
           FROM emb q JOIN emb c ON q.vec_id < 10 AND c.vec_id != q.vec_id
         )
    SELECT q_id, c_id, cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rn
          FROM scored) x
    WHERE rn <= 5
    """,
)
def q48_ann_cosine_topk(spark, sf_dir):
    """Exact top-5 cosine neighbors for 10 query vectors: broadcast
    queries x corpus, JVM-side fold for the dot product, per-query rank.
    The corpus side never shuffles raw vectors."""
    queries, corpus = _q_and_corpus(spark, sf_dir)
    return brute_force_topk(queries, corpus, k=5)


@query(
    "q49_embedding_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           ROUND(AVG(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))), 4) AS avg_norm,
           ROUND(MIN(list_sum(CAST(embedding AS DOUBLE[]))), 4) AS min_sum,
           ROUND(MAX(list_sum(CAST(embedding AS DOUBLE[]))), 4) AS max_sum
    FROM embeddings
    GROUP BY label
    """,
)
def q49_embedding_stats(spark, sf_dir):
    """Vector column profiling per label: norms and component sums via
    higher-order folds (F.aggregate ≙ list_sum) — no UDF."""
    e = t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    sq_sum = F.aggregate(
        F.transform("vec", lambda x: x * x), F.lit(0.0), lambda a, v: a + v
    )
    comp_sum = F.aggregate(F.col("vec"), F.lit(0.0), lambda a, v: a + v)
    return (
        e.select("label", F.sqrt(sq_sum).alias("norm"), comp_sum.alias("csum"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.min("csum"), 4).alias("min_sum"),
            F.round(F.max("csum"), 4).alias("max_sum"),
        )
    )


@query("q50_ann_lsh")  # approximate — rows-only; recall tested vs brute force
def q50_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH top-5: equi-join on the sign-pattern bucket
    replaces the cross join (the 100 TB scale path)."""
    queries, corpus = _q_and_corpus(spark, sf_dir)
    return lsh_bucket_topk(queries, corpus, k=5, dim=64)
