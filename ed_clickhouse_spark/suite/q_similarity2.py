"""All-pairs nearest-neighbor query (Layer C similarity, exact tier)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.similarity import brute_force_topk
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q65_nn_all_vectors",
    oracle="""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                  ROUND(list_cosine_similarity(q.vec, c.vec), 6) AS cos_sim
           FROM emb q JOIN emb c ON c.vec_id != q.vec_id
         )
    SELECT q_id, c_id, cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rn
          FROM scored) x
    WHERE rn = 1
    """,
)
def q65_nn_all_vectors(spark, sf_dir):
    """Exact 1-NN for EVERY vector (the verification tier of embedding
    dedup — the data has no >=0.95 near-dup pairs, so the operator's
    output here is each vector's closest neighbor). The corpus side
    stays unshuffled; per-partition top-1 via WindowGroupLimit."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    queries = emb.select(F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec"))
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec"))
    return brute_force_topk(queries, corpus, k=1)


@query("q87_ann_ivf")  # approximate (IVF cells) — rows-only; recall tested vs brute force
def q87_ann_ivf(spark, sf_dir):
    """IVF top-5 for 20 query vectors: 16 centroid cells (md5-seeded +
    one Lloyd pass), probe the 4 nearest cells per query, exact-score
    candidates only (~25% of the corpus scanned per query). The third
    ANN tier beside brute force (exact) and LSH (trainless)."""
    from ed_clickhouse_spark.operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec"))
    return ivf_topk(queries, corpus, k=5, n_lists=16, n_probe=4,
                    index_key=f"{sf_dir}/embeddings")


@query(
    "q88_filtered_ann",
    oracle="""
    WITH emb AS (SELECT vec_id, label,
                        CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                  ROUND(list_cosine_similarity(q.vec, c.vec), 6) AS cos_sim
           FROM emb q JOIN emb c
             ON q.vec_id < 10 AND c.vec_id != q.vec_id AND c.label = 1
         )
    SELECT q_id, c_id, cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rn
          FROM scored) x
    WHERE rn <= 3
    """,
)
def q88_filtered_ann(spark, sf_dir):
    """Metadata-filtered exact top-3: neighbors restricted to label=1.
    Pre-filtering the corpus BEFORE scoring (filter pushes to the
    parquet scan) is the right plan at 100 TB — post-filtering top-k
    results under-fills k whenever the filter is selective."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    corpus = emb.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")
    )
    return brute_force_topk(queries, corpus, k=3)


@query("q141_pq_ann")  # approximate (trained codebooks) — rows-only;
# plumbing exactness + recall floors pinned in tests/test_dedup_similarity.py
def q141_pq_ann(spark, sf_dir):
    """Product-quantization ANN: corpus compressed to m=8 sub-space
    codes (~32x smaller scan), ADC candidate ranking via broadcast
    per-query distance tables, exact cosine re-rank of the top-50 —
    the compress-then-verify tier of the similarity ladder."""
    from ed_clickhouse_spark.operators.pq import pq_topk
    from ed_clickhouse_spark.suite.q_similarity import _q_and_corpus

    q, c = _q_and_corpus(spark, sf_dir)
    return pq_topk(
        q, c, k=5, m=8, n_codes=32, iters=1, rerank=50,
        q_id="q_id", c_id="c_id", q_vec="q_vec", c_vec="c_vec",
    )


@query(
    "q165_semantic_clusters",
    oracle="""
    WITH RECURSIVE
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    prs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM emb a JOIN emb b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.vec, b.vec), 6) >= 0.4
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM prs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM prs
    ),
    reach(id, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r
    ),
    clusters AS (
      SELECT id AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    )
    SELECT vec_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM clusters
    """,
)
def q165_semantic_clusters(spark, sf_dir):
    """Semantic dedup end-to-end: exact cosine pairs (>= 0.4, the
    deliberately-exact verifier tier — broadcast matrix + per-partition
    BLAS, no shuffle) -> connected components (pointer-doubling label
    propagation, q96's engine) -> per-vector cluster id + size. The
    oracle is DuckDB's recursive-CTE transitive closure — different
    algorithm, same fixpoint. At 100 TB the pair stage swaps to LSH
    candidates (embedding_near_dup_pairs) with identical downstream."""
    from pyspark.sql import Window as W

    from ed_clickhouse_spark.operators.dedup import dedup_clusters
    from ed_clickhouse_spark.operators.similarity import exact_cosine_pairs

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    pairs = exact_cosine_pairs(emb, 0.4)
    cl = dedup_clusters(pairs)
    return cl.select(
        F.col("id").alias("vec_id"),
        "cluster_id",
        F.count("*").over(W.partitionBy("cluster_id")).alias("cluster_size"),
    )


@query(
    "q172_semantic_decontamination",
    oracle="""
    WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec
                 FROM embeddings),
    bench AS (SELECT vec_id, vec FROM emb WHERE label < 2),
    corpus AS (SELECT vec_id, vec FROM emb WHERE label >= 2),
    scored AS (
      SELECT c.vec_id AS corpus_id, b.vec_id AS bench_id,
             ROUND(list_cosine_similarity(c.vec, b.vec), 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY c.vec_id
               ORDER BY ROUND(list_cosine_similarity(c.vec, b.vec), 6) DESC,
                        b.vec_id ASC) AS rn
      FROM corpus c CROSS JOIN bench b
    )
    SELECT corpus_id, bench_id, cos_sim
    FROM scored WHERE rn = 1 AND cos_sim >= 0.35
    """,
)
def q172_semantic_decontamination(spark, sf_dir):
    """Semantic decontamination (the embedding-level sibling of q89's
    n-gram decontamination): training vectors whose nearest BENCHMARK
    vector (labels 0-1 stand in for an eval set) scores >= 0.35 cosine
    — paraphrase-level contamination n-gram overlap misses. Benchmark
    broadcast + per-partition BLAS; the corpus never shuffles."""
    from ed_clickhouse_spark.operators.similarity import flag_near_benchmark

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    bench = emb.filter(F.col("label") < 2).select("vec_id", "vec")
    corpus = emb.filter(F.col("label") >= 2).select("vec_id", "vec")
    return flag_near_benchmark(corpus, bench, 0.35)


def _recall_audit(approx, exact, k, floor, n_expected):
    """Pooled recall@k of an approximate top-k result against the exact
    one, as a 3-column DataFrame the driver can hash against a DuckDB
    oracle: (n_queries, recall_bp, recall_ok). Both inputs carry
    (q_id, c_id). Pooled (not per-query): per-query recall on random
    vectors is legitimately 0 for some queries at healthy pooled
    recall — the same pooling the unit-test floors use.

    ``recall_bp`` is the MEASURED pooled recall in basis points
    (VERDICT r9 #4: the floors were bare calibrated constants with the
    measurement living only in docstrings). Both tiers are md5-seeded,
    so the value is exact and stable on fixed testdata; the oracle
    pins the per-corpus expected value behind a content fingerprint
    (see _AUDIT_ORACLE) — on regenerated testdata the fingerprint
    misses, the oracle yields NULL, and the driver row goes loudly red
    instead of a floor sagging silently. Recalibration rule: re-run
    tools' measure script (or these audits) on the new corpora, paste
    the new fingerprints + recall_bp constants into the three oracles,
    and re-check the floor still has margin."""
    # ONE action: the previous three counts (join, total, distinct-q)
    # re-ran the expensive exact brute-force lineage once each; a left
    # join with a hit marker folds all three into a single aggregate job.
    # The marker side is dropDuplicates'd (cheap — it is the small side)
    # so `total` stays invariant even if a future candidate generator
    # emits duplicate (q_id, c_id) pairs (ADVICE r11).
    marked = exact.join(
        approx.select("q_id", "c_id")
        .dropDuplicates(["q_id", "c_id"])
        .withColumn("__hit", F.lit(1)),
        ["q_id", "c_id"],
        "left",
    )
    row = marked.agg(
        F.count(F.lit(1)).alias("total"),
        F.count("__hit").alias("hits"),
        F.countDistinct("q_id").alias("nq"),
    ).collect()[0]
    hits, total, nq = row["hits"], row["total"], row["nq"]
    bp = int(round(hits * 10000 / total)) if total else 0
    spark = approx.sparkSession
    return spark.createDataFrame(
        [(nq, bp, bool(total > 0 and hits / total >= floor))],
        "n_queries long, recall_bp long, recall_ok boolean",
    )


# Measured recall per test corpus, keyed by a content fingerprint
# (sf0.001 and sf0.01 both hold 500 vectors — COUNT alone can't tell
# them apart). {bp} is filled per tier below.
_AUDIT_ORACLE = """
SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
       CAST(CASE (SELECT COUNT(*) || ':' || ROUND(SUM(embedding[1]), 2)
                  FROM embeddings)
            WHEN '500:-1.46' THEN {bp_sf0001}
            WHEN '500:1.08' THEN {bp_sf001}
            WHEN '2000:1.53' THEN {bp_sf01}
            END AS BIGINT) AS recall_bp,
       true AS recall_ok
FROM embeddings WHERE vec_id < 10
"""


@query(
    "q240_lsh_recall_audit",
    oracle=_AUDIT_ORACLE.format(
        bp_sf0001=3200, bp_sf001=2000, bp_sf01=3200
    ),
)
def q240_lsh_recall_audit(spark, sf_dir):
    """Driver-visible recall band for the LSH tier (r8): q50 itself
    stays rows-only (its output is legitimately approximate and
    bench-timed), but THIS query hash-matches iff LSH recall@5 against
    the exact brute-force top-5 clears the same >=0.3 pooled floor the
    regression tripwire floor: measured pooled recall on the three
    test corpora is 0.20-0.32 (random 64-dim vectors are LSH's worst
    case), so 0.15 sits under the observed minimum with margin — a
    broken band join or bucket hash drops recall to ~0, which this
    catches. Deterministic: both tiers are md5-seeded, so the band
    either always holds on this data or never does."""
    from ed_clickhouse_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucket_topk,
    )
    from ed_clickhouse_spark.suite.q_similarity import _q_and_corpus

    q, c = _q_and_corpus(spark, sf_dir)
    approx = lsh_bucket_topk(q, c, k=5, dim=64).select("q_id", "c_id")
    exact = brute_force_topk(q, c, k=5).select("q_id", "c_id")
    return _recall_audit(approx, exact, 5, 0.15, 10)


@query(
    "q241_ivf_recall_audit",
    oracle=_AUDIT_ORACLE.format(
        bp_sf0001=5400, bp_sf001=5200, bp_sf01=6200
    ),
)
def q241_ivf_recall_audit(spark, sf_dir):
    """Driver-visible recall band for the IVF tier (r8): recall@5 of
    the 4-of-16-cells probe against exact brute force must clear a
    0.40 tripwire floor (measured 0.52-0.62 across the three test
    corpora). Same md5-seeded determinism as q240."""
    from ed_clickhouse_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from ed_clickhouse_spark.suite.q_similarity import _q_and_corpus

    q, c = _q_and_corpus(spark, sf_dir)
    approx = ivf_topk(
        q, c, k=5, n_lists=16, n_probe=4,
        index_key=f"{sf_dir}/embeddings__audit",
    ).select("q_id", "c_id")
    exact = brute_force_topk(q, c, k=5).select("q_id", "c_id")
    return _recall_audit(approx, exact, 5, 0.40, 10)


@query(
    "q242_pq_recall_audit",
    oracle=_AUDIT_ORACLE.format(
        bp_sf0001=7800, bp_sf001=6400, bp_sf01=7000
    ),
)
def q242_pq_recall_audit(spark, sf_dir):
    """Driver-visible recall band for the PQ-ADC tier (r8): the
    compress-then-rerank pipeline must clear a 0.55 tripwire floor
    (measured 0.64-0.78 across the three test corpora; the unit
    suite's 0.9 floor is on its own clustered synthetic data — these
    corpora are near-random, PQ's worst case)."""
    from ed_clickhouse_spark.operators.pq import pq_topk
    from ed_clickhouse_spark.operators.similarity import brute_force_topk
    from ed_clickhouse_spark.suite.q_similarity import _q_and_corpus

    q, c = _q_and_corpus(spark, sf_dir)
    approx = pq_topk(
        q, c, k=5, m=8, n_codes=32, iters=1, rerank=50,
        q_id="q_id", c_id="c_id", q_vec="q_vec", c_vec="c_vec",
    ).select("q_id", "c_id")
    exact = brute_force_topk(q, c, k=5).select("q_id", "c_id")
    return _recall_audit(approx, exact, 5, 0.55, 10)


@query(
    "q254_embedding_centroids",
    oracle="""
    WITH pos AS (
      SELECT label, i, AVG(x) AS c
      FROM (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
      GROUP BY label, i
    ),
    cent AS (SELECT label, list(c ORDER BY i) AS cv FROM pos GROUP BY label),
    d AS (
      SELECT e.label,
             sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) ^ 2))) AS dist
      FROM embeddings e JOIN cent c ON e.label = c.label
    )
    SELECT d.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(CAST(ANY_VALUE(sqrt(nrm)) AS DECIMAL(18,2)) AS DOUBLE)
             AS centroid_norm,
           CAST(CAST(AVG(dist) AS DECIMAL(18,2)) AS DOUBLE) AS avg_dist
    FROM d
    JOIN (SELECT label, list_sum(list_transform(cv, v -> v * v)) AS nrm
          FROM cent GROUP BY label, cv) n ON n.label = d.label
    GROUP BY d.label
    """,
)
def q254_embedding_centroids(spark, sf_dir):
    """Per-label embedding centroids and member-to-centroid distances —
    the distributed shape of a clustering-quality report. One
    posexplode + (label, dim) groupBy computes the centroid components
    with map-side partial sums (shuffle = labels x 64 dims, never the
    vectors); the centroid frame (one 64-dim row per label — bounded)
    joins back to the members and the distance is a pure-codegen
    zip_with/aggregate fold. No collect, no UDF; at 100 TB the only
    growing exchange is the (label, dim) partial-avg, which is
    fact-row-count-independent after the map-side combine."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        emb.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(named_struct"
                "('i', i, 'c', c))), __s -> __s.c)"
            ).alias("cv")
        )
    )
    dist = F.expr(
        "sqrt(aggregate(zip_with(v, cv, (__a, __b) -> (__a - __b)"
        " * (__a - __b)), CAST(0 AS DOUBLE), (__s, __x) -> __s + __x))"
    )
    nrm = F.expr(
        "sqrt(aggregate(transform(cv, __c -> __c * __c),"
        " CAST(0 AS DOUBLE), (__s, __x) -> __s + __x))"
    )
    return (
        emb.join(cent, "label")
        .select("label", dist.alias("dist"), nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.first("nrm").cast("decimal(18,2)").cast("double")
            .alias("centroid_norm"),
            F.avg("dist").cast("decimal(18,2)").cast("double")
            .alias("avg_dist"),
        )
    )
