"""Keyword-search suite: BM25 ranking and posting-list statistics over
the documents table — the "find training docs about X" capability."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.search import bm25_topk, doc_terms
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t

_TERMS = ["vector", "window", "merge"]
_TERMS_SQL = "('vector', 'window', 'merge')"


@query(
    "q98_bm25_search",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
      FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens),
    postings AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      WHERE term IN {_TERMS_SQL}
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM postings GROUP BY 1),
    scored AS (
      SELECT p.doc_id,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
               AS term_score
      FROM postings p
      JOIN dfreq d USING (term)
      JOIN lens l USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id, ROUND(SUM(term_score), 6) AS bm25,
           COUNT(*) AS n_terms_hit
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
)
def q98_bm25_search(spark, sf_dir):
    """BM25(k1=1.2, b=0.75) top-10 docs for a three-term query. Posting
    lists are filtered to the query terms before any join; df/N/avgdl are
    corpus statistics; deterministic doc_id tiebreak."""
    return bm25_topk(t(spark, sf_dir, "documents"), _TERMS, k=10)


@query(
    "q99_posting_stats",
    oracle="""
    SELECT term,
           COUNT(*) AS n_docs,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           CAST(MAX(tf) AS BIGINT) AS max_tf
    FROM (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      WHERE term <> ''
      GROUP BY 1, 2
    )
    GROUP BY term
    ORDER BY n_docs DESC, term
    LIMIT 25
    """,
)
def q99_posting_stats(spark, sf_dir):
    """Inverted-index accounting: the 25 widest posting lists with their
    collection frequencies — the index-build cost model query."""
    return (
        doc_terms(t(spark, sf_dir, "documents"))
        .groupBy("term")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tf").alias("total_tf"),
            F.max("tf").alias("max_tf"),
        )
        .orderBy(F.col("n_docs").desc(), "term")
        .limit(25)
    )


@query(
    "q204_hybrid_search_rrf",
    oracle=f"""
    WITH lens AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
      FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens),
    postings AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      WHERE term IN {_TERMS_SQL}
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM postings GROUP BY 1),
    bm AS (
      SELECT doc_id, ROUND(SUM(
               ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
             ), 6) AS bm25
      FROM postings p JOIN dfreq d USING (term)
      JOIN lens l USING (doc_id) CROSS JOIN stats s
      GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
      FROM bm QUALIFY rank <= 50
    ),
    qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    cs AS (
      SELECT e.vec_id AS doc_id,
             ROUND(list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[]),
               CAST((SELECT embedding FROM qv) AS DOUBLE[])), 6) AS cos
      FROM embeddings e WHERE e.vec_id <> 0
    ),
    sem AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rank
      FROM cs QUALIFY rank <= 50
    )
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           l.rank AS rank_1, s.rank AS rank_2,
           ROUND(COALESCE(1.0 / (60 + l.rank), 0)
                 + COALESCE(1.0 / (60 + s.rank), 0), 6) AS rrf
    FROM lex l FULL JOIN sem s USING (doc_id)
    ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def q204_hybrid_search_rrf(spark, sf_dir):
    """Hybrid retrieval, the RAG-index staple: BM25 lexical top-50 and
    embedding-cosine semantic top-50 (query = vector 0, scored with the
    JVM zip_with/aggregate fold — no UDF), fused by reciprocal-rank
    fusion (operators/search.py:rrf_fuse) into one calibrated-free
    ranking. Both retrieval tiers keep their scale shape (posting-list
    filter / broadcast query vector, corpus never shuffles raw); the
    fusion joins two 50-row lists — negligible at any corpus size."""
    from ed_clickhouse_spark.operators.search import rrf_fuse
    from ed_clickhouse_spark.operators.similarity import cosine

    def rank_bounded(topk, score):
        """1-based rank of an already-top-k frame (score desc, doc_id asc)
        WITHOUT a window: pack the <=k rows into one sorted array and
        posexplode.  A global row_number window here would drag the
        WindowExec single-partition path into the plan; this is a bounded
        k-row aggregate instead."""
        packed = topk.agg(
            F.sort_array(
                F.collect_list(F.struct((-F.col(score)).alias("s"), "doc_id"))
            ).alias("xs")
        )
        return packed.select(
            F.posexplode("xs").alias("pos", "x")
        ).select(
            F.col("x.doc_id").alias("doc_id"),
            (F.col("pos") + 1).cast("bigint").alias("rank"),
        )

    docs = t(spark, sf_dir, "documents")
    # bm25_topk returns the <= 50 best via orderBy+limit
    # (TakeOrderedAndProject — per-partition heaps, one tiny merge)
    lex = rank_bounded(bm25_topk(docs, _TERMS, k=50), "bm25")
    emb = t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    # bounded: a single query vector (one row after the id filter)
    qv = F.broadcast(
        emb.filter(F.col("doc_id") == 0).select(F.col("vec").alias("q_vec"))
    )
    # Semantic top-50 likewise via orderBy+limit — Catalyst compiles it to
    # a distributed TakeOrderedAndProject, NOT a global single-partition
    # window over the whole scored corpus.
    sem_top = (
        emb.filter(F.col("doc_id") != 0)
        .crossJoin(qv)
        .select("doc_id", F.round(cosine("vec", "q_vec"), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(50)
    )
    sem = rank_bounded(sem_top, "cos")
    return rrf_fuse([lex, sem], k=10)
