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
