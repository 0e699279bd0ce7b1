"""Keyword search operators: inverted-index statistics and BM25 ranking
over the documents table.

The reference delegates text search to ClickHouse full-text functions;
here the same capability is a DataFrame pipeline: tokenize -> per-doc
term frequencies (the posting-list build) -> corpus document
frequencies -> BM25 score for a query term set -> top-k.

Scale shape: the posting build is explode + groupBy(doc, term) — one
shuffle keyed on (doc, term); document frequencies aggregate the same
frame keyed on term (map-side combine, result is vocabulary-sized);
scoring filters postings to the query terms FIRST (a broadcast semi
join against a literal list), so the heavy per-doc work only touches
docs containing a query term. Never all-pairs, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def doc_terms(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document term frequencies (the inverted-index posting list,
    keyed the row-oriented way: one row per (doc, term, tf))."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(F.split(text_col, " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    round_to: int = 6,
) -> DataFrame:
    """BM25 top-k documents for a bag-of-words query.

    score(D,Q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*|D|/avgdl))
    with the standard smoothed idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    N, avgdl and per-term df are computed over the full corpus; the
    scored join is pre-filtered to the query terms so its input is
    |terms| posting lists, not the whole index. Ties broken by doc_id
    for a deterministic top-k."""
    toks = F.split(F.col(text_col), " ")
    lens = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(toks, lambda t: t != "")).alias("dl"),
    )
    stats = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    postings = doc_terms(df, id_col, text_col).filter(F.col("term").isin(terms))
    dfreq = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    scored = (
        # bounded: dfreq has one row per query term; stats is 1 row
        postings.join(F.broadcast(dfreq), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.sum("term_score"), round_to).alias("bm25"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rrf_k: int = 60,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval lists — the standard
    way to combine lexical (BM25) and semantic (embedding) retrieval
    into one hybrid ranking without score calibration:

        rrf(d) = sum_i 1 / (rrf_k + rank_i(d))

    with a list contributing 0 for documents it didn't retrieve. Each
    input frame must have (``id_col``, ``rank``) with rank starting at
    1. Returns (id, rank_1..rank_N, rrf) top-k, ties broken by id.

    Scale shape: the inputs are top-``depth`` lists (already truncated
    by their retrievers), so the fusion join is over at most
    N * depth rows — driver-free, broadcastable, trivially cheap next
    to the retrieval stages that feed it."""
    fused = None
    for i, df in enumerate(ranked, start=1):
        side = df.select(F.col(id_col), F.col("rank").alias(f"rank_{i}"))
        fused = side if fused is None else fused.join(side, id_col, "full_outer")
    contrib = [
        F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        for i in range(1, len(ranked) + 1)
    ]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    return (
        fused.withColumn("rrf", F.round(total, round_to))
        .orderBy(F.col("rrf").desc(), id_col)
        .limit(k)
    )
