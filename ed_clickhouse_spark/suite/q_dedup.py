"""Deduplication suite (Layer C): exact, n-gram Jaccard (oracle-able),
MinHash+LSH and SimHash (hash-based — rows-only driver check, verified
against exact Jaccard in unit tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
)
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q44_dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars, dup_count
    FROM (SELECT doc_id, lang, source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) ORDER BY doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY md5(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS dup_count
          FROM documents) x
    WHERE rn = 1
    """,
)
def q44_dedup_exact(spark, sf_dir):
    """Exact dedup: canonical (min doc_id) row per distinct normalized
    text. Shuffle key is the 16-byte fingerprint, not the body."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars", "text")
    return exact_dedup(d).select("doc_id", "lang", "source", "n_chars", "dup_count")


@query(
    "q45_jaccard_pairs",
    oracle="""
    WITH sh AS (
      SELECT doc_id AS id, unnest(list_distinct(sh_list)) AS sh
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, GREATEST(len(string_split(text,' ')) - 3, 0) + 2),
                 i -> array_to_string(string_split(text,' ')[i:i+2], ' ')
               ) AS sh_list
        FROM documents
      )
    ),
    shc AS (
      SELECT id, sh FROM sh
      QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 10
    ),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM shc GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM shc a JOIN shc b ON a.sh = b.sh AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5
    """,
)
def q45_jaccard_pairs(spark, sf_dir):
    """Exact word-3-gram Jaccard near-dup pairs (>= 0.5) over shingles
    with document frequency <= 10 (boilerplate/stopword shingles are
    excluded from intersection AND union — the df-cap that keeps the
    candidate join linear on templated corpora; same cap in the oracle)."""
    d = t(spark, sf_dir, "documents")
    return jaccard_pairs(d, n=3, threshold=0.5, max_df=10)


@query("q46_minhash_lsh")  # hash-based — rows-only; tested vs exact jaccard
def q46_minhash_lsh(spark, sf_dir):
    """MinHash(32 perms) + LSH(8 bands): near-dup candidates with
    estimated Jaccard >= 0.5. The 100 TB path: signature is one codegen
    pass, candidates meet only inside band buckets."""
    d = t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d).filter(F.col("est_jaccard") >= 0.5)


@query("q47_simhash")  # hash-based — rows-only
def q47_simhash(spark, sf_dir):
    """64-bit SimHash per doc + bucket sizes on the top-16-bit prefix
    (the banding used for hamming-neighbor candidate lookup)."""
    d = t(spark, sf_dir, "documents")
    s = simhash(d)
    return (
        s.withColumn("prefix", F.shiftrightunsigned("simhash", 48))
        .groupBy("prefix")
        .agg(F.count("*").alias("bucket_size"), F.min("id").alias("min_doc_id"))
    )
