"""Deduplication suite (Layer C): exact, n-gram Jaccard (oracle-able),
MinHash+LSH and SimHash (hash-based — rows-only driver check, verified
against exact Jaccard in unit tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.dedup import (
    dedup_clusters,
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


# The q45 pair list as a reusable oracle CTE chain (kept textually in sync
# with the q45 oracle above).
_PAIRS_CTES = """
    sh AS (
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
    prs0 AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM shc a JOIN shc b ON a.sh = b.sh AND a.id < b.id
      GROUP BY 1, 2
    ),
    prs AS (
      SELECT id_a, id_b
      FROM prs0
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5
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
      SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    )
"""


@query(
    "q96_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    {_PAIRS_CTES}
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM clusters
    """,
)
def q96_dedup_clusters(spark, sf_dir):
    """Near-dup pairs -> connected components: each doc in a >=0.5
    Jaccard pair gets the min reachable doc_id as its cluster id. Spark
    side is iterative min-label propagation (O(diameter) co-partitioned
    join+min rounds); the oracle is DuckDB's recursive-CTE transitive
    closure — two different algorithms, same fixpoint, hash-matched."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, n=3, threshold=0.5, max_df=10)
    cl = dedup_clusters(pairs)
    return cl.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        F.count("*").over(W.partitionBy("cluster_id")).alias("cluster_size"),
    )


@query(
    "q97_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE
    {_PAIRS_CTES}
    , assigned AS (
      SELECT d.doc_id, d.source, d.n_chars,
             COALESCE(c.cluster_id, d.doc_id) AS cid
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cid ORDER BY n_chars DESC, doc_id
      ) AS rn
      FROM assigned
    )
    SELECT source,
           COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
           COUNT(*) FILTER (WHERE rn > 1) AS n_dropped,
           CAST(SUM(n_chars) FILTER (WHERE rn = 1) AS BIGINT) AS chars_kept
    FROM ranked GROUP BY source
    """,
)
def q97_dedup_survivors(spark, sf_dir):
    """The end of the dedup pipeline: keep ONE representative per
    near-dup cluster (the longest doc; doc_id tiebreak), count
    kept/dropped and surviving chars per source. Docs in no cluster
    survive as singletons."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, n=3, threshold=0.5, max_df=10)
    cl = dedup_clusters(pairs).withColumnRenamed("id", "doc_id")
    assigned = d.select("doc_id", "source", "n_chars").join(
        cl, "doc_id", "left"
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.coalesce("cluster_id", "doc_id").alias("cid"),
    )
    w = W.partitionBy("cid").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = assigned.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
        F.count(F.when(F.col("rn") > 1, 1)).alias("n_dropped"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_chars"))).alias("chars_kept"),
    )


@query(
    "q101_repeated_passages",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, GREATEST(len(string_split(text,' ')) - 10, 0) + 2),
               i -> array_to_string(string_split(text,' ')[i:i+9], ' ')
             ))) AS gram
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, substr(md5(gram), 1, 16) AS gram_key,
             len(string_split(gram, ' ')) AS n_tokens
      FROM grams
    )
    SELECT gram_key,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc,
           CAST(MIN(n_tokens) AS BIGINT) AS n_tokens
    FROM keyed
    GROUP BY gram_key
    HAVING COUNT(*) >= 3
    """,
)
def q101_repeated_passages(spark, sf_dir):
    """Substring-level dedup signal (the exact-substring-dedup family):
    word 10-grams appearing in >= 3 distinct docs are boilerplate /
    copied passages. Distinct-per-doc explode -> groupBy gram — the
    shuffle key is the gram (hashed to md5 in the output so the result
    is scalar); at 100 TB the same plan runs with a df-cap like
    jaccard_pairs. Passages, not docs, are the unit — this catches
    partial duplication that whole-doc fingerprints miss."""
    from ed_clickhouse_spark.operators.dedup import _spread

    # _spread: the gram build is compute-bound and documents arrives as
    # one or two parquet splits at small SF — without it the whole
    # projection runs on one core (measured 2.1s -> 0.9s steady at
    # sf0.1/local[32]); a no-op at 100 TB where the input has thousands
    # of splits.
    d = _spread(t(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    # hash INSIDE the transform: distinct + explode then carry the fixed
    # 16-hex md5 prefix (the engine-portable key decontaminate() also
    # uses) instead of ~70-byte passage strings, so both the explode and
    # the exchange are bound-width. md5-before-distinct is equivalent to
    # distinct-before-md5 (the hash is deterministic per gram).
    g10 = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - 10, F.lit(0))),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", F.slice(toks, i + 1, 10))), 1, 16
            ),
        )
    )
    # every gram has exactly 10 tokens except the single whole-doc gram
    # of a <10-word doc — so n_tok is a per-DOC constant, computed once
    # instead of re-splitting every exploded gram.
    keyed = d.select(
        "doc_id",
        F.least(F.lit(10), F.size(toks)).alias("n_tok"),
        F.explode(g10).alias("gram_key"),
    )
    return (
        keyed.groupBy("gram_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.min("n_tok").cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_docs") >= 3)
        .select("gram_key", "n_docs", "first_doc", "n_tokens")
    )


@query(
    "q102_source_overlap",
    oracle=f"""
    WITH RECURSIVE
    {_PAIRS_CTES}
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           COUNT(*) AS neardup_pairs
    FROM prs
    JOIN documents da ON da.doc_id = prs.id_a
    JOIN documents db ON db.doc_id = prs.id_b
    WHERE da.source <> db.source
    GROUP BY 1, 2
    ORDER BY neardup_pairs DESC, source_a, source_b
    LIMIT 50
    """,
)
def q102_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix: how many near-dup pairs
    (Jaccard >= 0.5) cross each source pair — the "is dump B a re-crawl
    of dump A" triage query. The pair list is the q45 candidate join;
    sources attach via two broadcast-able joins on doc_id; the pair key
    is orientation-normalized (least/greatest) so A-B and B-A merge."""
    d = t(spark, sf_dir, "documents")
    src = d.select("doc_id", "source")
    pairs = jaccard_pairs(d, n=3, threshold=0.5, max_df=10)
    joined = (
        pairs.join(
            src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
    )
    return (
        joined.groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count("*").alias("neardup_pairs"))
        .orderBy(F.col("neardup_pairs").desc(), "source_a", "source_b")
        .limit(50)
    )


@query(
    "q209_passage_excision",
    oracle="""
    WITH toks AS (
      -- parallel unnests of equal-length lists zip positionally
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             CAST(unnest(range(0, len(string_split(text, ' '))))
                  AS BIGINT) AS pos
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             CAST(unnest(range(0,
               GREATEST(len(string_split(text, ' ')) - 9, 0)))
               AS BIGINT) AS pos,
             substr(md5(unnest(list_transform(
               range(1, GREATEST(len(string_split(text, ' ')) - 9, 0) + 1),
               i -> array_to_string(string_split(text, ' ')[i:i + 9], ' ')
             ))), 1, 16) AS gram_key
      FROM documents
    ),
    dup AS (
      SELECT gram_key, MIN(doc_id) AS keeper
      FROM (SELECT DISTINCT doc_id, gram_key FROM grams)
      GROUP BY gram_key HAVING COUNT(*) >= 2
    ),
    covered AS (
      SELECT DISTINCT g.doc_id, g.pos + o.o AS pos
      FROM grams g
      JOIN dup d USING (gram_key), unnest(range(0, 10)) AS o(o)
      WHERE g.doc_id <> d.keeper
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM toks t ANTI JOIN covered c
        ON t.doc_id = c.doc_id AND t.pos = c.pos
    ),
    rebuilt AS (
      SELECT doc_id,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           CAST(len(string_split(d.text, ' ')) - COALESCE(r.n_kept, 0)
                AS BIGINT) AS n_removed
    FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
)
def q209_passage_excision(spark, sf_dir):
    """Span-level dedup CUT: every word 10-gram appearing in >= 2 docs
    is excised from all but the lowest-doc_id holder, overlapping spans
    unioned through the (doc, position) cover set, text rebuilt from the
    surviving tokens (operators/dedup.py:excise_repeated_passages — the
    exact-substring-dedup family as a transformation, not just the q101
    signal). Gram keys hash to 16-hex md5 BEFORE any shuffle; the cover
    explode touches only duplicated occurrences; rebuild keys on doc_id."""
    from ed_clickhouse_spark.operators.dedup import excise_repeated_passages

    d = t(spark, sf_dir, "documents")
    return excise_repeated_passages(d, "doc_id", "text", n=10, min_docs=2)


@query(
    "q245_minhash_recall_audit",
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
    ),
    tru AS (
      SELECT id_a, id_b
      FROM pairs
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.7
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs, true AS recall_ok
    FROM tru
    """,
)
def q245_minhash_recall_audit(spark, sf_dir):
    """Driver-visible recall band for MinHash-LSH (r8): q46 stays
    rows-only (its candidate list is legitimately approximate), but
    THIS query hash-matches iff the LSH candidate set recovers >= 80%
    of the TRUE >= 0.7-Jaccard pairs (the q45 exact-pair machinery
    with a higher threshold — at 0.7, 8-band/4-row LSH collision
    probability is ~1-(1-0.7^4)^8 ~ 0.91, so 0.8 is a tripwire with
    margin, not a quality ceiling). The n_true_pairs arm is an EXACT
    cross-engine check of the 0.7-threshold pair count. md5-seeded
    determinism: the band either always holds on this corpus or never
    does."""
    from ed_clickhouse_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    d = t(spark, sf_dir, "documents")
    tru = jaccard_pairs(d, n=3, threshold=0.7, max_df=10).select(
        "id_a", "id_b"
    )
    cand = minhash_lsh_pairs(d).select("id_a", "id_b")
    # one action (r11): a hit-marked left join replaces the two counts
    # that each re-ran the exact-jaccard lineage. The marker side is
    # dropDuplicates'd so n_true stays invariant even if a future
    # candidate generator emits duplicate pairs (ADVICE r11).
    row = (
        tru.join(
            cand.dropDuplicates(["id_a", "id_b"]).withColumn("__hit", F.lit(1)),
            ["id_a", "id_b"],
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("__hit").alias("hits"),
        )
        .collect()[0]
    )
    n_true, hits = row["n_true"], row["hits"]
    ok = bool(n_true == 0 or hits / n_true >= 0.8)
    return spark.createDataFrame(
        [(n_true, ok)], "n_true_pairs long, recall_ok boolean"
    )


@query(
    "q246_simhash_dup_audit",
    oracle="""
    WITH g AS (
      SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY 1
    )
    SELECT CAST(COALESCE(SUM(n * (n - 1) / 2), 0) AS BIGINT)
             AS n_dup_pairs,
           true AS all_equal_ok
    FROM g WHERE n > 1
    """,
)
def q246_simhash_dup_audit(spark, sf_dir):
    """SimHash invariant audit (r8): byte-identical documents MUST get
    byte-identical 64-bit simhashes — the property every
    hamming-neighbor lookup rests on. The exact-duplicate pair count
    is cross-checked against DuckDB's md5-group count (an exact arm);
    the band column asserts zero fingerprint disagreements inside any
    duplicate group. q47's bucket histogram stays rows-only."""
    from ed_clickhouse_spark.operators.dedup import simhash

    d = t(spark, sf_dir, "documents")
    s = simhash(d).select("id", "simhash").join(
        t(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("id"), F.md5("text").alias("h")
        ),
        "id",
    )
    g = s.groupBy("h").agg(
        F.count("*").alias("n"),
        F.countDistinct("simhash").alias("n_fp"),
    ).filter(F.col("n") > 1)
    # one action (r11): the pair-count aggregate and the disagreement
    # count ran the duplicate-group lineage twice; fold both into one
    row = g.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("p"),
        F.sum((F.col("n_fp") > 1).cast("int")).alias("bad"),
    ).collect()[0]
    n_pairs = row["p"] or 0
    bad = row["bad"] or 0
    return spark.createDataFrame(
        [(int(n_pairs), bool(bad == 0))],
        "n_dup_pairs long, all_equal_ok boolean",
    )
