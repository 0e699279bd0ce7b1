"""Training-data-pipeline queries (Layer C, beyond the dedup ladder):
deterministic splits, degenerate-text detection, PII scrubbing, corpus
accounting, mixture weighting, sequence packing — each oracle-checked
against DuckDB on the ``documents`` table."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.llmdata import (
    PII_PATTERNS,
    decontaminate,
    mixture_weights,
    pack_sequences,
    quality_rules,
    repetition_ratio,
    scrub_pii,
    stratified_sample,
    train_split,
)
from ed_clickhouse_spark.operators.text import ngram_topk, token_count
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q81_train_split",
    oracle="""
    WITH s AS (
      SELECT source, text,
             CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT *, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                       AS BIGINT) % 100 AS b
        FROM documents
      )
    )
    SELECT split, source, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM s GROUP BY 1, 2
    """,
)
def q81_train_split(spark, sf_dir):
    """Leakage-safe train/val/test split: membership is a pure function
    of md5(doc_id), so appends/backfills/reruns assign identically with
    zero coordination — and the SAME split is reproducible from DuckDB
    (or any engine with md5), which the oracle proves."""
    d = train_split(t(spark, sf_dir, "documents"))
    return d.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
    )


@query(
    "q82_repetition_score",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             list_transform(
               range(1, GREATEST(len(string_split(text, ' ')) - 3, 0) + 2),
               i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')
             ) AS grams
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             CASE WHEN len(grams) > 0
                  THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
                  ELSE 0.0 END AS rr
      FROM g
    )
    SELECT doc_id, ROUND(rr, 6) AS rep_ratio, rr > 0.01 AS is_degenerate
    FROM r
    """,
)
def q82_repetition_score(spark, sf_dir):
    """Repeated-3-gram fraction per doc — the degenerate/boilerplate
    text filter (log spam, keyword stuffing, model loops). Pure codegen
    array expressions, no shuffle. Threshold 0.01 splits THIS corpus
    (max observed ratio 0.07); production filters run ~0.2-0.5."""
    d = t(spark, sf_dir, "documents")
    rr = repetition_ratio("text", n=3)
    return d.select(
        "doc_id",
        F.round(rr, 6).alias("rep_ratio"),
        (rr > 0.01).alias("is_degenerate"),
    )


_P_EMAIL, _P_PHONE, _P_IPV4 = (
    PII_PATTERNS["email"],
    PII_PATTERNS["phone"],
    PII_PATTERNS["ipv4"],
)

@query(
    "q83_pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, source,
             text || CASE WHEN doc_id % 3 = 0
                          THEN ' contact user' || doc_id || '@example.com'
                          ELSE '' END
                  || CASE WHEN doc_id % 4 = 0
                          THEN ' from 10.0.' || (doc_id % 256) || '.1'
                          ELSE '' END
                  || CASE WHEN doc_id % 5 = 0
                          THEN ' tel 555-123-4567' ELSE '' END AS text
      FROM documents
    ),
    s AS (
      SELECT doc_id, source, text,
             len(regexp_extract_all(text, '{_P_EMAIL}')) AS n_email,
             regexp_replace(text, '{_P_EMAIL}', '<email>', 'g') AS t1
      FROM aug
    ),
    s2 AS (
      SELECT doc_id, source, n_email,
             len(regexp_extract_all(t1, '{_P_PHONE}')) AS n_phone,
             regexp_replace(t1, '{_P_PHONE}', '<phone>', 'g') AS t2
      FROM s
    ),
    s3 AS (
      SELECT doc_id, source, n_email, n_phone,
             len(regexp_extract_all(t2, '{_P_IPV4}')) AS n_ipv4,
             regexp_replace(t2, '{_P_IPV4}', '<ipv4>', 'g') AS clean
      FROM s2
    )
    SELECT source,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(n_ipv4) AS BIGINT) AS ipv4s,
           CAST(SUM(length(clean)) AS BIGINT) AS clean_chars,
           COUNT(*) AS n_docs
    FROM s3 GROUP BY source
    """,
)
def q83_pii_scrub(spark, sf_dir):
    """PII redaction accounting per source. The corpus itself carries no
    PII, so deterministic synthetic entities (emails/IPs/phones keyed on
    doc_id) are appended in-query — identically in the oracle — making
    the scrub verification non-trivial at every scale factor."""
    d = t(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" tel 555-123-4567")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    p = scrub_pii("text")
    scrubbed = aug.select(
        "source",
        p["n_email"].alias("n_email"),
        p["n_phone"].alias("n_phone"),
        p["n_ipv4"].alias("n_ipv4"),
        p["clean"].alias("clean"),
    )
    return scrubbed.groupBy("source").agg(
        F.sum("n_email").alias("emails"),
        F.sum("n_phone").alias("phones"),
        F.sum("n_ipv4").alias("ipv4s"),
        F.sum(F.length("clean")).alias("clean_chars"),
        F.count("*").alias("n_docs"),
    )


@query(
    "q84_length_histogram",
    oracle="""
    SELECT source,
           length(CAST(n_chars AS VARCHAR)) AS magnitude,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def q84_length_histogram(spark, sf_dir):
    """Order-of-magnitude doc-length histogram per source (decimal-digit
    buckets — engine-portable integer bucketing, no float log edge
    cases). The shape check before length-filtering a corpus."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy(
        "source",
        F.length(F.col("n_chars").cast("string")).cast("bigint").alias("magnitude"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "q85_mixture_weights",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    t AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total,
                 COUNT(*) AS groups FROM c)
    SELECT lang, n_docs,
           ROUND(n_docs / total, 6) AS share,
           ROUND((total / groups) / n_docs, 6) AS weight
    FROM c, t
    """,
)
def q85_mixture_weights(spark, sf_dir):
    """Per-language resampling weights to reach a uniform target mixture
    (upsample rare langs, downsample dominant) — the corpus-recipe
    primitive. One tiny aggregate + broadcast total; no data shuffle."""
    return mixture_weights(t(spark, sf_dir, "documents"), dim="lang")


@query(
    "q86_sequence_packing",
    oracle="""
    WITH tk AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    p AS (
      SELECT source, n_tok,
             CAST(FLOOR(COALESCE(SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0)
               AS BIGINT) AS pack_id
      FROM tk
    )
    SELECT source, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
    FROM p GROUP BY 1, 2
    """,
)
def q86_sequence_packing(spark, sf_dir):
    """Concat-and-chunk sequence packing into 512-token budgets, per
    source: pack assignment is one window cumsum (deterministic, shuffles
    once on the partition key, no sequential driver loop — the shape that
    still works when 100 TB packs in parallel per key)."""
    d = t(spark, sf_dir, "documents").select(
        "source", "doc_id", token_count("text").alias("n_tok")
    )
    packed = pack_sequences(
        d, budget=512, token_col="n_tok", partition_col="source", order_col="doc_id"
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("pack_tokens"),
    )


@query(
    "q89_decontamination",
    oracle="""
    WITH grams AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, GREATEST(len(string_split(text, ' ')) - 4, 0) + 2),
               i -> substr(md5(array_to_string(string_split(text, ' ')[i:i+3], ' ')), 1, 16)
             )) AS gs
      FROM documents
    ),
    bench AS (
      SELECT DISTINCT unnest(gs) AS g16 FROM grams WHERE doc_id % 97 = 0
    ),
    corpus AS (
      SELECT doc_id, source, unnest(gs) AS g16 FROM grams
    ),
    hits AS (
      SELECT c.doc_id, c.source, COUNT(*) AS n_hits
      FROM corpus c JOIN bench b USING (g16)
      GROUP BY 1, 2
    )
    SELECT source,
           COUNT(*) AS n_contaminated,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits,
           CAST(MAX(n_hits) AS BIGINT) AS max_hits
    FROM hits WHERE doc_id % 97 <> 0
    GROUP BY source
    """,
)
def q89_decontamination(spark, sf_dir):
    """Benchmark decontamination (GPT-3/C4-style leakage check): flag
    corpus docs sharing a word 4-gram with the 'benchmark' slice (docs with
    doc_id % 97 = 0 stand in for an eval set). Benchmark grams dedupe to
    a tiny set and broadcast; the 100 TB corpus side never shuffles. Join
    key is a 16-hex md5 prefix — fixed-width and engine-portable, which
    the DuckDB oracle proves by reproducing identical keys."""
    d = t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0)
    hits = decontaminate(d, bench, n=4).join(
        d.select("doc_id", "source"), "doc_id"
    )
    return (
        hits.where(F.col("doc_id") % 97 != 0)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_contaminated"),
            F.sum("n_hits").alias("total_hits"),
            F.max("n_hits").alias("max_hits"),
        )
    )


@query(
    "q90_quality_filter",
    oracle="""
    WITH f AS (
      SELECT source,
             len(string_split(text, ' ')) AS nw,
             (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
               / len(string_split(text, ' ')) AS mwl,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                 ['the','a','of','and','to','in'])) AS stop_hits,
             CASE WHEN len(list_transform(
                    range(1, GREATEST(len(string_split(text, ' ')) - 3, 0) + 2),
                    i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) > 0
                  THEN 1.0 - len(list_distinct(list_transform(
                    range(1, GREATEST(len(string_split(text, ' ')) - 3, 0) + 2),
                    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) * 1.0
                    / len(list_transform(
                    range(1, GREATEST(len(string_split(text, ' ')) - 3, 0) + 2),
                    i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
                  ELSE 0.0 END AS rep
      FROM documents
    ),
    r AS (
      SELECT source,
             (nw >= 10 AND nw <= 100000) AS r_wordcount,
             (mwl >= 2.0 AND mwl <= 12.0) AS r_meanlen,
             (stop_hits >= 2) AS r_stopword,
             (rep <= 0.2) AS r_repetition
      FROM f
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN r_wordcount AND r_meanlen AND r_stopword
                          AND r_repetition THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN NOT r_wordcount THEN 1 ELSE 0 END) AS BIGINT) AS f_wordcount,
           CAST(SUM(CASE WHEN NOT r_meanlen THEN 1 ELSE 0 END) AS BIGINT) AS f_meanlen,
           CAST(SUM(CASE WHEN NOT r_stopword THEN 1 ELSE 0 END) AS BIGINT) AS f_stopword,
           CAST(SUM(CASE WHEN NOT r_repetition THEN 1 ELSE 0 END) AS BIGINT) AS f_repetition
    FROM r GROUP BY source
    """,
)
def q90_quality_filter(spark, sf_dir):
    """C4/Gopher-style composite quality filter: named boolean rules
    (word count, mean word length, stopword presence, repeated-3-gram
    ratio), reported as per-source pass and per-rule failure counts —
    the audit table a corpus build reviews before dropping data. Pure
    codegen per-row expressions; one tiny agg shuffle."""
    d = t(spark, sf_dir, "documents")
    r = quality_rules("text")
    flagged = d.select(
        "source",
        r["r_wordcount"].alias("r_wordcount"),
        r["r_meanlen"].alias("r_meanlen"),
        r["r_stopword"].alias("r_stopword"),
        r["r_repetition"].alias("r_repetition"),
        r["q_pass"].alias("q_pass"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("q_pass").cast("bigint")).alias("n_pass"),
        F.sum((~F.col("r_wordcount")).cast("bigint")).alias("f_wordcount"),
        F.sum((~F.col("r_meanlen")).cast("bigint")).alias("f_meanlen"),
        F.sum((~F.col("r_stopword")).cast("bigint")).alias("f_stopword"),
        F.sum((~F.col("r_repetition")).cast("bigint")).alias("f_repetition"),
    )


@query(
    "q91_stratified_sample",
    oracle="""
    WITH r AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang, doc_id, n_chars FROM r WHERE rk <= 40
    """,
)
def q91_stratified_sample(spark, sf_dir):
    """Deterministic 40-per-language stratified sample: rank within each
    stratum by md5(doc_id) — a fixed uniform permutation — and keep the
    first 40. Exact-k (unlike Bernoulli sampleBy), engine-portable, and
    stable under appends to other strata. One shuffle on the stratum key;
    the oracle reproduces the EXACT same sampled rows from DuckDB."""
    d = t(spark, sf_dir, "documents")
    return stratified_sample(d, k=40, strata_col="lang", id_col="doc_id").select(
        "lang", "doc_id", "n_chars"
    )


@query(
    "q92_ngram_topk",
    oracle="""
    WITH g AS (
      SELECT lang,
             unnest(list_transform(
               range(1, GREATEST(len(string_split(text, ' ')) - 2, 0) + 2),
               i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')
             )) AS gram
      FROM documents
    ),
    c AS (SELECT lang, gram, COUNT(*) AS n FROM g GROUP BY 1, 2),
    r AS (
      SELECT lang, gram, n,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY n DESC, gram ASC) AS rank
      FROM c
    )
    SELECT lang, gram, n, rank FROM r WHERE rank <= 10
    """,
)
def q92_ngram_topk(spark, sf_dir):
    """Top-10 word bigrams per language (corpus phrase-frequency audit).
    explode -> two-phase count (map-side partial agg shrinks the shuffle
    to distinct grams, not corpus tokens) -> per-group row_number with a
    deterministic (count desc, gram asc) tiebreak."""
    d = t(spark, sf_dir, "documents")
    return ngram_topk(d, k=10, n=2, text_col="text", group_col="lang")


@query(
    "q100_weighted_sample",
    oracle="""
    WITH stats AS (SELECT AVG(n_chars) AS avg_chars FROM documents),
    u AS (
      SELECT d.*,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) / 4294967296.0 AS unif,
             LEAST(1.0, 0.3 * d.n_chars / s.avg_chars) AS p
      FROM documents d CROSS JOIN stats s
    )
    SELECT source,
           COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
    FROM u WHERE unif < p
    GROUP BY source
    """,
)
def q100_weighted_sample(spark, sf_dir):
    """Deterministic length-weighted Poisson sample (rate 0.3): a doc's
    inclusion probability is proportional to its length, membership is a
    pure function of md5(doc_id) — reruns, backfills, and other engines
    (the oracle) draw the IDENTICAL sample with no coordination or RNG
    state. The standard corpus down-sampling step when token budget,
    not doc count, is the constraint."""
    d = t(spark, sf_dir, "documents")
    stats = d.agg(F.avg("n_chars").alias("avg_chars"))
    unif = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(4294967296.0)
    )
    p = F.least(F.lit(1.0), F.lit(0.3) * F.col("n_chars") / F.col("avg_chars"))
    return (
        # bounded: stats is a 1-row global aggregate
        d.crossJoin(F.broadcast(stats))
        .withColumn("unif", unif)
        .withColumn("p", p)
        .filter(F.col("unif") < F.col("p"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )
