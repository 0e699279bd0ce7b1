"""Training-data-pipeline queries, second batch (Layer C): document
chunking, URL analytics via the ClickHouse URL-function spellings, exact
weighted quantiles, unigram-LM quality scoring, embedding quantization —
each oracle-checked against DuckDB."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ed_clickhouse_spark.functions.clickhouse import (
    quantile_exact_weighted,
    quantiles_exact_weighted,
    register_sql_aliases,
)
from ed_clickhouse_spark.operators.llmdata import chunk_documents
from ed_clickhouse_spark.operators.similarity import quantize_embeddings
from ed_clickhouse_spark.operators.text import unigram_logprob
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q131_chunking",
    oracle="""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             unnest(range(0,
               GREATEST(CAST(CEIL((n - 32) / 24.0) AS BIGINT), 0) + 1
             )) AS chunk_idx
      FROM tk
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * 24 AS chunk_start,
           CAST(len(toks[chunk_idx*24+1 : chunk_idx*24+32]) AS BIGINT) AS n_tok,
           substr(md5(array_to_string(
             toks[chunk_idx*24+1 : chunk_idx*24+32], ' ')), 1, 8) AS chunk_sig
    FROM c
    """,
)
def q131_chunking(spark, sf_dir):
    """Sliding-window chunking (32-token windows, stride 24 — overlapping
    RAG/context-window passages). One row per chunk; chunk text verified
    through an md5 prefix so the driver hash pins exact chunk contents
    without shipping bodies. Pure per-row array codegen + one narrow
    posexplode — no shuffle at any scale."""
    d = t(spark, sf_dir, "documents")
    ch = chunk_documents(d, chunk_tokens=32, stride=24)
    return ch.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        "n_tok",
        F.substring(F.md5("chunk_text"), 1, 8).alias("chunk_sig"),
    )


@query(
    "q132_url_functions",
    oracle="""
    WITH u AS (
      SELECT 'https://' ||
             ['www','cdn','api'][CAST(event_id % 3 AS INT) + 1] ||
             '.example.' ||
             ['com','org','net','io'][CAST(event_id % 4 AS INT) + 1] ||
             '/' || event_type || '/item' || CAST(event_id % 50 AS VARCHAR) ||
             '?user=' || CAST(user_id AS VARCHAR) ||
             '&ref=' || ['home','search','promo','email','feed'][CAST(event_id % 5 AS INT) + 1] ||
             '#sec' || CAST(event_id % 7 AS VARCHAR) AS url
      FROM events
    ),
    p AS (
      SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
             regexp_extract(url, '^https://[^/]+([^?#]+)', 1) AS pth,
             regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref,
             regexp_extract(url, '[?&]user=([^&#]*)', 1) AS usr
      FROM u
    )
    SELECT host,
           regexp_extract(host, '\\.([^.]+)$', 1) AS tld,
           ref,
           COUNT(*) AS n_events,
           COUNT(DISTINCT pth) AS n_paths,
           COUNT(DISTINCT usr) AS n_users
    FROM p GROUP BY 1, 2, 3
    """,
)
def q132_url_functions(spark, sf_dir):
    """ClickHouse URL-function family (domain / topLevelDomain / path /
    extractURLParameter), exercised through the registered SQL spellings
    (backed by Spark's built-in parse_url — JVM codegen, no regex UDFs).
    URLs are synthesized deterministically from events columns so every
    scale factor gets non-trivial coverage; the oracle re-derives the
    same parts with plain regexes (equivalent on well-formed URLs)."""
    register_sql_aliases(spark)
    e = t(spark, sf_dir, "events")
    sub = F.element_at(
        F.array(F.lit("www"), F.lit("cdn"), F.lit("api")),
        (F.col("event_id") % 3).cast("int") + 1,
    )
    tld = F.element_at(
        F.array(*[F.lit(x) for x in ("com", "org", "net", "io")]),
        (F.col("event_id") % 4).cast("int") + 1,
    )
    ref = F.element_at(
        F.array(*[F.lit(x) for x in ("home", "search", "promo", "email", "feed")]),
        (F.col("event_id") % 5).cast("int") + 1,
    )
    url = F.concat(
        F.lit("https://"), sub, F.lit(".example."), tld,
        F.lit("/"), F.col("event_type"),
        F.lit("/item"), (F.col("event_id") % 50).cast("string"),
        F.lit("?user="), F.col("user_id").cast("string"),
        F.lit("&ref="), ref,
        F.lit("#sec"), (F.col("event_id") % 7).cast("string"),
    )
    u = e.select(url.alias("url"))
    return (
        u.select(
            F.expr("domain(url)").alias("host"),
            F.expr("topLevelDomain(url)").alias("tld"),
            F.expr("extractURLParameter(url, 'ref')").alias("ref"),
            F.expr("path(url)").alias("pth"),
            F.expr("extractURLParameter(url, 'user')").alias("usr"),
        )
        .groupBy("host", "tld", "ref")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("pth").alias("n_paths"),
            F.countDistinct("usr").alias("n_users"),
        )
    )


@query(
    "q133_weighted_quantile",
    oracle="""
    WITH pv AS (
      SELECT l_returnflag AS flag, l_quantity AS v,
             SUM(l_linenumber) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT flag, v,
             SUM(w) OVER (PARTITION BY flag ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(w) OVER (PARTITION BY flag) AS tot
      FROM pv
    )
    SELECT m.flag, m.med_qty, p.p90_qty
    FROM (SELECT flag, MIN(v) AS med_qty FROM c
          WHERE cum >= 0.5 * tot GROUP BY flag) m
    JOIN (SELECT flag, MIN(v) AS p90_qty FROM c
          WHERE cum >= 0.9 * tot GROUP BY flag) p USING (flag)
    """,
)
def q133_weighted_quantile(spark, sf_dir):
    """ClickHouse quantileExactWeighted: exact weighted median and p90 of
    l_quantity weighted by l_linenumber, per return flag. Distributed as
    pre-aggregate-per-distinct-value + window cumsum — exact at any scale
    with a bounded value domain (unlike percentile_approx), never sorting
    raw rows."""
    li = t(spark, sf_dir, "lineitem")
    # plural form: both quantiles from ONE pre-aggregate + cumsum +
    # conditional agg (the CH quantilesExactWeighted shape) — previously
    # two full passes joined back (measured 1.23 -> 0.60 s at sf0.1)
    both = quantiles_exact_weighted(
        li,
        "l_quantity",
        "l_linenumber",
        ["l_returnflag"],
        qs=[0.5, 0.9],
        aliases=["med_qty", "p90_qty"],
    )
    return both.select(
        F.col("l_returnflag").alias("flag"), "med_qty", "p90_qty"
    )


@query(
    "q134_lm_quality",
    oracle="""
    WITH dw AS (
      SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    tf AS (SELECT id, w, COUNT(*) AS tf FROM dw GROUP BY 1, 2),
    vocab AS (SELECT w, SUM(tf) AS cf FROM tf GROUP BY 1),
    tot AS (SELECT CAST(SUM(cf) AS DOUBLE) AS total FROM vocab),
    scored AS (
      SELECT id, CAST(SUM(tf) AS BIGINT) AS n_tok,
             SUM(tf * ln(cf / total)) / SUM(tf) AS alp
      FROM tf JOIN vocab USING (w) CROSS JOIN tot
      GROUP BY id
    ),
    d AS (
      SELECT s.source, ROUND(sc.alp, 4) AS alp
      FROM scored sc JOIN documents s ON sc.id = s.doc_id
    )
    SELECT source,
           CAST(FLOOR(alp * 2) AS BIGINT) AS lp_bucket,
           COUNT(*) AS n_docs
    FROM d GROUP BY 1, 2
    """,
)
def q134_lm_quality(spark, sf_dir):
    """Unigram-LM quality scoring (the CCNet-style perplexity-filter
    proxy): mean token log-probability under a corpus-fit unigram model,
    reported as per-source half-nat histogram buckets. Token counts and
    the vocabulary join are two-phase aggregations; the bucket floor
    makes the check robust to sub-ulp ln() differences between
    engines."""
    d = t(spark, sf_dir, "documents")
    scored = unigram_logprob(d, round_to=4)
    joined = scored.join(d.select("doc_id", "source"), "doc_id")
    return (
        joined.select(
            "source",
            F.floor(F.col("avg_logprob") * 2).cast("bigint").alias("lp_bucket"),
        )
        .groupBy("source", "lp_bucket")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "q135_quantization",
    oracle="""
    WITH v AS (
      SELECT MIN(x) AS vmin, MAX(x) AS vmax,
             (MAX(x) - MIN(x)) / 255.0 AS scale
      FROM (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings)
    ),
    q AS (
      SELECT label,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(ROUND((x - vmin) / scale) AS INT)) AS qvec,
             CAST(embedding AS DOUBLE[]) AS vec,
             vmin, scale
      FROM embeddings CROSS JOIN v
    ),
    e AS (
      SELECT label,
             CAST(list_sum(qvec) AS BIGINT) AS code_sum,
             sqrt(list_sum(list_transform(
               list_zip(vec, list_transform(qvec, c -> vmin + c * scale)),
               p -> (p[1] - p[2]) * (p[1] - p[2])
             )) / len(vec)) AS err
      FROM q
    )
    SELECT label, COUNT(*) AS n,
           CAST(SUM(code_sum) AS BIGINT) AS total_code,
           ROUND(AVG(err), 4) AS avg_err
    FROM e GROUP BY label
    """,
)
def q135_quantization(spark, sf_dir):
    """Int8 scalar quantization of the embedding corpus (global-range
    SQ): per label, the exact integer code mass (pins every code value
    bit-for-bit via the driver hash) and mean reconstruction error. The
    4x storage/IO lever for 100 TB vector corpora; range pass is one
    tiny global aggregate, codes are per-row codegen."""
    e = t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    quant, _params = quantize_embeddings(e, "embedding", bits=8)
    per_vec = quant.select(
        "label",
        F.aggregate("qvec", F.lit(0).cast("bigint"), lambda a, c: a + c).alias(
            "code_sum"
        ),
        F.col("recon_err").alias("err"),
    )
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum("code_sum").cast("bigint").alias("total_code"),
        F.round(F.avg("err"), 4).alias("avg_err"),
    )


@query(
    "q136_shard_assignment",
    oracle="""
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS BIGINT) % 16 AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY 1
    """,
)
def q136_shard_assignment(spark, sf_dir):
    """Deterministic 16-way training-shard assignment (md5 bucketing —
    the export_shards layout): per-shard doc/token accounting, proving
    the exact shard membership is reproducible from any engine. The
    write itself is exercised in pytest; this is the accounting half."""
    from ed_clickhouse_spark.operators.llmdata import assign_shards
    from ed_clickhouse_spark.operators.text import token_count

    d = assign_shards(t(spark, sf_dir, "documents"), n_shards=16)
    return d.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "q137_topk_values",
    oracle="""
    WITH c AS (
      SELECT user_id % 10 AS cohort, event_type AS v, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT cohort, v,
             ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY n DESC, v ASC) AS rk
      FROM c
    )
    SELECT cohort,
           array_to_string(list(v ORDER BY rk), ',') AS top_values
    FROM r WHERE rk <= 3 GROUP BY cohort
    """,
)
def q137_topk_values(spark, sf_dir):
    """ClickHouse topK(3): most frequent event types per user cohort,
    exact two-phase spelling (the shuffle carries distinct values, not
    events), serialized to a comma-joined string so the array result
    stays scalar for the driver hash."""
    from ed_clickhouse_spark.functions.clickhouse import top_k_values

    e = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("cohort"), "event_type"
    )
    return top_k_values(e, ["cohort"], "event_type", k=3)


@query(
    "q138_value_histogram",
    oracle="""
    WITH r AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events),
    b AS (
      SELECT LEAST(CAST(FLOOR((value - vmin) / ((vmax - vmin) / 10.0)) AS BIGINT),
                   9) AS bucket,
             value
      FROM events CROSS JOIN r
    )
    SELECT bucket, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total
    FROM b GROUP BY bucket
    """,
)
def q138_value_histogram(spark, sf_dir):
    """ClickHouse histogram(10)-style equal-width histogram of the event
    value column (deterministic fixed-width buckets rather than CH's
    adaptive ones, so any engine reproduces it): one tiny min/max
    aggregate broadcast back, then a per-row bucket expression + one
    two-phase count — no sort, no window."""
    e = t(spark, sf_dir, "events")
    r = e.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    width = (F.col("vmax") - F.col("vmin")) / F.lit(10.0)
    bucket = F.least(
        F.floor((F.col("value") - F.col("vmin")) / width).cast("bigint"), F.lit(9)
    )
    return (
        # bounded: r is a 1-row min/max aggregate
        e.crossJoin(F.broadcast(r))
        .select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("total"),
        )
    )


@query(
    "q180_intake_pipeline",
    oracle="""
    WITH tk AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, source,
             unnest(range(0,
               GREATEST(CAST(CEIL((n - 32) / 24.0) AS BIGINT), 0) + 1
             )) AS chunk_idx,
             toks
      FROM tk
    ),
    ch AS (
      SELECT doc_id, source, chunk_idx,
             toks[chunk_idx*24+1 : chunk_idx*24+32] AS ctoks
      FROM c
    ),
    sig AS (
      SELECT doc_id, source, chunk_idx,
             md5(array_to_string(ctoks, ' ')) AS fp,
             len(ctoks) AS n_tok,
             len(list_intersect(list_distinct(ctoks),
                 ['the','a','of','and','to','in'])) AS stop_hits
      FROM ch
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY fp ORDER BY doc_id, chunk_idx
      ) AS rn
      FROM sig
    )
    SELECT source,
           COUNT(*) AS n_chunks,
           COUNT(*) FILTER (WHERE rn > 1) AS n_dup_dropped,
           COUNT(*) FILTER (WHERE rn = 1 AND NOT (n_tok >= 16 AND stop_hits >= 1))
             AS n_quality_dropped,
           COUNT(*) FILTER (WHERE rn = 1 AND n_tok >= 16 AND stop_hits >= 1)
             AS n_kept,
           CAST(SUM(n_tok) FILTER (WHERE rn = 1 AND n_tok >= 16 AND stop_hits >= 1)
             AS BIGINT) AS tokens_kept
    FROM ranked GROUP BY source
    """,
)
def q180_intake_pipeline(spark, sf_dir):
    """The whole training-data intake as ONE declarative DAG — chunk
    (32/24 sliding windows) → exact chunk dedup (md5 fingerprint,
    first (doc, idx) survives) → quality gate (length + stopword) →
    per-source accounting. This is the composition story the individual
    operators exist for: chunking is per-row codegen, the dedup rank is
    the ONLY shuffle (keyed on the 16-byte fingerprint, never chunk
    text), the gate is per-row again, and the final rollup re-keys on
    the 20-value source column (a second, trivially small exchange —
    plan-checked: exactly 2 shuffles end to end). At 100 TB the plan is
    scan → project → fp exchange → window → project → source exchange →
    aggregate."""
    from pyspark.sql import Window as W

    from ed_clickhouse_spark.operators.llmdata import chunk_documents

    d = t(spark, sf_dir, "documents")
    # `source` rides through the chunker's per-row projection
    # (carry_cols) — zero extra shuffle, and no corpus-cardinality
    # broadcast of the doc-id table to re-attach it afterwards.
    ch = chunk_documents(
        d.select("doc_id", "source", "text"), 32, 24, carry_cols=("source",)
    )
    toks = F.split("chunk_text", " ")
    en_stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in")])
    sig = ch.select(
        "doc_id",
        "source",
        "chunk_idx",
        F.md5("chunk_text").alias("fp"),
        F.col("n_tok"),
        F.size(F.array_intersect(F.array_distinct(toks), en_stop)).alias(
            "stop_hits"
        ),
    )
    ranked = sig.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("fp").orderBy("doc_id", "chunk_idx")
        ),
    )
    ok = (F.col("n_tok") >= 16) & (F.col("stop_hits") >= 1)
    keep = (F.col("rn") == 1) & ok
    return ranked.groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.count(F.when(F.col("rn") > 1, 1)).alias("n_dup_dropped"),
        F.count(F.when((F.col("rn") == 1) & ~ok, 1)).alias("n_quality_dropped"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.sum(F.when(keep, F.col("n_tok"))).cast("bigint").alias("tokens_kept"),
    )


@query(
    "q181_chunk_decontamination",
    oracle="""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE doc_id >= 10
    ),
    c AS (
      SELECT doc_id,
             unnest(range(0,
               GREATEST(CAST(CEIL((n - 32) / 24.0) AS BIGINT), 0) + 1
             )) AS chunk_idx,
             toks
      FROM tk
    ),
    ch AS (
      SELECT doc_id * 100000 + chunk_idx AS chunk_uid,
             toks[chunk_idx*24+1 : chunk_idx*24+32] AS ctoks
      FROM c
    ),
    cg AS (
      SELECT chunk_uid,
             substr(md5(gram), 1, 16) AS g16
      FROM (
        SELECT chunk_uid,
               unnest(list_distinct(list_transform(
                 range(1, GREATEST(len(ctoks) - 8, 0) + 2),
                 i -> array_to_string(ctoks[i:i+7], ' ')
               ))) AS gram
        FROM ch WHERE len(ctoks) >= 8
      )
    ),
    bg AS (
      SELECT DISTINCT substr(md5(gram), 1, 16) AS g16
      FROM (
        SELECT unnest(list_distinct(list_transform(
                 range(1, GREATEST(len(string_split(text,' ')) - 8, 0) + 2),
                 i -> array_to_string(string_split(text,' ')[i:i+7], ' ')
               ))) AS gram
        FROM documents WHERE doc_id < 10
      )
    )
    SELECT chunk_uid, COUNT(*) AS n_hits
    FROM cg JOIN bg USING (g16)
    GROUP BY 1
    """,
)
def q181_chunk_decontamination(spark, sf_dir):
    """Chunk-level benchmark decontamination — q89's doc-level check
    misses PARTIAL leakage (one paragraph of an eval item quoted inside
    a long doc); running the same broadcast 8-gram probe on 32-token
    CHUNKS localizes the hit. Docs 0-9 stand in for the benchmark.
    Chunking is per-row codegen; the benchmark gram set broadcasts; the
    corpus never shuffles."""
    from ed_clickhouse_spark.operators.llmdata import chunk_documents, decontaminate

    d = t(spark, sf_dir, "documents")
    # decontaminate() reads the SAME (id_col, text_col) names on both
    # sides — project the benchmark into the chunk frame's shape
    bench = d.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("chunk_uid"), F.col("text").alias("chunk_text")
    )
    corpus = d.filter(F.col("doc_id") >= 10)
    ch = (
        chunk_documents(corpus.select("doc_id", "text"), 32, 24)
        .filter(F.col("n_tok") >= 8)
        .select(
            (F.col("doc_id") * 100000 + F.col("chunk_idx")).alias("chunk_uid"),
            F.col("chunk_text"),
        )
    )
    return decontaminate(ch, bench, text_col="chunk_text", id_col="chunk_uid", n=8)


@query(
    "q197_token_budget_mixture",
    oracle="""
    WITH lt AS (
      SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS lang_tokens
      FROM documents GROUP BY lang
    )
    SELECT lang, lang_tokens,
           ROUND(LEAST(1.0, (1000000.0 / (SELECT COUNT(*) FROM lt)) / lang_tokens), 6)
             AS sample_rate,
           CAST(LEAST(CAST(1000000.0 / (SELECT COUNT(*) FROM lt) AS BIGINT),
                      lang_tokens) AS BIGINT) AS expected_tokens
    FROM lt
    """,
)
def q197_token_budget_mixture(spark, sf_dir):
    """Token-budget mixture rebalancing: per-language sampling rates so
    each language contributes (up to) an equal share of a 1M-token
    training budget — the TOKEN-denominated counterpart of the
    doc-denominated q85 mixture. One groupBy over token counts plus a
    window for the language count; rates feed stratified_sample/
    train_split downstream. At 100 TB the only data-sized pass is the
    token-count aggregate."""
    from ed_clickhouse_spark.operators.text import token_count

    d = t(spark, sf_dir, "documents")
    lt = d.groupBy("lang").agg(F.sum(token_count("text")).alias("lang_tokens"))
    n_langs = F.count("*").over(W.partitionBy())
    per_lang = F.lit(1_000_000.0) / n_langs
    return lt.select(
        "lang",
        "lang_tokens",
        F.round(
            F.least(F.lit(1.0), per_lang / F.col("lang_tokens")), 6
        ).alias("sample_rate"),
        F.least(
            per_lang.cast("bigint"), F.col("lang_tokens")
        ).cast("bigint").alias("expected_tokens"),
    )


@query(
    "q198_temperature_mixture",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    s AS (
      SELECT lang, n_docs,
             n_docs * 1.0 / (SELECT SUM(n_docs) FROM c) AS share
      FROM c
    )
    SELECT lang, n_docs,
           ROUND(share, 6) AS share,
           ROUND(POW(share, 0.3) / (SELECT SUM(POW(share, 0.3)) FROM s), 6)
             AS target_share,
           ROUND(POW(share, 0.3) / (SELECT SUM(POW(share, 0.3)) FROM s) / share, 6)
             AS weight
    FROM s
    """,
)
def q198_temperature_mixture(spark, sf_dir):
    """Temperature-based language mixture (p_i ∝ share_i^0.3): the
    multilingual-pretraining sampling recipe that upsamples rare
    languages without drowning the head. One tiny aggregate; weights
    feed stratified sampling downstream."""
    from ed_clickhouse_spark.operators.llmdata import temperature_mixture

    return temperature_mixture(t(spark, sf_dir, "documents"), dim="lang", alpha=0.3)
