"""Text-analysis + array-function surface (Layer C text ops + SURVEY.md
§2 B8-array) over the ``documents`` table — the heuristics stage of a
training-data pipeline: token stats, quality scores, language ID,
fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.text import (
    BPE_ISH_TOKEN_RE,
    STOPWORDS,
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_features,
    token_count,
    tokens,
)
from ed_clickhouse_spark.operators.sketch import cm_build, cm_query
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q37_array_ops",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3_tokens
    FROM documents
    WHERE lang = 'en'
    """,
)
def q37_array_ops(spark, sf_dir):
    """Array ops over tokenized text: size / array_distinct /
    array_contains / sort+slice (ClickHouse arrayJoin/has family —
    SURVEY §2 B8 maps genres/labels arrays, migrations/009:24-27)."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    return d.filter(F.col("lang") == "en").select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), ",").alias(
            "first3_tokens"
        ),
    )


@query(
    "q38_explode_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    HAVING COUNT(*) >= 100
    """,
)
def q38_explode_tokens(spark, sf_dir):
    """explode ≙ ClickHouse arrayJoin: corpus token frequencies.
    At 100 TB: explode -> partial agg keeps the shuffle at distinct-token
    cardinality, not token instances."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n") >= 100)
    )


@query(
    "q39_lang_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def q39_lang_stats(spark, sf_dir):
    """Corpus composition stats by language and source."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_ALL_STOP_SQL = "[" + ", ".join(
    f"'{w}'" for ws in STOPWORDS.values() for w in ws
) + "]"

@query(
    "q40_quality_score",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_intersect(list_distinct(string_split(text, ' ')), {_ALL_STOP_SQL})) AS n_stopwords,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             CASE WHEN len(string_split(text, ' ')) > 0
                  THEN ROUND((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0 / len(string_split(text, ' ')), 6)
                  ELSE 0.0 END AS avg_token_len
      FROM documents
    )
    SELECT doc_id, lang, n_tokens, n_stopwords, n_punct, avg_token_len,
           ROUND(LEAST(1.0, n_tokens / 100.0) * 0.5
                 + CASE WHEN avg_token_len BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END
                 + LEAST(0.2, n_stopwords / 50.0), 6) AS quality_score
    FROM f
    """,
)
def q40_quality_score(spark, sf_dir):
    """Heuristic quality features + score (length/punct/stopword ratios) —
    the filter stage of an LLM-data pipeline; all codegen'd built-ins."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return quality_features(d).select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_stopwords",
        "n_punct",
        F.round("avg_token_len", 6).alias("avg_token_len"),
        "quality_score",
    )


@query(
    "q41_token_counts",
    oracle=f"""
    SELECT source,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{BPE_ISH_TOKEN_RE}'))) AS BIGINT) AS total_bpe_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
)
def q41_token_counts(spark, sf_dir):
    """Corpus token budgets per source: whitespace + BPE-ish regex
    tokenization (token-count accounting for training-data sizing)."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(token_count("text")).alias("total_ws_tokens"),
        F.sum(bpe_ish_token_count("text")).alias("total_bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


@query(
    "q42_fingerprint_dups",
    oracle="""
    SELECT md5(substr(trim(regexp_replace(text, '\\s+', ' ', 'g')), 1, 64)) AS fp,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_doc_id,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
)
def q42_fingerprint_dups(spark, sf_dir):
    """Document fingerprinting (md5 of the first 64 whitespace-normalized
    chars) — template/boilerplate-dup groups; the cheap first tier of the
    dedup ladder. Prefix-64 (vs whole-doc md5, which q44 covers) so the
    check exercises real dup groups at every SF."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(fingerprint("text", prefix=64).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
            ).alias("doc_ids"),
        )
        .filter(F.col("n_copies") > 1)
    )


_LANG_HITS_SQL = ",\n".join(
    f"           len(list_intersect(list_distinct(string_split(text, ' ')), "
    f"[{', '.join(repr(w) for w in STOPWORDS[code])}])) AS h_{code}"
    for code in sorted(STOPWORDS)
)
_LANG_CASE_SQL = "CASE WHEN GREATEST(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und' " + " ".join(
    f"WHEN h_{code} = GREATEST(h_de, h_en, h_es, h_fr, h_zh) THEN '{code}'"
    for code in sorted(STOPWORDS)
) + " END"


@query(
    "q43_language_id",
    oracle=f"""
    WITH hits AS (
      SELECT lang AS actual,
{_LANG_HITS_SQL}
      FROM documents
    )
    SELECT actual, {_LANG_CASE_SQL} AS predicted, COUNT(*) AS n
    FROM hits
    GROUP BY 1, 2
    """,
)
def q43_language_id(spark, sf_dir):
    """Stopword-overlap language ID vs the labeled lang column —
    returns the confusion counts (predicted x actual)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.col("lang").alias("actual"), language_id("text").alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count("*").alias("n"))
    )


@query("q80_heavy_hitters")  # sketch estimates — rows-only; bounds unit-tested
def q80_heavy_hitters(spark, sf_dir):
    """Count-min sketch heavy hitters: estimated corpus frequency of the
    20 most common tokens. The sketch is depth*width counters regardless
    of corpus size (the 100 TB path for hot-key frequency); estimates are
    one-sided (never undercount — bound pinned in tests/test_sketch.py)."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("token"))
    sketch = cm_build(tok, "token")
    top = (
        tok.groupBy("token")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "token")
        .limit(20)
    )
    return cm_query(sketch, top, "token").join(top, "token")


@query(
    "q155_ngram_distance",
    oracle="""
    WITH d AS (
      SELECT doc_id, substr(text, 1, 60) AS s FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, GREATEST(len(s) - 2, 1) + 1),
               i -> substr(s, i, 3))) AS ta,
             list_distinct(list_transform(
               range(1, GREATEST(len('fast table scan merge join order') - 2, 1) + 1),
               i -> substr('fast table scan merge join order', i, 3))) AS tb
      FROM d
    )
    SELECT doc_id,
           ROUND(1 - len(list_intersect(ta, tb))
                     * 1.0 / len(list_distinct(list_concat(ta, tb))), 6) AS dist
    FROM grams
    ORDER BY dist ASC, doc_id ASC
    LIMIT 20
    """,
)
def q155_ngram_distance(spark, sf_dir):
    """ClickHouse ngramDistance: 20 documents whose 60-char prefix has
    the closest character-3-gram profile to a probe phrase (fuzzy
    template search without an index). Exact set-Jaccard over HOF-built
    trigram arrays — per-row codegen expressions, embarrassingly
    parallel, one TakeOrdered."""
    from ed_clickhouse_spark.functions.clickhouse import ngramDistance

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 60).alias("s")
    )
    out = d.select(
        "doc_id",
        F.round(
            ngramDistance(F.col("s"), F.lit("fast table scan merge join order")), 6
        ).alias("dist"),
    )
    return out.orderBy(F.asc("dist"), F.asc("doc_id")).limit(20)


@query(
    "q173_count_substrings",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, 'scan')) AS n_scan,
           (len(string_split(text, 'the')) - 1) AS n_the,
           (CASE WHEN text LIKE '%spark%' OR text LIKE '%hash%'
                 THEN TRUE ELSE FALSE END) AS has_any
    FROM documents WHERE doc_id < 50
    """,
)
def q173_count_substrings(spark, sf_dir):
    """ClickHouse countSubstrings + multiSearchAny: occurrence counts
    and any-of-needles membership — the grep-style column predicates a
    log-analytics user runs constantly. Pure codegen expressions
    (regexp_count / split-length / LIKE-OR), no UDF, no shuffle."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("scan")).cast("bigint").alias("n_scan"),
        (F.size(F.split("text", "the", -1)) - 1).cast("bigint").alias("n_the"),
        (F.col("text").contains("spark") | F.col("text").contains("hash")).alias(
            "has_any"
        ),
    )


@query(
    "q174_transform_map",
    oracle="""
    SELECT CASE lang WHEN 'en' THEN 'english' WHEN 'de' THEN 'german'
                     WHEN 'fr' THEN 'french' ELSE 'other' END AS lang_name,
           COUNT(*) AS n
    FROM documents GROUP BY 1
    """,
)
def q174_transform_map(spark, sf_dir):
    """ClickHouse transform(x, [from...], [to...], default): inline
    value recoding (the enum-decode idiom) — expressed as the
    try_element_at over a literal map with a coalesce default, which
    Catalyst constant-folds; one aggregate after."""
    d = t(spark, sf_dir, "documents")
    mapping = F.create_map(
        F.lit("en"), F.lit("english"),
        F.lit("de"), F.lit("german"),
        F.lit("fr"), F.lit("french"),
    )
    return (
        d.select(
            F.coalesce(mapping[F.col("lang")], F.lit("other")).alias("lang_name")
        )
        .groupBy("lang_name")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q210_char_entropy",
    oracle="""
    WITH bi AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, GREATEST(len(text) - 1, 0) + 1),
               i -> substr(text, i, 2))) AS bigram
      FROM documents
    ),
    c AS (
      SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY 1, 2
    ),
    h AS (
      SELECT doc_id, SUM(c) AS n,
             ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS entropy
      FROM c GROUP BY 1
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams, entropy,
           entropy < 3.0 AS low_entropy
    FROM h
    """,
)
def q210_char_entropy(spark, sf_dir):
    """Character-bigram Shannon entropy per document — the CCNet-style
    gibberish/degenerate-text filter (low entropy = keyboard mash,
    template spam, repeated runs), complementing q82's token repetition
    and q134's unigram-LM score. Composes operators/stats.py:entropy
    grouped by doc_id over exploded bigrams: the shuffle carries
    (doc_id, 2-char gram) pairs then per-doc distinct grams — both
    doc-keyed and linear."""
    from ed_clickhouse_spark.operators.stats import entropy

    d = t(spark, sf_dir, "documents")
    grams = F.when(
        F.length("text") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("text") - 1),
            lambda i: F.col("text").substr(i, F.lit(2)),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    bi = d.select("doc_id", F.explode(grams).alias("bigram"))
    h = entropy(bi, "bigram", ["doc_id"])
    return h.select(
        "doc_id",
        F.col("n").alias("n_bigrams"),
        "entropy",
        (F.col("entropy") < 3.0).alias("low_entropy"),
    )


_FUZZY_PROBES = ["custmer", "filtre", "mrege", "qurey", "striam", "wndow"]


@query(
    "q225_fuzzy_vocab_match",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    probes(probe) AS (
      VALUES ('custmer'), ('filtre'), ('mrege'),
             ('qurey'), ('striam'), ('wndow')
    )
    SELECT probe,
           min(damerau_levenshtein(tok, probe)) AS best_dist,
           count(CASE WHEN damerau_levenshtein(tok, probe) <= 1 THEN 1 END)
             AS near1,
           count(CASE WHEN damerau_levenshtein(tok, probe) <= 2 THEN 1 END)
             AS near2
    FROM toks CROSS JOIN probes
    GROUP BY probe
    """,
)
def q225_fuzzy_vocab_match(spark, sf_dir):
    """Typo-tolerant vocabulary match via full Damerau-Levenshtein
    (ClickHouse damerauLevenshteinDistance; transpositions like
    'mrege'->'merge' cost 1 where plain levenshtein charges 2). The
    100 TB shape: dedupe the token column FIRST — the distinct shuffle
    scales with vocabulary, not corpus — then score vocab x probes with
    the Arrow-batched pandas UDF (functions/strdist.py) and aggregate.
    Fuzz-pinned byte-exact against DuckDB's damerau_levenshtein."""
    from ed_clickhouse_spark.functions.strdist import register_strdist

    register_strdist(spark)
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    probes = spark.createDataFrame(
        [(p,) for p in _FUZZY_PROBES], "probe string"
    )
    # bounded: 6 literal probe rows
    scored = toks.crossJoin(F.broadcast(probes)).select(
        "probe",
        F.call_udf("ch_damerau_levenshtein", F.col("tok"), F.col("probe")).alias(
            "dist"
        ),
    )
    return scored.groupBy("probe").agg(
        F.min("dist").alias("best_dist"),
        F.count(F.when(F.col("dist") <= 1, 1)).alias("near1"),
        F.count(F.when(F.col("dist") <= 2, 1)).alias("near2"),
    )


@query(
    "q226_jaro_winkler_rank",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    probes(probe) AS (VALUES ('qurey'), ('custmer'))
    SELECT probe, tok,
           round(jaro_winkler_similarity(tok, probe), 4) AS sim
    FROM toks CROSS JOIN probes
    WHERE jaro_winkler_similarity(tok, probe) > 0.7
    """,
)
def q226_jaro_winkler_rank(spark, sf_dir):
    """Jaro-Winkler candidate ranking for fuzzy entity resolution
    (ClickHouse jaroWinklerSimilarity: 0.1 prefix boost above the 0.7
    Jaro gate, strcmp95 floored transpositions — bit-exact with
    DuckDB's vendored RapidFuzz, so the 4-dp rounding and the 0.7
    filter agree between engines). Same vocabulary-first reduction as
    q225; the similarity filter runs AFTER the distinct, so the UDF
    touches |vocab| x |probes| rows only."""
    from ed_clickhouse_spark.functions.strdist import register_strdist

    register_strdist(spark)
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    probes = spark.createDataFrame(
        [("qurey",), ("custmer",)], "probe string"
    )
    # bounded: 2 literal probe rows
    sim = F.call_udf("ch_jaro_winkler", F.col("tok"), F.col("probe"))
    return (
        toks.crossJoin(F.broadcast(probes))
        .select("probe", "tok", sim.alias("sim_raw"))
        .filter(F.col("sim_raw") > 0.7)
        .select("probe", "tok", F.round("sim_raw", 4).alias("sim"))
    )


@query(
    "q244_heavy_hitters_audit",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
      FROM documents
    ),
    tc AS (
      SELECT token, COUNT(*) AS true_count FROM tok
      WHERE token != '' GROUP BY token
    )
    SELECT token, true_count, true AS cm_bounds_ok
    FROM tc
    ORDER BY true_count DESC, token
    LIMIT 20
    """,
)
def q244_heavy_hitters_audit(spark, sf_dir):
    """Driver-visible bound check for q80's count-min sketch (r8): the
    exact top-20 token counts are cross-checked against DuckDB (an
    exact arm — deterministic tie-break by token), and the band holds
    iff the sketch estimate obeys the CM guarantees on each: one-sided
    (est >= true) and est <= true + (e/width) * N at 3x slack
    (width=2048, depth=4 — the depth amplifies the per-row bound, so
    3x over the single-row epsilon is a tripwire, not a ceiling).
    q80 stays rows-only with the estimates as output."""
    import math

    from ed_clickhouse_spark.operators.sketch import cm_build, cm_query

    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("token"))
    # lazy 1-row total instead of an eager count() job (r11): the count
    # re-ran the whole tokenize+explode as a separate action
    totals = tok.agg(F.count(F.lit(1)).alias("__n_total"))
    eps = math.e / 2048.0
    sketch = cm_build(tok, "token")
    top = (
        tok.groupBy("token")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "token")
        .limit(20)
    )
    est = (
        cm_query(sketch, top, "token")
        .join(top, "token")
        # bounded: totals is a 1-row aggregate (corpus token count)
        .crossJoin(F.broadcast(totals))
    )
    return est.select(
        "token",
        "true_count",
        (
            (F.col("est_count") >= F.col("true_count"))
            & (
                F.col("est_count")
                <= F.col("true_count")
                + F.lit(3.0 * eps) * F.col("__n_total")
            )
        ).alias("cm_bounds_ok"),
    )
