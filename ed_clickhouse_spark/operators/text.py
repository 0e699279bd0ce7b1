"""Text-analysis operators (Layer C, SURVEY.md §2): tokenization,
language-ID heuristic, quality scoring, fingerprinting — the
training-data-pipeline ops over the ``documents`` table.

All JVM-side built-ins (split / higher-order array fns / regexp);
no Python UDFs — at 100 TB these run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-overlap
# language-ID heuristic (public-knowledge lists, deliberately short).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "为"],
}

BPE_ISH_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokens (the documents table is space-separated)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def token_count(text_col: str | Column = "text") -> Column:
    """Whitespace token count without materializing the array."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.split(c, " ")).cast("bigint")


def bpe_ish_token_count(text_col: str | Column = "text") -> Column:
    """BPE-ish token estimate: alpha runs, digit runs, and single
    punctuation marks each count as one token (regexp-based)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_TOKEN_RE), F.lit(0))).cast("bigint")


def language_id(text_col: str | Column = "text") -> Column:
    """Stopword-overlap language ID: the language whose stopword list hits
    the most tokens; 'und' (undetermined) when nothing hits. Deterministic
    tie-break: higher count wins, then lexicographic language code."""
    toks = F.array_distinct(tokens(text_col))
    scored = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
                # negate the code ordering trick: array_max picks max struct
                # lexicographically (hits, code) — ties break to the LARGEST
                # code, so invert by sorting below instead.
                F.lit(code).alias("code"),
            )
            for code, ws in sorted(STOPWORDS.items())
        ]
    )
    # max by (hits asc, code desc) so ties resolve to lexicographically
    # smallest code: sort and take the element with max hits / min code.
    best = F.aggregate(
        scored,
        F.struct(F.lit(-1).alias("hits"), F.lit("zz").alias("code")),
        lambda acc, x: F.when(
            (x["hits"] > acc["hits"]),
            x,
        ).otherwise(acc),
    )
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a score
    in [0,1] — the heuristic-filter stage of a training-data pipeline."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    all_stop = F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), all_stop))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), F.lit(0)))
    avg_tok_len = F.when(
        n_tok > 0, (F.length(F.col(text_col)) - (n_tok - 1)) / n_tok
    ).otherwise(F.lit(0.0))
    score = F.round(
        F.least(F.lit(1.0), n_tok / F.lit(100.0)) * 0.5
        + F.when(avg_tok_len.between(3, 10), 0.3).otherwise(0.0)
        + F.least(F.lit(0.2), n_stop / F.lit(50.0)),
        6,
    )
    return df.select(
        "*",
        n_tok.cast("bigint").alias("n_tokens"),
        n_stop.cast("bigint").alias("n_stopwords"),
        n_punct.cast("bigint").alias("n_punct"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        score.alias("quality_score"),
    )


def fingerprint(text_col: str | Column = "text", prefix: int | None = None) -> Column:
    """Deterministic document fingerprint (md5 of normalized text) for
    exact-dup detection across shards — same spelling in any engine.

    ``prefix`` fingerprints only the first N normalized chars — the cheap
    template/boilerplate-dup tier (docs sharing a generated preamble),
    and bounds hash input for pathological multi-MB rows at 100 TB.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.trim(F.regexp_replace(c, r"\s+", " "))
    if prefix is not None:
        norm = F.substring(norm, 1, prefix)
    return F.md5(norm)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean unigram log-probability under a language model
    fit on the corpus itself — the CCNet-style "perplexity filter" proxy
    (documents far below the corpus-typical logprob are boilerplate,
    gibberish, or wrong-language; far above are repetitive). Returns
    (id_col, n_tok, avg_logprob).

    Model: P(w) = count(w) / total_tokens over the whole corpus, no
    smoothing needed (every scored token was counted, so P > 0).
    logprob uses ln.

    Scale shape: (1) token counts = explode -> two-phase groupBy count
    (the shuffle carries distinct words, not corpus tokens); (2) scoring
    joins per-doc DISTINCT words against the vocabulary (equi-join on
    the word — co-partitioned shuffle; a per-doc word appearing k times
    contributes via its in-doc count, computed before the join, so the
    join carries each (doc, word) once); (3) one final groupBy(doc).
    ln/exp stay in codegen. Everything is two-phase aggregation — at
    100 TB the vocabulary side is millions of rows, never broadcast-
    assumed; Catalyst/AQE picks the join strategy.
    """
    # (id, word, in-doc count) — counted per doc before any join. NOT
    # persisted (r12): the r11 persist was adjudicated at 100k/300k-doc
    # synthetic corpora (tools/ab_unigram_persist.py, VERDICT r11 #6) —
    # the columnar cache write of the (id, w, tf) frame costs MORE than
    # recomputing the cheap codegen explode+count per consumer (best-of
    # interleaved A/B at 100k docs: persist 5.09s, recompute 4.22s,
    # recompute+direct-total 3.25s; the driver's r11 bench read the
    # persist at 0.80x too). Two consumers re-run the explode; the cache
    # write, the InMemoryTableScan reads and the pinned executor memory
    # all go away.
    doc_words = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("w"))
        .groupBy("id", "w")
        .agg(F.count("*").alias("tf"))
    )
    vocab = doc_words.groupBy("w").agg(F.sum("tf").alias("cf"))
    # total tokens straight off the corpus: sum(size(tokens)) ==
    # sum(tf) == sum(vocab.cf) exactly (integer sums — split(text," ")
    # yields every exploded token including empties), with NO explode
    # and no (id, w) exchange in the 1-row aggregate's lineage. NULL
    # text contributes 0 (size(NULL) is -1, explode(NULL) emits none).
    total = df.agg(
        F.sum(
            F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
                F.size(tokens(text_col))
            )
        )
        .cast("bigint")
        .alias("__total")
    )
    scored = (
        doc_words.join(vocab, "w")
        # bounded: total is a 1-row aggregate
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tok"),
            (
                F.sum(F.col("tf") * F.log(F.col("cf") / F.col("__total")))
                / F.sum("tf")
            ).alias("__alp"),
        )
    )
    return scored.select(
        F.col("id").alias(id_col),
        "n_tok",
        F.round("__alp", round_to).alias("avg_logprob"),
    )


def ngram_topk(
    df: DataFrame,
    k: int = 10,
    n: int = 2,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Top-k word n-grams per group (vocabulary / phrase-frequency stats
    for corpus audits). explode -> two-phase count (map-side combine
    shrinks the shuffle to distinct grams) -> per-group row_number top-k.
    Deterministic tiebreak: count desc, then gram asc."""
    from pyspark.sql import Window as W

    from ed_clickhouse_spark.operators.llmdata import word_ngrams

    counts = (
        df.select(group_col, F.explode(word_ngrams(text_col, n)).alias("gram"))
        .groupBy(group_col, "gram")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy(group_col).orderBy(F.desc("n"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def zipf_slope(
    df: DataFrame, text_col: str = "text", top_n: int = 1000, round_to: int = 6
) -> DataFrame:
    """Zipf-law audit of a corpus: OLS slope of ln(freq) on ln(rank)
    over the ``top_n`` most frequent tokens (a healthy natural-language
    corpus sits near −1; templated/synthetic text drifts toward 0, a
    fast distribution-shift detector for training-data intake). One
    row: (n_tokens, slope, intercept).

    Scale shape: explode → token-keyed count (rows shuffle once as
    tokens), TakeOrderedAndProject down to ``top_n`` rows (freq desc,
    token asc — deterministic under ties), then the regression runs on
    the tiny top-N table; the double moment sums span only ``top_n``
    terms, absorbed by rounding."""
    from ed_clickhouse_spark.operators.text import tokens

    counts = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(top_n)
    )
    from pyspark.sql import Window as W

    ranked = counts.withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("c"), F.asc("tok")))
    ).select(F.log("r").alias("lx"), F.log("c").alias("ly"))
    m = ranked.agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(slope, round_to).alias("slope"),
        F.round(
            F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"), round_to
        ).alias("intercept"),
    )
