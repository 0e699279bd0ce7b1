"""Training-data-pipeline operators beyond the dedup/similarity ladder
(Layer C): deterministic splits, degenerate-text detection, PII
scrubbing, corpus accounting, mixture weighting, sequence packing.

All pure Spark SQL expressions (codegen, no UDFs), each with a DuckDB
oracle twin in the suite — the ops a 100 TB pretraining corpus build
runs between "raw crawl" and "tokenized shards".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# PII patterns kept to the regex subset Java and RE2 (DuckDB) agree on:
# no backrefs, no lookaround. Deliberately simple, demonstration-grade —
# swap for a vetted ruleset in production.
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def hash_bucket(id_col: str | Column, buckets: int = 100) -> Column:
    """Deterministic, engine-portable bucket in [0, buckets): integer
    value of the first 4 hex chars of md5(id) mod buckets. Stable across
    Spark/DuckDB/any engine with md5 — unlike xxhash64/hash whose seeds
    are engine-specific — so a train/val/test split is reproducible by
    ANY tool that can read the table."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("bigint")
        % buckets
    )


def train_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Adds a ``split`` column (train/val/test) by hash bucket — the
    standard leakage-safe split: membership is a pure function of the id,
    so reruns, backfills, and incremental appends land rows in the same
    split without any coordination or stored assignment table."""
    b = hash_bucket(id_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def repetition_ratio(text_col: str | Column = "text", n: int = 3) -> Column:
    """Fraction of repeated word n-grams: 1 - distinct/total. High values
    flag degenerate/boilerplate text (log spam, keyword stuffing, model
    loops) — a standard pretraining quality filter. Codegen'd array
    expressions; no shuffle."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    total = F.size(grams)
    return F.when(total > 0, 1.0 - F.size(F.array_distinct(grams)) / total).otherwise(
        F.lit(0.0)
    )


def scrub_pii(text_col: str | Column = "text") -> dict[str, Column]:
    """Returns {'clean': redacted text, 'n_<kind>': match count per PII
    kind}. Patterns are applied longest-entity-first (email before ipv4 —
    an email's host part must not be half-redacted as an address)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out: dict[str, Column] = {}
    clean = c
    for kind in ("email", "phone", "ipv4"):
        pat = PII_PATTERNS[kind]
        out[f"n_{kind}"] = F.size(
            F.regexp_extract_all(clean, F.lit(pat), F.lit(0))
        ).cast("bigint")
        clean = F.regexp_replace(clean, pat, f"<{kind}>")
    out["clean"] = clean
    return out


def mixture_weights(
    df: DataFrame, dim: str = "lang", round_to: int = 6
) -> DataFrame:
    """Per-``dim`` resampling weight to reach a UNIFORM target mixture:
    weight = target_share / actual_share. The corpus-recipe primitive
    (upsample rare languages / downsample dominant sources); one tiny
    aggregate + a broadcast of the total — no data-sized shuffle."""
    counts = df.groupBy(dim).agg(F.count("*").alias("n_docs"))
    total = counts.agg(
        F.sum("n_docs").alias("__total"), F.count("*").alias("__groups")
    )
    return (
        # bounded: total is a 1-row global aggregate
        counts.crossJoin(F.broadcast(total))
        .select(
            dim,
            "n_docs",
            F.round(F.col("n_docs") / F.col("__total"), round_to).alias("share"),
            F.round(
                (F.col("__total") / F.col("__groups")) / F.col("n_docs"), round_to
            ).alias("weight"),
        )
    )


def temperature_mixture(
    df: DataFrame, dim: str = "lang", alpha: float = 0.3, round_to: int = 6
) -> DataFrame:
    """Temperature-based mixture reweighting: sampling probability
    p_i ∝ share_i^alpha — the standard multilingual-pretraining recipe
    (alpha=1 keeps the natural mixture, alpha→0 approaches uniform;
    alpha≈0.3 is the common pick that upsamples rare languages without
    drowning the head). Returns per-``dim`` natural share, tempered
    target share, and the resampling weight target/actual.

    Same cost shape as :func:`mixture_weights`: one tiny aggregate +
    a broadcast of the per-group powers — no data-sized shuffle."""
    counts = df.groupBy(dim).agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("__total"))
    # bounded: tot and powsum are 1-row global aggregates
    shared = counts.crossJoin(F.broadcast(tot)).withColumn(
        "__share", F.col("n_docs") / F.col("__total")
    )
    powsum = shared.agg(F.sum(F.pow("__share", F.lit(alpha))).alias("__z"))
    return (
        shared.crossJoin(F.broadcast(powsum))
        .select(
            dim,
            "n_docs",
            F.round("__share", round_to).alias("share"),
            F.round(
                F.pow("__share", F.lit(alpha)) / F.col("__z"), round_to
            ).alias("target_share"),
            F.round(
                (F.pow("__share", F.lit(alpha)) / F.col("__z")) / F.col("__share"),
                round_to,
            ).alias("weight"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str | Column,
    partition_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each doc a ``pack_id``: contiguous docs (ordered by
    ``order_col`` within each ``partition_col``) fill fixed token-budget
    packs — the "concat-and-chunk" packing used to build training
    sequences. pack boundary = floor(preceding-cumulative-tokens /
    budget), so a doc straddling a boundary starts the next pack's id
    (chunk-fill semantics, deterministic and expressible as one window
    cumsum in ANY engine — no sequential driver loop).

    Scale: packing is per partition key, so 100 TB packs with one
    shuffle on ``partition_col`` and no global ordering dependency."""
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = (
        W.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_cum = F.coalesce(F.sum(tok).over(w), F.lit(0))
    return df.withColumn("pack_id", F.floor(prev_cum / budget).cast("bigint"))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = True,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sliding-window document chunking: split each doc into token
    windows of ``chunk_tokens`` starting every ``stride`` tokens
    (``stride < chunk_tokens`` ⇒ overlapping chunks — the standard
    context-window / RAG-passage chunker). Returns one row per chunk:
    (id_col, [carry_cols...], chunk_idx, chunk_start, n_tok,
    [chunk_text]).

    ``carry_cols``: extra per-document columns replicated onto every
    chunk row inside the same per-row projection — zero additional
    shuffle, so carrying a dimension (e.g. ``source``) through the
    chunker is strictly cheaper at scale than re-attaching it with a
    corpus-cardinality join afterwards.

    Every doc yields >= 1 chunk (short docs produce one partial chunk);
    the final window may be shorter than ``chunk_tokens``. Chunk
    boundaries are a pure function of the token count, so reruns and
    other engines (the DuckDB oracle) produce identical chunking.

    Scale shape: chunking is per-row codegen array expressions plus one
    narrow posexplode — no shuffle at any scale; output size is
    input_tokens/stride rows. With ``keep_text=False`` only counts and
    offsets are produced (the accounting pass), so the explode never
    carries document bodies."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # last chunk start = stride * ceil((n - chunk)/stride), floored at 0
    n_extra = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)), F.lit(0)
    ).cast("int")
    starts = F.transform(
        F.sequence(F.lit(0), n_extra), lambda i: i * stride
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_tokens))
    ex = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.posexplode(chunks).alias("chunk_idx", "__chunk"),
    )
    out = ex.select(
        id_col,
        *carry_cols,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("chunk_idx") * stride).cast("bigint").alias("chunk_start"),
        F.size("__chunk").cast("bigint").alias("n_tok"),
        *([F.concat_ws(" ", "__chunk").alias("chunk_text")] if keep_text else []),
    )
    return out


def assign_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Add a ``shard`` column in [0, n_shards): the deterministic,
    engine-portable shard assignment (md5 bucketing, same mechanism as
    :func:`train_split`) used to cut a corpus into fixed training
    shards. Membership is a pure function of the id — appends, reruns,
    and other engines produce the identical sharding."""
    return df.withColumn("shard", hash_bucket(id_col, n_shards))


def export_shards(
    df: DataFrame,
    dest: str,
    n_shards: int,
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> DataFrame:
    """Write the corpus as ``n_shards`` deterministic shards
    (``shard=K/`` directories) — the final "tokenized shards" step of a
    training-data pipeline, where downstream loaders need (a) stable
    doc->shard assignment across rebuilds and (b) one directory per
    shard. Returns per-shard accounting (shard, n_docs).

    Scale shape: one hash-partitioned shuffle on the shard id, then a
    partitioned write — each shard lands as its own directory written in
    parallel. ``repartition(n_shards, shard)`` bounds output files to
    one per shard per partition-writer; no driver-side loop over shards."""
    sharded = assign_shards(df, n_shards, id_col)
    out = sharded.repartition(n_shards, "shard")
    writer = out.write.mode("overwrite").partitionBy("shard")
    if fmt == "parquet":
        writer.parquet(dest)
    elif fmt == "json":
        writer.json(dest)
    else:
        raise ValueError(f"unsupported shard format {fmt!r}")
    return sharded.groupBy("shard").agg(F.count("*").alias("n_docs"))


def word_ngrams(text_col: str | Column, n: int) -> Column:
    """Word n-grams as an array of space-joined strings (codegen'd array
    exprs, same construction as :func:`repetition_ratio`)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, " ")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing >= min_overlap
    distinct word ``n``-grams with any benchmark doc (the GPT-3/C4-style
    leakage check run before training). Returns (id_col, n_hits) where
    n_hits = count of distinct contaminated n-grams in the doc.

    Scale shape: both sides explode to (doc, gram-key) with the key being
    a 16-hex-char md5 prefix — a fixed 16-byte join key regardless of
    n-gram length, engine-portable (md5 is identical everywhere, so the
    DuckDB oracle reproduces the exact same keys — unlike xxhash64).
    The benchmark side (eval sets) is tiny relative to a 100 TB corpus:
    it is deduped to distinct grams and broadcast, so the corpus never
    shuffles. Corpus grams are distinct-ed per doc BEFORE the join, so a
    gram repeated k times in one doc contributes once, not k join rows.
    """
    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("__gram"),
        ).select(id_col, F.substring(F.md5("__gram"), 1, 16).alias("__g16"))

    bench_grams = grams(benchmark).select("__g16").distinct()
    hits = (
        grams(corpus)
        # bounded: the benchmark side is max_bench-guarded upstream
        .join(F.broadcast(bench_grams), "__g16")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
        .where(F.col("n_hits") >= min_overlap)
    )
    return hits


# C4/Gopher-style document quality rules, each a named boolean column.
# Thresholds are corpus-tuned demonstration values; swap per deployment.
def quality_rules(text_col: str | Column = "text") -> dict[str, Column]:
    """Composite rule-based quality filter. Returns named boolean rule
    columns (True = passes) plus ``q_pass`` (all rules hold). All pure
    codegen expressions — per-row, no shuffle, survives any scale."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(c, " ")
    n_words = F.size(toks)
    # mean word length without a second tokenize: non-space chars / words
    mean_wl = (F.length(c) - (n_words - 1)) / n_words
    en_stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to", "in")])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en_stop))
    rep = repetition_ratio(c, n=3)
    rules = {
        "r_wordcount": (n_words >= 10) & (n_words <= 100_000),
        "r_meanlen": (mean_wl >= 2.0) & (mean_wl <= 12.0),
        "r_stopword": stop_hits >= 2,
        "r_repetition": rep <= 0.2,
    }
    rules["q_pass"] = rules["r_wordcount"] & rules["r_meanlen"] & rules["r_stopword"] & rules["r_repetition"]
    return rules


def stratified_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows within each stratum
    by md5(id) (a fixed uniform permutation) and keep the first k. Unlike
    ``df.sampleBy`` this is engine-portable (md5), exact-k, and stable
    across reruns/appends of OTHER strata. One shuffle on the stratum key;
    per-stratum row_number never materializes more than the stratum."""
    w = W.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
