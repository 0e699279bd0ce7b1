"""Deduplication operators (Layer C): exact, n-gram Jaccard, MinHash+LSH,
SimHash — the dedup ladder of a 100 TB training-data pipeline.

Design: every variant reduces to groupBy/join on a *derived key* (hash,
band bucket, simhash prefix) so the heavy lifting is a co-partitioned
shuffle, never a cross join. Exact Jaccard is kept for verification and
as the DuckDB-oracle-able query; MinHash/SimHash are the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.text import fingerprint

# MinHash parameters: h_i(x) = (a_i * x + b_i) mod P. P is the Mersenne
# prime 2^31-1 so a*x stays under 2^63 (Spark 4 runs ANSI arithmetic —
# a silent overflow would instead be a runtime error).
_P = (1 << 31) - 1
_N_HASHES = 32
_N_BANDS = 8  # 8 bands x 4 rows: catches Jaccard >~ 0.5 w.h.p.
# Deterministic (a, b) pairs — fixed seed, public mix constants.
_AB = [
    (((2 * i + 1) * 0x9E3779B9) % _P or 1, ((i * 0xBF58476D) + 7) % _P)
    for i in range(_N_HASHES)
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: canonical row per distinct text = the min id.
    groupBy on a fingerprint hash (not the full text) so the shuffle key
    is 16 bytes, not the document body.

    One hash aggregate: ``min_by(struct(<row>), id)`` picks the min-id
    row and ``count(*)`` the duplicate count, with map-side partial
    aggregation — the exchange carries at most one candidate row per
    fingerprint per map task. The previous two-window form (row_number +
    count over __fp) shuffled EVERY row and sorted each fingerprint
    group (guide §2.3 "aggregate before you shuffle"). Identical output:
    ids are unique, so min_by's winner is the row_number-1 row."""
    fp = fingerprint(text_col)
    cols = df.columns
    return (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(
            F.min_by(F.struct(*[F.col(c) for c in cols]), F.col(id_col)).alias(
                "__row"
            ),
            F.count("*").alias("dup_count"),
        )
        .select(*[F.col(f"__row.{c}").alias(c) for c in cols], "dup_count")
    )


def shingles(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a space-separated text column."""
    toks = F.split(F.col(text_col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard >= thr).

    Plan: explode distinct shingles -> xxhash64 (8-byte key instead of
    the 3-word string) -> ONE groupBy(shingle) collecting the (sorted,
    df-capped) posting list -> generate each shingle's C(k,2) ordered
    pairs narrowly with array HOFs -> groupBy pair, count
    co-occurrences -> jaccard = inter / (|A| + |B| - inter).

    The posting-list formulation replaced a hash self-join on the
    shingle (measured at sf0.1/local[32]: 2.0s vs 2.6s steady, 3.0s vs
    6.2s cold): the single groupBy(sh) exchange subsumes both join
    sides, pair generation happens inside the partition, and the df-cap
    becomes a free ``size(ids) <= max_df`` filter instead of a separate
    count + broadcast anti-join pass over the shingle frame.

    ``max_df``: ignore shingles whose document frequency exceeds it (the
    standard stopword-shingle cap). A shingle shared by k docs
    contributes k^2/2 candidate pairs, so boilerplate shingles make pair
    generation quadratic on templated corpora; capping df bounds any
    single shingle's contribution at max_df^2/2. The cap applies to both
    intersection and sizes — semantics become "Jaccard over shingles
    with df <= max_df", identically mirrored in the SQL oracle.

    The grouped posting-list frame (one row per distinct shingle) is
    persisted: it feeds both the pair generation and the per-doc size
    counts. The cache stays pinned as long as the returned (lazy)
    DataFrame may be re-executed; long-lived sessions running many such
    queries should ``spark.catalog.clearCache()`` after materializing
    the result (bench.py does).

    Measured note: ppjoin-style prefix filtering (index only the first
    n - ceil(t*n) + 1 sorted hashes, verify via array_intersect on full
    signatures) was implemented and benchmarked SLOWER at t=0.5 on this
    corpus (6.2s vs 4.9s at sf0.1): the candidate-pair dedup shuffle
    matches the plain pair-count shuffle while the signature arrays add
    build cost. Prefix filtering pays at high thresholds (>=0.8) on long
    documents; for low-threshold sweeps at 100 TB, prune with
    minhash_lsh_pairs first and use this as the exact verifier.
    """
    from ed_clickhouse_spark.operators._cache import pin

    sh = _spread(df).select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, n)).alias("__s")
    ).select("id", F.xxhash64("__s").alias("sh"))
    grouped = sh.groupBy("sh").agg(F.sort_array(F.collect_list("id")).alias("ids"))
    if max_df is not None:
        grouped = grouped.where(F.size("ids") <= max_df)
    grouped = pin(grouped)
    sizes = (
        grouped.select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_sh"))
    )
    # every ordered pair within a posting list, generated in-partition
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = pin(
        grouped.where(F.size("ids") > 1)
        .select(F.explode(combos).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    # `sizes` is one row per document (corpus cardinality) — broadcasting it
    # whole would OOM the driver at 10^9 docs.  But only ids that survived
    # candidate generation matter for the jaccard denominator, so semi-join
    # sizes down to the pair-id set first (post df-cap the pair set is the
    # *output* scale, orders of magnitude below the corpus).  `pairs` is
    # persisted above so the semi-join branch reuses the materialized pair
    # frame instead of re-running the posting-list exchange.
    # No .distinct(): left_semi is duplicate-insensitive, so deduping the
    # probe side only shrank the broadcast build a little while costing a
    # full exchange + aggregate over 2x|pairs| rows (r12, guide §2.4 "a
    # distinct on data that [need not be] unique"). The union is a narrow
    # projection of the persisted pair frame; the semi join's hash build
    # dedups keys as it builds.
    pair_ids = pairs.select(F.col("id_a").alias("id")).union(
        pairs.select(F.col("id_b").alias("id"))
    )
    # persisted: both the n_a and n_b lookups read it, and the persist
    # keeps the semi-join from running once per branch (pair-set-sized,
    # so the cache is output-scale).
    sizes_small = pin(sizes.join(pair_ids, "id", "left_semi"))
    # No forced broadcast: the semi-joined frame is usually tiny
    # (<= 2x|pairs| ids), but that bound is data-dependent — on a
    # pathologically duplicate-heavy corpus the pair set itself is large
    # and a forced hint would OOM where a plain equi-join degrades
    # gracefully.  AQE sees the materialized (persisted) size at runtime
    # and picks broadcast exactly when it is safe.
    sa = sizes_small.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes_small.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _spread(df: DataFrame) -> DataFrame:
    """Local-parallelism guard for compute-bound derived-key builds
    (shingling, per-shingle hashing): a small input that arrives as one
    or two parquet splits would otherwise run its whole CPU-heavy
    projection on one core. Repartition only when the input has far
    fewer partitions than the cluster has slots — at 100 TB the input
    arrives in thousands of splits and this is a no-op, so no giant
    document-body shuffle is ever introduced at scale. (Measured at
    sf0.1/local[32]: 2.5x on the minhash signature build, 1.6x on
    jaccard_pairs.)"""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 4 <= target:
        return df.repartition(target)
    return df


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """MinHash signatures: shingle -> xxhash64 -> k permutations
    h_i = (a_i*x+b_i) mod P -> min per permutation.

    Implemented as explode -> groupBy(id) with k partial-min aggregates.
    Partial mins combine map-side (explode is narrow, so each doc's
    shingles stay in one partition and the exchange carries exactly one
    k-long row per doc). Two alternatives were implemented and measured
    SLOWER at equal parallelism (sf0.1, 32 partitions): (a) k
    array_min(transform(...)) folds in a projection — 1.95s vs 0.72s,
    the generated code for 32 lambda folds abandons whole-stage codegen;
    (b) one F.aggregate fold with a k-long accumulator array — 1.80s,
    per-element array allocation dominates. Keep the shuffle; it's tiny.

    Note: a doc with no shingles (empty text) has no signature row."""
    # Hash INSIDE the array transform so the explode carries 8-byte longs,
    # not 3-word shingle strings (measured ~10% on the signature build).
    # The 32 permutation-min aggregates and the final array are JVM-parsed
    # expr() strings — built column-by-column they cost ~130 Py4J round
    # trips of driver-side plan construction per query (~0.5s cold, r10).
    harr = F.transform(shingles(text_col, n), lambda s: F.pmod(F.xxhash64(s), F.lit(_P)))
    hashes = _spread(df).select(F.col(id_col).alias("id"), F.explode(harr).alias("h"))
    mins = hashes.groupBy("id").agg(
        *[
            F.expr(f"min((h * {a}L + {b}L) % {_P}L)").alias(f"__m{i}")
            for i, (a, b) in enumerate(_AB)
        ]
    )
    arr = ", ".join(f"__m{i}" for i in range(_N_HASHES))
    return mins.select("id", F.expr(f"array({arr})").alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_bands: int = _N_BANDS,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on
    (band_idx, band_hash). Only same-bucket docs meet — the shuffle key is
    the band hash, so cost scales with collisions, not n^2. Returns
    candidate pairs with their estimated (signature) Jaccard.

    The banded index frame (and its pinned signature cache) comes from
    :func:`banded_signatures` — see there for the persist contract."""
    sigs, bands = _sigs_and_bands(df, id_col, text_col, n, n_bands)
    # The self-join carries only the 3-long key rows (id, band, bh) —
    # the 32-long signature arrays do NOT ride the band exchange (r10;
    # previously each sig shuffled n_bands times through the join and
    # the r8 fix only kept it out of the dedup exchange). Pairs dedup
    # on bare ids, then the persisted signature frame joins back once
    # per side to compute est — AQE broadcasts it at local scale, and
    # at cluster scale each sig ships once per side instead of once
    # per band. est is unchanged (same formula over the same sigs), so
    # the output is bit-identical to the pre-r10 plan. Measured at
    # sf0.1/local[32] best-of-4: 1.74s -> see COVERAGE r10 note.
    key = bands.select("id", "band", "bh")
    a = key.alias("a")
    b = key.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(float(_N_HASHES)),
        6,
    )
    return (
        cand.join(
            sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .select("id_a", "id_b", est.alias("est_jaccard"))
    )


def banded_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_bands: int = _N_BANDS,
) -> DataFrame:
    """(id, sig, band, bh) rows: the LSH band index of each document —
    ``n_bands`` rows per doc, ``bh`` the hash of that band's signature
    slice. This is both the candidate key frame of
    :func:`minhash_lsh_pairs` and the persistent incremental index of
    the streaming near-dup gate (streaming/corpus.py), so batch and
    stream agree bit-for-bit on candidate buckets."""
    return _sigs_and_bands(df, id_col, text_col, n, n_bands)[1]


def _sigs_and_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_bands: int = _N_BANDS,
) -> tuple[DataFrame, DataFrame]:
    """The persisted signature frame AND its banded explode.

    Signatures are persisted before banding: the pair query reads them
    again to compute est after the candidate join, and without the
    persist the whole explode+32-min build runs per consumer (measured
    ~2x end-to-end). The cache stays pinned for the lifetime of
    derived lazy frames — long-lived sessions should
    ``spark.catalog.clearCache()`` after materializing."""
    from ed_clickhouse_spark.operators._cache import pin

    rows_per_band = _N_HASHES // n_bands
    sigs = pin(minhash_signatures(df, id_col, text_col, n))
    # one JVM-parsed expr for the band array (vs ~100 Py4J column
    # builds: 8 bands x (4 element_at casts + concat_ws + xxhash64))
    band_structs = ", ".join(
        "named_struct('band', {i}, 'bh', xxhash64(concat_ws(',', {parts})))".format(
            i=i,
            parts=", ".join(
                f"CAST(element_at(sig, {i * rows_per_band + j + 1}) AS STRING)"
                for j in range(rows_per_band)
            ),
        )
        for i in range(n_bands)
    )
    bands = sigs.select(
        "id", "sig", F.expr(f"explode(array({band_structs}))").alias("b")
    ).select("id", "sig", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    return sigs, bands


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sum +/-1 weighted
    by token-hash bit, sign -> bit.

    Shape: explode distinct-token hashes once, then 64 partial-sum bit
    counters in ONE groupBy (map-side combine; shuffle = 65 longs/doc).
    The previous form — 64 filter() lambdas over the token array inside
    a single projection — rescanned the array per bit and paid ~130 Py4J
    expression builds; this is a single pass and all codegen (the bit
    aggregates are expr() strings, parsed JVM-side in one call)."""
    hashes = F.transform(
        F.array_distinct(F.split(F.col(text_col), " ")), lambda tok: F.xxhash64(tok)
    )
    ex = df.select(F.col(id_col).alias("id"), F.explode(hashes).alias("h"))
    counts = ex.groupBy("id").agg(
        F.count("*").alias("n"),
        *[F.expr(f"sum(shiftrightunsigned(h, {i}) & 1)").alias(f"c{i}") for i in range(64)],
    )
    # bit i of the simhash = 1 iff the majority of token hashes set bit i
    terms = " + ".join(
        f"IF(c{i} * 2 > n, CAST({(1 << i) if i < 63 else -(1 << 63)} AS BIGINT), "
        f"CAST(0 AS BIGINT))"
        for i in range(64)
    )
    return counts.select("id", F.expr(terms).alias("simhash"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair list: every doc that
    appears in ``pairs`` gets a ``cluster_id`` = the min doc id reachable
    through the pair graph. This is the step that turns pairwise near-dup
    findings into actionable dedup groups ("keep one doc per cluster") —
    the reference's pipeline stops at ClickHouse, which has no iterative
    operator at all, so this is a capability extension in the same style
    as the dedup ladder it feeds.

    Algorithm: min-label propagation with pointer doubling. Start each
    node at its own id; each round every node takes the min of its
    label, its neighbors' labels, and its label's label (the doubling
    jump — chains compress quadratically, so rounds are O(log diameter)
    rather than O(diameter)). Near-dup components are dense and shallow
    (a cluster of k near-identical docs is close to a clique), so
    typically 2-3 rounds even at corpus scale.

    Scale shape: one round = one equi-join (edges x labels, keyed on
    node id) + one groupBy-min (keyed on node id) + one labels self-join
    (the jump) — all co-partitioned shuffles on the 8-byte id, never
    all-pairs. Labels are LAZILY localCheckpoint'ed every round and
    materialized by the convergence probe, so a round costs exactly ONE
    Spark job (measured 3x faster end-to-end than the eager
    checkpoint-then-probe version on small graphs, where per-job
    overhead dominates) and round k never replans a k-join lineage.
    """
    spark = pairs.sparkSession
    # pin the pair list BEFORE symmetrizing: the union reads it twice,
    # and the upstream candidate join (shingle/LSH) is the expensive
    # part — without this pin it executes once per union branch
    # (measured ~1.4s of the 4.2s end-to-end at sf0.1)
    pairs = pairs.persist()
    # Size the iteration's shuffles to the GRAPH, not the corpus: the
    # edge list is orders of magnitude smaller than the documents that
    # produced it (only near-dup members appear), so inheriting the
    # session's corpus-scale shuffle width makes every round pay task
    # overhead for mostly-empty partitions. One pair count (it also
    # materializes the persist) picks ~1 partition per 100k edges —
    # at 100 TB a billion-edge graph still gets thousands of partitions.
    # Counting PAIRS (n_edges = exactly 2x) keeps the symmetrized union
    # out of the fast path entirely: it is built and persisted only when
    # the distributed iteration actually needs it (r11 — previously the
    # union materialized just to be counted).
    n_edges = 2 * pairs.count()
    # Adaptive small-graph fast path: the iterative rounds each cost a
    # full Spark job, which dominates when the pair graph is tiny (the
    # common case — near-dup pairs are a sliver of the corpus). The
    # edge count above is already materialized, so the branch is free:
    # under the bound (default 1M edges ~ 16 MB of longs; 0 disables),
    # collect the edges and run driver-side union-find with min-root
    # labels — identical output (cluster_id = min reachable id) by
    # construction. Above the bound, the distributed pointer-doubled
    # propagation below is the scale path; this is a GUARDED collect in
    # the max_queries style, never corpus-sized.
    cc_max = int(spark.conf.get("spark.ed.cc_collect_max_edges", "1000000"))
    if 0 < n_edges <= cc_max:
        try:
            rows = pairs.select(
                F.col(id_a).cast("long"), F.col(id_b).cast("long")
            ).collect()
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:
                    parent[x], x = r, parent[x]
                return r

            for a, b in rows:
                ra, rb = find(a), find(b)
                if ra != rb:
                    # min root wins, preserving cluster_id = min id
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            out = [(n, find(n)) for n in
                   {x for r in rows for x in r}]
            return spark.createDataFrame(
                out, "id long, cluster_id long"
            )
        finally:
            pairs.unpersist()
    sym = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .persist()
    )
    iter_parts = str(
        max(
            2,
            min(
                int(spark.conf.get("spark.sql.shuffle.partitions")),
                n_edges // 100_000 + 2,
            ),
        )
    )
    from ed_clickhouse_spark.operators.rollup import _conf

    try:
        with _conf(spark, "spark.sql.shuffle.partitions", iter_parts):
            labels = (
                sym.select(F.col("src").alias("id"))
                .distinct()
                .select("id", F.col("id").alias("lbl"))
                .localCheckpoint(eager=False)
            )
            for _ in range(max_iter):
                nbr_min = (
                    sym.join(labels, sym["src"] == labels["id"])
                    .groupBy(F.col("dst").alias("nid"))
                    .agg(F.min("lbl").alias("nbr_lbl"))
                )
                prop = labels.join(
                    nbr_min, labels["id"] == nbr_min["nid"], "left"
                ).select(
                    labels["id"],
                    F.least(
                        F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                    ).alias("lbl"),
                    labels["lbl"].alias("__old"),
                )
                # pointer doubling: lbl := min(lbl, lbl(lbl)). Every lbl
                # is itself a node id, so the self-join always matches.
                jump = prop.select(
                    F.col("id").alias("jid"), F.col("lbl").alias("jlbl")
                )
                new = (
                    prop.join(jump, prop["lbl"] == jump["jid"], "left")
                    .select(
                        "id",
                        F.least(
                            F.col("lbl"), F.coalesce(F.col("jlbl"), F.col("lbl"))
                        ).alias("lbl"),
                        "__old",
                    )
                    .localCheckpoint(eager=False)
                )
                # one action per round: the probe materializes the lazy
                # checkpoint AND answers "did any label change". A full
                # count, not limit(1): an early-exit probe would compute
                # only one partition, leaving the checkpoint unmaterialized
                # and the lineage growing round over round.
                changed = new.filter(F.col("lbl") != F.col("__old")).count()
                labels = new.drop("__old")
                if changed == 0:
                    break
    finally:
        sym.unpersist()
        pairs.unpersist()
    return labels.select("id", F.col("lbl").alias("cluster_id"))


def excise_repeated_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Span-level dedup CUT (the exact-substring-dedup family, word
    n-gram granularity): remove every n-token passage that appears in
    >= ``min_docs`` distinct documents from all docs EXCEPT the lowest
    ``id_col`` holder (the canonical first copy keeps its text).  Docs
    shorter than ``n`` tokens carry no grams and pass through intact.

    Returns (id_col, clean_text, n_removed) for EVERY input doc;
    overlapping duplicated spans union through the distinct
    (doc, position) cover set, so excision never double-counts.

    Scale shape — every stage is linear with bounded shuffle keys:
    grams hash to a 16-hex md5 prefix BEFORE the gram shuffle (the
    q101_repeated_passages discipline); the cover set explodes only
    DUPLICATED gram occurrences (n small ints each); the token
    anti-join and the rebuild both key on (doc, position) /
    doc — no stage ever carries passage strings through an exchange.
    """
    toks = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    sz = F.size("__toks")
    starts = F.when(
        sz >= n, F.sequence(F.lit(0), sz - n)
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    grams = base.select(
        id_col,
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.substring(
                        F.md5(F.concat_ws(" ", F.slice("__toks", i + 1, n))),
                        1,
                        16,
                    ).alias("gram_key"),
                ),
            )
        ).alias("g"),
    ).select(
        id_col, F.col("g.pos").alias("pos"), F.col("g.gram_key").alias("gram_key")
    )
    dup = (
        grams.select(id_col, "gram_key")
        .distinct()
        .groupBy("gram_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("__keeper"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select("gram_key", "__keeper")
    )
    covered = (
        grams.join(dup, "gram_key")
        .filter(F.col(id_col) != F.col("__keeper"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    tok_rows = base.select(
        id_col, F.posexplode("__toks").alias("pos", "tok")
    )
    kept = tok_rows.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("__n_kept"),
    )
    return (
        df.select(id_col, F.size(toks).alias("__n_tok"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("__n_tok") - F.coalesce("__n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )
