"""Statistical aggregates (ClickHouse's statistics family): entropy,
Cramér's V, Welch's t-test, Mann-Whitney U, Spearman rank correlation,
Kolmogorov-Smirnov, Theil's U — the corpus-audit / A-B-readout
functions a ClickHouse user runs over event tables (CH: ``entropy``,
``cramersV``, ``welchTTest``, ``mannWhitneyUTest``, ``rankCorr``,
``kolmogorovSmirnovTest``, ``theilsU``).

All are one- or two-shuffle decompositions over counts and exact
decimal power sums (the q51/q52 moment pattern): no sorting, no raw-row
collection, deterministic at any scale. Transcendental steps (ln, sqrt)
run on already-aggregated cells, so cross-engine float drift is bounded
by one function application, absorbed by output rounding.

The rank-based tests (Mann-Whitney, Spearman, KS) never globally sort
raw rows: ranks compress to per-DISTINCT-VALUE counts first (the
``quantile_exact_weighted`` trick), so the one unavoidable ordered pass
runs over value cardinality, not row count — a measure with bounded
precision (2-dp doubles, token counts, scores) has bounded distinct
values no matter how many rows the corpus holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec(col, scale: int = 4):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(28,{scale})")


def entropy(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Shannon entropy (nats) of ``value_col``'s empirical distribution
    per group — ClickHouse ``entropy(x)``. H = ln(n) - Σ c·ln(c) / n
    over per-value counts c: two two-phase count aggregates; the
    shuffle carries distinct values, never rows."""
    group_cols = group_cols or []
    counts = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("__c"))
    agg = counts.groupBy(*group_cols).agg(
        F.sum("__c").alias("__n"),
        F.sum(F.col("__c") * F.log("__c")).alias("__clnc"),
    )
    h = F.log("__n") - F.col("__clnc") / F.col("__n")
    return agg.select(
        *group_cols,
        F.col("__n").cast("bigint").alias("n"),
        F.round(h, round_to).alias("entropy"),
    )


def cramers_v(
    df: DataFrame, col_a: str, col_b: str, round_to: int = 6
) -> DataFrame:
    """Cramér's V association between two categorical columns —
    ClickHouse ``cramersV(a, b)``. One row: (n, chi2, v).

    χ² over the full contingency table without materializing zero
    cells: χ² = Σ_observed[(o-e)²/e] + (n - Σ_observed e), since every
    unobserved cell contributes exactly e and Σ_all e = n. Shuffles
    carry the observed cells + the two marginal vectors only."""
    cells = df.groupBy(col_a, col_b).agg(F.count("*").alias("o"))
    ra = cells.groupBy(col_a).agg(F.sum("o").alias("ra"))
    cb = cells.groupBy(col_b).agg(F.sum("o").alias("cb"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct(col_a).alias("r"),
        F.countDistinct(col_b).alias("c"),
    )
    joined = (
        # bounded: marginals have one row per category; tot is 1 row
        cells.join(F.broadcast(ra), col_a)
        .join(F.broadcast(cb), col_b)
        .crossJoin(F.broadcast(tot))
        .withColumn("e", F.col("ra") * F.col("cb") / F.col("n"))
    )
    parts = joined.groupBy("n", "r", "c").agg(
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias(
            "__obs"
        ),
        F.sum("e").alias("__esum"),
    )
    chi2 = F.col("__obs") + (F.col("n") - F.col("__esum"))
    v = F.sqrt(
        chi2 / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
    )
    return parts.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(chi2, round_to).alias("chi2"),
        F.round(v, round_to).alias("v"),
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups — ClickHouse
    ``welchTTest(x, g)``. One row: (n_a, n_b, mean_a, mean_b, t_stat,
    df) with Welch–Satterthwaite degrees of freedom.

    Means/variances come from exact decimal power sums in ONE grouped
    aggregate (the q51 moment pattern) — order-independent, one
    shuffle, no second pass."""
    filt = df.filter(F.col(group_col).isin([group_a, group_b]))
    s = filt.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(_dec(value_col)).cast("double").alias("sx"),
        F.sum(_dec(value_col) * _dec(value_col)).cast("double").alias("sx2"),
    )
    s = s.select(
        group_col,
        "n",
        (F.col("sx") / F.col("n")).alias("m"),
        ((F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    a = s.filter(F.col(group_col) == group_a).select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"), F.col("var").alias("v_a")
    )
    b = s.filter(F.col(group_col) == group_b).select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"), F.col("var").alias("v_b")
    )
    j = a.crossJoin(b)
    se_a = F.col("v_a") / F.col("n_a")
    se_b = F.col("v_b") / F.col("n_b")
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se_a + se_b)
    dof = (se_a + se_b) * (se_a + se_b) / (
        se_a * se_a / (F.col("n_a") - 1) + se_b * se_b / (F.col("n_b") - 1)
    )
    return j.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round("m_a", round_to).alias("mean_a"),
        F.round("m_b", round_to).alias("mean_b"),
        F.round(t, round_to).alias("t_stat"),
        F.round(dof, round_to).alias("df"),
    )


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's conservative size estimate for a frame — the
    optimized plan's ``sizeInBytes`` statistic, which for file sources
    derives from the scanned files' on-disk footprint and only shrinks
    through explicit selectivity hints. Driver-side metadata only (no
    job). Returns a huge sentinel when statistics are unavailable so
    callers fall back to the scale-safe path."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return 1 << 62


def _range_cumsum(
    df: DataFrame,
    value_col: str,
    sum_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """Distributed prefix sums over rows ordered by ``value_col`` — the
    two-pass range-partitioned cumsum, NOT a single-partition global
    window (which would serialize when the value domain is large, e.g.
    continuous scores where distinct ~= rows):

    1. range-partition on the value (partition i holds the i-th value
       range, so partition ids are monotone in the sort order);
    2. cumsum within each partition — a *partitioned* window, parallel;
    3. add per-partition offsets derived from the tiny one-row-per-
       partition totals frame via a broadcast triangular join
       (offset(p) = sum of totals of partitions < p).

    The totals branch and the main branch share one range-partitioning
    exchange: RangePartitioner samples with deterministic seeds and
    ReuseExchange dedupes the identical subtree, so both branches read
    the same materialized shuffle and see identical partition ids.
    Adds one ``__cum_<col>`` per entry of ``sum_cols``; ``inclusive=
    False`` gives the exclusive prefix (the #[x < v] shape midranks
    need).

    Adaptive small-input fast path: the two-pass shape pays a fixed
    multi-stage cost (range sampling + triangular offset join) that a
    small count-compressed input doesn't justify, so when Catalyst's
    plan statistics bound the input below
    ``spark.ed.rank_cumsum_small_bytes`` (default 64 MB — comfortably
    one window task) the prefix sums run as a single ordered window
    instead. The decision is driver-side and job-free: ``sizeInBytes``
    propagates conservatively from the file-scan footprint, so a 100 TB
    scan can never be misclassified as small, and both paths produce
    identical results by construction. ``0`` disables the fast path
    (the plan tests pin the range-partitioned shape this way)."""
    from pyspark.sql import Window as W

    spark = df.sparkSession
    end = 0 if inclusive else -1
    small_bytes = int(
        spark.conf.get("spark.ed.rank_cumsum_small_bytes", str(64 * 1024 * 1024))
    )
    if small_bytes > 0 and _plan_size_bytes(df) <= small_bytes:
        w = W.orderBy(value_col).rowsBetween(W.unboundedPreceding, end)
        out = df
        for c in sum_cols:
            out = out.withColumn(
                f"__cum_{c}", F.coalesce(F.sum(c).over(w), F.lit(0))
            )
        return out
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = df.repartitionByRange(n_part, F.col(value_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    tot = parts.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols]
    )
    off = (
        tot.alias("a")
        .join(
            # bounded: tot has one row per shuffle partition
            F.broadcast(tot.alias("b")),
            F.col("b.__pid") < F.col("a.__pid"),
            "left",
        )
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(
            *[
                F.coalesce(F.sum(F.col(f"b.__t_{c}")), F.lit(0)).alias(f"__off_{c}")
                for c in sum_cols
            ]
        )
    )
    end = 0 if inclusive else -1
    w = (
        W.partitionBy("__pid")
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, end)
    )
    # bounded: off has one row per shuffle partition
    out = parts.join(F.broadcast(off), "__pid")
    for c in sum_cols:
        out = out.withColumn(
            f"__cum_{c}",
            F.coalesce(F.sum(c).over(w), F.lit(0)) + F.col(f"__off_{c}"),
        )
    return out.drop("__pid", *[f"__off_{c}" for c in sum_cols])


def _rank_map(counts: DataFrame, value_col: str) -> DataFrame:
    """Average (midrank) per distinct value from per-value counts:
    rank(v) = #[x < v] + (#[x = v] + 1) / 2. The running count is the
    range-partitioned cumsum over distinct values — parallel even when
    the measure is continuous and distinct ~= rows."""
    out = _range_cumsum(counts, value_col, ["__c"], inclusive=False)
    return out.withColumn(
        "__rank", F.col("__cum___c") + (F.col("__c") + 1) / 2.0
    ).drop("__cum___c")


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two groups — ClickHouse
    ``mannWhitneyUTest(x, g)``. One row: (n_a, n_b, u, z) where ``u``
    is group A's U statistic and ``z`` its tie-corrected normal
    approximation.

    Scale shape: one groupBy(value) count (rows shuffle once, keyed on
    the measure), one distinct-value window for midranks, one scalar
    aggregate. R_a = Σ c_a(v)·rank(v); U_a = R_a − n_a(n_a+1)/2;
    σ² = (n_a·n_b/12)·[(n+1) − Σ(c³−c)/(n(n−1))] (tie correction)."""
    filt = df.filter(F.col(group_col).isin([group_a, group_b]))
    counts = filt.groupBy(value_col).agg(
        F.count("*").alias("__c"),
        F.count(F.when(F.col(group_col) == group_a, 1)).alias("__ca"),
    )
    ranked = _rank_map(counts, value_col)
    agg = ranked.agg(
        F.sum("__ca").alias("n_a"),
        F.sum(F.col("__c") - F.col("__ca")).alias("n_b"),
        F.sum(F.col("__ca") * F.col("__rank")).alias("r_a"),
        F.sum(F.col("__c") * F.col("__c") * F.col("__c") - F.col("__c")).alias("__t"),
    )
    n = F.col("n_a") + F.col("n_b")
    u = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    sigma = F.sqrt(
        F.col("n_a")
        * F.col("n_b")
        / 12.0
        * ((n + 1) - F.col("__t") / (n * (n - 1)))
    )
    # sigma is 0 when EVERY observation ties (the tie correction removes
    # all variance): z is undefined — NULL, not a divide-by-zero (which
    # ANSI mode turns into a runtime error). Found by the hypothesis
    # property test on a=[0,0], b=[0,0].
    z = F.when(sigma > 0, (u - F.col("n_a") * F.col("n_b") / 2.0) / sigma)
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(u, round_to).alias("u"),
        F.round(z, round_to).alias("z"),
    )


def rank_corr(
    df: DataFrame, col_x: str, col_y: str, round_to: int = 6
) -> DataFrame:
    """Spearman rank correlation — ClickHouse ``rankCorr(x, y)``. One
    row: (n, rho). Midranks for each column come from its per-value
    count table (two distinct-value windows); rows join back to the two
    rank maps by value (equi-joins, broadcast-eligible while the value
    domains stay small), then Pearson over the rank pairs from one
    exact moment aggregate — ranks are exact multiples of 0.5, so
    decimal power sums are order-independent."""
    rx = _rank_map(
        df.groupBy(col_x).agg(F.count("*").alias("__c")), col_x
    ).select(col_x, F.col("__rank").alias("__rx"))
    ry = _rank_map(
        df.groupBy(col_y).agg(F.count("*").alias("__c")), col_y
    ).select(col_y, F.col("__rank").alias("__ry"))
    j = df.select(col_x, col_y).join(rx, col_x).join(ry, col_y)
    dx = _dec("__rx", 1)
    dy = _dec("__ry", 1)
    m = j.agg(
        F.count("*").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    rho = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(rho, round_to).alias("rho"),
    )


def kolmogorov_smirnov(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov — ClickHouse
    ``kolmogorovSmirnovTest(x, g)``. One row: (n_a, n_b, d, ks) where
    ``d`` = sup |ECDF_a − ECDF_b| and ``ks`` = √(n_a·n_b/(n_a+n_b))·d.

    ECDFs step only at observed values, so the sup is attained at a
    distinct value: per-value group counts, one range-partitioned
    cumsum for the two running totals (parallel even on continuous
    measures), one max."""
    filt = df.filter(F.col(group_col).isin([group_a, group_b]))
    counts = filt.groupBy(value_col).agg(
        F.count(F.when(F.col(group_col) == group_a, 1)).alias("__ca"),
        F.count(F.when(F.col(group_col) == group_b, 1)).alias("__cb"),
    )
    cum = _range_cumsum(counts, value_col, ["__ca", "__cb"]).select(
        F.col("__cum___ca").alias("__cum_a"),
        F.col("__cum___cb").alias("__cum_b"),
    )
    tot = filt.agg(
        F.count(F.when(F.col(group_col) == group_a, 1)).alias("n_a"),
        F.count(F.when(F.col(group_col) == group_b, 1)).alias("n_b"),
    )
    # bounded: tot is a 1-row aggregate
    d = cum.crossJoin(F.broadcast(tot)).agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.max(
            F.abs(F.col("__cum_a") / F.col("n_a") - F.col("__cum_b") / F.col("n_b"))
        ).alias("__d"),
    )
    return d.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round("__d", round_to).alias("d"),
        F.round(
            F.sqrt(F.col("n_a") * F.col("n_b") / (F.col("n_a") + F.col("n_b")))
            * F.col("__d"),
            round_to,
        ).alias("ks"),
    )


def theils_u(df: DataFrame, col_a: str, col_b: str, round_to: int = 6) -> DataFrame:
    """Theil's uncertainty coefficient U(a|b) — ClickHouse
    ``theilsU(a, b)`` (asymmetric: how much knowing b reduces the
    entropy of a). One row: (n, u).

    U = (H(a) − H(a|b)) / H(a) with H(a) = ln n − Σ c_a ln c_a / n and
    H(a|b) = (Σ c_b ln c_b − Σ c_ab ln c_ab) / n — all three from the
    contingency cell counts and the two marginals, same shuffle shape
    as :func:`cramers_v` (observed cells only, zero cells never
    materialize because 0·ln 0 = 0)."""
    cells = df.groupBy(col_a, col_b).agg(F.count("*").alias("o"))
    agg = cells.agg(
        F.sum("o").alias("n"),
        F.sum(F.col("o") * F.log("o")).alias("__cab"),
    )
    ma = (
        cells.groupBy(col_a)
        .agg(F.sum("o").alias("c"))
        .agg(F.sum(F.col("c") * F.log("c")).alias("__ca"))
    )
    mb = (
        cells.groupBy(col_b)
        .agg(F.sum("o").alias("c"))
        .agg(F.sum(F.col("c") * F.log("c")).alias("__cb"))
    )
    # bounded: ma/mb are 1-row aggregates
    j = agg.crossJoin(F.broadcast(ma)).crossJoin(F.broadcast(mb))
    h_a = F.log("n") - F.col("__ca") / F.col("n")
    h_a_given_b = (F.col("__cb") - F.col("__cab")) / F.col("n")
    return j.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.when(h_a > 0, (h_a - h_a_given_b) / h_a), round_to).alias("u"),
    )


def bounding_ratio(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """ClickHouse ``boundingRatio(x, y)``: slope of the chord between
    the leftmost and rightmost points, (y at max x − y at min x) /
    (max x − min x). One grouped aggregate (max_by/min_by), one
    shuffle keyed on the group."""
    group_cols = group_cols or []
    agg = df.groupBy(*group_cols).agg(
        F.max_by(y_col, x_col).alias("__y_hi"),
        F.min_by(y_col, x_col).alias("__y_lo"),
        F.max(x_col).alias("__x_hi"),
        F.min(x_col).alias("__x_lo"),
    )
    return agg.select(
        *group_cols,
        F.round(
            F.when(
                F.col("__x_hi") != F.col("__x_lo"),
                (F.col("__y_hi") - F.col("__y_lo"))
                / (F.col("__x_hi") - F.col("__x_lo")),
            ),
            round_to,
        ).alias("ratio"),
    )


def sequence_count(
    df: DataFrame,
    ts_col: str,
    cond_a,
    cond_b,
    group_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1)(?2)')(ts, cond_a, cond_b)``:
    greedy non-overlapping count of an A-then-B event pattern per
    group. Returns (group, matches) for groups with >= 1 match.

    Equivalence (why a lag suffices): the greedy matcher arms on the
    first A, fires on the next B, then resets. Restricted to the A/B
    subsequence, every maximal run ``A+ B+`` fires exactly once — on
    its first B (later Bs find the matcher unarmed, later As inside
    the next A-run re-arm it only once). A B fires iff its immediate
    A/B predecessor is an A, so matches = #{B : lag(symbol) = A}.
    One user-keyed window over the filtered stream — no state machine,
    no ``applyInPandasWithState``, no quadratic self-join.
    """
    from pyspark.sql import Window as W

    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    sym = (
        df.withColumn(
            "__sym",
            F.when(cond_a, F.lit("A")).when(cond_b, F.lit("B")),
        )
        .filter(F.col("__sym").isNotNull())
    )
    w = W.partitionBy(group_col).orderBy(*order)
    lagged = sym.withColumn("__prev", F.lag("__sym").over(w))
    return (
        lagged.filter((F.col("__sym") == "B") & (F.col("__prev") == "A"))
        .groupBy(group_col)
        .agg(F.count("*").alias("matches"))
    )


def auc(df: DataFrame, score_col: str, label_col: str, round_to: int = 6) -> DataFrame:
    """ROC AUC of a score against a binary label — ClickHouse
    ``arrayAUC(scores, labels)`` lifted to a dataset aggregate (the CH
    spelling takes parallel arrays; a table of rows is the same data).
    One row: (n_pos, n_neg, auc).

    AUC is the rank-sum identity: AUC = (R_pos − n_pos(n_pos+1)/2) /
    (n_pos·n_neg) with midranks handling score ties (equivalent to
    trapezoidal interpolation on the ROC curve). Same scale shape as
    :func:`mann_whitney_u`: per-distinct-score counts, one
    cardinality-bounded window, one scalar aggregate — rows shuffle
    once, keyed on the score."""
    lab = F.col(label_col).cast("int")
    counts = df.groupBy(score_col).agg(
        F.count("*").alias("__c"),
        F.sum(lab).alias("__cp"),
    )
    ranked = _rank_map(counts, score_col)
    agg = ranked.agg(
        F.sum("__cp").alias("n_pos"),
        F.sum(F.col("__c") - F.col("__cp")).alias("n_neg"),
        F.sum(F.col("__cp") * F.col("__rank")).alias("r_pos"),
    )
    a = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
        / (F.col("n_pos") * F.col("n_neg")),
    )
    return agg.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.round(a, round_to).alias("auc"),
    )


def skew_kurt(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Skewness and excess kurtosis per group — ClickHouse ``skewPop``
    / ``kurtPop``. One grouped aggregate of raw power sums (S1..S4),
    then the central-moment identities in double:
    m_k = E[(x−μ)^k]; skew = m3/m2^1.5; kurt = m4/m2² − 3.

    S1/S2 go through exact decimals (the q51 pattern); S3/S4 would
    overflow 38-digit decimals, so they sum in double — their relative
    error is ~1e-12 on any aggregation order, absorbed by the output
    rounding. Both statistics are scale-invariant, so the magnitude of
    the measure doesn't amplify the drift."""
    group_cols = group_cols or []
    v = F.col(value_col).cast("double")
    d = _dec(value_col)
    s = df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(d).cast("double").alias("s1"),
        F.sum(d * d).cast("double").alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - m1 * m1
    m3 = F.col("s3") / F.col("n") - 3 * m1 * F.col("s2") / F.col("n") + 2 * m1 * m1 * m1
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * m1 * F.col("s3") / F.col("n")
        + 6 * m1 * m1 * F.col("s2") / F.col("n")
        - 3 * m1 * m1 * m1 * m1
    )
    return s.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n"),
        F.round(F.when(m2 > 0, m3 / F.pow(m2, 1.5)), round_to).alias("skew"),
        F.round(F.when(m2 > 0, m4 / (m2 * m2) - 3), round_to).alias("kurt"),
    )


def student_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Student's pooled-variance t-test — ClickHouse ``studentTTest(x,
    g)`` (the equal-variance sibling of :func:`welch_ttest`). One row:
    (n_a, n_b, t_stat, df) with df = n_a + n_b − 2 and pooled variance
    s² = ((n_a−1)s_a² + (n_b−1)s_b²) / df. Same single-shuffle exact
    power-sum shape as welch_ttest."""
    filt = df.filter(F.col(group_col).isin([group_a, group_b]))
    s = filt.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(_dec(value_col)).cast("double").alias("sx"),
        F.sum(_dec(value_col) * _dec(value_col)).cast("double").alias("sx2"),
    )
    s = s.select(
        group_col,
        "n",
        (F.col("sx") / F.col("n")).alias("m"),
        (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")).alias("ss"),
    )
    a = s.filter(F.col(group_col) == group_a).select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"), F.col("ss").alias("ss_a")
    )
    b = s.filter(F.col(group_col) == group_b).select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"), F.col("ss").alias("ss_b")
    )
    j = a.crossJoin(b)
    dof = F.col("n_a") + F.col("n_b") - 2
    pooled = (F.col("ss_a") + F.col("ss_b")) / dof
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(
        pooled * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return j.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(t, round_to).alias("t_stat"),
        dof.cast("bigint").alias("df"),
    )


def avg_weighted(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """ClickHouse ``avgWeighted(x, w)``: Σ x·w / Σ w per group, exact
    decimal numerator/denominator, one shuffle."""
    group_cols = group_cols or []
    agg = df.groupBy(*group_cols).agg(
        F.sum(_dec(value_col) * _dec(weight_col, 0)).cast("double").alias("__num"),
        F.sum(_dec(weight_col, 0)).cast("double").alias("__den"),
    )
    return agg.select(
        *group_cols,
        F.round(F.col("__num") / F.col("__den"), round_to).alias("wavg"),
    )


def simple_linear_regression(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """ClickHouse ``simpleLinearRegression(x, y)``: per-group OLS
    (slope, intercept). One grouped aggregate of exact decimal moment
    sums (n, Σx, Σy, Σx², Σxy) — one shuffle keyed on the group; the
    two divisions run on aggregated cells only."""
    group_cols = group_cols or []
    dx = _dec(x_col, 0)
    dy = _dec(y_col)
    m = df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    slope = F.when(
        vx > 0, (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / vx
    )
    return m.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, round_to).alias("slope"),
        F.round(
            F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"), round_to
        ).alias("intercept"),
    )


def contingency_coefficients(
    df: DataFrame, col_a: str, col_b: str, round_to: int = 6
) -> DataFrame:
    """ClickHouse ``contingency(a, b)`` and ``cramersVBiasCorrected``:
    the χ²-family association coefficients beyond plain Cramér's V.
    One row: (n, chi2, contingency, v_bc).

    contingency = √(χ²/(χ²+n)); the bias-corrected V replaces χ²/n with
    max(0, φ² − (r−1)(c−1)/(n−1)) and shrinks r, c accordingly
    (Bergsma 2013). Same observed-cells-only shuffle as cramers_v."""
    cells = df.groupBy(col_a, col_b).agg(F.count("*").alias("o"))
    ra = cells.groupBy(col_a).agg(F.sum("o").alias("ra"))
    cb = cells.groupBy(col_b).agg(F.sum("o").alias("cb"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct(col_a).alias("r"),
        F.countDistinct(col_b).alias("c"),
    )
    joined = (
        # bounded: marginals have one row per category; tot is 1 row
        cells.join(F.broadcast(ra), col_a)
        .join(F.broadcast(cb), col_b)
        .crossJoin(F.broadcast(tot))
        .withColumn("e", F.col("ra") * F.col("cb") / F.col("n"))
    )
    parts = joined.groupBy("n", "r", "c").agg(
        F.sum(
            (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
        ).alias("__obs"),
        F.sum("e").alias("__esum"),
    )
    chi2 = F.col("__obs") + (F.col("n") - F.col("__esum"))
    phi2 = chi2 / F.col("n")
    phi2_bc = F.greatest(
        F.lit(0.0),
        phi2 - (F.col("r") - 1) * (F.col("c") - 1) / (F.col("n") - 1),
    )
    r_bc = F.col("r") - (F.col("r") - 1) * (F.col("r") - 1) / (F.col("n") - 1)
    c_bc = F.col("c") - (F.col("c") - 1) * (F.col("c") - 1) / (F.col("n") - 1)
    return parts.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(chi2, round_to).alias("chi2"),
        F.round(F.sqrt(chi2 / (chi2 + F.col("n"))), round_to).alias("contingency"),
        F.round(
            F.sqrt(phi2_bc / F.least(r_bc - 1, c_bc - 1)), round_to
        ).alias("v_bc"),
    )
