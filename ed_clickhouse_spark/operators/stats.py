"""Statistical aggregates (ClickHouse's statistics family): entropy,
Cramér's V, Welch's t-test — the corpus-audit / A-B-readout functions a
ClickHouse user runs over event tables (CH: ``entropy``, ``cramersV``,
``welchTTest``).

All are one- or two-shuffle decompositions over counts and exact
decimal power sums (the q51/q52 moment pattern): no sorting, no raw-row
collection, deterministic at any scale. Transcendental steps (ln, sqrt)
run on already-aggregated cells, so cross-engine float drift is bounded
by one function application, absorbed by output rounding.
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
