"""Known-value checks for the nonparametric stats operators
(textbook examples, plus the greedy-equivalence edge cases for
sequence_count)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.stats import (
    bounding_ratio,
    kolmogorov_smirnov,
    mann_whitney_u,
    rank_corr,
    sequence_count,
    theils_u,
)


def _two_group(spark, a, b):
    rows = [(float(x), "a") for x in a] + [(float(x), "b") for x in b]
    return spark.createDataFrame(rows, "v double, g string")


def test_mann_whitney_separated(spark):
    # a = {1,2,3}, b = {4,5,6}: ranks 1..6, R_a = 6, U_a = 0, no ties.
    row = mann_whitney_u(_two_group(spark, [1, 2, 3], [4, 5, 6]), "v", "g", "a", "b").first()
    assert (row["n_a"], row["n_b"]) == (3, 3)
    assert row["u"] == 0.0
    assert abs(row["z"] - (-4.5 / math.sqrt(5.25))) < 1e-6


def test_mann_whitney_ties_symmetric(spark):
    # identical groups: U = n_a*n_b/2 exactly, z = 0.
    row = mann_whitney_u(
        _two_group(spark, [1, 2, 2, 3], [1, 2, 2, 3]), "v", "g", "a", "b"
    ).first()
    assert row["u"] == 8.0
    assert row["z"] == 0.0


def test_ks_disjoint_supports(spark):
    row = kolmogorov_smirnov(_two_group(spark, [1, 2], [3, 4]), "v", "g", "a", "b").first()
    assert row["d"] == 1.0
    assert row["ks"] == 1.0  # sqrt(2*2/4) * 1


def test_rank_corr_monotone(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 11)], "x double, y double"
    )
    assert rank_corr(df, "x", "y").first()["rho"] == 1.0
    rev = df.withColumn("y", -F.col("y"))
    assert rank_corr(rev, "x", "y").first()["rho"] == -1.0


def test_sequence_count_greedy_nonoverlap(spark):
    # symbol sequences -> expected greedy A-then-B match counts
    cases = {
        "u1": ("ABAB", 2),
        "u2": ("AABB", 1),
        "u3": ("BA", 0),
        "u4": ("ABBA", 1),
        "u5": ("BBB", 0),
    }
    rows = [
        (u, i, sym) for u, (seq, _) in cases.items() for i, sym in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "u string, ts int, sym string")
    got = {
        r["u"]: r["matches"]
        for r in sequence_count(
            df, "ts", F.col("sym") == "A", F.col("sym") == "B", group_col="u"
        ).collect()
    }
    for u, (_, want) in cases.items():
        assert got.get(u, 0) == want


def test_theils_u_extremes(spark):
    # b determines a completely -> U(a|b) = 1
    det = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 2), ("y", 2), ("z", 3)], "a string, b int"
    )
    assert theils_u(det, "a", "b").first()["u"] == 1.0
    # b constant -> knowing b reduces nothing -> U = 0
    const = spark.createDataFrame(
        [("x", 1), ("y", 1), ("x", 1), ("z", 1)], "a string, b int"
    )
    assert theils_u(const, "a", "b").first()["u"] == 0.0


def test_bounding_ratio_slope(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (3.0, 99.0), (10.0, 5.0)], "x double, y double"
    )
    assert bounding_ratio(df, "x", "y").first()["ratio"] == 0.5


def test_auc_perfect_and_chance(spark):
    # all positives score above all negatives -> AUC = 1
    rows = [(float(i), 1) for i in range(5, 10)] + [(float(i), 0) for i in range(5)]
    df = spark.createDataFrame(rows, "s double, y int")
    from ed_clickhouse_spark.operators.stats import auc

    assert auc(df, "s", "y").first()["auc"] == 1.0
    # identical score distributions -> AUC = 0.5 (midranks on full ties)
    tied = spark.createDataFrame([(1.0, 1), (1.0, 0)] * 4, "s double, y int")
    assert auc(tied, "s", "y").first()["auc"] == 0.5


def test_skew_kurt_symmetric(spark):
    from ed_clickhouse_spark.operators.stats import skew_kurt

    # symmetric two-point {0,1}: skew 0, kurtosis excess = -2
    df = spark.createDataFrame([(0.0,), (1.0,)] * 10, "v double")
    row = skew_kurt(df, "v").first()
    assert row["skew"] == 0.0
    assert row["kurt"] == -2.0


def test_student_ttest_textbook(spark):
    from ed_clickhouse_spark.operators.stats import student_ttest

    # a = {1,2,3}, b = {2,3,4}: means 2,3; pooled s^2 = (2+2)/4 = 1
    # t = -1 / sqrt(1*(1/3+1/3)) = -sqrt(3/2)
    df = _two_group(spark, [1, 2, 3], [2, 3, 4])
    row = student_ttest(df, "v", "g", "a", "b").first()
    assert row["df"] == 4
    assert abs(row["t_stat"] - (-math.sqrt(1.5))) < 1e-6


def test_avg_weighted(spark):
    from ed_clickhouse_spark.operators.stats import avg_weighted

    df = spark.createDataFrame([(1.0, 1), (10.0, 9)], "x double, w int")
    assert avg_weighted(df, "x", "w").first()["wavg"] == 9.1


def test_zipf_slope_exact_power_law(spark):
    from ed_clickhouse_spark.operators.text import zipf_slope

    # token i repeated 120/i times: freq exactly proportional to 1/rank,
    # so ln(freq) = ln(120) - ln(rank) and the OLS slope is exactly -1.
    words = []
    for i in range(1, 6):
        words += [f"tok{i:02d}"] * (120 // i)
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    row = zipf_slope(df, "text", top_n=5).first()
    assert row["n_tokens"] == 5
    assert abs(row["slope"] - (-1.0)) < 1e-6


def test_linear_regression_exact_line(spark):
    from ed_clickhouse_spark.operators.stats import simple_linear_regression

    df = spark.createDataFrame(
        [(i, 2.0 * i + 1.0) for i in range(10)], "x int, y double"
    )
    row = simple_linear_regression(df, "x", "y").first()
    assert (row["slope"], row["intercept"]) == (2.0, 1.0)


def test_ngram_distance_bounds(spark):
    from ed_clickhouse_spark.functions.clickhouse import ngramDistance

    df = spark.range(1).select(
        ngramDistance(F.lit("hello world"), F.lit("hello world")).alias("same"),
        ngramDistance(F.lit("aaaa"), F.lit("zzzz")).alias("disjoint"),
    )
    row = df.first()
    assert row["same"] == 0.0
    assert row["disjoint"] == 1.0


def test_lttb_keeps_endpoints_and_spike(spark):
    from datetime import datetime

    from ed_clickhouse_spark.operators.windows import lttb_downsample

    base = datetime(2024, 1, 1)
    ys = [0.0, 0.0, 0.0, 0.0, 9.0, 0.0, 0.0, 0.0, 5.0]
    rows = [(base.replace(second=i), ys[i]) for i in range(9)]
    df = spark.createDataFrame(rows, "ts timestamp, y double")
    out = sorted(
        (r["bucket"], r["ts"].second, r["y"])
        for r in lttb_downsample(df, "ts", "y", 3).collect()
    )
    # bucket 0 keeps the FIRST point, bucket 2 the LAST point, and the
    # middle bucket its max-triangle-area point (the y=9 spike).
    assert out == [(0, 0, 0.0), (1, 4, 9.0), (2, 8, 5.0)]


def test_contingency_perfect_association(spark):
    from ed_clickhouse_spark.operators.stats import contingency_coefficients

    det = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 2), ("y", 2), ("z", 3), ("z", 3)],
        "a string, b int",
    )
    row = contingency_coefficients(det, "a", "b").first()
    # perfect association: chi2 = n*(min(r,c)-1) = 12, C = sqrt(12/18)
    assert row["chi2"] == 12.0
    assert abs(row["contingency"] - math.sqrt(12 / 18)) < 1e-6


def test_nonneg_derivative_clamps_resets(spark):
    from datetime import datetime

    from ed_clickhouse_spark.operators.windows import non_negative_derivative

    base = datetime(2024, 1, 1)
    # gauge rises 10 in 2s, RESETS to 0, rises 30 in 2s
    rows = [
        ("u", base.replace(second=0), 0.0),
        ("u", base.replace(second=2), 10.0),
        ("u", base.replace(second=4), 0.0),
        ("u", base.replace(second=6), 30.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = non_negative_derivative(df, "ts", "v", ["g"]).orderBy("ts").collect()
    assert out[0]["rate"] is None  # first row: no derivative, NOT 0
    assert out[1]["rate"] == 5.0
    assert out[2]["rate"] == 0.0  # reset clamped
    assert out[3]["rate"] == 15.0
