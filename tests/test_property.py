"""Property-based checks (hypothesis) for the operators whose
correctness rests on a non-obvious equivalence argument: the greedy
sequence-count lag reduction, the sweep-based interval union, and the
count-compressed midrank statistics. Each property is checked against a
direct Python reference on random inputs — the cases a fixed example
table can't enumerate."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SET = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(seq=st.lists(st.sampled_from("ABX"), min_size=0, max_size=30))
@_SET
def test_sequence_count_matches_state_machine(spark, seq):
    """The lag reduction equals the literal armed/fire state machine."""
    from ed_clickhouse_spark.operators.stats import sequence_count

    armed, want = False, 0
    for s in seq:
        if s == "A":
            armed = True
        elif s == "B" and armed:
            want += 1
            armed = False
    rows = [("u", i, s) for i, s in enumerate(seq)]
    if not rows:
        rows = [("u", 0, "X")]
    df = spark.createDataFrame(rows, "u string, ts int, sym string")
    out = sequence_count(
        df, "ts", F.col("sym") == "A", F.col("sym") == "B", group_col="u"
    ).collect()
    got = out[0]["matches"] if out else 0
    assert got == want


@given(
    iv=st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 20)), min_size=1, max_size=25
    )
)
@_SET
def test_interval_length_sum_matches_point_union(spark, iv):
    """The high-water-mark sweep equals the size of the literal union
    of integer points covered by the half-open intervals."""
    from ed_clickhouse_spark.operators.windows import interval_length_sum

    covered = set()
    for s, ln in iv:
        covered.update(range(s, s + ln))
    df = spark.createDataFrame(
        [("g", s, s + ln) for s, ln in iv], "g string, s long, e long"
    )
    got = interval_length_sum(df, ["g"], "s", "e").first()["covered"]
    assert got == len(covered)


@given(
    a=st.lists(st.integers(0, 9), min_size=2, max_size=30),
    b=st.lists(st.integers(0, 9), min_size=2, max_size=30),
)
@_SET
def test_mann_whitney_u_matches_pairwise_count(spark, a, b):
    """U from count-compressed midranks equals the literal pairwise
    definition: U = #[x_a > x_b] + 0.5 * #[x_a = x_b]."""
    from ed_clickhouse_spark.operators.stats import mann_whitney_u

    want = sum(
        1.0 if x > y else 0.5 if x == y else 0.0 for x in a for y in b
    )
    rows = [(float(x), "a") for x in a] + [(float(x), "b") for x in b]
    df = spark.createDataFrame(rows, "v double, g string")
    got = mann_whitney_u(df, "v", "g", "a", "b").first()["u"]
    assert got == want


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 20), st.integers(1, 5)), min_size=1, max_size=20
    ),
    q=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
)
@_SET
def test_quantile_exact_weighted_matches_expansion(spark, vals, q):
    """The count-compressed cumulative-weight quantile equals the rule
    applied to the literal per-value weights: the smallest value whose
    cumulative weight reaches q * total (CH's lower-weighted rule)."""
    from collections import defaultdict

    from ed_clickhouse_spark.functions.clickhouse import quantile_exact_weighted

    wsum = defaultdict(int)
    for v, w in vals:
        wsum[v] += w
    total = sum(wsum.values())
    cum, want = 0, None
    for v in sorted(wsum):
        cum += wsum[v]
        if cum >= q * total:
            want = float(v)
            break
    df = spark.createDataFrame(
        [("g", float(v), w) for v, w in vals], "g string, v double, w int"
    )
    got = quantile_exact_weighted(df, "v", "w", ["g"], q).first()["qew"]
    assert got == want
