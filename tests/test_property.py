"""Property-based checks (hypothesis) for the operators whose
correctness rests on a non-obvious equivalence argument: the greedy
sequence-count lag reduction, the sweep-based interval union, and the
count-compressed midrank statistics. Each property is checked against a
direct Python reference on random inputs — the cases a fixed example
table can't enumerate."""

from __future__ import annotations

import pytest
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


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # ts
            st.sampled_from("ABCX"),
        ),
        min_size=0,
        max_size=14,
    ),
    gap=st.integers(min_value=1, max_value=15),
)
@_SET
def test_sequence_match_times_matches_brute_force(spark, events, gap):
    """The nested-exists fold equals literal brute-force chain search
    over every (A, B, C) combination with the (?t<=gap) constraints —
    including re-anchoring cases greedy matching would miss."""
    from itertools import combinations

    from ed_clickhouse_spark.operators.windows import sequence_match_times

    # distinct timestamps keep the reference unambiguous (ties are
    # engine-order-dependent in any formulation)
    seen, evs = set(), []
    for ts, ev in events:
        if ts not in seen:
            seen.add(ts)
            evs.append((float(ts), ev))

    def brute() -> bool:
        steps = "ABC"
        cand = [[t for t, e in evs if e == s] for s in steps]
        for a in cand[0]:
            for b in cand[1]:
                for c in cand[2]:
                    if a < b <= a + gap and b < c <= b + gap:
                        return True
        return False

    if not evs or all(e not in "ABC" for _t, e in evs):
        return  # no step events: operator emits no row for the user
    df = spark.createDataFrame(
        [("u", t, e) for t, e in evs], "user string, ts double, ev string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sequence_match_times(
        df, "user", "ts", "ev", ["A", "B", "C"], [("<=", gap), ("<=", gap)]
    ).collect()
    assert len(got) == 1 and got[0]["matched"] == brute()


@given(
    log=st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.integers(min_value=0, max_value=3),  # version
            st.booleans(),  # state row (True) or its cancel (False)
        ),
        min_size=0,
        max_size=12,
    )
)
@_SET
def test_versioned_collapsing_matches_reference_fold(spark, log):
    """final_read on VersionedCollapsingMergeTree equals the literal
    per-(key, version) net-sign bookkeeping, for any arrival order."""
    from collections import Counter

    from ed_clickhouse_spark import ddl

    spec = ddl.parse_clickhouse_ddl(
        """
        CREATE TABLE t (
            k String, sign Int8, ver UInt32, v Int64
        ) ENGINE = VersionedCollapsingMergeTree(sign, ver)
        ORDER BY k;
        """
    )
    net = Counter()
    for k, ver, is_state in log:
        net[(k, ver)] += 1 if is_state else -1
    want = {kv for kv, n in net.items() if n > 0}

    if not log:
        return
    rows = [
        (k, 1 if st_ else -1, ver, ver * 10) for k, ver, st_ in log
    ]
    df = spark.createDataFrame(rows, "k string, sign int, ver int, v long")
    got = {
        (r["k"], r["ver"]) for r in ddl.final_read(df, spec).collect()
    }
    assert got == want


@_SET
@given(
    s=st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=40,
    )
)
def test_query_param_string_roundtrips_exactly(spark, s):
    """Injection-safety as a property: ANY string value rendered by
    substitute_params comes back from Spark byte-identical — quotes,
    backslashes, keywords, unicode — i.e. a parameter can never escape
    its literal."""
    from ed_clickhouse_spark.chsql import substitute_params

    sql = substitute_params("SELECT {x:String} AS v", {"x": s})
    assert spark.sql(sql).first()["v"] == s


_DIALECT_BAIT = [
    "CAST(x AS Float64)", "x::UInt32", "range(3)", "multiIf(a, b, c)",
    "topK(2)(x)", "sumMap(m)", "retention(a, b)", "windowFunnel(60)(t, c)",
    "sequenceMatch(p)(t, c)", "arrayJoin(a)", "DISTINCT ON (a)",
    "uniqMerge(u)", "groupArray(5)(x)", "extract(s, re)", "LIMIT 1 BY a",
    "PREWHERE", "SAMPLE 0.1", "WITH TOTALS", "assumeNotNull(x)",
    "tupleElement(t, 1)", "lagInFrame(v)", "dateDiff(day, a, b)",
    "[1, 2, 3]", "x[1]", "rand() % 100", "toIntervalDay(2)",
    "quantileMerge(0.5)(x)", "avgMerge(a)", "x IN [1, 2]",
    # round-4 trigger spellings
    "sequenceCount(p)(t, c)", "windowFunnel(60, so)(t, c)",
    "toWeek(t)", "toISOYear(t)", "LIMIT 1, 2",
]


@given(
    parts=st.lists(st.sampled_from(_DIALECT_BAIT), min_size=1, max_size=4),
    sep=st.sampled_from([" ", ", ", " -- ", "::"]),
)
@_SET
def test_translate_never_rewrites_inside_string_literals(parts, sep):
    """Every clause/function rewrite in chsql is token-scanned outside
    string literals. Property: a literal built from the rewriter's own
    trigger spellings survives translate() byte-for-byte."""
    from ed_clickhouse_spark.chsql import translate

    bait = sep.join(parts)
    assert "'" not in bait
    sql = f"SELECT '{bait}' AS s FROM t"
    out = translate(sql).sql
    assert f"'{bait}'" in out


def test_translate_literal_hazards():
    """Regression pins for literal-preservation bugs the property test
    found: dateDiff/GLOBAL rewrites, whitespace collapse, scalar-WITH
    substitution, and {param:Type} shapes inside string literals."""
    from ed_clickhouse_spark.chsql import translate

    assert "'dateDiff(day, a, b)'" in translate(
        "SELECT 'dateDiff(day, a, b)' AS s FROM t"
    ).sql
    assert "'GLOBAL JOIN'" in translate("SELECT 'GLOBAL JOIN' AS s FROM t").sql
    # double spaces and newlines inside a literal are user data
    assert "'a  b\nc'" in translate("SELECT 'a  b\nc' AS s   FROM    t").sql
    # a scalar WITH binding must not substitute inside a literal
    out = translate("WITH 0.1 AS rate SELECT 'flat rate' AS s, rate AS r FROM t").sql
    assert "'flat rate'" in out and "(0.1) AS r" in out
    # {name:Type}-shaped literal text is not a parameter
    out = translate("SELECT '{x:Int64}' AS s FROM t", params={"x": 5}).sql
    assert "'{x:Int64}'" in out


@given(
    arrays=st.lists(
        st.lists(st.integers(-50, 50), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    )
)
@_SET
def test_sum_foreach_matches_columnwise_reference(spark, arrays):
    """The dialect's -ForEach fold equals literal position-wise sums
    over ragged arrays (missing positions contribute nothing)."""
    from ed_clickhouse_spark.chsql import translate

    width = max((len(a) for a in arrays), default=0)
    want = [
        float(sum(a[i] for a in arrays if len(a) > i)) for i in range(width)
    ]
    df = spark.createDataFrame([(a,) for a in arrays], "arr array<int>")
    df.createOrReplaceTempView("__pfe")
    got = spark.sql(
        translate("SELECT sumForEach(arr) AS s FROM __pfe").sql
    ).first()["s"]
    assert (got or []) == want


@given(
    seq=st.lists(st.sampled_from("ABCX"), min_size=0, max_size=12),
)
@_SET
def test_sequence_match_adjacency_matches_reference(spark, seq):
    """The '(?1)(?2)' nested-exists translation equals the literal
    ClickHouse adjacency semantics: some A immediately followed by a B
    among events matching ANY listed condition (A, B, or C — the third
    condition breaks adjacency without ever matching refs)."""
    from ed_clickhouse_spark.chsql import translate

    matching = [s for s in seq if s in "ABC"]
    want = any(
        a == "A" and b == "B" for a, b in zip(matching, matching[1:])
    )
    rows = [("u", i, s) for i, s in enumerate(seq)] or [("u", 0, "X")]
    df = spark.createDataFrame(rows, "u string, ts int, sym string")
    df.createOrReplaceTempView("__padj")
    got = spark.sql(
        translate(
            "SELECT sequenceMatch('(?1)(?2)')("
            " CAST(ts AS TIMESTAMP), sym = 'A', sym = 'B', sym = 'C') AS m"
            " FROM __padj GROUP BY u"
        ).sql
    ).first()["m"]
    assert bool(got) == want


def _ref_sequence_count(listed, refs, adjacent, match):
    """Backtracking reference for ClickHouse sequenceCount: repeatedly
    find the earliest-completing match among the listed events (the
    leftmost-anchor match of CH's engine ends at the same event for this
    pattern grammar), then restart after its last event."""
    from itertools import combinations

    def earliest_end(start):
        best = None
        for combo in combinations(range(start, len(listed)), len(refs)):
            if not all(match(listed[c], r) for c, r in zip(combo, refs)):
                continue
            if any(
                adj and combo[k + 1] != combo[k] + 1
                for k, adj in enumerate(adjacent)
            ):
                continue
            if best is None or combo[-1] < best:
                best = combo[-1]
        return best

    cnt, start = 0, 0
    while True:
        end = earliest_end(start)
        if end is None:
            return cnt
        cnt, start = cnt + 1, end + 1


@given(
    seq=st.lists(st.sampled_from("ABCX"), min_size=0, max_size=12),
    pat=st.sampled_from(
        [
            "(?1)(?2)",
            "(?1)(?2)(?3)",
            "(?1).*(?2)(?3)",
            "(?1)(?2).*(?3)",
            "(?1).*(?2)",
            "(?1)(?1)",
            "(?3)(?2)",
            "(?2)(?1)(?2)",
            # the pattern that killed the single-chain greedy fold: an A
            # can serve as ref 3 of a live chain or ref 1 of a better one
            "(?1)(?2)(?3)(?1)",
        ]
    ),
)
@_SET
def test_sequence_count_adjacency_matches_reference(spark, seq, pat):
    """The single-pass adjacency-aware counting fold equals the literal
    backtracking matcher on random event strings — including overlapping
    conditions (cond3 = A-or-C also matches every A) and the unlisted
    symbol X, which is invisible to adjacency."""
    import re as _re

    from ed_clickhouse_spark.chsql import translate

    # cond1: A, cond2: B, cond3: A or C (overlaps cond1)
    preds = [lambda s: s == "A", lambda s: s == "B", lambda s: s in "AC"]
    listed = [s for s in seq if any(p(s) for p in preds)]
    refs = [int(r) for r in _re.findall(r"\(\?(\d+)\)", pat)]
    parts = _re.split(r"\(\?\d+\)", pat)[1:-1]
    adjacent = [p == "" for p in parts]
    want = _ref_sequence_count(
        listed, refs, adjacent, lambda s, r: preds[r - 1](s)
    )
    rows = [("u", i, s) for i, s in enumerate(seq)] or [("u", 0, "X")]
    df = spark.createDataFrame(rows, "u string, ts int, sym string")
    df.createOrReplaceTempView("__pcnt")
    got = spark.sql(
        translate(
            f"SELECT sequenceCount('{pat}')("
            " CAST(ts AS TIMESTAMP), sym = 'A', sym = 'B',"
            " sym IN ('A', 'C')) AS c"
            " FROM __pcnt GROUP BY u"
        ).sql
    ).first()["c"]
    assert got == want


def _parse_seq_pattern(pat):
    """(refs, edges) from a sequenceCount pattern: edge is 'adj', 'any',
    or ('gap', op, n)."""
    import re as _re

    tok_rx = _re.compile(
        r"\(\?(\d+)\)|\(\?t\s*(<=|>=|==|<|>)\s*(\d+(?:\.\d+)?)\)|\.\*"
    )
    toks = []
    for tm in tok_rx.finditer(pat):
        if tm.group(1):
            toks.append(("ref", int(tm.group(1))))
        elif tm.group(2):
            toks.append(("gap", tm.group(2), float(tm.group(3))))
        else:
            toks.append(("any",))
    refs = [t[1] for t in toks if t[0] == "ref"]
    edges, pend, started = [], [], False
    for t in toks:
        if t[0] == "ref":
            if started:
                g = [p for p in pend if p[0] == "gap"]
                edges.append(g[0] if g else (("any",) if pend else ("adj",)))
            started, pend = True, []
        else:
            pend.append(t)
    return refs, edges


def _ref_sequence_count_timed(listed, refs, edges, match):
    """Backtracking reference with time-gap edges: earliest-completing
    valid match among listed (index, time, symbol) events, restart after
    its last event."""
    from itertools import combinations

    def gapok(e, t1, t2):
        if e[0] == "gap":
            d = t2 - t1
            return {
                "<=": t2 > t1 and d <= e[2],
                "<": t2 > t1 and d < e[2],
                ">=": t2 > t1 and d >= e[2],
                ">": d > e[2],
                "==": t2 > t1 and d == e[2],
            }[e[1]]
        return t2 > t1

    def earliest_end(start):
        best = None
        for combo in combinations(range(start, len(listed)), len(refs)):
            if not all(
                match(listed[c][2], r) for c, r in zip(combo, refs)
            ):
                continue
            ok = True
            for k, e in enumerate(edges):
                i1, i2 = combo[k], combo[k + 1]
                if e[0] == "adj" and i2 != i1 + 1:
                    ok = False
                    break
                if not gapok(e, listed[i1][1], listed[i2][1]):
                    ok = False
                    break
            if ok and (best is None or combo[-1] < best):
                best = combo[-1]
        return best

    cnt, start = 0, 0
    while True:
        end = earliest_end(start)
        if end is None:
            return cnt
        cnt, start = cnt + 1, end + 1


@given(
    ev=st.lists(
        st.tuples(st.sampled_from("ABCX"), st.integers(1, 4)),
        min_size=0,
        max_size=10,
    ),
    pat=st.sampled_from(
        [
            "(?1)(?t<=2)(?2)",
            "(?1)(?t>2)(?2)",
            "(?1)(?t<3)(?2)(?t>=1)(?3)",
            "(?1).*(?2)(?t<=3)(?3)",
            "(?1)(?2)(?t<=4)(?3)",
            "(?1)(?t<=2)(?1)",
            "(?1)(?t==2)(?2)",
            "(?1)(?t==1)(?1)(?t==1)(?1)",
            "(?1)(?t==2)(?2)(?t<=3)(?3)",
            "(?1).*(?2)(?t==1)(?3)",
            "(?1)(?t>=1)(?2)(?t==2)(?3)",
        ]
    ),
)
@_SET
def test_sequence_count_timed_matches_reference(spark, ev, pat):
    """The timed-NFA counting fold (per-depth dominant timestamp) equals
    the backtracking reference under (?t op n) gaps mixed with .* and
    adjacency edges, on irregular event spacing with overlapping
    conditions."""
    from ed_clickhouse_spark.chsql import translate

    preds = [lambda s: s == "A", lambda s: s == "B", lambda s: s in "AC"]
    times, cur = [], 0
    for _sym, delta in ev:
        cur += delta
        times.append(cur)
    seq = [sym for sym, _ in ev]
    listed = [
        (i, float(times[i]), s)
        for i, s in enumerate(seq)
        if any(p(s) for p in preds)
    ]
    # re-index adjacency positions within the listed subsequence
    listed = [(j, t, s) for j, (_, t, s) in enumerate(listed)]
    refs, edges = _parse_seq_pattern(pat)
    want = _ref_sequence_count_timed(
        listed, refs, edges, lambda s, r: preds[r - 1](s)
    )
    rows = [("u", times[i], s) for i, s in enumerate(seq)] or [("u", 0, "X")]
    df = spark.createDataFrame(rows, "u string, ts int, sym string")
    df.createOrReplaceTempView("__ptimed")
    got = spark.sql(
        translate(
            f"SELECT sequenceCount('{pat}')("
            " CAST(ts AS TIMESTAMP), sym = 'A', sym = 'B',"
            " sym IN ('A', 'C')) AS c"
            " FROM __ptimed GROUP BY u"
        ).sql
    ).first()["c"]
    assert got == want


@given(
    ev=st.lists(
        st.tuples(st.sampled_from("ABCX"), st.integers(1, 5)),
        min_size=0,
        max_size=10,
    ),
    w=st.sampled_from([3, 6, 12, 1000]),
)
@_SET
def test_funnel_exact_matches_brute_force(spark, ev, w):
    """funnel_exact's latest-anchor DP (ClickHouse's windowFunnel
    algorithm) equals the brute-force max-depth subsequence matcher:
    max k with an increasing event subsequence matching steps 1..k and
    last - first <= W."""
    from itertools import combinations

    from ed_clickhouse_spark.operators.windows import funnel_exact

    steps = ["A", "B", "C"]
    times, cur = [], 0
    for _sym, d in ev:
        cur += d
        times.append(cur)
    seq = [sym for sym, _ in ev]

    def brute():
        for k in range(len(steps), 0, -1):
            for combo in combinations(range(len(seq)), k):
                if (
                    all(seq[combo[j]] == steps[j] for j in range(k))
                    and times[combo[-1]] - times[combo[0]] <= w
                ):
                    return k
        return 0

    rows = [("u", times[i], s) for i, s in enumerate(seq)] or [("u", 0, "X")]
    df = spark.createDataFrame(rows, "u string, ts int, ev string").selectExpr(
        "u", "CAST(ts AS TIMESTAMP) AS ts", "ev"
    )
    got = funnel_exact(df, "u", "ts", "ev", steps, w).collect()
    depth = got[0]["funnel_steps"] if got else 0
    assert depth == brute()
    # the bare dialect spelling runs the same exact DP (r6)
    from ed_clickhouse_spark.chsql import translate

    df.createOrReplaceTempView("__pfun")
    dia = spark.sql(
        translate(
            f"SELECT windowFunnel({w})(ts, ev = 'A', ev = 'B', ev = 'C')"
            " AS d FROM __pfun GROUP BY u"
        ).sql
    ).collect()
    assert (dia[0]["d"] if dia else 0) == brute()


@given(
    parts=st.lists(
        st.sampled_from(
            [
                "(", ")", "'", '"', ",", ".*", "(?1)", "(?t<=3)", "*",
                "SELECT", "FROM", "WHERE", "GROUP BY", "ORDER BY",
                "APPLY", "COLUMNS", "REPLACE", "EXCEPT", "sequenceCount",
                "windowFunnel", "LIMIT 1 BY x", "ARRAY JOIN", "WITH FILL",
                "SAMPLE 0.1", "FINAL", "PREWHERE", "QUALIFY", "'x'",
                "tuple(", "[1,2]", "t", "x", "1", "--c", "::Int64",
            ]
        ),
        min_size=1,
        max_size=12,
    )
)
@_SET
def test_translate_never_crashes_unstructured(parts):
    """Malformed dialect input must surface as ValueError (a loud,
    actionable refusal), never an internal IndexError/KeyError from the
    token scanner — the contract a front-end needs to show users their
    own syntax error."""
    from ed_clickhouse_spark.chsql import translate

    try:
        translate(" ".join(parts))
    except ValueError:
        pass  # loud refusal is the contract for malformed input


def test_equal_timestamp_events_are_order_invariant(spark):
    """Tie semantics pin: the synthetic tables never carry equal
    timestamps, so the oracle sweep cannot exercise ties — this pins
    that the collected-array folds (sequenceCount NFA, windowFunnel
    exact DP, funnel_exact) normalize equal-timestamp events via
    array_sort: INPUT ROW ORDER of tied events never changes a result,
    and the documented tie behavior holds (an equal-timestamp event
    does not 'intervene' for adjacency, does not advance a strict-after
    edge, and CAN extend the tie-tolerant exact funnel)."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.operators.windows import funnel_exact

    rows_ab = [("u", 1.0, "A"), ("u", 2.0, "A"), ("u", 2.0, "B"), ("u", 3.0, "B")]
    rows_ba = [rows_ab[0], rows_ab[2], rows_ab[1], rows_ab[3]]
    results = []
    for rows in (rows_ab, rows_ba):
        df = spark.createDataFrame(rows, "u string, ts double, ev string")
        df.createOrReplaceTempView("__ties")
        cnt = spark.sql(
            translate(
                "SELECT sequenceCount('(?1)(?2)')("
                " CAST(ts AS TIMESTAMP), ev = 'A', ev = 'B') AS c"
                " FROM __ties GROUP BY u"
            ).sql
        ).first()["c"]
        fd = funnel_exact(
            df.selectExpr("u", "CAST(ts AS TIMESTAMP) AS ts", "ev"),
            "u", "ts", "ev", ["A", "B"], 100,
        ).first()["funnel_steps"]
        results.append((cnt, fd))
    assert results[0] == results[1]  # input order of ties is invisible
    # exact funnel tolerates the tie (CH default admits equal
    # timestamps); the strict-after sequence fold does not advance on it
    assert results[0][1] == 2


def _ch_window_funnel_model(events, n_conds, window, modes):
    """Pure-Python transliteration of ClickHouse's windowFunnel event
    loop (the published AggregateFunctionWindowFunnel algorithm),
    including mode flags and the pinned (t asc, cond DESC) tie order.
    ``events``: list of (t, matched_cond_indexes_1based)."""
    so = "strict_order" in modes
    sd = "strict_dedup" in modes
    si = "strict_increase" in modes
    entries = []
    for t, matched in events:
        hit = False
        for c in range(n_conds, 0, -1):
            if c in matched:
                entries.append((t, c))
                hit = True
        if so and not hit:
            entries.append((t, 0))
    entries.sort(key=lambda e: (e[0], -e[1]))
    slots = [None] * n_conds  # (chain anchor, last event time) per level
    first_event = False
    for t, c in entries:
        idx = c - 1
        if so and idx == -1:
            if first_event:
                break
            continue
        elif idx == 0:
            slots[0] = (t, t)
            first_event = True
        elif sd and slots[idx] is not None:
            return c
        elif so and first_event and slots[idx - 1] is None:
            for j in range(n_conds):
                if slots[j] is None:
                    return j
        elif slots[idx - 1] is not None:
            anchor, last = slots[idx - 1]
            ok = t <= anchor + window
            if si:
                ok = ok and last < t
            if ok:
                slots[idx] = (anchor, t)
                if idx + 1 == n_conds:
                    return n_conds
    for j in range(n_conds, 0, -1):
        if slots[j - 1] is not None:
            return j
    return 0


def test_funnel_ch_modes_match_model_exhaustive(spark):
    """funnel_ch's SQL fold equals the pure-Python transliteration of
    ClickHouse's windowFunnel loop on an exhaustive grid: every event
    sequence over {A, B, C, X} (X matches no step) up to length 5, three
    time patterns (spread, bursty, with exact ties), windows {2, 5,
    1000}, and all 8 mode combinations — ~98k case evaluations, batched
    through Spark as one grouped aggregate per (modes, window)."""
    from itertools import product

    from ed_clickhouse_spark.operators.windows import funnel_ch

    steps = ["A", "B", "C"]
    deltas = {"d1": [1, 1, 1, 1, 1], "d2": [1, 3, 1, 3, 1], "d0": [1, 0, 1, 0, 1]}
    cases, rows = {}, []
    for n in range(6):
        for seq in product("ABCX", repeat=n):
            for dname, ds in deltas.items():
                cid = f"{''.join(seq)}|{dname}"
                t, times = 0, []
                for i in range(n):
                    t += ds[i]
                    times.append(t)
                cases[cid] = [
                    (times[i], {steps.index(s) + 1} if s in steps else set())
                    for i, s in enumerate(seq)
                ]
                rows += [(cid, float(times[i]), seq[i]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "u string, ts double, ev string"
    ).selectExpr("u", "CAST(ts AS TIMESTAMP) AS ts", "ev")
    mode_combos = [
        set(c)
        for r in range(4)
        for c in __import__("itertools").combinations(
            ["strict_order", "strict_dedup", "strict_increase"], r
        )
    ]
    checked = 0
    for modes in mode_combos:
        for w in (2, 5, 1000):
            got = {
                r["u"]: r["funnel_steps"]
                for r in funnel_ch(
                    df, "u", "ts", "ev", steps, w, modes
                ).collect()
            }
            for cid, evs in cases.items():
                want = _ch_window_funnel_model(evs, 3, w, modes)
                assert got.get(cid, 0) == want, (cid, sorted(modes), w)
                checked += 1
    assert checked == len(cases) * len(mode_combos) * 3


def test_sequence_count_eq_gap_matches_reference_exhaustive(spark):
    """The bounded multi-slot NFA for (?t == n) gaps equals the
    backtracking earliest-completion reference on an exhaustive grid:
    every event string over {A, B, C, X} up to length 5, three time
    patterns (including one with equal gaps the == edge can hit), five
    ==-bearing patterns mixing adjacency, '.*' and range gaps — batched
    through Spark as one grouped aggregate per pattern."""
    from itertools import product

    from ed_clickhouse_spark.chsql import translate

    preds = [lambda s: s == "A", lambda s: s == "B", lambda s: s in "AC"]
    pats = [
        "(?1)(?t==2)(?2)",
        "(?1)(?t==1)(?1)(?t==1)(?1)",
        "(?1)(?t==2)(?2)(?t<=3)(?3)",
        "(?1).*(?2)(?t==1)(?3)",
        "(?1)(?2)(?t==2)(?3)",
        # swapped-ref patterns with ties: the shape that exposed the r6
        # single-slot tie bug (higher cond feeding a lower-cond ref
        # processes first at a tie and overwrote the only slot; the
        # 2-max compression keeps the usable second value)
        "(?2)(?t<=3)(?1)",
        "(?2)(?t<2)(?1)",
        "(?3).*(?1)(?t<=3)(?2)",
        "(?2)(?t>=1)(?1)",
        "(?2)(?t<=2)(?1)(?t<=2)(?2)",
    ]
    deltas = {"d1": [1, 1, 1, 1, 1], "d2": [1, 2, 1, 2, 1], "d3": [2, 2, 2, 2, 2]}
    rows, cases = [], {}
    for n in range(6):
        for seq in product("ABCX", repeat=n):
            for dn, ds in deltas.items():
                cid = f"{''.join(seq)}|{dn}"
                t, times = 0, []
                for i in range(n):
                    t += ds[i]
                    times.append(float(t))
                cases[cid] = (list(seq), times)
                rows += [(cid, times[i], seq[i]) for i in range(n)]
    df = spark.createDataFrame(rows, "u string, ts double, e string")
    df.createOrReplaceTempView("__eqgrid")
    checked = 0
    for pat in pats:
        refs, edges = _parse_seq_pattern(pat)
        got = {
            r["u"]: r["c"]
            for r in spark.sql(
                translate(
                    f"SELECT u, sequenceCount('{pat}')("
                    " CAST(ts AS TIMESTAMP), e = 'A', e = 'B',"
                    " e IN ('A', 'C')) AS c"
                    " FROM __eqgrid GROUP BY u"
                ).sql
            ).collect()
        }
        for cid, (seq, times) in cases.items():
            listed = [
                (i, times[i], s)
                for i, s in enumerate(seq)
                if any(p(s) for p in preds)
            ]
            listed = [(j, t, s) for j, (_, t, s) in enumerate(listed)]
            want = _ref_sequence_count_timed(
                listed, refs, edges, lambda s, r: preds[r - 1](s)
            )
            assert got.get(cid, 0) == want, (cid, pat, got.get(cid, 0), want)
            checked += 1
    assert checked == len(cases) * len(pats)


def test_sequence_count_eq_gap_cap_overflow_is_loud(spark):
    """More than 64 live chains at an ==-fed depth raises a runtime
    error naming the rewrite instead of silently miscounting."""
    import pytest

    from ed_clickhouse_spark.chsql import translate

    rows = [("u", float(i), "A") for i in range(70)]
    df = spark.createDataFrame(rows, "u string, ts double, e string")
    df.createOrReplaceTempView("__eqcap")
    q = translate(
        "SELECT u, sequenceCount('(?1)(?t==1000)(?2)')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B') AS c"
        " FROM __eqcap GROUP BY u"
    ).sql
    with pytest.raises(Exception, match="64 live chains"):
        spark.sql(q).collect()


def test_sequence_family_tie_order_invariance(spark):
    """Extends the r6 funnel tie pin to the whole family: for inputs
    with EQUAL timestamps, the INPUT ROW ORDER never changes a result —
    every operator sorts its collected struct array on a total key
    (time plus all condition fields), so ties land in one pinned order
    regardless of arrival. Covered: sequenceMatch (adjacency + timed),
    sequenceCount (greedy, adjacency-NFA, timed single-slot, timed
    multi-slot ==), retention, windowFunnel (bare + every mode
    string). Three arrival orders of a tie-rich event set must agree."""
    import random

    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.operators.windows import funnel_ch, retention

    base_rows = [
        ("u1", 1.0, "A"), ("u1", 1.0, "B"), ("u1", 1.0, "X"),
        ("u1", 2.0, "A"), ("u1", 2.0, "C"), ("u1", 3.0, "B"),
        ("u1", 3.0, "B"), ("u1", 3.0, "C"),
        ("u2", 1.0, "A"), ("u2", 1.0, "A"), ("u2", 2.0, "B"),
        ("u2", 2.0, "X"), ("u2", 2.0, "C"), ("u2", 4.0, "C"),
        ("u3", 5.0, "C"), ("u3", 5.0, "B"), ("u3", 5.0, "A"),
    ]
    orders = [
        base_rows,
        list(reversed(base_rows)),
        random.Random(7).sample(base_rows, len(base_rows)),
    ]
    sqls = [
        "SELECT u, sequenceMatch('(?1)(?2)')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B') AS r FROM __tieperm"
        " GROUP BY u",
        "SELECT u, sequenceMatch('(?1)(?t<=2)(?2)')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'C') AS r FROM __tieperm"
        " GROUP BY u",
        "SELECT u, sequenceCount('(?1).*(?2)')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B') AS r FROM __tieperm"
        " GROUP BY u",
        "SELECT u, sequenceCount('(?1)(?2)')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B') AS r FROM __tieperm"
        " GROUP BY u",
        "SELECT u, sequenceCount('(?1)(?t<=2)(?2)')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B') AS r FROM __tieperm"
        " GROUP BY u",
        "SELECT u, sequenceCount('(?1)(?t==1)(?2)')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B') AS r FROM __tieperm"
        " GROUP BY u",
        "SELECT u, windowFunnel(10)("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B', e = 'C') AS r"
        " FROM __tieperm GROUP BY u",
        "SELECT u, windowFunnel(10, 'strict_order')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B', e = 'C') AS r"
        " FROM __tieperm GROUP BY u",
        "SELECT u, windowFunnel(10, 'strict_deduplication')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B', e = 'C') AS r"
        " FROM __tieperm GROUP BY u",
        "SELECT u, windowFunnel(10, 'strict_increase')("
        " CAST(ts AS TIMESTAMP), e = 'A', e = 'B', e = 'C') AS r"
        " FROM __tieperm GROUP BY u",
    ]
    results = []
    for rows in orders:
        # coalesce(1) pins a single partition so collect_list arrival
        # order really does follow the row order under test
        df = spark.createDataFrame(
            rows, "u string, ts double, e string"
        ).coalesce(1)
        df.createOrReplaceTempView("__tieperm")
        snap = []
        for q in sqls:
            snap.append(
                sorted(
                    (r["u"], r["r"])
                    for r in spark.sql(translate(q).sql).collect()
                )
            )
        tdf = df.withColumn("ts", F.col("ts").cast("timestamp"))
        snap.append(
            sorted(
                (r["u"], r["funnel_steps"])
                for r in funnel_ch(
                    tdf, "u", "ts", "e", ["A", "B", "C"], 10,
                    {"strict_order", "strict_dedup"},
                ).collect()
            )
        )
        snap.append(
            sorted(
                (r["u"], str(r["cohort_date"]), r["d1"])
                for r in retention(tdf, "u", "ts", offsets=(1,)).collect()
            )
        )
        results.append(snap)
    assert results[0] == results[1] == results[2]


def test_argminmax_combinators_match_python_reference(spark):
    """sumArgMin/avgArgMax/countArgMin/maxArgMin over 60 random groups
    in ONE query equal a brute-force Python fold — ties at the key
    extreme all contribute (the property min_by/max_by would break)."""
    import random

    from ed_clickhouse_spark.chsql import translate

    rng = random.Random(34)
    rows, want = [], {}
    for g in range(60):
        n = rng.randint(1, 8)
        grp = [
            (g, round(rng.uniform(-5, 5), 2), rng.randint(0, 3))
            for _ in range(n)
        ]
        rows += grp
        kmin = min(k for _, _, k in grp)
        kmax = max(k for _, _, k in grp)
        at_min = [v for _, v, k in grp if k == kmin]
        at_max = [v for _, v, k in grp if k == kmax]
        want[g] = (
            sum(at_min),
            sum(at_max) / len(at_max),
            len(at_min),
            max(at_min),
        )
    spark.createDataFrame(
        rows, "g int, v double, k int"
    ).createOrReplaceTempView("__amprop")
    got = spark.sql(
        translate(
            "SELECT g, sumArgMin(v, k) AS s, avgArgMax(v, k) AS a,"
            " countArgMin(k) AS c, maxArgMin(v, k) AS mx"
            " FROM __amprop GROUP BY g"
        ).sql
    ).collect()
    assert len(got) == 60
    for r in got:
        w = want[r["g"]]
        assert r["s"] == pytest.approx(w[0], abs=1e-9), r["g"]
        assert r["a"] == pytest.approx(w[1], abs=1e-9), r["g"]
        assert r["c"] == w[2], r["g"]
        assert float(r["mx"]) == pytest.approx(w[3], abs=1e-9), r["g"]


def test_resample_combinator_matches_python_reference(spark):
    """sumResample/countResample over 40 random groups equal the
    Python bucket fold, including CH's truncated last bucket and the
    sum-family zero for empty buckets."""
    import random

    from ed_clickhouse_spark.chsql import translate

    rng = random.Random(35)
    start, end, step = 2, 17, 4  # buckets [2,6) [6,10) [10,14) [14,17)
    bounds = []
    lo = start
    while lo < end:
        bounds.append((lo, min(lo + step, end)))
        lo += step
    rows, want = [], {}
    for g in range(40):
        grp = [
            (g, round(rng.uniform(0, 10), 2), rng.randint(-2, 20))
            for _ in range(rng.randint(1, 10))
        ]
        rows += grp
        want[g] = (
            [
                sum(v for _, v, k in grp if lo_ <= k < hi_)
                for lo_, hi_ in bounds
            ],
            [
                sum(1 for _, _, k in grp if lo_ <= k < hi_)
                for lo_, hi_ in bounds
            ],
        )
    spark.createDataFrame(
        rows, "g int, v double, k int"
    ).createOrReplaceTempView("__rsprop")
    got = spark.sql(
        translate(
            f"SELECT g, sumResample({start}, {end}, {step})(v, k) AS s,"
            f" countResample({start}, {end}, {step})(k) AS c"
            " FROM __rsprop GROUP BY g"
        ).sql
    ).collect()
    assert len(got) == 40
    for r in got:
        ws, wc = want[r["g"]]
        assert list(r["c"]) == wc, r["g"]
        assert list(r["s"]) == pytest.approx(ws, abs=1e-9), r["g"]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),          # outer group
            st.integers(0, 2),          # inner split
            st.integers(-50, 50),       # value
            st.sampled_from("abcdef"),  # entity
        ),
        min_size=1,
        max_size=30,
    )
)
@_SET
def test_state_merge_roundtrip_equals_direct(spark, rows):
    """The r7 -State/-Merge combinator pair is a homomorphism: writing
    per-(g, h) partial states and re-merging per g must equal the
    direct one-level aggregate for EVERY split of the data — the
    algebraic contract AggregatingMergeTree relies on. Checked for
    sum/count/min/max/avg/uniqExact (exact) and uniq (HLL — exact at
    these cardinalities, <= 6 distinct entities)."""
    from ed_clickhouse_spark.chsql import translate

    df = spark.createDataFrame(rows, "g int, h int, v int, s string")
    df.createOrReplaceTempView("__prop_sm")
    merged = {
        r["g"]: r
        for r in spark.sql(
            translate(
                "SELECT g, sumMerge(ss) AS sm, countMerge(cs) AS c,"
                " minMerge(mns) AS mn, maxMerge(mxs) AS mx,"
                " avgMerge(avs) AS av, uniqExactMerge(ues) AS ue,"
                " uniqMerge(us) AS u"
                " FROM (SELECT g, h, sumState(v) AS ss,"
                "   countState() AS cs, minState(v) AS mns,"
                "   maxState(v) AS mxs, avgState(v) AS avs,"
                "   uniqExactState(s) AS ues, uniqState(s) AS us"
                "   FROM __prop_sm GROUP BY g, h)"
                " GROUP BY g"
            ).sql
        ).collect()
    }
    from collections import defaultdict

    model = defaultdict(list)
    for g, _h, v, s in rows:
        model[g].append((v, s))
    assert set(merged) == set(model)
    for g, vals in model.items():
        vs = [v for v, _ in vals]
        got = merged[g]
        assert got["sm"] == sum(vs) and got["c"] == len(vs)
        assert got["mn"] == min(vs) and got["mx"] == max(vs)
        assert abs(float(got["av"]) - sum(vs) / len(vs)) < 1e-9
        n_distinct = len({s for _, s in vals})
        assert got["ue"] == n_distinct
        assert got["u"] == n_distinct  # HLL exact at <= 6 entities


@given(
    maps=st.lists(
        st.dictionaries(
            st.sampled_from("xyz"), st.integers(-20, 20), max_size=3
        ),
        min_size=1,
        max_size=12,
    )
)
@_SET
def test_map_combinator_matches_python_model(spark, maps):
    """The r7 -Map combinator extensions (avgMap/countMap/uniqMap)
    and the preexisting sumMap/minMap/maxMap against a literal per-key
    Python model over random map rows."""
    from ed_clickhouse_spark.chsql import translate

    df = spark.createDataFrame(
        [(m,) for m in maps], "m map<string, int>"
    )
    df.createOrReplaceTempView("__prop_map")
    got = spark.sql(
        translate(
            "SELECT sumMap(m) AS s, minMap(m) AS mn, maxMap(m) AS mx,"
            " avgMap(m) AS av, countMap(m) AS c, uniqMap(m) AS u"
            " FROM __prop_map"
        ).sql
    ).collect()[0]
    from collections import defaultdict

    per_key = defaultdict(list)
    for m in maps:
        for k, v in m.items():
            per_key[k].append(v)
    want_keys = set(per_key)
    for field in ("s", "mn", "mx", "av", "c", "u"):
        assert set(got[field] or {}) == want_keys, field
    for k, vs in per_key.items():
        assert got["s"][k] == sum(vs) and got["c"][k] == len(vs)
        assert got["mn"][k] == min(vs) and got["mx"][k] == max(vs)
        assert abs(got["av"][k] - sum(vs) / len(vs)) < 1e-9
        assert got["u"][k] == len(set(vs))


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),                            # group
            st.one_of(st.none(), st.integers(-9, 9)),     # value v
            st.one_of(st.none(), st.integers(-2, 6)),     # key k
            st.one_of(st.none(), st.booleans()),          # condition c
        ),
        min_size=1,
        max_size=25,
    )
)
@_SET
def test_combinator_stackings_null_shapes(spark, rows):
    """Round-8 (verdict #8): every implemented combinator stacking
    pair under adversarial NULL shapes — NULL values, NULL keys, NULL
    conditions, groups where nothing matches, groups that are entirely
    NULL — pinned against a Python model of the repo's documented
    semantics (CH NULL-skipping for the bases; NULL ordering keys
    never become the ArgMin/ArgMax extreme; -OrDefault backstops 0;
    -Resample buckets drop NULL keys; empty sum/count buckets are 0).
    The round-7 probe batches found two edge defaults by hand; this
    suite exists so the next one is found here."""
    from ed_clickhouse_spark.chsql import translate

    # coalesce (not repartition): preserves insertion order so the
    # order-dependent anyArgMinIf check is deterministic
    spark.createDataFrame(
        rows, "g int, v int, k int, c boolean"
    ).coalesce(1).createOrReplaceTempView("__nullprop")

    got = {
        r["g"]: r
        for r in spark.sql(
            translate(
                "SELECT g,"
                " sumIf(v, c) AS s_if,"
                " countIf(c) AS c_if,"
                " avgIf(v, c) AS a_if,"
                " minIf(v, c) AS mn_if,"
                " maxIf(v, c) AS mx_if,"
                " sumOrDefaultIf(v, c) AS s_od,"
                " avgOrDefaultIf(v, c) AS a_od,"
                " sumArgMinIf(v, k, c) AS s_am,"
                " countArgMinIf(k, c) AS c_am,"
                " avgArgMaxIf(v, k, c) AS a_ax,"
                " minArgMaxIf(v, k, c) AS mn_ax,"
                " anyArgMinIf(v, k, c) AS any_am,"
                " sumResample(0, 4, 2)(v, k) AS s_rs,"
                " countResample(0, 4, 2)(k) AS c_rs,"
                " sumIfResample(0, 4, 2)(v, c, k) AS s_ifrs,"
                " sumResampleIf(0, 4, 2)(v, k, c) AS s_rsif,"
                " avgResampleIf(0, 4, 2)(v, k, c) AS a_rsif"
                " FROM __nullprop GROUP BY g"
            ).sql
        ).collect()
    }

    def model(grp):
        def s(vals):
            nn = [v for v in vals if v is not None]
            return sum(nn) if nn else None

        def a(vals):
            nn = [v for v in vals if v is not None]
            return sum(nn) / len(nn) if nn else None

        ct = [(v, k) for _, v, k, c in grp if c is True]
        vs = [v for v, _ in ct]
        out = {
            "s_if": s(vs),
            "c_if": len(ct),
            "a_if": a(vs),
            "mn_if": min((v for v in vs if v is not None), default=None),
            "mx_if": max((v for v in vs if v is not None), default=None),
        }
        out["s_od"] = out["s_if"] if out["s_if"] is not None else 0
        out["a_od"] = out["a_if"] if out["a_if"] is not None else 0.0
        cands = [(v, k) for v, k in ct if k is not None]
        if cands:
            kmin = min(k for _, k in cands)
            kmax = max(k for _, k in cands)
            tmin = [v for v, k in cands if k == kmin]
            tmax = [v for v, k in cands if k == kmax]
        else:
            tmin = tmax = []
        out["s_am"] = s(tmin)
        out["c_am"] = len(tmin)
        out["a_ax"] = a(tmax)
        out["mn_ax"] = min(
            (v for v in tmax if v is not None), default=None
        )
        out["any_am"] = next((v for v in tmin if v is not None), None)
        buckets = [(0, 2), (2, 4)]
        allr = [(v, k) for _, v, k, _ in grp]

        def in_b(k, lo, hi):
            return k is not None and lo <= k < hi

        out["s_rs"] = [
            s([v for v, k in allr if in_b(k, lo, hi)]) or 0
            for lo, hi in buckets
        ]
        out["c_rs"] = [
            sum(1 for _, k in allr if in_b(k, lo, hi))
            for lo, hi in buckets
        ]
        out["s_ifrs"] = [
            s([v for v, k in ct if in_b(k, lo, hi)]) or 0
            for lo, hi in buckets
        ]
        out["s_rsif"] = out["s_ifrs"]
        out["a_rsif"] = [
            a([v for v, k in ct if in_b(k, lo, hi)]) for lo, hi in buckets
        ]
        return out

    groups = sorted({g for g, *_ in rows})
    assert set(got) == set(groups)
    for g in groups:
        grp = [r for r in rows if r[0] == g]
        want = model(grp)
        have = got[g]
        for col, w in want.items():
            h = have[col]
            if isinstance(w, float) or (
                isinstance(w, list) and any(isinstance(x, float) for x in w if x is not None)
            ) or col in ("a_if", "a_od", "a_ax", "a_rsif"):
                if isinstance(w, list):
                    assert len(h) == len(w), (g, col, h, w)
                    for hx, wx in zip(h, w):
                        if wx is None:
                            assert hx is None, (g, col, h, w)
                        else:
                            assert hx == pytest.approx(wx), (g, col, h, w)
                elif w is None:
                    assert h is None, (g, col, h, w)
                else:
                    assert h == pytest.approx(w), (g, col, h, w)
            elif isinstance(w, list):
                assert list(h) == w, (g, col, h, w)
            else:
                assert h == w, (g, col, h, w)


@given(
    days=st.lists(
        st.integers(0, 1460),  # 4 years from 2022-01-01 incl. leap
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@_SET
def test_week_modes_match_python_calendar(spark, days):
    """Round-8 batch 48 pin: toWeek modes against Python's calendar.
    Mode 3 IS isocalendar week. Mode 0 counts Sundays: week 0 before
    the year's first Sunday, then +1 per Sunday. Mode 1 is ISO clamped
    to the calendar year (0 before ISO week 1; December dates in next
    year's ISO week 1 get the prior week + 1)."""
    import datetime as dt

    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    dates = [dt.date(2022, 1, 1) + dt.timedelta(days=d) for d in days]

    def mode0(d):
        jan1 = dt.date(d.year, 1, 1)
        # days until the first Sunday (Python: Monday=0 .. Sunday=6)
        first_sunday = jan1 + dt.timedelta(days=(6 - jan1.weekday()) % 7)
        if d < first_sunday:
            return 0
        return (d - first_sunday).days // 7 + 1

    def mode3(d):
        return d.isocalendar()[1]

    def mode1(d):
        iso_year, iso_week, _ = d.isocalendar()
        if iso_year < d.year:
            return 0
        if iso_year > d.year:
            return (d - dt.timedelta(days=7)).isocalendar()[1] + 1
        return iso_week

    spark.createDataFrame(
        [(d.isoformat(),) for d in dates], "d string"
    ).createOrReplaceTempView("__wk")
    got = spark.sql(translate(
        "SELECT d, toWeek(CAST(d AS DATE), 0) AS w0,"
        " toWeek(CAST(d AS DATE), 1) AS w1,"
        " toWeek(CAST(d AS DATE), 3) AS w3 FROM __wk").sql).collect()
    by_d = {r["d"]: r for r in got}
    for d in dates:
        r = by_d[d.isoformat()]
        assert r["w0"] == mode0(d), (d, r["w0"], mode0(d))
        assert r["w1"] == mode1(d), (d, r["w1"], mode1(d))
        assert r["w3"] == mode3(d), (d, r["w3"], mode3(d))


@given(
    ts=st.lists(st.integers(0, 3600), min_size=1, max_size=15),
    h=st.sampled_from([60, 300]),
    mult=st.integers(1, 3),
)
@_SET
def test_hop_window_assignment_matches_model(spark, ts, h, mult):
    """r10 (VERDICT r9 #5): hop(t, hop, window) multi-assigns each
    record to every epoch-aligned window [k*hop, k*hop + window)
    containing it. Timestamps exactly ON a hop edge belong to the
    window starting there and NOT to the one ending there (half-open
    upper bound) — the strategy forces edge-exact samples in."""
    from collections import Counter

    from ed_clickhouse_spark.chsql import translate

    w = h * mult
    ts = sorted(set(ts) | {0, h, 2 * h, w})  # edge-exact samples
    spark.createDataFrame(
        [(t,) for t in ts], "t long"
    ).createOrReplaceTempView("__hopp")
    q = translate(
        "SELECT unix_timestamp(hopStart(hop(timestamp_seconds(t),"
        f" INTERVAL {h} SECOND, INTERVAL {w} SECOND))) AS s,"
        " count(*) AS c FROM __hopp GROUP BY"
        f" hop(timestamp_seconds(t), INTERVAL {h} SECOND,"
        f" INTERVAL {w} SECOND)"
    ).sql
    got = {r["s"]: r["c"] for r in spark.sql(q).collect()}
    want: Counter = Counter()
    for t in ts:
        k = (t - w) // h + 1  # earliest start strictly above t - w
        while k * h <= t:
            want[k * h] += 1
            k += 1
    assert got == dict(want)


@given(
    a=st.lists(st.integers(0, 30), max_size=12),
    b=st.lists(st.integers(0, 30), max_size=12),
    overlap=st.booleans(),
)
@_SET
def test_bitmap_algebra_matches_python_sets(spark, a, b, overlap):
    """r10 (VERDICT r9 #5): the scalar bitmap family vs Python sets —
    hypothesis shrinks into the empty/single-element shapes, and the
    overlap flag forces the full-overlap (b == a) shape regularly."""
    from ed_clickhouse_spark.chsql import translate

    if overlap:
        b = list(a)
    sa, sb = set(a), set(b)
    spark.createDataFrame(
        [(a, b)], "a array<int>, b array<int>"
    ).createOrReplaceTempView("__bmp")
    r = spark.sql(translate(
        "SELECT bitmapToArray(bitmapAnd(bitmapBuild(a), bitmapBuild(b)))"
        "   AS i,"
        " bitmapToArray(bitmapOr(bitmapBuild(a), bitmapBuild(b))) AS u,"
        " bitmapToArray(bitmapXor(bitmapBuild(a), bitmapBuild(b))) AS x,"
        " bitmapToArray(bitmapAndnot(bitmapBuild(a), bitmapBuild(b)))"
        "   AS d,"
        " bitmapCardinality(bitmapBuild(a)) AS ca,"
        " bitmapAndCardinality(bitmapBuild(a), bitmapBuild(b)) AS ci,"
        " bitmapOrCardinality(bitmapBuild(a), bitmapBuild(b)) AS cu"
        " FROM __bmp").sql).collect()[0]
    assert r["i"] == sorted(sa & sb)
    assert r["u"] == sorted(sa | sb)
    assert r["x"] == sorted(sa ^ sb)
    assert r["d"] == sorted(sa - sb)
    assert r["ca"] == len(sa) and r["ci"] == len(sa & sb)
    assert r["cu"] == len(sa | sb)


@given(
    base=st.integers(0, 8000),
    secs=st.integers(0, 86399),
    year=st.integers(1971, 2099),
    month=st.integers(1, 12),
)
@_SET
def test_change_field_setters_match_calendar(spark, base, secs, year, month):
    """r10 (VERDICT r9 #5): changeYear/changeMonth set the target
    field, preserve every other field, and clamp the day-of-month to
    the target month's length (Jan 31 -> Feb 29 on leap years; Feb 29
    -> Feb 28 on a non-leap changeYear) — the documented
    timestampadd-delta model. changeHour/Minute/Second set exactly."""
    import calendar
    import datetime as dt

    from ed_clickhouse_spark.chsql import translate

    d0 = dt.datetime(2020, 1, 1) + dt.timedelta(days=base, seconds=secs)

    def setter(d, **kw):
        y = kw.get("year", d.year)
        m = kw.get("month", d.month)
        day = min(d.day, calendar.monthrange(y, m)[1])
        return d.replace(year=y, month=m, day=day)

    spark.createDataFrame(
        [(d0.strftime("%Y-%m-%d %H:%M:%S"),)], "t string"
    ).createOrReplaceTempView("__chg")
    r = spark.sql(translate(
        f"SELECT changeYear(CAST(t AS TIMESTAMP), {year}) AS cy,"
        f" changeMonth(CAST(t AS TIMESTAMP), {month}) AS cm,"
        " changeHour(CAST(t AS TIMESTAMP), 5) AS chh,"
        " changeMinute(CAST(t AS TIMESTAMP), 7) AS cmi,"
        " changeSecond(CAST(t AS TIMESTAMP), 9) AS cse"
        " FROM __chg").sql).collect()[0]
    assert r["cy"] == setter(d0, year=year), (d0, year, r["cy"])
    assert r["cm"] == setter(d0, month=month), (d0, month, r["cm"])
    assert r["chh"] == d0.replace(hour=5)
    assert r["cmi"] == d0.replace(minute=7)
    assert r["cse"] == d0.replace(second=9)


@given(
    x0=st.integers(-20, 20),
    y0=st.integers(-20, 20),
    w=st.integers(0, 30),
    hgt=st.integers(0, 30),
    hole=st.booleans(),
)
@_SET
def test_polygon_algebra_matches_closed_form(spark, x0, y0, w, hgt, hole):
    """r10 (VERDICT r9 #5): polygon area/perimeter on rectangles with
    an optional inset rectangular hole vs the closed form — area =
    outer - hole (shoelace with holes), perimeter sums EVERY ring's
    boundary (boost semantics). Degenerate zero-width/zero-height
    rings report area 0 and perimeter 2*side."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    outer = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + hgt),
             (x0, y0 + hgt), (x0, y0)]
    area = float(w * hgt)
    perim = float(2 * (w + hgt))
    rings = [outer]
    if hole and w >= 4 and hgt >= 4:
        hx, hy, hw, hh = x0 + 1, y0 + 1, w - 2, hgt - 2
        rings.append([(hx, hy), (hx, hy + hh), (hx + hw, hy + hh),
                      (hx + hw, hy), (hx, hy)])
        area -= hw * hh
        perim += 2 * (hw + hh)
    wkt = "POLYGON (" + ", ".join(
        "(" + ", ".join(f"{x} {y}" for x, y in ring) + ")"
        for ring in rings
    ) + ")"
    r = spark.sql(translate(
        f"SELECT polygonAreaCartesian(readWKTPolygon('{wkt}')) AS a,"
        f" polygonPerimeterCartesian(readWKTPolygon('{wkt}')) AS p"
    ).sql).collect()[0]
    assert r["a"] == pytest.approx(area), (wkt, r["a"], area)
    assert r["p"] == pytest.approx(perim), (wkt, r["p"], perim)


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 50)),
        min_size=1,
        max_size=20,
    ),
)
@_SET
def test_timeseries_grid_matches_python_promql(spark, pts):
    """r10 (VERDICT r9 #5): the timeSeries*ToGrid family vs a literal
    Python implementation of the documented PromQL semantics — grid
    0..600 step 150 window 150 over samples at 25-second resolution,
    so counter resets and samples land EXACTLY on window boundaries
    regularly (t = k*150), including single-sample windows."""
    from ed_clickhouse_spark.chsql import translate

    # dedupe by timestamp (keep max v, matching the sort-by-(t,v)
    # tie order where the LAST struct wins for resample/irate)
    by_t: dict = {}
    for tt, v in pts:
        t_s = tt * 25
        by_t[t_s] = max(v, by_t.get(v, v), by_t.get(t_s, v))
    samples = sorted((t, float(v)) for t, v in by_t.items())
    start, end, step, w = 0, 600, 150, 150

    def win(g):
        return [(t, v) for t, v in samples if g - w < t <= g]

    def resample(ws):
        return ws[-1][1] if ws else None

    def idelta(ws):
        return ws[-1][1] - ws[-2][1] if len(ws) >= 2 else None

    def irate(ws):
        if len(ws) < 2:
            return None
        (t1, v1), (t2, v2) = ws[-2], ws[-1]
        if t2 == t1:
            return None
        return ((v2 - v1) if v2 >= v1 else v2) / (t2 - t1)

    def delta_rate(ws, g, is_rate):
        if len(ws) < 2:
            return None
        t1, v1 = ws[0]
        tn, vn = ws[-1]
        si = tn - t1
        if si <= 0:
            return None
        corr = 0.0
        if is_rate:
            for (pa, va), (pb, vb) in zip(ws, ws[1:]):
                if vb < va:
                    corr += va
        inc = vn - v1 + corr
        nn = len(ws)
        avg = si / (nn - 1)
        gs, ge = g - w, g
        ds0 = t1 - gs
        ds = ds0
        if is_rate and inc > 0 and v1 >= 0 and si * v1 / inc < ds0:
            ds = si * v1 / inc
        de = ge - tn
        extrap = (
            si
            + (ds if ds < 1.1 * avg else avg / 2)
            + (de if de < 1.1 * avg else avg / 2)
        )
        res = inc * extrap / si
        return res / w if is_rate else res

    grid = [start + i * step for i in range((end - start) // step + 1)]
    want = {
        "rs": [resample(win(g)) for g in grid],
        "idl": [idelta(win(g)) for g in grid],
        "irt": [irate(win(g)) for g in grid],
        "dl": [delta_rate(win(g), g, False) for g in grid],
        "rt": [delta_rate(win(g), g, True) for g in grid],
    }
    spark.createDataFrame(
        [(float(t), v) for t, v in samples], "ts double, v double"
    ).createOrReplaceTempView("__tsgp")
    r = spark.sql(translate(
        "SELECT"
        f" timeSeriesResampleToGridWithStaleness({start}, {end}, {step},"
        f" {w})(ts, v) AS rs,"
        f" timeSeriesInstantDeltaToGrid({start}, {end}, {step}, {w})"
        "   (ts, v) AS idl,"
        f" timeSeriesInstantRateToGrid({start}, {end}, {step}, {w})"
        "   (ts, v) AS irt,"
        f" timeSeriesDeltaToGrid({start}, {end}, {step}, {w})(ts, v)"
        "   AS dl,"
        f" timeSeriesRateToGrid({start}, {end}, {step}, {w})(ts, v)"
        "   AS rt"
        " FROM __tsgp").sql).collect()[0]
    for key in want:
        got = r[key]
        exp = want[key]
        assert len(got) == len(exp), key
        for gv, ev in zip(got, exp):
            if ev is None:
                assert gv is None, (key, got, exp, samples)
            else:
                assert gv == pytest.approx(ev), (key, got, exp, samples)


@given(
    vals=st.lists(
        st.integers(-50, 50), min_size=1, max_size=25
    ),
    qnum=st.integers(1, 19),
)
@_SET
def test_exact_quantile_selectors_match_python(spark, vals, qnum):
    """r10: the three exact-quantile selector families vs literal
    Python references — ExactLow/High order statistics
    (floor/ceil(q*(n-1))) and ExactExclusive (Excel PERCENTILE.EXC:
    h = q*(n+1), interpolated, end-clamped). Duplicates and 1-element
    groups included by the strategy."""
    import math

    from ed_clickhouse_spark.chsql import translate

    q = qnum / 20
    s = sorted(vals)
    n = len(s)
    want_low = s[math.floor(q * (n - 1))]
    want_high = s[math.ceil(q * (n - 1))]
    h = min(max(q * (n + 1), 1.0), float(n))
    fl = math.floor(h)
    lo = s[fl - 1]
    hi = s[fl] if fl < n else s[fl - 1]
    want_exc = lo + (h - fl) * (hi - lo)
    spark.createDataFrame(
        [(v,) for v in vals], "x int"
    ).createOrReplaceTempView("__qsel")
    r = spark.sql(translate(
        f"SELECT quantileExactLow({q})(x) AS l,"
        f" quantileExactHigh({q})(x) AS h,"
        f" quantileExactExclusive({q})(x) AS e FROM __qsel").sql
    ).collect()[0]
    assert r["l"] == want_low, (vals, q, r["l"], want_low)
    assert r["h"] == want_high, (vals, q, r["h"], want_high)
    assert r["e"] == pytest.approx(want_exc), (vals, q, r["e"], want_exc)


@given(
    vals=st.lists(st.integers(0, 5), min_size=1, max_size=20),
    maj=st.integers(0, 5),
)
@_SET
def test_anyheavy_majority_guarantee(spark, vals, maj):
    """verdict r10: anyHeavy honors CH's heavy-hitters contract — a
    value holding a strict majority is deterministically returned; on
    no-majority input the pick is the deterministic mode (count desc,
    value asc), matching the documented tie-break."""
    from collections import Counter

    from ed_clickhouse_spark.chsql import translate

    data = vals + [maj] * (len(vals) + 1)  # maj holds a strict majority
    spark.createDataFrame(
        [(v,) for v in data], "x int"
    ).createOrReplaceTempView("__ah_maj")
    r = spark.sql(translate(
        "SELECT anyHeavy(x) AS ah FROM __ah_maj").sql).collect()[0]
    assert r["ah"] == maj, (data, r["ah"])
    c = Counter(vals)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    spark.createDataFrame(
        [(v,) for v in vals], "x int"
    ).createOrReplaceTempView("__ah_mode")
    r = spark.sql(translate(
        "SELECT anyHeavy(x) AS ah FROM __ah_mode").sql).collect()[0]
    assert r["ah"] == want, (vals, r["ah"], want)


@given(
    vals=st.lists(st.integers(-40, 40), min_size=2, max_size=40),
    n=st.integers(2, 6),
)
@_SET
def test_approx_ntile_bucket_invariants(spark, vals, n):
    """r10 approx_ntile property pins (verdict r11 task #5): bucket ids
    stay in 1..n, are monotone with the value (non-decreasing
    ascending, non-increasing descending), equal values share one
    bucket (duplicate-heavy input merges buckets rather than splitting
    ties), and with distinct values + exact-grade accuracy the bucket
    sizes are near-balanced."""
    from ed_clickhouse_spark.operators.windows import approx_ntile

    df = spark.createDataFrame([(v,) for v in vals], "x int")
    rows = approx_ntile(df, "x", n, accuracy=1_000_000).collect()
    got = sorted((r["x"], r["ntile"]) for r in rows)
    assert all(1 <= b <= n for _, b in got)
    assert all(got[i][1] <= got[i + 1][1] for i in range(len(got) - 1))
    by_val: dict[int, set] = {}
    for v, b in got:
        by_val.setdefault(v, set()).add(b)
    assert all(len(bs) == 1 for bs in by_val.values())
    rows_d = approx_ntile(df, "x", n, descending=True).collect()
    got_d = sorted((r["x"], r["ntile"]) for r in rows_d)
    assert all(1 <= b <= n for _, b in got_d)
    assert all(
        got_d[i][1] >= got_d[i + 1][1] for i in range(len(got_d) - 1)
    )
    if len(set(vals)) == len(vals) and len(vals) >= 2 * n:
        from collections import Counter

        sizes = Counter(b for _, b in got)
        assert max(sizes.values()) - min(sizes.values()) <= 2, sizes


@given(
    parts=st.lists(
        st.tuples(
            st.integers(1, 500),
            st.sampled_from([
                ("ns", 1e-9), ("us", 1e-6), ("ms", 1e-3), ("s", 1.0),
                ("sec", 1.0), ("second", 1.0), ("seconds", 1.0),
                ("m", 60.0), ("min", 60.0), ("minutes", 60.0),
                ("h", 3600.0), ("hr", 3600.0), ("hours", 3600.0),
                ("d", 86400.0), ("days", 86400.0),
                ("w", 604800.0), ("weeks", 604800.0),
                ("mo", 2635200.0), ("months", 2635200.0),
                ("y", 31536000.0), ("years", 31536000.0),
            ]),
        ),
        min_size=1,
        max_size=6,
    )
)
@_SET
def test_parse_timedelta_matches_unit_table(spark, parts):
    """r10/r11 parseTimeDelta property pin: any sequence of
    (number, unit) pairs from the CH unit table (incl. the bare 'm'
    minutes spelling, ADVICE r10) sums to the literal Python fold."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import (
        register_sql_aliases,
    )

    register_sql_aliases(spark)
    text = " ".join(f"{num}{unit}" for num, (unit, _) in parts)
    want = sum(num * mult for num, (_, mult) in parts)
    r = spark.sql(translate(
        f"SELECT parseTimeDelta('{text}') AS td").sql).collect()[0]
    assert r["td"] == pytest.approx(want), (text, r["td"], want)


@given(
    chunks=st.lists(
        st.text(alphabet="ab,;", min_size=0, max_size=6), min_size=0,
        max_size=5,
    ),
    maxn=st.integers(1, 6),
)
@_SET
def test_splitbychar_max_substrings_matches_python(spark, chunks, maxn):
    """r10 splitByChar(sep, s, max_substrings) property pin: CH's
    default discards the remainder — the result is exactly the first
    max_substrings elements of the FULL split (not Python's
    keep-the-tail str.split(sep, n))."""
    from ed_clickhouse_spark.chsql import translate

    s = "".join(chunks)
    want_full = s.split(",")
    want = want_full[:maxn]
    lit = s.replace("'", "''")
    r = spark.sql(translate(
        f"SELECT splitByChar(',', '{lit}', {maxn}) AS p,"
        f" splitByChar(',', '{lit}') AS full").sql).collect()[0]
    assert r["full"] == want_full, (s, r["full"])
    assert r["p"] == want, (s, maxn, r["p"], want)


@given(
    hexparts=st.lists(st.integers(0, 0xFFFF), min_size=8, max_size=8),
    v4=st.booleans(),
    data=st.data(),
)
@_SET
def test_ipv6_string_num_roundtrip(spark, hexparts, v4, data):
    """r10 IPv6 family property pin: IPv6StringToNum -> IPv6NumToString
    round-trips any address to its RFC 5952 canonical compression,
    including embedded-IPv4 forms (::ffff:a.b.c.d) — reference is
    Python's ipaddress module, except IPv4-MAPPED addresses, which CH
    (and RFC 5952 §5) render dotted-quad where ipaddress stays
    hex-grouped."""
    import ipaddress

    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import (
        register_sql_aliases,
    )

    register_sql_aliases(spark)
    if v4:
        a = data.draw(st.integers(0, 255))
        b = data.draw(st.integers(0, 255))
        addr = f"::ffff:{a}.{b}.1.2"
        want = addr  # already canonical dotted-quad mapped form
    else:
        # zero out a random run so compression paths get exercised
        start = data.draw(st.integers(0, 7))
        ln = data.draw(st.integers(0, 8 - start))
        for i in range(start, start + ln):
            hexparts[i] = 0
        addr = ":".join(f"{p:x}" for p in hexparts)
        v6 = ipaddress.IPv6Address(addr)
        # the random draw can land on a mapped address too — same
        # dotted-quad expectation as the explicit v4 branch then
        want = f"::ffff:{v6.ipv4_mapped}" if v6.ipv4_mapped else str(v6)
    r = spark.sql(translate(
        f"SELECT IPv6NumToString(IPv6StringToNum('{addr}')) AS rt"
    ).sql).collect()[0]
    assert r["rt"] == want, (addr, r["rt"], want)


@given(
    toks=st.lists(
        st.sampled_from([
            "col_a", "col_b", "1", "2.5", "'a s'", "+", "-", "*", "/",
            ",", "(", ")", "count(*)", "sum(col_a)",
            "CAST(col_a AS BIGINT)", "col_a IN (1, 2)",
            "CASE WHEN col_a > 1 THEN 2 ELSE 3 END",
        ]),
        min_size=1,
        max_size=12,
    )
)
@_SET
def test_inline_alias_pass_is_identity_without_pattern(toks):
    """r11: _rewrite_inline_paren_aliases runs on EVERY translated
    statement, so it must be a byte-identity on statements that don't
    carry the (expr AS name) shape — including CASTs, IN lists,
    string literals with spaces, and arbitrary unbalanced-ish token
    soup (balanced here so _call_end terminates)."""
    from ed_clickhouse_spark.chsql import _rewrite_inline_paren_aliases

    # balance parens WELL-ORDERED (a count-balanced ') (' soup is
    # still ill-formed and the scanner rightly raises on it): drop
    # closers at depth zero, close whatever stays open at the end
    out, depth = [], 0
    for tok in toks:
        if tok == ")":
            if depth == 0:
                continue
            depth -= 1
        elif tok == "(":
            depth += 1
        out.append(tok)
    out.extend(")" for _ in range(depth))
    body = " ".join(out) or "col_a"
    sql = f"SELECT {body} FROM t WHERE col_b > 0"
    assert _rewrite_inline_paren_aliases(sql) == sql
