"""Window-based operators (SURVEY.md §2 B5): sessionization and funnel —
the two event-analytics idioms ClickHouse spells as special functions
(sessionization via its ORDER BY design + ``windowFunnel``) and Spark
expresses as window compositions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame, user_col: str, ts_col: str, gap_seconds: int
) -> DataFrame:
    """Assign a session id per user: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``.

    lag -> gap flag -> running sum (the classic pattern). One shuffle on
    ``user_col``; both window functions share the same partitioning so
    Catalyst evaluates them in a single Window node. At 100 TB the same
    logic runs incrementally as Structured Streaming
    ``session_window(ts, gap)``.
    Adds columns: ``session_seq`` (1..n per user), ``is_session_start``.
    """
    w = W.partitionBy(user_col).orderBy(ts_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    is_start = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("is_session_start", is_start).withColumn(
        "session_seq",
        F.sum("is_session_start").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )


def approx_ntile(
    df: DataFrame,
    col: str,
    n: int,
    descending: bool = False,
    accuracy: int = 10000,
    out_col: str = "ntile",
) -> DataFrame:
    """Scale-safe approximate NTILE(n): global rank buckets WITHOUT the
    single-reducer sort an unpartitioned window pays (q30's documented
    hazard — VERDICT r8/r9). Boundaries come from ONE
    ``approx_percentile`` tree-aggregate (rank error <= rows/accuracy
    per boundary); every row then maps to its bucket in a pure-codegen
    projection against the n-1 literal boundaries. No WindowExec, no
    shuffle of the fact table at all — the plan is scan -> partial agg
    -> scan -> project, which survives any scale-up.

    ``descending=True`` puts the LARGEST values in bucket 1 (the
    ntile-over-ORDER-BY-DESC shape). Ties sitting exactly on a
    boundary land in the lower bucket; the approximate contract is
    bucket sizes within rows/accuracy of equal, not tie placement —
    exact NTILE splits boundary ties arbitrarily by row position
    anyway. Heavy duplicate mass can legitimately merge buckets
    (duplicate boundaries), exactly like exact NTILE cannot: we keep
    the duplicate boundaries so bucket IDs stay 1..n."""
    if n < 1:
        raise ValueError("approx_ntile: n must be >= 1")
    if n == 1:
        return df.withColumn(out_col, F.lit(1))
    qs = [i / n for i in range(1, n)]
    # bounded: n-1 scalar boundaries — driver-side by construction
    bs = df.agg(
        F.percentile_approx(col, qs, accuracy).alias("bs")
    ).collect()[0]["bs"]
    if not bs:
        return df.withColumn(out_col, F.lit(1))
    arr = ", ".join(f"CAST({float(b)!r} AS DOUBLE)" for b in bs)
    cmp = ">" if descending else "<"
    return df.withColumn(
        out_col,
        F.expr(
            f"1 + size(filter(array({arr}),"
            f" __ch_b -> __ch_b {cmp} CAST({col} AS DOUBLE)))"
        ),
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    window_seconds: int | None = None,
    strict_dedup: bool = False,
) -> DataFrame:
    """ClickHouse ``windowFunnel``-style ordered-sequence match: per user,
    the number of funnel ``steps`` completed in order (each step strictly
    after the previous step's first completion).

    With ``window_seconds`` set, later steps must also land within that
    many seconds of the step-1 match (greedy-earliest anchor: the chain
    anchors at the user's FIRST step-1 event — deterministic and
    SQL-oracle-able; ClickHouse's DP re-anchors to any step-1 event, so
    it can count deeper on pathological sequences — documented deviation).

    With ``strict_dedup``, a repeat of any already-matched step condition
    interrupts the chain: after step k matches at ``t_k``, an event of
    steps 1..k falling strictly before the step-k+1 candidate stops the
    funnel at depth k. (This is the greedy-anchor variant of the idea —
    for ClickHouse's exact ``'strict_deduplication'`` semantics, which
    differ on level-1 repeats and on scan termination, use
    :func:`funnel_ch`.)

    Pure aggregation — no UDF: step 1 time is ``min(ts) filter step1``;
    step k time is ``min(ts) filter (event=step_k and ts > t_{k-1})``,
    computed as a chain of conditional aggregates over collect_list via
    higher-order functions. One shuffle on ``user_col``.

    Returns (user_col, funnel_steps) with funnel_steps in 0..len(steps).
    """
    # Collect each user's (ts, event) pairs once, then fold the step chain
    # JVM-side with higher-order array functions — no Python per row.
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(event_col).alias("ev")))
    )
    agg = df.filter(F.col(event_col).isin(steps)).groupBy(user_col).agg(pairs.alias("evs"))

    # Iteratively compute t_k = min ts of step k events strictly after
    # t_{k-1}. Column-API lambdas, not spliced expr strings — step names
    # with quotes would otherwise break or corrupt the filter.
    out = agg
    prev_t: str | None = None

    def matcher(step: str, prev: str | None):
        # closure factory: PySpark infers HOF lambda arity from the
        # signature, so captured values must NOT be default parameters
        def match(x):
            cond = x["ev"] == F.lit(step)
            if prev is not None:
                cond = cond & (x["ts"] > F.col(prev))
                if window_seconds is not None:
                    cond = cond & (
                        x["ts"]
                        <= F.col("__t0") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
                    )
            return cond

        return match

    def dup_matcher(dup_steps: list[str], prev: str):
        def match(x):
            return x["ev"].isin(dup_steps) & (x["ts"] > F.col(prev))

        return match

    for i, step in enumerate(steps):
        tcol = f"__t{i}"
        cand = F.array_min(
            F.transform(F.filter("evs", matcher(step, prev_t)), lambda x: x["ts"])
        )
        if strict_dedup and i > 0:
            # earliest repeat of an already-matched condition after t_{k-1};
            # strictly before the candidate -> interrupted (candidate drops)
            dup = F.array_min(
                F.transform(
                    F.filter("evs", dup_matcher(steps[:i], prev_t)),
                    lambda x: x["ts"],
                )
            )
            out = out.withColumn("__cand", cand).withColumn("__dup", dup)
            cand = F.when(
                F.col("__dup").isNull() | (F.col("__dup") >= F.col("__cand")),
                F.col("__cand"),
            )
            out = out.withColumn(tcol, cand).drop("__cand", "__dup")
        else:
            out = out.withColumn(tcol, cand)
        prev_t = tcol
    # deepest completed step wins: the when for step k must be checked
    # before step k-1, so build inside-out (step 0 innermost).
    expr = F.lit(0)
    for i in range(len(steps)):
        expr = F.when(F.col(f"__t{i}").isNotNull(), F.lit(i + 1)).otherwise(expr)
    return out.select(user_col, expr.alias("funnel_steps"))


def funnel_exact(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    window_seconds: int,
) -> DataFrame:
    """ClickHouse ``windowFunnel(W)(ts, conds...)`` with the EXACT
    re-anchoring semantics of ClickHouse's own DP — the variant
    :func:`funnel` deliberately trades away for SQL-oracle-able greedy
    anchoring (documented deviation there). Here the chain may anchor
    at ANY step-1 event: depth = max k such that some increasing event
    subsequence matches steps 1..k with ``ts_k - ts_1 <= W``.

    Implementation mirrors ClickHouse's algorithm: fold the time-sorted
    event array keeping, per depth d, the LATEST chain-anchor timestamp
    among chains reaching d (later anchors dominate — they satisfy every
    window a smaller one does, so one slot per depth is exact). A step-d
    event propagates the depth-(d-1) anchor when it lands within W of
    it; a step-1 event refreshes the depth-1 anchor. Slots only grow, so
    the final depth is the filled-prefix length. Equal timestamps
    process in array order (ClickHouse's default mode also admits
    equal-timestamp chains; only ``strict_increase`` forbids them).

    One shuffle on ``user_col``; the fold is a single JVM ``aggregate``
    over the collected struct array. Property-tested against a
    brute-force subsequence matcher (tests/test_property.py); q220
    oracle-checks it against nested-EXISTS chains in DuckDB.

    Returns (user_col, funnel_steps) with funnel_steps in 0..len(steps).
    """
    K = len(steps)
    fields = ", ".join(
        [f"CAST(CAST({ts_col} AS TIMESTAMP) AS DOUBLE) AS t"]
        + [f"(__ev = {_sql_str(s)}) AS s{i + 1}" for i, s in enumerate(steps)]
    )
    evs = f"array_sort(collect_list(struct({fields})))"
    init = "array(" + ", ".join(["CAST(NULL AS DOUBLE)"] * K) + ")"
    slots = []
    for d in range(1, K + 1):
        if d == 1:
            cand = "CASE WHEN __e.s1 THEN __e.t END"
        else:
            cand = (
                f"CASE WHEN __e.s{d} AND __a[{d - 2}] IS NOT NULL"
                f" AND __e.t - __a[{d - 2}] <= {int(window_seconds)}"
                f" THEN __a[{d - 2}] END"  # propagate the chain ANCHOR
            )
        slots.append(f"greatest(__a[{d - 1}], {cand})")
    expr = (
        f"size(filter(aggregate({evs}, {init},"
        f" (__a, __e) -> array({', '.join(slots)})),"
        f" __x -> __x IS NOT NULL))"
    )
    return (
        df.filter(F.col(event_col).isin(steps))
        .select(F.col(user_col), F.col(ts_col), F.col(event_col).alias("__ev"))
        .groupBy(user_col)
        .agg(F.expr(expr).alias("funnel_steps"))
    )


def _sql_str(s: str) -> str:
    """SQL string literal with quotes escaped (step names are data)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


_FUNNEL_MODES = frozenset({"strict_order", "strict_dedup", "strict_increase"})


def funnel_ch_fold_sql(
    ts_sql: str, conds_sql: list[str], window_sql: str, modes: frozenset | set
) -> str:
    """SQL aggregate expression simulating ClickHouse's ``windowFunnel``
    event loop EXACTLY, mode flags included — a direct transliteration of
    the published algorithm (ClickHouse ``AggregateFunctionWindowFunnel``):

    - one list entry per (event, matched condition), conditions added in
      DESCENDING index order so a single event can never chain with
      itself across two consecutive steps;
    - in ``strict_order`` mode, events matching NO condition are kept as
      level-0 entries (they interrupt a started chain);
    - the scan keeps one ``(chain anchor, last event time)`` pair per
      level; a level-1 event always refreshes slot 1 (it never triggers
      dedup or order interruption — the level-1 branch precedes both
      checks); a level-k event with a filled own slot ends the scan at
      ``k`` under ``strict_dedup``; an out-of-order level-k event (empty
      slot k-1 after the chain started) ends the scan at the filled
      prefix under ``strict_order``; otherwise it propagates the level
      k-1 anchor when within the window (``strict_increase`` additionally
      requires the level k-1 LAST event time strictly before it);
      reaching full depth ends the scan (later duplicates can no longer
      interrupt).

    Equal timestamps: ClickHouse's cross-row order for tied events is
    insertion/merge-order dependent (nondeterministic under distributed
    aggregation); this fold pins the deterministic tiebreak the rest of
    the funnel family uses — time ascending, condition index DESCENDING
    (matching ClickHouse's within-row insertion order).

    The returned expression is a single JVM ``aggregate()`` over the
    collected per-group entry array — one shuffle on the group key, no
    Python. Validated against a pure-Python transliteration of the same
    loop on an exhaustive case grid (tests/test_property.py).
    """
    modes = set(modes)
    unknown = modes - _FUNNEL_MODES
    if unknown:
        raise ValueError(f"windowFunnel: unknown mode {sorted(unknown)!r}")
    so = "strict_order" in modes
    sd = "strict_dedup" in modes
    si = "strict_increase" in modes
    K = len(conds_sql)
    T = f"CAST(CAST({ts_sql} AS TIMESTAMP) AS DOUBLE)"
    # per-row entries, condition indexes descending (stored negated so the
    # struct sort's ascending second field gives condition-DESC ties)
    entries = [
        f"CASE WHEN ({conds_sql[k - 1]}) THEN"
        f" named_struct('t', {T}, 'nc', {-k}) END"
        for k in range(K, 0, -1)
    ]
    if so:
        anycond = " OR ".join(f"({c})" for c in conds_sql)
        entries.append(
            f"CASE WHEN NOT coalesce({anycond}, false) THEN"
            f" named_struct('t', {T}, 'nc', 0) END"
        )
    evs = (
        "array_sort(flatten(collect_list(filter(array("
        + ", ".join(entries)
        + "), __wf_n -> __wf_n IS NOT NULL))))"
    )
    nulls = ", ".join(["CAST(NULL AS DOUBLE)"] * K)
    init = (
        "named_struct('r', CAST(NULL AS INT), 'fe', false,"
        f" 'f', array({nulls}), 'l', array({nulls}))"
    )

    def arr_set(arr: str, idx: int, val: str) -> str:
        elems = ", ".join(
            val if i == idx else f"{arr}[{i}]" for i in range(K)
        )
        return f"array({elems})"

    def st(r: str, fe: str, f: str, l: str) -> str:
        return f"named_struct('r', {r}, 'fe', {fe}, 'f', {f}, 'l', {l})"

    keep = st("__wf_a.r", "__wf_a.fe", "__wf_a.f", "__wf_a.l")
    prefix = (
        "CAST(size(filter(__wf_a.f, __wf_p -> __wf_p IS NOT NULL)) AS INT)"
    )
    branches = ["WHEN __wf_a.r IS NOT NULL THEN __wf_a"]
    if so:
        branches.append(
            "WHEN __wf_e.nc = 0 THEN CASE WHEN __wf_a.fe THEN "
            + st(prefix, "__wf_a.fe", "__wf_a.f", "__wf_a.l")
            + " ELSE __wf_a END"
        )
    branches.append(
        "WHEN __wf_e.nc = -1 THEN "
        + st(
            "CAST(NULL AS INT)", "true",
            arr_set("__wf_a.f", 0, "__wf_e.t"),
            arr_set("__wf_a.l", 0, "__wf_e.t"),
        )
    )
    for k in range(2, K + 1):
        inner = []
        if sd:
            inner.append(
                f"WHEN __wf_a.f[{k - 1}] IS NOT NULL THEN "
                + st(str(k), "__wf_a.fe", "__wf_a.f", "__wf_a.l")
            )
        if so:
            inner.append(
                f"WHEN __wf_a.fe AND __wf_a.f[{k - 2}] IS NULL THEN "
                + st(prefix, "__wf_a.fe", "__wf_a.f", "__wf_a.l")
            )
        cond = (
            f"__wf_a.f[{k - 2}] IS NOT NULL"
            f" AND __wf_e.t <= __wf_a.f[{k - 2}] + ({window_sql})"
        )
        if si:
            cond += f" AND __wf_a.l[{k - 2}] < __wf_e.t"
        done = str(K) if k == K else "CAST(NULL AS INT)"
        inner.append(
            f"WHEN {cond} THEN "
            + st(
                done, "__wf_a.fe",
                arr_set("__wf_a.f", k - 1, f"__wf_a.f[{k - 2}]"),
                arr_set("__wf_a.l", k - 1, "__wf_e.t"),
            )
        )
        branches.append(
            f"WHEN __wf_e.nc = {-k} THEN"
            f" CASE {' '.join(inner)} ELSE {keep} END"
        )
    return (
        f"aggregate({evs}, {init},"
        f" (__wf_a, __wf_e) -> CASE {' '.join(branches)} ELSE __wf_a END,"
        f" __wf_a -> coalesce(__wf_a.r, {prefix}))"
    )


def funnel_ch(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    window_seconds: int,
    modes: frozenset | set = frozenset(),
) -> DataFrame:
    """ClickHouse ``windowFunnel(W[, modes...])(ts, conds...)`` with the
    EXACT semantics of ClickHouse's own event loop for every mode string
    (``'strict_order'``, ``'strict_deduplication'``, ``'strict_increase'``,
    any combination) — see :func:`funnel_ch_fold_sql` for the algorithm
    and the pinned equal-timestamp tiebreak. The bare (no-mode) result
    equals :func:`funnel_exact` (kept as the leaner single-array fold).

    ``strict_order`` keeps events matching NO step: they interrupt a
    started chain, so the input is NOT pre-filtered in that mode (at
    100 TB prefer a cheap predicate that retains only the user's event
    types of interest if the condition set allows it). All other modes
    pre-filter to step events before the shuffle.

    Returns (user_col, funnel_steps) with funnel_steps in 0..len(steps).
    """
    modes = {
        "strict_dedup" if m == "strict_deduplication" else m for m in modes
    }
    conds = [f"__ev = {_sql_str(s)}" for s in steps]
    expr = funnel_ch_fold_sql(
        "__ts", conds, str(int(window_seconds)), modes
    )
    base = df.select(
        F.col(user_col), F.col(ts_col).alias("__ts"),
        F.col(event_col).alias("__ev"),
    )
    if "strict_order" not in modes:
        base = base.filter(F.col("__ev").isin(steps))
    return base.groupBy(user_col).agg(F.expr(expr).alias("funnel_steps"))


def retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    offsets: tuple[int, ...] = (1, 3, 7),
) -> DataFrame:
    """ClickHouse ``retention(cond0, cond1, ...)``-style cohort retention:
    per user, cohort date = first active date, plus one boolean per
    offset k — was the user active exactly k days after the cohort date.

    Shape: dedupe to (user, date) — shrinks events by the per-day event
    multiplicity BEFORE the heavy shuffle — then one groupBy(user). The
    per-user distinct-date set is bounded by the calendar, so collect_set
    cannot blow up at 100 TB. Returns (user_col, cohort_date, d<k>...).
    """
    daily = df.select(user_col, F.to_date(ts_col).alias("__d")).distinct()
    per_user = daily.groupBy(user_col).agg(
        F.min("__d").alias("cohort_date"), F.collect_set("__d").alias("__days")
    )
    flags = [
        F.array_contains("__days", F.date_add("cohort_date", k)).alias(f"d{k}")
        for k in offsets
    ]
    return per_user.select(user_col, "cohort_date", *flags)


def sequence_match(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)...')`` — per user, did the
    ``steps`` occur as an ordered subsequence (greedy-earliest chain:
    step k matched at its first occurrence after step k-1's match, which
    is complete for existence — if any chain exists, the greedy one does).
    Returns (user_col, matched). Users with no step events are absent."""
    f = funnel(df, user_col, ts_col, event_col, steps)
    return f.select(
        user_col, (F.col("funnel_steps") == len(steps)).alias("matched")
    )


def delta_sum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    alias: str = "delta_sum",
) -> DataFrame:
    """ClickHouse ``deltaSum(value)``: sum of the POSITIVE increments
    between consecutive rows in order — counter-reset-aware rate totals
    (a monotone counter that resets contributes each ascending run).

    One window pass (lag + conditional sum) per partition key, then one
    groupBy — both shuffles are on ``part_cols``, and AQE coalesces them
    into a single exchange since the partitioning matches. No UDFs.
    """
    w = W.partitionBy(*part_cols).orderBy(*order_cols)
    step = F.col(value_col) - F.lag(value_col).over(w)
    inc = F.when(step > 0, step).otherwise(F.lit(0.0))
    return (
        df.withColumn("__inc", inc)
        .groupBy(*part_cols)
        .agg(F.sum("__inc").alias(alias))
    )


def interval_length_sum(
    df: DataFrame,
    part_cols: list[str],
    start_col: str,
    end_col: str,
    alias: str = "covered",
) -> DataFrame:
    """ClickHouse ``intervalLengthSum(start, end)``: total length of the
    UNION of [start, end) intervals per group — overlaps counted once.

    Classic sweep, expressed relationally: order intervals by (start,
    end), track the running max of ``end`` over all PRECEDING rows, and
    count only the part of each interval past that high-water mark:

        contribution = max(0, end - max(start, max_prev_end))

    One window shuffle on the group key; no self-join (an interval
    overlap self-join would be quadratic per group at 100 TB).
    Numeric or timestamp columns both work (timestamps via unix seconds).
    """
    w = (
        W.partitionBy(*part_cols)
        .orderBy(start_col, end_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_hwm = F.max(end_col).over(w)
    lo = F.greatest(F.col(start_col), prev_hwm)
    contrib = F.greatest(F.col(end_col) - F.coalesce(lo, F.col(start_col)), F.lit(0))
    return (
        df.withColumn("__c", contrib)
        .groupBy(*part_cols)
        .agg(F.sum("__c").alias(alias))
    )


def funnel_strict(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    event_col: str,
    steps: list[str],
) -> DataFrame:
    """ClickHouse ``windowFunnel(...., 'strict_order')``: the funnel
    chain must be CONSECUTIVE — any intervening event of another type
    breaks it (vs the default mode, where other events may interleave).

    Anchored greedily at the user's first step-1 event (deterministic and
    SQL-oracle-able; same anchoring as :func:`funnel`).  Per user:
    collect the FULL ordered event sequence once (ties broken by
    ``id_col``), then check that positions i, i+1, ... after the anchor
    carry exactly steps 2, 3, ... — pure JVM array ops, one shuffle on
    ``user_col``.  Users with events but no step-1 event report 0.

    Group state is the user's event-type sequence (bounded by per-user
    activity, the same bound ClickHouse's windowFunnel state has).
    """
    seq = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("ts"),
                    F.col(id_col).alias("id"),
                    F.col(event_col).alias("ev"),
                )
            )
        ),
        lambda x: x["ev"],
    )
    agg = df.groupBy(user_col).agg(seq.alias("evs"))
    anchored = agg.withColumn("__i", F.array_position("evs", steps[0]))

    # depth = 1 + number of consecutive matches after the anchor
    depth = F.when(F.col("__i") == 0, F.lit(0))
    for k in range(1, len(steps)):
        # element_at is 1-based; anchor at __i, step k sits at __i + k
        cond = (F.col("__i") > 0) & (
            F.element_at("evs", (F.col("__i") + k).cast("int")) == steps[k]
        )
        depth = depth.when(~cond, F.lit(k))
    depth = depth.otherwise(F.lit(len(steps)))
    return anchored.select(user_col, depth.alias("funnel_steps"))


def max_intersections(
    df: DataFrame,
    part_cols: list[str],
    start_col: str,
    end_col: str,
    alias: str = "max_concurrent",
) -> DataFrame:
    """ClickHouse ``maxIntersections(start, end)``: the maximum number of
    simultaneously-open [start, end) intervals per group — peak
    concurrency (sessions online at once, overlapping jobs, ...).

    Sweep expressed relationally: explode each interval into a (+1 at
    start, -1 at end) delta stream, running-sum it in (time, delta)
    order (ends sort before starts at the same instant — half-open
    intervals don't intersect at the boundary), take the max.  Two
    window-free narrow ops + one windowed running sum on the group key:
    one shuffle total, no self-join (the naive pairwise-overlap count is
    quadratic per group)."""
    deltas = df.select(
        *part_cols,
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("t"), F.lit(1).alias("d")),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("e"),
    ).select(*part_cols, F.col("e.t").alias("t"), F.col("e.d").alias("d"))
    w = (
        W.partitionBy(*part_cols)
        .orderBy("t", "d")  # d=-1 (close) sorts before d=+1 (open) at equal t
        .rowsBetween(W.unboundedPreceding, 0)
    )
    running = deltas.withColumn("__open", F.sum("d").over(w))
    return running.groupBy(*part_cols).agg(F.max("__open").alias(alias))


def running_difference(
    value_col, partition_by: list, order_by: list
):
    """ClickHouse ``runningDifference(x)``: x minus the previous row's x
    in window order; 0 for the first row (CH semantics). One window
    shuffle on the partition key."""
    from pyspark.sql import Window as W

    c = F.col(value_col) if isinstance(value_col, str) else value_col
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    prev = F.lag(c, 1).over(w)
    return F.when(prev.isNull(), c - c).otherwise(c - prev)


def neighbor(value_col, offset: int, partition_by: list, order_by: list, default=None):
    """ClickHouse ``neighbor(x, offset[, default])``: the value of x at
    the row ``offset`` positions away in window order (positive = ahead,
    negative = behind), ``default`` when out of range. lag/lead under a
    deterministic window — one shuffle on the partition key."""
    from pyspark.sql import Window as W

    c = F.col(value_col) if isinstance(value_col, str) else value_col
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    if offset >= 0:
        return F.lead(c, offset, default).over(w)
    return F.lag(c, -offset, default).over(w)


def lttb_downsample(
    df: DataFrame,
    ts_col: str,
    y_col: str,
    n_buckets: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling — ClickHouse
    ``largestTriangleThreeBuckets(n)(x, y)`` — in its parallel
    mean-anchor variant: each bucket keeps the point maximizing the
    triangle area against the NEIGHBORING BUCKETS' MEAN points (the
    sequential original anchors on the previously *selected* point,
    which serializes the scan; anchoring on bucket means is the
    standard parallelization and is what makes the operator one
    shuffle + one tiny window instead of a sequential fold). The first
    and last buckets keep their first/last point exactly, as in the
    original.

    Scale shape: one min/max aggregate (broadcast), integer-arithmetic
    time-width bucketing at scan time, one grouped mean per bucket
    (broadcast back — n_buckets rows per group), one per-bucket
    row_number. Rows shuffle once, keyed on (group, bucket).
    """
    group_cols = group_cols or []
    # the input feeds THREE consumers (env min/max, bucket means, the
    # scored join) — without a persist Spark recomputes the full input
    # lineage per branch (measured 6 parquet scans on the q154 shape).
    # MEMORY_AND_DISK like operators/dedup.py: the series frame is the
    # operator's working set and spills rather than OOMs at scale.
    from ed_clickhouse_spark.operators._cache import pin

    df = pin(df)
    # unix_micros/1e6, not unix_timestamp: keeps fractional seconds
    # (micros/1e6 in double — the same value DuckDB's epoch() computes),
    # which bucket boundaries are sensitive to. The session timezone is
    # pinned to UTC (session.py), so the NTZ->TZ cast is the identity.
    x = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1000000.0)
    env = df.groupBy(*group_cols).agg(
        F.min(x).alias("__lo"), F.max(x).alias("__hi")
    )
    # bounded: env is one min/max row per series key (plot-sized groups)
    pts = df.join(F.broadcast(env), group_cols or None) if group_cols else (
        df.crossJoin(F.broadcast(env))
    )
    # explicit floor before the integer cast: Spark's double->bigint
    # truncates but DuckDB's rounds, so the floor is the only spelling
    # both engines agree on
    b = F.floor(
        (x - F.col("__lo")) * n_buckets / (F.col("__hi") - F.col("__lo") + 1)
    )
    pts = pts.withColumn("__b", b.cast("bigint"))
    means = pts.groupBy(*group_cols, "__b").agg(
        (F.sum(x).cast("double") / F.count("*")).alias("__mx"),
        (F.sum(F.col(y_col).cast("decimal(28,4)")).cast("double") / F.count("*")).alias(
            "__my"
        ),
    )
    from pyspark.sql import Window as W

    # bounded window: one row per LTTB bucket (n_out param), not raw rows
    wb = W.partitionBy(*group_cols).orderBy("__b") if group_cols else W.orderBy("__b")
    anchors = means.select(
        *group_cols,
        "__b",
        F.lag("__mx").over(wb).alias("__px"),
        F.lag("__my").over(wb).alias("__py"),
        F.lead("__mx").over(wb).alias("__nx"),
        F.lead("__my").over(wb).alias("__ny"),
    )
    # bounded: anchors has n_buckets rows per series key (output-sized)
    j = pts.join(F.broadcast(anchors), [*group_cols, "__b"])
    area = F.abs(
        (F.col("__px") - F.col("__nx")) * (F.col(y_col) - F.col("__py"))
        - (F.col("__px") - x) * (F.col("__ny") - F.col("__py"))
    )
    # first bucket keeps its earliest point, last its latest, middle the
    # max-area point; encode all three as one descending score.
    score = (
        F.when(F.col("__px").isNull(), -x.cast("double"))
        .when(F.col("__ny").isNull(), x.cast("double"))
        .otherwise(area)
    )
    # Per-bucket pick as ONE hash aggregate (max_by over the total order
    # (score DESC, ts ASC) — encoded as max of (score, -x); x is unique
    # within a series because the input is pre-reduced to one row per
    # (group, ts), so the winner is the same row row_number picked).
    # The previous row_number window shuffled EVERY point and sorted it
    # per (group, bucket); max_by partial-aggregates map-side, so the
    # exchange carries at most one candidate row per (group, bucket) per
    # map task — n_buckets-scale, not point-scale. (guide §2.3
    # "aggregate before you shuffle", §2.4 "remove shuffles outright")
    picked = (
        j.withColumn("__score", score)
        .groupBy(*group_cols, "__b")
        .agg(
            F.max_by(
                F.struct(F.col(ts_col).alias("t"), F.col(y_col).alias("y")),
                F.struct(
                    F.col("__score").alias("s"), (-x).alias("nx")
                ),
            ).alias("__pick")
        )
    )
    return picked.select(
        *group_cols,
        F.col("__b").alias("bucket"),
        F.col("__pick.t").alias(ts_col),
        F.col("__pick.y").alias(y_col),
    )


def non_negative_derivative(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    per_seconds: float = 1.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``nonNegativeDerivative(value, ts)``: per-second rate
    of change of a monotone gauge, clamped at zero across counter
    resets (the Prometheus-rate idiom). One lag window per group —
    adds columns ``rate`` (nullable on each group's first row)."""
    from pyspark.sql import Window as W

    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = W.partitionBy(*group_cols).orderBy(*order)
    dv = F.col(value_col) - F.lag(value_col).over(w)
    # micros subtracted as integers BEFORE the one /1e6 rounding — a
    # per-value epoch-to-double then subtract drifts a ulp and shows up
    # after division
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dt = (us - F.lag(us).over(w)) / 1_000_000.0
    # explicit guard instead of greatest(0, x): greatest SKIPS nulls in
    # every engine, which would silently turn the first row (and any
    # zero-dt pair) into rate 0 instead of rate NULL
    rate = F.when(
        dv.isNotNull() & (dt > 0),
        F.greatest(F.lit(0.0), dv / dt * per_seconds),
    )
    return df.withColumn("rate", rate)


def exponential_moving_average(
    df: DataFrame,
    date_col: str,
    value_col: str,
    group_cols: list[str],
    halflife_days: int = 7,
) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage(halflife)(x, t)`` over a
    daily series: time-decayed mean where a point ``d`` days old weighs
    ``2^(-d/halflife)``. Adds column ``ema``.

    Windowable closed form: EMA_i = Σ x_j·w^(i−j) / Σ w^(i−j) with
    w = 2^(−1/halflife) — multiply num and den by w^(−i) and the
    unstable w^i factor cancels, leaving two plain running sums of
    x_j·2^(j/h) and 2^(j/h) (j = days since the group's first point).
    Two cumulative window sums, one shuffle on the group key. The
    2^(j/h) terms grow with series span — fine for multi-year daily
    series (2^(3650/7) still < DOUBLE_MAX at 10 years ≈ 2^521 is NOT:
    re-base j per decade, or use the reference implementation's
    sequential fold, if your series spans one)."""
    from pyspark.sql import Window as W

    wg = W.partitionBy(*group_cols)
    w = W.partitionBy(*group_cols).orderBy(date_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    j = F.datediff(F.col(date_col), F.min(date_col).over(wg))
    growth = F.pow(F.lit(2.0), j / F.lit(float(halflife_days)))
    return (
        df.withColumn("__g", growth)
        .withColumn(
            "ema",
            F.sum(F.col(value_col) * F.col("__g")).over(w)
            / F.sum("__g").over(w),
        )
        .drop("__g")
    )


def sequence_match_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    gaps: list[tuple[str, float] | None] | None = None,
) -> DataFrame:
    """ClickHouse ``sequenceMatch`` with ``(?t op n)`` time conditions —
    e.g. ``sequenceMatch('(?1)(?t<=3600)(?2)')(ts, e='A', e='B')``.

    EXACT semantics, unlike the greedy-earliest :func:`sequence_match`:
    matched iff ANY ordered chain of step events satisfies every adjacent
    time constraint.  With an upper-bound gap the greedy chain can miss a
    later re-anchored match (A@0, A@100, B@105 under t<=10 matches only
    via the second A), so this variant searches all chains the way
    ClickHouse's backtracking does.

    ``gaps[i]`` constrains ``t_{i+1} - t_i`` in seconds as ``(op, n)``
    with op one of '<', '<=', '>', '>='; ``None`` leaves the gap
    unconstrained (ordering ``t_{i+1} > t_i`` always applies).

    Plan: one shuffle on ``user_col`` collecting each user's step events
    (ts as epoch seconds), then ``len(steps)`` nested JVM ``exists``
    higher-order folds — no UDF, no re-shuffle.  Worst-case per-user cost
    is O(m^k) on m step events held by that user (the same per-user state
    bound ClickHouse's sequenceMatch pays; typical m is tiny).  Users
    with no step events are absent, matching ClickHouse's grouped
    aggregate over present users.
    """
    if gaps is None:
        gaps = [None] * (len(steps) - 1)
    if len(gaps) != len(steps) - 1:
        raise ValueError("need len(steps) - 1 gap constraints (None allowed)")
    ops = {
        "<": lambda g, n: g < n,
        "<=": lambda g, n: g <= n,
        ">": lambda g, n: g > n,
        ">=": lambda g, n: g >= n,
    }
    for g in gaps:
        if g is not None and g[0] not in ops:
            raise ValueError(f"unsupported gap op {g[0]!r}")

    # epoch seconds; TIMESTAMP_NTZ needs the intermediate TIMESTAMP cast
    # (gaps are differences, so the zone offset cancels either way)
    evs = F.collect_list(
        F.struct(
            F.col(ts_col).cast("timestamp").cast("double").alias("ts"),
            F.col(event_col).alias("ev"),
        )
    )
    agg = (
        df.filter(F.col(event_col).isin(steps))
        .groupBy(user_col)
        .agg(evs.alias("evs"))
    )

    def chain(k: int, prev):
        # Column[bool]: some event matches step k after `prev` within the
        # gap constraint, and the rest of the chain matches after it.
        def lam(x):
            c = x["ev"] == F.lit(steps[k])
            if prev is not None:
                c = c & (x["ts"] > prev)
                g = gaps[k - 1]
                if g is not None:
                    op, n = g
                    c = c & ops[op](x["ts"] - prev, F.lit(float(n)))
            if k + 1 < len(steps):
                return c & chain(k + 1, x["ts"])
            return c

        return F.exists("evs", lam)

    return agg.select(user_col, chain(0, None).alias("matched"))


def time_decayed(
    df: DataFrame,
    part_cols: list[str],
    ts_col: str,
    value_col: str,
    decay_seconds: float,
) -> DataFrame:
    """ClickHouse's ``exponentialTimeDecayed{Sum,Count,Max,Avg}`` window
    family as an O(rows) per-partition recurrence — the 100 TB path for
    unbounded running frames.

    The chsql window rewrite (``exponentialTimeDecayedSum(x)(v, t)
    OVER (...)``) is exact and frame-general, but it materializes the
    collected frame array per row: O(frame²) memory per partition,
    fine for dashboard-sized frames, a hazard for power users with
    millions of events. This operator covers the common shape those
    queries actually use — per-key ORDER BY time, UNBOUNDED PRECEDING
    TO CURRENT ROW — with a sequential recurrence instead:

        state' = state * exp((t_prev - t_now)/x) + contribution

    Rescaling the state to the CURRENT row's time keeps every
    intermediate in [0, running_total]: no ``exp(epoch/x)`` blow-up at
    any time span (old mass underflows toward 0 exactly as the weights
    themselves do), unlike the two-running-sums factoring, which
    overflows past ~700x of span. One shuffle on ``part_cols``; the
    per-group pass is a vectorized-in, sequential-fold Arrow batch
    (pandas), not per-row Python UDF calls.

    Adds ``decayed_sum``, ``decayed_count``, ``decayed_max``,
    ``decayed_avg`` to the input columns. Ties on ``ts_col`` fold in
    ascending-timestamp order with input order broken deterministically
    by the remaining sort (stable sort on ts only) — same totals either
    way, since tied events share one decay factor.
    """
    import math

    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    # a fresh StructType: StructType.add MUTATES in place, and
    # df.schema hands back the DataFrame's own cached object
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(name, DoubleType())
            for name in (
                "decayed_sum",
                "decayed_count",
                "decayed_max",
                "decayed_avg",
            )
        ]
    )
    lam = float(decay_seconds)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="stable").reset_index(drop=True)
        # normalize to ns first: pandas 2 may deliver datetime64[us],
        # whose int64 view would be µs and silently shrink every gap
        ts = (
            pd.to_datetime(pdf[ts_col])
            .astype("datetime64[ns]")
            .astype("int64")
            / 1e9
        )
        vals = pdf[value_col].astype(float)
        s = c = 0.0
        mx = float("-inf")
        prev_t = None
        sums, cnts, maxs = [], [], []
        for t, v in zip(ts, vals):
            if prev_t is not None:
                f = math.exp((prev_t - t) / lam)
                s *= f
                c *= f
                mx *= f
            s += v
            c += 1.0
            mx = max(mx, v)
            prev_t = t
            sums.append(s)
            cnts.append(c)
            maxs.append(mx)
        pdf["decayed_sum"] = sums
        pdf["decayed_count"] = cnts
        pdf["decayed_max"] = maxs
        pdf["decayed_avg"] = [
            (a / b if b else None) for a, b in zip(sums, cnts)
        ]
        return pdf

    return df.groupBy(*part_cols).applyInPandas(fold, out_schema)
