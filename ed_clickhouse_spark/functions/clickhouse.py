"""ClickHouse function spellings -> Spark semantics (SURVEY.md §2 B8/§4).

A user of the reference stack queries these tables in ClickHouse SQL;
this module keeps their vocabulary working in two layers:

  * Python: functions with ClickHouse names delegating to the Spark
    built-in (JVM expression — zero overhead, no UDF);
  * SQL: ``register_sql_aliases(spark)`` creates temporary SQL functions
    (Spark 4 SQL UDFs — inlined into the plan by Catalyst, still
    codegen'd) for the scalar spellings; aggregate spellings that Spark
    already has under another name are documented in AGG_ALIASES.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# --- Python-level aliases (ClickHouse name -> Spark expression) ---------


def uniq(col) -> Column:
    """ClickHouse uniq() — approximate distinct (HLL++)."""
    return F.approx_count_distinct(col)


def uniqExact(col) -> Column:  # noqa: N802 (ClickHouse spelling)
    return F.countDistinct(col)


def countIf(cond: Column) -> Column:  # noqa: N802
    return F.count_if(cond)


def sumIf(col, cond: Column) -> Column:  # noqa: N802
    # coerce: F.when treats a bare string as a literal, not a column ref
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.when(cond, c))


def argMax(value, by) -> Column:  # noqa: N802
    return F.max_by(value, by)


def argMin(value, by) -> Column:  # noqa: N802
    return F.min_by(value, by)


def quantile(col, q: float) -> Column:
    """ClickHouse quantile() is approximate by default — map to the
    sketch-mergeable percentile_approx (use F.percentile for exact)."""
    return F.percentile_approx(col, q)


def groupArray(col) -> Column:  # noqa: N802
    return F.collect_list(col)


def groupUniqArray(col) -> Column:  # noqa: N802
    return F.collect_set(col)


def has(arr, value) -> Column:
    return F.array_contains(arr, value)


def hasAny(a, b) -> Column:  # noqa: N802
    return F.arrays_overlap(a, b)


def arrayJoin(col) -> Column:  # noqa: N802
    """ClickHouse arrayJoin ≙ explode (usable in select, one per query)."""
    return F.explode(col)


def toStartOfDay(col) -> Column:  # noqa: N802
    return F.date_trunc("day", col)


def toStartOfHour(col) -> Column:  # noqa: N802
    return F.date_trunc("hour", col)


def JSONExtractString(col, key: str) -> Column:  # noqa: N802
    return F.get_json_object(col, f"$.{key}")


def multiIf(*args) -> Column:  # noqa: N802
    """multiIf(cond1, v1, cond2, v2, ..., default)."""
    *pairs, default = args
    expr = None
    for i in range(0, len(pairs), 2):
        cond, val = pairs[i], pairs[i + 1]
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(default)


def uniqUpTo(col, n: int) -> Column:  # noqa: N802
    """ClickHouse uniqUpTo(N)(x): exact distinct count capped at N+1 —
    "N+1" encodes "more than N". Exact-oracle-able, constant output."""
    return F.least(F.count_distinct(col), F.lit(n + 1))


def anyLast(col) -> Column:  # noqa: N802
    """ClickHouse anyLast — last non-null seen (order-dependent in CH;
    Spark's last(ignorenulls) under a sorted window is the deterministic
    spelling)."""
    return F.last(col, ignorenulls=True)


def sum_map_entries(df, group_cols: list[str], map_col: str, alias: str = "summed"):
    """ClickHouse ``sumMap``: element-wise sum of maps per group.

    Scalable decomposition (NOT collect_list-of-maps, which is memory-
    bounded by group size): explode map entries first, partial-aggregate
    (group, key) sums map-side, then reassemble one sorted map per group.
    Two shuffles on the same leading key; entries never sit in one
    executor's memory as a whole map.
    """
    return agg_map_entries(df, group_cols, map_col, F.sum, alias)


def agg_map_entries(df, group_cols: list[str], map_col: str, agg, alias: str):
    """Shared sumMap/minMap/maxMap shape: explode map entries, partial-
    aggregate (group, key) map-side with ``agg`` (F.sum / F.min /
    F.max), reassemble one sorted map per group. Two shuffles on the
    same leading key; entries never sit in one executor's memory as a
    whole map."""
    exploded = df.select(*group_cols, F.explode(map_col).alias("__k", "__v"))
    per_key = exploded.groupBy(*group_cols, "__k").agg(agg("__v").alias("__s"))
    return (
        per_key.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("__k", "__s")))
            ).alias(alias)
        )
    )


def min_map_entries(df, group_cols: list[str], map_col: str, alias: str = "minned"):
    """ClickHouse ``minMap``: element-wise min of maps per group."""
    return agg_map_entries(df, group_cols, map_col, F.min, alias)


def max_map_entries(df, group_cols: list[str], map_col: str, alias: str = "maxed"):
    """ClickHouse ``maxMap``: element-wise max of maps per group."""
    return agg_map_entries(df, group_cols, map_col, F.max, alias)


def quantile_exact_weighted(
    df,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    q: float = 0.5,
    alias: str = "qew",
):
    """ClickHouse ``quantileExactWeighted(q)(x, w)``: exact weighted
    quantile — the smallest value whose cumulative weight reaches
    q * total weight (CH's lower-weighted-quantile rule).

    Scalable decomposition: pre-aggregate weight per DISTINCT value
    (map-side combine shrinks the shuffle to the value domain, not the
    row count), then one window cumsum ordered by value within each
    group, then min(value | cum >= q*total). Never sorts raw rows and
    never collects a group into memory — the shape that survives a
    100 TB fact table with a bounded value domain. Exact and
    engine-portable, unlike percentile_approx."""
    from pyspark.sql import Window

    per_val = df.groupBy(*group_cols, value_col).agg(
        F.sum(weight_col).alias("__w")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = per_val.select(
        *group_cols,
        F.col(value_col),
        F.sum("__w").over(w_cum).alias("__cum"),
        F.sum("__w").over(w_tot).alias("__tot"),
    )
    return (
        cum.where(F.col("__cum") >= F.lit(q) * F.col("__tot"))
        .groupBy(*group_cols)
        .agg(F.min(value_col).alias(alias))
    )


def quantiles_exact_weighted(
    df,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    qs: list[float],
    aliases: list[str],
):
    """ClickHouse plural ``quantilesExactWeighted(q1, q2, ...)(x, w)``:
    every requested quantile from ONE pre-aggregate + ONE window cumsum
    + ONE conditional aggregation — no per-quantile recompute or join
    (N quantiles cost the same shuffles as one). Same lower-weighted-
    quantile rule as :func:`quantile_exact_weighted`."""
    from pyspark.sql import Window

    per_val = df.groupBy(*group_cols, value_col).agg(
        F.sum(weight_col).alias("__w")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = per_val.select(
        *group_cols,
        F.col(value_col),
        F.sum("__w").over(w_cum).alias("__cum"),
        F.sum("__w").over(w_tot).alias("__tot"),
    )
    return cum.groupBy(*group_cols).agg(
        *[
            F.min(
                F.when(
                    F.col("__cum") >= F.lit(q) * F.col("__tot"),
                    F.col(value_col),
                )
            ).alias(alias)
            for q, alias in zip(qs, aliases)
        ]
    )


def top_k_values(
    df,
    group_cols: list[str],
    value_col: str,
    k: int = 5,
    alias: str = "top_values",
):
    """ClickHouse ``topK(k)(x)``: the k most frequent values per group,
    as one comma-joined string column (serialized so the result stays
    scalar for cross-engine comparison; CH returns an array).

    CH's topK is approximate (filtered space-saving); this is the exact
    two-phase spelling — groupBy (group, value) count with map-side
    combine (the shuffle carries distinct values, not rows), then a
    per-group row_number top-k. Deterministic tiebreak: count desc,
    value asc. Exact beats approximate at any scale where the per-group
    distinct-value domain is bounded; for unbounded domains compose with
    the count-min sketch (operators/sketch.py) as the pre-filter."""
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("__n"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__n"), F.asc(value_col)
    )
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .groupBy(*group_cols)
        .agg(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(
                        F.struct("__rk", F.col(value_col).cast("string").alias("__v"))
                    )
                ).getField("__v"),
            ).alias(alias)
        )
    )


def trigrams(col) -> Column:
    """Distinct character 3-grams of a string (whole string if shorter
    than 3) — pure codegen HOFs, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - 2, F.lit(1))),
            lambda i: F.substring(c, i, 3),
        )
    )


def ngramDistance(a, b) -> Column:  # noqa: N802 (ClickHouse spelling)
    """ClickHouse ``ngramDistance(a, b)``: dissimilarity of the two
    strings' 3-gram profiles in [0, 1] (0 = identical profiles). This
    engine uses the exact set-Jaccard form, 1 − |A∩B| / |A∪B|
    (ClickHouse approximates the same quantity through hashed 4-bit
    profiles; exact is strictly better and stays in whole-stage
    codegen). Embarrassingly parallel — a per-row expression."""
    ta, tb = trigrams(a), trigrams(b)
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_distinct(F.concat(ta, tb)))
    return 1 - inter / union


def limit_by(df, n: int, by: list[str], order_by: list) -> "DataFrame":
    """ClickHouse ``LIMIT n BY col...``: first ``n`` rows per ``by`` group
    in ``order_by`` order — the idiom for "top n variants per key" without
    collapsing the group.  One window shuffle; Spark's WindowGroupLimit
    pushes the rank filter into the sort, so no group ever materializes
    fully (same physical shape as the suite's q27 top-k)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


# Aggregate spellings Spark already has under another name (SQL level).
AGG_ALIASES = {
    "uniq": "approx_count_distinct",
    "uniqExact": "count(DISTINCT ...)",
    "countIf": "count_if",
    "argMax": "max_by",
    "argMin": "min_by",
    "quantile": "percentile_approx / percentile",
    "groupArray": "collect_list",
    "groupUniqArray": "collect_set",
}

# Scalar SQL UDFs: name -> (signature, body). Spark 4 SQL functions are
# inlined by Catalyst — they stay inside whole-stage codegen.
_SQL_SCALAR_ALIASES: dict[str, tuple[str, str]] = {
    "toStartOfDay": ("(x TIMESTAMP) RETURNS TIMESTAMP", "date_trunc('DAY', x)"),
    "toStartOfHour": ("(x TIMESTAMP) RETURNS TIMESTAMP", "date_trunc('HOUR', x)"),
    "toStartOfMinute": ("(x TIMESTAMP) RETURNS TIMESTAMP", "date_trunc('MINUTE', x)"),
    "toYYYYMM": ("(x TIMESTAMP) RETURNS INT", "CAST(date_format(x, 'yyyyMM') AS INT)"),
    "JSONExtractString": ("(j STRING, k STRING) RETURNS STRING", "get_json_object(j, concat('$.', k))"),
    "hasAll": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS BOOLEAN",
        "size(array_except(b, a)) = 0",
    ),
    "notEmpty": ("(s STRING) RETURNS BOOLEAN", "length(s) > 0"),
    "empty": ("(s STRING) RETURNS BOOLEAN", "length(s) = 0 OR s IS NULL"),
    # ifNull intentionally absent: Spark already ships `ifnull` built-in
    "intDiv": ("(a BIGINT, b BIGINT) RETURNS BIGINT", "a div b"),
    "modulo": ("(a BIGINT, b BIGINT) RETURNS BIGINT", "a % b"),
    # date/time part spellings (ClickHouse toX family)
    "toDate": ("(x TIMESTAMP) RETURNS DATE", "CAST(x AS DATE)"),
    # default mode 0 starts the week on SUNDAY (it's toMonday that is
    # Monday-anchored); Spark dayofweek: 1=Sunday .. 7=Saturday
    "toStartOfWeek": (
        "(x TIMESTAMP) RETURNS DATE",
        "date_sub(CAST(x AS DATE), dayofweek(x) - 1)",
    ),
    "toStartOfMonth": ("(x TIMESTAMP) RETURNS DATE", "CAST(date_trunc('MONTH', x) AS DATE)"),
    "toYear": ("(x TIMESTAMP) RETURNS INT", "year(x)"),
    "toMonth": ("(x TIMESTAMP) RETURNS INT", "month(x)"),
    "toHour": ("(x TIMESTAMP) RETURNS INT", "hour(x)"),
    "toDayOfWeek": ("(x TIMESTAMP) RETURNS INT", "weekday(x) + 1"),  # CH: Mon=1
    "toUnixTimestamp": ("(x TIMESTAMP) RETURNS BIGINT", "unix_timestamp(x)"),
    # string/array spellings
    "splitByChar": (
        "(sep STRING, s STRING) RETURNS ARRAY<STRING>",
        r"split(s, concat('\\Q', sep, '\\E'))",  # literal separator, not regex
    ),
    "arrayStringConcat": (
        "(a ARRAY<STRING>, sep STRING) RETURNS STRING",
        "array_join(a, sep)",
    ),
    "replaceAll": ("(s STRING, a STRING, b STRING) RETURNS STRING", "replace(s, a, b)"),
    "positionCaseSensitive": ("(h STRING, n STRING) RETURNS INT", "instr(h, n)"),
    # arithmetic spellings (ClickHouse function-call style). CH's
    # division is IEEE Float64 — divide(a, 0) is +-inf (nan at 0/0) —
    # where the session's ANSI `/` OPERATOR throws DIVIDE_BY_ZERO;
    # the named spelling branches so CH queries that rely on inf
    # (e.g. feeding ifNotFinite) run verbatim. The bare `a / b`
    # operator keeps the loud ANSI error (documented deviation: spell
    # divide(a, b) for CH zero-divisor semantics).
    "plus": ("(a DOUBLE, b DOUBLE) RETURNS DOUBLE", "a + b"),
    "minus": ("(a DOUBLE, b DOUBLE) RETURNS DOUBLE", "a - b"),
    "multiply": ("(a DOUBLE, b DOUBLE) RETURNS DOUBLE", "a * b"),
    "divide": (
        "(a DOUBLE, b DOUBLE) RETURNS DOUBLE",
        "CASE WHEN b = 0 THEN"
        " CASE WHEN a > 0 THEN double('Infinity')"
        " WHEN a < 0 THEN double('-Infinity')"
        " ELSE double('NaN') END"
        " ELSE a / b END",
    ),
    # more date/time spellings
    "toMinute": ("(x TIMESTAMP) RETURNS INT", "minute(x)"),
    "toSecond": ("(x TIMESTAMP) RETURNS INT", "second(x)"),
    "toDayOfMonth": ("(x TIMESTAMP) RETURNS INT", "day(x)"),
    "toDayOfYear": ("(x TIMESTAMP) RETURNS INT", "dayofyear(x)"),
    "toQuarter": ("(x TIMESTAMP) RETURNS INT", "quarter(x)"),
    "toStartOfQuarter": ("(x TIMESTAMP) RETURNS DATE", "CAST(date_trunc('QUARTER', x) AS DATE)"),
    "toStartOfYear": ("(x TIMESTAMP) RETURNS DATE", "CAST(date_trunc('YEAR', x) AS DATE)"),
    "addDays": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x + make_interval(0, 0, 0, n)"),
    "subtractDays": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x - make_interval(0, 0, 0, n)"),
    "addHours": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x + make_interval(0, 0, 0, 0, n)"),
    # dateDiff / startsWith / endsWith intentionally absent: Spark ships
    # case-insensitive builtins with those names (datediff, startswith,
    # endswith) that CREATE FUNCTION cannot shadow; the string predicates
    # are drop-in already, and CH dateDiff('day', a, b) maps to the
    # builtin datediff(b, a) / timestampdiff(unit, a, b).
    "formatDateTime": ("(x TIMESTAMP, f STRING) RETURNS STRING", "date_format(x, f)"),
    # more string spellings
    "lowerUTF8": ("(s STRING) RETURNS STRING", "lower(s)"),
    "upperUTF8": ("(s STRING) RETURNS STRING", "upper(s)"),
    "trimBoth": ("(s STRING) RETURNS STRING", "trim(s)"),
    "leftPad": ("(s STRING, n INT, p STRING) RETURNS STRING", "lpad(s, n, p)"),
    "rightPad": ("(s STRING, n INT, p STRING) RETURNS STRING", "rpad(s, n, p)"),
    "extractAll": (
        "(s STRING, re STRING) RETURNS ARRAY<STRING>",
        "regexp_extract_all(s, re, 0)",
    ),
    "toString": ("(x STRING) RETURNS STRING", "x"),
    "toInt64": ("(s STRING) RETURNS BIGINT", "COALESCE(try_cast(s AS BIGINT), CAST(CAST(s AS DOUBLE) AS BIGINT))"),
    "toFloat64": ("(s STRING) RETURNS DOUBLE", "CAST(s AS DOUBLE)"),
    "toInt64OrNull": ("(s STRING) RETURNS BIGINT", "try_cast(s AS BIGINT)"),
    "toFloat64OrNull": ("(s STRING) RETURNS DOUBLE", "try_cast(s AS DOUBLE)"),
    # more array spellings
    "arraySlice": (
        "(a ARRAY<STRING>, off INT, len INT) RETURNS ARRAY<STRING>",
        "slice(a, off, len)",
    ),
    "arraySort": ("(a ARRAY<STRING>) RETURNS ARRAY<STRING>", "array_sort(a)"),
    "arrayReverse": ("(a ARRAY<STRING>) RETURNS ARRAY<STRING>", "reverse(a)"),
    "arrayUniq": ("(a ARRAY<STRING>) RETURNS INT", "size(array_distinct(a))"),
    "indexOf": ("(a ARRAY<STRING>, x STRING) RETURNS INT", "array_position(a, x)"),
    "arrayConcat": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS ARRAY<STRING>",
        "concat(a, b)",
    ),
    "arrayDifference": (
        "(a ARRAY<BIGINT>) RETURNS ARRAY<BIGINT>",
        "transform(a, (x, i) -> IF(i = 0, CAST(0 AS BIGINT), x - a[i - 1]))",
    ),
    "arrayCumSum": (
        "(a ARRAY<BIGINT>) RETURNS ARRAY<BIGINT>",
        "transform(a, (x, i) -> aggregate(slice(a, 1, i + 1), CAST(0 AS BIGINT), (s, y) -> s + y))",
    ),
    "arrayEnumerate": (
        "(a ARRAY<STRING>) RETURNS ARRAY<INT>",
        "transform(a, (x, i) -> i + 1)",
    ),
    "arrayCompact": (
        "(a ARRAY<STRING>) RETURNS ARRAY<STRING>",
        "filter(a, (x, i) -> i = 0 OR x != a[i - 1])",
    ),
    "arrayIntersect": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS ARRAY<STRING>",
        "array_sort(array_intersect(a, b))",
    ),
    # URL functions (ClickHouse URL family). Backed by Spark's built-in
    # parse_url (JVM java.net.URI-based, codegen) rather than regexes —
    # the engine-idiomatic path; q116 oracle-checks them on well-formed
    # absolute URLs where parse_url and a plain regex agree.
    "protocol": ("(u STRING) RETURNS STRING", "parse_url(u, 'PROTOCOL')"),
    "domain": ("(u STRING) RETURNS STRING", "parse_url(u, 'HOST')"),
    # public-suffix-list-free simplification (documented): significant
    # subdomain = second-to-last host label; the cut keeps the last two
    "firstSignificantSubdomain": (
        "(u STRING) RETURNS STRING",
        r"coalesce(try_element_at(split(parse_url(u, 'HOST'), '\\.'), -2), '')",
    ),
    "cutToFirstSignificantSubdomain": (
        "(u STRING) RETURNS STRING",
        r"(CASE WHEN size(split(parse_url(u, 'HOST'), '\\.')) < 2"
        r" THEN coalesce(parse_url(u, 'HOST'), '')"
        r" ELSE concat_ws('.', slice(split(parse_url(u, 'HOST'), '\\.'), -2, 2))"
        r" END)",
    ),
    "path": ("(u STRING) RETURNS STRING", "parse_url(u, 'PATH')"),
    "pathFull": ("(u STRING) RETURNS STRING", "parse_url(u, 'FILE')"),
    "queryString": ("(u STRING) RETURNS STRING", "parse_url(u, 'QUERY')"),
    "fragment": ("(u STRING) RETURNS STRING", "parse_url(u, 'REF')"),
    "extractURLParameter": (
        "(u STRING, k STRING) RETURNS STRING",
        "parse_url(u, 'QUERY', k)",
    ),
    "cutQueryString": ("(u STRING) RETURNS STRING", "substring_index(u, '?', 1)"),
    "cutFragment": ("(u STRING) RETURNS STRING", "substring_index(u, '#', 1)"),
    "cutQueryStringAndFragment": (
        "(u STRING) RETURNS STRING",
        r"regexp_replace(u, '[?#].*$', '')",
    ),
    "cutWWW": (
        "(u STRING) RETURNS STRING",
        r"regexp_replace(u, '(^|//)www\\.', '$1')",
    ),
    "netloc": (
        "(u STRING) RETURNS STRING",
        r"regexp_extract(u, '^(?:[a-z][a-z0-9+.-]*:)?//([^/?#]*)', 1)",
    ),
    # ClickHouse's public-suffix heuristic: the label left of a
    # second-level suffix (com/net/org/co/gov/mil/edu) when present,
    # else the label left of the TLD
    "firstSignificantSubdomain": (
        "(u STRING) RETURNS STRING",
        "CASE WHEN size(split(parse_url(u, 'HOST'), '\\\\.')) < 2 THEN ''"
        " WHEN element_at(split(parse_url(u, 'HOST'), '\\\\.'), -2)"
        "   IN ('com', 'net', 'org', 'co', 'gov', 'mil', 'edu')"
        "   AND size(split(parse_url(u, 'HOST'), '\\\\.')) >= 3"
        " THEN element_at(split(parse_url(u, 'HOST'), '\\\\.'), -3)"
        " ELSE element_at(split(parse_url(u, 'HOST'), '\\\\.'), -2) END",
    ),
    "extractURLParameters": (
        "(u STRING) RETURNS ARRAY<STRING>",
        "filter(split(coalesce(parse_url(u, 'QUERY'), ''), '&'),"
        " p -> p != '')",
    ),
    "extractURLParameterNames": (
        "(u STRING) RETURNS ARRAY<STRING>",
        "transform(filter(split(coalesce(parse_url(u, 'QUERY'), ''), '&'),"
        " p -> p != ''), p -> substring_index(p, '=', 1))",
    ),
    # url_encode spells spaces '+'; ClickHouse uses %20
    "encodeURLComponent": (
        "(s STRING) RETURNS STRING",
        "replace(url_encode(s), '+', '%20')",
    ),
    "decodeURLComponent": ("(s STRING) RETURNS STRING", "url_decode(s)"),
    # form-encoding variants: x-www-form-urlencoded spells spaces '+',
    # which is exactly what Spark's url_encode/url_decode do natively
    "encodeURLFormComponent": ("(s STRING) RETURNS STRING", "url_encode(s)"),
    "decodeURLFormComponent": ("(s STRING) RETURNS STRING", "url_decode(s)"),
    "queryStringAndFragment": (
        "(u STRING) RETURNS STRING",
        "concat(coalesce(parse_url(u, 'QUERY'), ''),"
        " CASE WHEN parse_url(u, 'REF') IS NOT NULL"
        " THEN concat('#', parse_url(u, 'REF')) ELSE '' END)",
    ),
    # cumulative path prefixes chopped at each '/' — ClickHouse's
    # URLPathHierarchy('https://x/browse/CONV-6788') =
    # ['/browse/', '/browse/CONV-6788']; elements end AT each break, a
    # trailing element only when the path doesn't end in '/'
    "URLPathHierarchy": (
        "(u STRING) RETURNS ARRAY<STRING>",
        "(CASE WHEN coalesce(parse_url(u, 'PATH'), '') IN ('', '/')"
        " THEN CAST(array() AS ARRAY<STRING>)"
        " ELSE concat("
        "   filter(transform(sequence(2, length(parse_url(u, 'PATH'))),"
        "     i -> CASE WHEN substring(parse_url(u, 'PATH'), i, 1) = '/'"
        "          THEN substring(parse_url(u, 'PATH'), 1, i) END),"
        "     x -> x IS NOT NULL),"
        "   CASE WHEN substring(parse_url(u, 'PATH'), -1, 1) != '/'"
        "        THEN array(parse_url(u, 'PATH'))"
        "        ELSE CAST(array() AS ARRAY<STRING>) END)"
        " END)",
    ),
    # same prefixes anchored at protocol+host; first element is the
    # site root (ClickHouse returns ['https://x/', 'https://x/a/', ...])
    "URLHierarchy": (
        "(u STRING) RETURNS ARRAY<STRING>",
        "(CASE WHEN regexp_extract(u,"
        " '^((?:[a-z][a-z0-9+.-]*:)?//[^/?#]*)', 1) = ''"
        " THEN CAST(array() AS ARRAY<STRING>)"
        " ELSE concat("
        "   array(concat(regexp_extract(u,"
        "     '^((?:[a-z][a-z0-9+.-]*:)?//[^/?#]*)', 1), '/')),"
        "   transform(URLPathHierarchy(u), e -> concat(regexp_extract(u,"
        "     '^((?:[a-z][a-z0-9+.-]*:)?//[^/?#]*)', 1), e)))"
        " END)",
    ),
    "topLevelDomain": (
        "(u STRING) RETURNS STRING",
        r"regexp_extract(parse_url(u, 'HOST'), '\\.([^.]+)$', 1)",
    ),
    # RFC twin (batch-70): same last-label extraction; domainRFC's
    # parse_url body is inlined because it registers LATER in this
    # dict (temp-function bodies resolve at CREATE time)
    "topLevelDomainRFC": (
        "(u STRING) RETURNS STRING",
        r"regexp_extract(parse_url(u, 'HOST'), '\\.([^.]+)$', 1)",
    ),
    # IP functions (ClickHouse IPv4 family; value is a UInt32 as BIGINT)
    "IPv4NumToString": (
        "(n BIGINT) RETURNS STRING",
        "concat(CAST((n div 16777216) % 256 AS STRING), '.', "
        "CAST((n div 65536) % 256 AS STRING), '.', "
        "CAST((n div 256) % 256 AS STRING), '.', CAST(n % 256 AS STRING))",
    ),
    "IPv4StringToNum": (
        "(s STRING) RETURNS BIGINT",
        "CAST(split(s, '\\\\.')[0] AS BIGINT) * 16777216 + "
        "CAST(split(s, '\\\\.')[1] AS BIGINT) * 65536 + "
        "CAST(split(s, '\\\\.')[2] AS BIGINT) * 256 + "
        "CAST(split(s, '\\\\.')[3] AS BIGINT)",
    ),
    # the dotted-quad check is inlined (CREATE FUNCTION validates body
    # references at creation, and isIPv4String registers later)
    "IPv4StringToNumOrNull": (
        "(s STRING) RETURNS BIGINT",
        r"CASE WHEN s RLIKE '^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$'"
        " THEN IPv4StringToNum(s) END",
    ),
    "toIPv4": (
        "(s STRING) RETURNS BIGINT",
        "IPv4StringToNum(s)",
    ),
    "toIPv4OrNull": (
        "(s STRING) RETURNS BIGINT",
        r"CASE WHEN s RLIKE '^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$'"
        " THEN IPv4StringToNum(s) END",
    ),
    # batch-68: the OrZero spellings coalesce onto the type's zero
    # address (CH renders 0.0.0.0 / ::); the IPv6 try-parse is the
    # session-registered pandas UDF (strdist.py), resolvable here
    # because register_sql_aliases registers the ch_* UDFs first
    "toIPv4OrZero": (
        "(s STRING) RETURNS BIGINT",
        "coalesce(toIPv4OrNull(s), CAST(0 AS BIGINT))",
    ),
    "toIPv6OrZero": (
        "(s STRING) RETURNS STRING",
        "coalesce(ch_try_ipv6_normalize(s), '::')",
    ),
    # (lo, hi) of the CIDR block as a struct — ClickHouse returns a
    # tuple of IPv4 values, same numeric content
    "IPv4CIDRToRange": (
        "(ip BIGINT, bits INT) RETURNS STRUCT<lo: BIGINT, hi: BIGINT>",
        "named_struct("
        " 'lo', shiftleft(shiftright(ip, 32 - bits), 32 - bits),"
        " 'hi', shiftleft(shiftright(ip, 32 - bits), 32 - bits)"
        "       + CAST(pow(2, 32 - bits) AS BIGINT) - 1)",
    ),
    "toUUID": ("(s STRING) RETURNS STRING", "lower(s)"),
    "toUUIDOrNull": (
        "(s STRING) RETURNS STRING",
        "CASE WHEN s RLIKE"
        " '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        "-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$'"
        " THEN lower(s) END",
    ),
    "toUUIDOrZero": (
        "(s STRING) RETURNS STRING",
        "coalesce(toUUIDOrNull(s),"
        " '00000000-0000-0000-0000-000000000000')",
    ),
    "UUIDStringToNum": (
        "(s STRING) RETURNS BINARY",
        "unhex(replace(s, '-', ''))",
    ),
    "UUIDNumToString": (
        "(b BINARY) RETURNS STRING",
        "concat_ws('-', substring(lower(hex(b)), 1, 8),"
        " substring(lower(hex(b)), 9, 4), substring(lower(hex(b)), 13, 4),"
        " substring(lower(hex(b)), 17, 4), substring(lower(hex(b)), 21, 12))",
    ),
    "arrayJaccardIndex": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS DOUBLE",
        "size(array_intersect(a, b)) * 1.0"
        " / size(array_distinct(concat(a, b)))",
    ),
    # JSONExtract siblings (q17 covers JSONExtractString; these decode
    # the other scalar types with the same get_json_object core)
    "JSONExtractInt": (
        "(j STRING, k STRING) RETURNS BIGINT",
        "try_cast(get_json_object(j, concat('$.', k)) AS BIGINT)",
    ),
    "JSONExtractFloat": (
        "(j STRING, k STRING) RETURNS DOUBLE",
        "try_cast(get_json_object(j, concat('$.', k)) AS DOUBLE)",
    ),
    "JSONExtractBool": (
        "(j STRING, k STRING) RETURNS BOOLEAN",
        "try_cast(get_json_object(j, concat('$.', k)) AS BOOLEAN)",
    ),
    "JSONExtractRaw": (
        "(j STRING, k STRING) RETURNS STRING",
        "get_json_object(j, concat('$.', k))",
    ),
    "JSONHas": (
        "(j STRING, k STRING) RETURNS BOOLEAN",
        "get_json_object(j, concat('$.', k)) IS NOT NULL",
    ),
    "JSONExtractKeys": (
        "(j STRING) RETURNS ARRAY<STRING>",
        "json_object_keys(j)",
    ),
    "isValidJSON": (
        "(s STRING) RETURNS BOOLEAN",
        "try_parse_json(s) IS NOT NULL",
    ),
    "JSONArrayLength": (
        "(s STRING) RETURNS INT",
        "json_array_length(s)",
    ),
    # simpleJSON* is ClickHouse's fast non-nested scanner — same answers
    # as JSONExtract* on the flat keys it supports
    "simpleJSONExtractString": (
        "(j STRING, k STRING) RETURNS STRING",
        "get_json_object(j, concat('$.', k))",
    ),
    "simpleJSONExtractInt": (
        "(j STRING, k STRING) RETURNS BIGINT",
        "TRY_CAST(get_json_object(j, concat('$.', k)) AS BIGINT)",
    ),
    "simpleJSONExtractFloat": (
        "(j STRING, k STRING) RETURNS DOUBLE",
        "TRY_CAST(get_json_object(j, concat('$.', k)) AS DOUBLE)",
    ),
    # unsigned variant: CH's readUIntText fails on '-' and yields 0, and a
    # missing key also yields 0 — greatest(0, NULL) = 0 covers both
    # (Spark's greatest skips NULLs when another arg is non-null)
    "simpleJSONExtractUInt": (
        "(j STRING, k STRING) RETURNS BIGINT",
        "greatest(CAST(0 AS BIGINT),"
        " TRY_CAST(get_json_object(j, concat('$.', k)) AS BIGINT))",
    ),
    "simpleJSONExtractBool": (
        "(j STRING, k STRING) RETURNS BOOLEAN",
        "TRY_CAST(get_json_object(j, concat('$.', k)) AS BOOLEAN)",
    ),
    "simpleJSONHas": (
        "(j STRING, k STRING) RETURNS BOOLEAN",
        "get_json_object(j, concat('$.', k)) IS NOT NULL",
    ),
    # raw JSON of the value: objects/arrays/numbers/bools pass through,
    # strings are re-quoted with to_json's own escaping (CH returns ''
    # for a missing key, not NULL). The to_json(array(v)) bracket-strip
    # is the escape-correct way to JSON-quote an arbitrary string.
    "simpleJSONExtractRaw": (
        "(j STRING, k STRING) RETURNS STRING",
        "(CASE WHEN get_json_object(j, concat('$.', k)) IS NULL THEN ''"
        " WHEN get_json_object(j, concat('$.', k)) RLIKE '^[\\\\[{]'"
        "   OR try_cast(get_json_object(j, concat('$.', k)) AS DOUBLE)"
        "     IS NOT NULL"
        "   OR get_json_object(j, concat('$.', k))"
        "     IN ('true', 'false', 'null')"
        " THEN get_json_object(j, concat('$.', k))"
        " ELSE substr(to_json(array(get_json_object(j,"
        " concat('$.', k)))), 2,"
        " length(to_json(array(get_json_object(j, concat('$.', k)))))"
        " - 2) END)",
    ),
    # raw elements of a SCALAR json array (nested-object elements need
    # the full parser; documents' props only carry scalars)
    "JSONExtractArrayRaw": (
        "(j STRING, k STRING) RETURNS ARRAY<STRING>",
        "from_json(get_json_object(j, concat('$.', k)), 'array<string>')",
    ),
    # arrays report element count, objects key count (json_array_length
    # is NULL on an object, so coalesce picks the right branch)
    "JSONLength": (
        "(j STRING) RETURNS INT",
        "coalesce(json_array_length(j),"
        " size(from_json(j, 'map<string,string>')))",
    ),
    # JSON path enumeration (r9 — previously refused): leaf paths in
    # dotted notation, unrolled to DEPTH 3 (objects nested deeper
    # report their depth-3 prefix — CH's JSON column type enumerates
    # fully, but flat event payloads rarely exceed this; documented).
    # Bracket JsonPath ($['k']) keeps keys with dots intact.
    "JSONAllPaths": (
        "(j STRING) RETURNS ARRAY<STRING>",
        "flatten(transform(json_object_keys(j), __k1 -> CASE WHEN"
        " get_json_object(j, concat('$[''', __k1, ''']'))"
        " RLIKE '^\\\\{'"
        " THEN flatten(transform(json_object_keys(get_json_object(j,"
        "   concat('$[''', __k1, ''']'))), __k2 -> CASE WHEN"
        "   get_json_object(j, concat('$[''', __k1, '''][''',"
        "     __k2, ''']')) RLIKE '^\\\\{'"
        "   THEN transform(json_object_keys(get_json_object(j,"
        "     concat('$[''', __k1, '''][''', __k2, ''']'))),"
        "     __k3 -> concat(__k1, '.', __k2, '.', __k3))"
        "   ELSE array(concat(__k1, '.', __k2)) END))"
        " ELSE array(__k1) END))",
    ),
    # every path is 'dynamic' in this engine (no shared-data storage
    # split exists outside CH's JSON column internals)
    "JSONDynamicPaths": (
        "(j STRING) RETURNS ARRAY<STRING>",
        "JSONAllPaths(j)",
    ),
    "JSONSharedDataPaths": (
        "(j STRING) RETURNS ARRAY<STRING>",
        "CAST(array() AS ARRAY<STRING>)",
    ),
    # SQL/JSON standard trio (probe batch 58) — paths are the caller's
    # '$...' JsonPath strings, fed to get_json_object directly.
    # JSON_VALUE: scalar at path as text, '' when missing or non-scalar
    # (CH's default return_type_allow_complex=false); JSON_QUERY wraps
    # the match in a one-element JSON array exactly as CH renders it.
    "JSON_EXISTS": (
        "(j STRING, p STRING) RETURNS BOOLEAN",
        "get_json_object(j, p) IS NOT NULL",
    ),
    # value-kind classification goes through variant_get's exact JSON
    # rendering when the path is a plain key/index chain (ADVICE r9:
    # get_json_object strips string quotes, so '"123"' or '"[x]"'
    # misclassified as number/container under the prefix heuristic);
    # wildcard/recursive paths — which variant_get rejects — keep the
    # old heuristic behind a lazily-evaluated CASE guard
    "JSON_VALUE": (
        "(j STRING, p STRING) RETURNS STRING",
        "CASE WHEN get_json_object(j, p) IS NULL THEN ''"
        " WHEN p RLIKE '^\\\\$(\\\\.[A-Za-z_][A-Za-z0-9_]*"
        "|\\\\[[0-9]+\\\\]|\\\\[''[^'']*''\\\\])*$' THEN"
        "   CASE WHEN left(to_json(variant_get(try_parse_json(j), p,"
        "     'variant')), 1) = '\"' THEN get_json_object(j, p)"
        "   WHEN coalesce(to_json(variant_get(try_parse_json(j), p,"
        "     'variant')), get_json_object(j, p)) RLIKE '^[\\\\[{]'"
        "     THEN ''"
        "   ELSE get_json_object(j, p) END"
        " WHEN get_json_object(j, p) RLIKE '^[\\\\[{]' THEN ''"
        " ELSE get_json_object(j, p) END",
    ),
    "JSON_QUERY": (
        "(j STRING, p STRING) RETURNS STRING",
        "CASE WHEN get_json_object(j, p) IS NULL THEN ''"
        " WHEN p RLIKE '^\\\\$(\\\\.[A-Za-z_][A-Za-z0-9_]*"
        "|\\\\[[0-9]+\\\\]|\\\\[''[^'']*''\\\\])*$'"
        "   AND try_parse_json(j) IS NOT NULL"
        " THEN CASE"
        "   WHEN to_json(variant_get(try_parse_json(j), p, 'variant'))"
        "     IS NULL THEN ''"
        "   ELSE concat('[', to_json(variant_get(try_parse_json(j), p,"
        "     'variant')), ']') END"
        " WHEN get_json_object(j, p) RLIKE '^[\\\\[{]'"
        "   OR try_cast(get_json_object(j, p) AS DOUBLE) IS NOT NULL"
        "   OR get_json_object(j, p) IN ('true', 'false', 'null')"
        " THEN concat('[', get_json_object(j, p), ']')"
        " ELSE to_json(array(get_json_object(j, p))) END",
    ),
    # (key, raw-value) pairs of a top-level object. The raw rendering
    # IS variant_get's to_json (exact quoting — ADVICE r9: the old
    # prefix heuristic rendered the string "123" as the number 123);
    # keys containing a quote would break the bracket path, so they
    # keep the heuristic (get_json_object tolerates them no better)
    "JSONExtractKeysAndValuesRaw": (
        "(j STRING) RETURNS ARRAY<STRUCT<key: STRING, value: STRING>>",
        "transform(json_object_keys(j), __k -> named_struct("
        "'key', __k, 'value',"
        " CASE WHEN __k NOT LIKE '%''%' THEN"
        "   coalesce(to_json(variant_get(try_parse_json(j),"
        "     concat('$[''', __k, ''']'), 'variant')), 'null')"
        " WHEN get_json_object(j, concat('$[''', __k, ''']'))"
        "   IS NULL THEN 'null'"
        " WHEN get_json_object(j, concat('$[''', __k, ''']'))"
        "   RLIKE '^[\\\\[{]'"
        "   OR try_cast(get_json_object(j, concat('$[''', __k, ''']'))"
        "     AS DOUBLE) IS NOT NULL"
        "   OR get_json_object(j, concat('$[''', __k, ''']'))"
        "     IN ('true', 'false', 'null')"
        " THEN get_json_object(j, concat('$[''', __k, ''']'))"
        " ELSE regexp_replace(to_json(array(get_json_object(j,"
        " concat('$[''', __k, ''']')))), '^\\\\[|\\\\]$', '') END))",
    ),
    "JSONType": (
        "(j STRING) RETURNS STRING",
        "CASE WHEN j IS NULL OR trim(j) = '' THEN NULL"
        " WHEN left(trim(j), 1) = '{' THEN 'Object'"
        " WHEN left(trim(j), 1) = '[' THEN 'Array'"
        " WHEN left(trim(j), 1) = '\"' THEN 'String'"
        " WHEN trim(j) IN ('true', 'false') THEN 'Bool'"
        " WHEN trim(j) = 'null' THEN 'Null'"
        " WHEN trim(j) RLIKE '^-?[0-9]+$' THEN 'Int64'"
        " ELSE 'Double' END",
    ),
    # the classifier is INLINED (not a JSONType call): a SQL-UDF call
    # whose argument carries a lambda variable cannot cross Spark's
    # function-inlining boundary (MISSING_ATTRIBUTES on __p)
    "JSONAllPathsWithTypes": (
        "(j STRING) RETURNS MAP<STRING, STRING>",
        "map_from_arrays(JSONAllPaths(j),"
        " transform(JSONAllPaths(j), __p ->"
        " CASE WHEN to_json(variant_get(try_parse_json(j),"
        "   concat('$.', __p), 'variant')) IS NULL THEN 'Null'"
        " WHEN left(to_json(variant_get(try_parse_json(j),"
        "   concat('$.', __p), 'variant')), 1) = '{' THEN 'Object'"
        " WHEN left(to_json(variant_get(try_parse_json(j),"
        "   concat('$.', __p), 'variant')), 1) = '[' THEN 'Array'"
        " WHEN left(to_json(variant_get(try_parse_json(j),"
        "   concat('$.', __p), 'variant')), 1) = '\"' THEN 'String'"
        " WHEN to_json(variant_get(try_parse_json(j),"
        "   concat('$.', __p), 'variant'))"
        "   IN ('true', 'false') THEN 'Bool'"
        " WHEN to_json(variant_get(try_parse_json(j),"
        "   concat('$.', __p), 'variant')) = 'null' THEN 'Null'"
        " WHEN to_json(variant_get(try_parse_json(j),"
        "   concat('$.', __p), 'variant'))"
        "   RLIKE '^-?[0-9]+$' THEN 'Int64'"
        " ELSE 'Double' END))",
    ),
    "formatReadableSize": (
        "(b DOUBLE) RETURNS STRING",
        "CASE WHEN b >= 1073741824 THEN concat(CAST(ROUND(b / 1073741824, 2) AS STRING), ' GiB')"
        "     WHEN b >= 1048576 THEN concat(CAST(ROUND(b / 1048576, 2) AS STRING), ' MiB')"
        "     WHEN b >= 1024 THEN concat(CAST(ROUND(b / 1024, 2) AS STRING), ' KiB')"
        "     ELSE concat(CAST(CAST(b AS BIGINT) AS STRING), ' B') END",
    ),
    # numeric array folds (ClickHouse arraySum/arrayAvg family; min/max
    # map to Spark's array_min/array_max builtins)
    "arraySum": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
        "aggregate(a, CAST(0.0 AS DOUBLE), (s, x) -> s + x)",
    ),
    "arrayAvg": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
        "aggregate(a, CAST(0.0 AS DOUBLE), (s, x) -> s + x) / size(a)",
    ),
    "arrayMin": ("(a ARRAY<DOUBLE>) RETURNS DOUBLE", "array_min(a)"),
    "arrayMax": ("(a ARRAY<DOUBLE>) RETURNS DOUBLE", "array_max(a)"),
    "arrayProduct": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
        "aggregate(a, CAST(1.0 AS DOUBLE), (s, x) -> s * x)",
    ),
    # UTF8-suffixed string spellings (Spark strings are UTF-8 already,
    # so these are the plain builtins; length/position are
    # CHARACTER-counting in both engines)
    "lengthUTF8": ("(s STRING) RETURNS INT", "char_length(s)"),
    "substringUTF8": ("(s STRING, p INT, l INT) RETURNS STRING", "substring(s, p, l)"),
    "positionUTF8": ("(h STRING, n STRING) RETURNS INT", "instr(h, n)"),
    "splitByString": (
        "(sep STRING, s STRING) RETURNS ARRAY<STRING>",
        r"split(s, concat('\\Q', sep, '\\E'))",  # literal separator
    ),
    "countSubstrings": (
        "(h STRING, n STRING) RETURNS INT",
        "CAST((length(h) - length(replace(h, n, ''))) / length(n) AS INT)",
    ),
    "countSubstringsCaseInsensitive": (
        "(h STRING, n STRING) RETURNS INT",
        "CAST((length(h) - length(replace(lower(h), lower(n), '')))"
        " / length(n) AS INT)",
    ),
    "isValidUTF8": (
        "(s STRING) RETURNS BOOLEAN",
        "try_validate_utf8(s) IS NOT NULL",
    ),
    # character-SET Jaccard (ClickHouse computes a byte-multiset index —
    # documented granularity deviation, same [0, 1] scale)
    "stringJaccardIndex": (
        "(a STRING, b STRING) RETURNS DOUBLE",
        "size(array_intersect(split(a, ''), split(b, '')))"
        " / CAST(size(array_union(split(a, ''), split(b, ''))) AS DOUBLE)",
    ),
    # the UTF8 spelling IS this codepoint-set computation (Spark
    # strings split per codepoint), so both names share it
    "stringJaccardIndexUTF8": (
        "(a STRING, b STRING) RETURNS DOUBLE",
        "size(array_intersect(split(a, ''), split(b, '')))"
        " / CAST(size(array_union(split(a, ''), split(b, ''))) AS DOUBLE)",
    ),
    # distinct 4-grams (strings shorter than 4 chars contribute their
    # whole tail) — the shared kernel for ngramDistance/ngramSearch
    "chFourGrams": (
        "(s STRING) RETURNS ARRAY<STRING>",
        "array_distinct(transform(sequence(1, greatest(length(s) - 3, 1)),"
        " i -> substring(s, i, 4)))",
    ),
    # set-based 4-gram distance/search (ClickHouse counts multisets —
    # documented deviation, same scale and ordering behavior)
    "ngramDistance": (
        "(a STRING, b STRING) RETURNS DOUBLE",
        "1.0 - size(array_intersect(chFourGrams(a), chFourGrams(b)))"
        " / CAST(size(array_union(chFourGrams(a), chFourGrams(b))) AS DOUBLE)",
    ),
    "ngramSearch": (
        "(h STRING, n STRING) RETURNS DOUBLE",
        "size(array_intersect(chFourGrams(n), chFourGrams(h)))"
        " / CAST(size(chFourGrams(n)) AS DOUBLE)",
    ),
    "multiSearchAny": (
        "(s STRING, pats ARRAY<STRING>) RETURNS BOOLEAN",
        "exists(pats, p -> instr(s, p) > 0)",
    ),
    # integer-width cast spellings (CH's unsigned widths widen to the
    # next signed Spark type — Spark has no unsigned integers)
    "toInt8": ("(s STRING) RETURNS TINYINT", "COALESCE(try_cast(s AS TINYINT), CAST(CAST(s AS DOUBLE) AS TINYINT))"),
    "toInt16": ("(s STRING) RETURNS SMALLINT", "COALESCE(try_cast(s AS SMALLINT), CAST(CAST(s AS DOUBLE) AS SMALLINT))"),
    "toInt32": ("(s STRING) RETURNS INT", "COALESCE(try_cast(s AS INT), CAST(CAST(s AS DOUBLE) AS INT))"),
    "toUInt8": ("(s STRING) RETURNS SMALLINT", "COALESCE(try_cast(s AS SMALLINT), CAST(CAST(s AS DOUBLE) AS SMALLINT))"),
    "toUInt16": ("(s STRING) RETURNS INT", "COALESCE(try_cast(s AS INT), CAST(CAST(s AS DOUBLE) AS INT))"),
    "toUInt32": ("(s STRING) RETURNS BIGINT", "COALESCE(try_cast(s AS BIGINT), CAST(CAST(s AS DOUBLE) AS BIGINT))"),
    "toUInt64": ("(s STRING) RETURNS BIGINT", "COALESCE(try_cast(s AS BIGINT), CAST(CAST(s AS DOUBLE) AS BIGINT))"),
    "toFloat32": ("(s STRING) RETURNS FLOAT", "CAST(s AS FLOAT)"),
    # -OrNull / -OrZero conversion family: unparseable input -> NULL / 0
    # (plain to* THROWS under ANSI where ClickHouse throws too)
    **{
        f"to{ch}OrNull": (
            f"(s STRING) RETURNS {sp}", f"TRY_CAST(s AS {sp})"
        )
        for ch, sp in [
            ("Int8", "TINYINT"), ("Int16", "SMALLINT"), ("Int32", "INT"),
            ("Int64", "BIGINT"), ("UInt8", "SMALLINT"), ("UInt16", "INT"),
            ("UInt32", "BIGINT"), ("UInt64", "BIGINT"),
            ("Float32", "FLOAT"),
        ]
    },
    **{
        f"to{ch}OrZero": (
            f"(s STRING) RETURNS {sp}",
            f"COALESCE(TRY_CAST(s AS {sp}), CAST(0 AS {sp}))",
        )
        for ch, sp in [
            ("Int8", "TINYINT"), ("Int16", "SMALLINT"), ("Int32", "INT"),
            ("Int64", "BIGINT"), ("UInt8", "SMALLINT"), ("UInt16", "INT"),
            ("UInt32", "BIGINT"), ("UInt64", "BIGINT"),
            ("Float32", "FLOAT"), ("Float64", "DOUBLE"),
        ]
    },
    "toDateOrNull": ("(s STRING) RETURNS DATE", "TRY_CAST(s AS DATE)"),
    # Date32 is the same calendar type here (no 1900 floor in Spark)
    "toDate32OrNull": ("(s STRING) RETURNS DATE", "TRY_CAST(s AS DATE)"),
    "toDate32OrZero": (
        "(s STRING) RETURNS DATE",
        "coalesce(TRY_CAST(s AS DATE), DATE'1970-01-01')",
    ),
    "toDateTimeOrNull": (
        "(s STRING) RETURNS TIMESTAMP", "TRY_CAST(s AS TIMESTAMP)"
    ),
    # 64-bit hash spellings. ROLE parity, not bit parity: CH's
    # sipHash64/cityHash64 and Spark's xxhash64 are different mixers, so
    # values differ across engines — fine for their actual uses
    # (bucketing, sampling, fingerprint joins computed and consumed
    # inside one engine), wrong for persisted cross-system hash
    # contracts (persist the md5 fingerprint column for that).
    "sipHash64": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    "cityHash64": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    "farmFingerprint64": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    "gccMurmurHash": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    # 128-bit family: 16 raw bytes like CH's FixedString(16)
    "sipHash128": ("(s STRING) RETURNS BINARY", "unhex(md5(s))"),
    # cryptographic 256-bit digest role-equivalent (SHA-256 — blake3
    # itself has no JVM spelling; same 32-byte contract)
    "blake3": ("(s STRING) RETURNS BINARY", "unhex(sha2(s, 256))"),
    # 64-bit non-crypto fingerprints: the documented xxhash64 role
    # convention (bit-compat with wyhash is not promised, the 64-bit
    # avalanche contract is)
    "wyHash64": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    # probe batch 59 tails of the same role convention: 32-bit
    # spellings take the masked low word; xxh3 rides the 64-bit role
    "xxHash32": (
        "(s STRING) RETURNS BIGINT", "xxhash64(s) & 4294967295",
    ),
    "xxh3": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    "javaHashUTF16LE": ("(s STRING) RETURNS INT", "hash(s)"),
    # CRC-32-IEEE 802.3 is exactly Spark's crc32
    "CRC32IEEE": ("(s STRING) RETURNS BIGINT", "crc32(s)"),
    "CRC64": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    # URL hash: CityHash-role hash of the URL with one trailing
    # /, ? or # removed (CH's documented normalization)
    "URLHash": (
        "(u STRING) RETURNS BIGINT",
        "xxhash64(regexp_replace(u, '[/?#]$', ''))",
    ),
    # exact digests (Spark sha2 covers the SHA-2 widths)
    "SHA224": ("(s STRING) RETURNS BINARY", "unhex(sha2(s, 224))"),
    "SHA384": ("(s STRING) RETURNS BINARY", "unhex(sha2(s, 384))"),
    "SHA512": ("(s STRING) RETURNS BINARY", "unhex(sha2(s, 512))"),
    # Kafka's partitioner hash contract: NON-NEGATIVE 32-bit (Kafka
    # masks the sign bit); murmur3 plays murmur2's role
    "kafkaMurmurHash": (
        "(s STRING) RETURNS INT",
        "CAST(hash(s) & 2147483647 AS INT)",
    ),
    "murmurHash3_128": ("(s STRING) RETURNS BINARY", "unhex(md5(s))"),
    # session-timezone offset of a timestamp, in seconds (0 under the
    # engine's pinned-UTC sessions; correct under any other tz)
    "timeZoneOffset": (
        "(t TIMESTAMP) RETURNS INT",
        "CAST(CAST(t AS DOUBLE)"
        " - CAST(to_utc_timestamp(t, current_timezone()) AS DOUBLE)"
        " AS INT)",
    ),
    # access-control introspection stand-ins (single-tenant engine)
    "currentRoles": (
        "() RETURNS ARRAY<STRING>", "array(current_user())"
    ),
    "currentProfiles": ("() RETURNS ARRAY<STRING>", "array('default')"),
    "enabledProfiles": ("() RETURNS ARRAY<STRING>", "array('default')"),
    "defaultRoles": (
        "() RETURNS ARRAY<STRING>", "array(current_user())"
    ),
    "enabledRoles": (
        "() RETURNS ARRAY<STRING>", "array(current_user())"
    ),
    # MAC address codecs (exact 48-bit hex formatting, CH's
    # uppercase colon-separated rendering)
    "MACNumToString": (
        "(n BIGINT) RETURNS STRING",
        "array_join(transform(sequence(5, 0, -1),"
        " __i -> lpad(hex(shiftright(n, __i * 8) & 255), 2, '0')), ':')",
    ),
    "MACStringToNum": (
        "(s STRING) RETURNS BIGINT",
        "CAST(conv(replace(s, ':', ''), 16, 10) AS BIGINT)",
    ),
    "MACStringToOUI": (
        "(s STRING) RETURNS BIGINT",
        "CAST(conv(substring(replace(s, ':', ''), 1, 6), 16, 10)"
        " AS BIGINT)",
    ),
    "initialQueryStartTime": ("() RETURNS TIMESTAMP", "now()"),
    "farmHash64": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    "intHash64": ("(x BIGINT) RETURNS BIGINT", "xxhash64(x)"),
    # UInt32 range like ClickHouse's (role parity, not bit parity)
    "intHash32": (
        "(x BIGINT) RETURNS BIGINT", "pmod(xxhash64(x), 4294967296)"
    ),
    "max2": ("(a DOUBLE, b DOUBLE) RETURNS DOUBLE", "greatest(a, b)"),
    "min2": ("(a DOUBLE, b DOUBLE) RETURNS DOUBLE", "least(a, b)"),
    # Spark strings are already valid UTF-8 at this boundary
    "toValidUTF8": ("(s STRING) RETURNS STRING", "s"),
    "countMatches": (
        "(s STRING, re STRING) RETURNS INT",
        "size(regexp_extract_all(s, re, 0))",
    ),
    # contiguous-subsequence containment via the sliding-window exists
    "hasSubstr": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS BOOLEAN",
        "CASE WHEN size(b) = 0 THEN TRUE WHEN size(b) > size(a) THEN FALSE"
        " ELSE exists(sequence(1, size(a) - size(b) + 1),"
        " i -> slice(a, i, size(b)) = b) END",
    ),
    "multiSearchFirstPosition": (
        "(s STRING, pats ARRAY<STRING>) RETURNS INT",
        # smallest positive locate() over the needles; 0 when none hit
        "coalesce(array_min(filter(transform(pats, p -> locate(p, s)),"
        " x -> x > 0)), 0)",
    ),
    "splitByNonAlpha": (
        "(s STRING) RETURNS ARRAY<STRING>",
        "filter(split(s, '[^A-Za-z]+'), x -> x != '')",
    ),
    "isFinite": (
        "(x DOUBLE) RETURNS BOOLEAN",
        "NOT (isnan(x) OR x IN (double('inf'), double('-inf')))",
    ),
    "isInfinite": (
        "(x DOUBLE) RETURNS BOOLEAN",
        "x IN (double('inf'), double('-inf'))",
    ),
    # isNaN needs no alias: Spark's isnan resolves case-insensitively
    "appendTrailingCharIfAbsent": (
        "(s STRING, c STRING) RETURNS STRING",
        "IF(endswith(s, c), s, concat(s, c))",
    ),
    "positionCaseInsensitive": (
        "(h STRING, n STRING) RETURNS INT",
        "locate(lower(n), lower(h))",
    ),
    "firstLine": ("(s STRING) RETURNS STRING", "substring_index(s, '\\n', 1)"),
    # token splitters: tokens() is ClickHouse's default (alphanumeric)
    # tokenizer; alphaTokens keeps letter runs only
    "tokens": (
        "(s STRING) RETURNS ARRAY<STRING>",
        "filter(split(s, '[^A-Za-z0-9]+'), __ch_t -> __ch_t != '')",
    ),
    "alphaTokens": (
        "(s STRING) RETURNS ARRAY<STRING>",
        "filter(split(s, '[^A-Za-z]+'), __ch_t -> __ch_t != '')",
    ),
    "ngrams": (
        "(s STRING, n INT) RETURNS ARRAY<STRING>",
        "IF(length(s) < n, CAST(array() AS ARRAY<STRING>),"
        " transform(sequence(1, length(s) - n + 1),"
        " __ch_i -> substring(s, __ch_i, n)))",
    ),
    # literal replacement only ('?' for every string/number literal) —
    # the fingerprint ClickHouse's normalizeQuery computes for query_log
    "normalizeQuery": (
        "(q STRING) RETURNS STRING",
        "regexp_replace(regexp_replace(q,"
        " '\\'[^\\']*\\'', '?'),"
        " '(?<![A-Za-z0-9_])[0-9]+(\\\\.[0-9]+)?', '?')",
    ),
    # Euclid fold: 96 iterations bounds the worst (Fibonacci) 64-bit case
    "gcd": (
        "(a BIGINT, b BIGINT) RETURNS BIGINT",
        "aggregate(sequence(1, 96), named_struct('g', abs(a), 'h', abs(b)),"
        " (__ch_acc, __ch_i) -> IF(__ch_acc.h = 0, __ch_acc,"
        " named_struct('g', __ch_acc.h, 'h', __ch_acc.g % __ch_acc.h)),"
        " __ch_acc -> __ch_acc.g)",
    ),
    "lcm": (
        "(a BIGINT, b BIGINT) RETURNS BIGINT",
        "CASE WHEN a = 0 OR b = 0 THEN 0"
        " ELSE abs((a div gcd(a, b)) * b) END",
    ),
    # greatest boundary <= x; below the smallest boundary ClickHouse
    # returns that smallest boundary
    "roundDown": (
        "(x DOUBLE, bounds ARRAY<DOUBLE>) RETURNS DOUBLE",
        "coalesce(array_max(filter(bounds, __ch_e -> __ch_e <= x)),"
        " array_min(bounds))",
    ),
    "roundToExp2": (
        "(x BIGINT) RETURNS BIGINT",
        "IF(x < 1, 0, shiftleft(CAST(1 AS BIGINT),"
        " CAST(floor(log2(x)) AS INT)))",
    ),
    # hash stand-ins: same 64-bit avalanche role; the VALUES differ from
    # ClickHouse's (documented deviation, same as cityHash64/farmHash64)
    "murmurHash3_64": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    "murmurHash2_64": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    "metroHash64": ("(s STRING) RETURNS BIGINT", "xxhash64(s)"),
    # 32-bit family routed to Spark's hash() (Murmur3_32, seed 42 vs
    # ClickHouse's seed — same documented value deviation as above)
    "murmurHash3_32": ("(s STRING) RETURNS INT", "hash(s)"),
    "murmurHash2_32": ("(s STRING) RETURNS INT", "hash(s)"),
    "javaHash": ("(s STRING) RETURNS INT", "hash(s)"),
    "hiveHash": ("(s STRING) RETURNS INT", "hash(s)"),
    "normalizedQueryHash": (
        "(s STRING) RETURNS BIGINT",
        "xxhash64(normalizeQuery(s))",
    ),
    # consistent-bucket API shape (stable assignment in [0, n)); the
    # bucket VALUES differ from ClickHouse's algorithms (jump/karger),
    # same class of deviation as the 64-bit hash family
    "jumpConsistentHash": ("(k BIGINT, n INT) RETURNS INT", "CAST(pmod(xxhash64(k), n) AS INT)"),
    # UInt64 keys above 2^63-1 (CH's own doc examples use them) wrap
    # to the signed 64-bit bit pattern before hashing (batch-68: a
    # BIGINT parameter overflowed on such literals)
    "kostikConsistentHash": (
        "(k DECIMAL(20,0), n INT) RETURNS INT",
        "CAST(pmod(xxhash64(CAST(k - CASE WHEN k > 9223372036854775807"
        " THEN CAST(18446744073709551616 AS DECIMAL(21,0))"
        " ELSE 0 END AS BIGINT)), n) AS INT)",
    ),
    "yandexConsistentHash": (
        "(k DECIMAL(20,0), n INT) RETURNS INT",
        "kostikConsistentHash(k, n)",
    ),
    "intExp10": ("(n INT) RETURNS BIGINT", "CAST(pow(10, n) AS BIGINT)"),
    # Lanczos approximation (g = 7, n = 9), |err| < 1e-13 for x > 0 —
    # Spark has no gamma builtins. chLgammaPos is the positive-domain
    # kernel (SQL UDFs cannot recurse, so the reflection branch calls
    # the kernel, not lgamma itself); poles (x <= 0 integer) are NULL.
    "chLgammaPos": (
        "(x DOUBLE) RETURNS DOUBLE",
        "0.5 * ln(2 * pi()) + (x - 0.5) * ln(x + 6.5) - (x + 6.5)"
        " + ln(0.99999999999980993 + 676.5203681218851 / x"
        "   - 1259.1392167224028 / (x + 1) + 771.32342877765313 / (x + 2)"
        "   - 176.61502916214059 / (x + 3) + 12.507343278686905 / (x + 4)"
        "   - 0.13857109526572012 / (x + 5) + 9.9843695780195716e-6 / (x + 6)"
        "   + 1.5056327351493116e-7 / (x + 7))",
    ),
    "lgamma": (
        "(x DOUBLE) RETURNS DOUBLE",
        "CASE WHEN x > 0 THEN chLgammaPos(x)"
        " WHEN x = CAST(floor(x) AS DOUBLE) THEN NULL"
        " ELSE ln(pi() / abs(sin(pi() * x))) - chLgammaPos(1 - x) END",
    ),
    "tgamma": (
        "(x DOUBLE) RETURNS DOUBLE",
        "CASE WHEN x > 0 THEN exp(chLgammaPos(x))"
        " WHEN x = CAST(floor(x) AS DOUBLE) THEN NULL"
        " ELSE pi() / (sin(pi() * x) * exp(chLgammaPos(1 - x))) END",
    ),
    "randCanonical": ("() RETURNS DOUBLE", "rand()"),
    "randUniform": (
        "(lo DOUBLE, hi DOUBLE) RETURNS DOUBLE",
        "lo + rand() * (hi - lo)",
    ),
    "randNormal": (
        "(mu DOUBLE, sigma DOUBLE) RETURNS DOUBLE",
        "mu + sigma * randn()",
    ),
    "randExponential": (
        "(rate DOUBLE) RETURNS DOUBLE",
        "-ln(1.0 - rand()) / rate",
    ),
    "bitmaskToList": (
        "(x BIGINT) RETURNS STRING",
        "concat_ws(',', transform(filter(sequence(0, 62),"
        " __ch_b -> (x & shiftleft(CAST(1 AS BIGINT), __ch_b)) != 0),"
        " __ch_b -> CAST(shiftleft(CAST(1 AS BIGINT), __ch_b)"
        " AS STRING)))",
    ),
    "bitmaskToArray": (
        "(x BIGINT) RETURNS ARRAY<BIGINT>",
        "transform(filter(sequence(0, 62),"
        " __ch_b -> (x & shiftleft(CAST(1 AS BIGINT), __ch_b)) != 0),"
        " __ch_b -> shiftleft(CAST(1 AS BIGINT), __ch_b))",
    ),
    "domainWithoutWWW": (
        "(u STRING) RETURNS STRING",
        r"regexp_replace(parse_url(u, 'HOST'), '^www\\.', '')",
    ),
    "isIPv4String": (
        "(s STRING) RETURNS BOOLEAN",
        r"s RLIKE '^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
        r"(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$'",
    ),
    "isIPv6String": (
        "(s STRING) RETURNS BOOLEAN",
        "s RLIKE '^([0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}$'"
        " AND s RLIKE ':'",
    ),
    # haversine metres on ClickHouse's sphere radius; geoDistance's
    # WGS-84 ellipsoid correction is approximated by the same sphere
    # (documented deviation, < 0.5% at any latitude)
    "greatCircleDistance": (
        "(lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE)"
        " RETURNS DOUBLE",
        "2 * 6372797.560856 * asin(sqrt("
        "pow(sin(radians(lat2 - lat1) / 2), 2)"
        " + cos(radians(lat1)) * cos(radians(lat2))"
        " * pow(sin(radians(lon2 - lon1) / 2), 2)))",
    ),
    "geoDistance": (
        "(lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE)"
        " RETURNS DOUBLE",
        "2 * 6372797.560856 * asin(sqrt("
        "pow(sin(radians(lat2 - lat1) / 2), 2)"
        " + cos(radians(lat1)) * cos(radians(lat2))"
        " * pow(sin(radians(lon2 - lon1) / 2), 2)))",
    ),
    # vector-distance family over ARRAY<DOUBLE> (L2/cosine/dot already
    # registered elsewhere in this table)
    "LinfDistance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "array_max(zip_with(a, b, (__ch_x, __ch_y) -> abs(__ch_x - __ch_y)))",
    ),
    "L2SquaredDistance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "aggregate(zip_with(a, b,"
        " (__ch_x, __ch_y) -> (__ch_x - __ch_y) * (__ch_x - __ch_y)),"
        " CAST(0.0 AS DOUBLE), (__ch_s, __ch_v) -> __ch_s + __ch_v)",
    ),
    "L1Norm": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
        "aggregate(a, CAST(0.0 AS DOUBLE),"
        " (__ch_s, __ch_v) -> __ch_s + abs(__ch_v))",
    ),
    "LinfNorm": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
        "array_max(transform(a, __ch_x -> abs(__ch_x)))",
    ),
    "L2Normalize": (
        "(a ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE>",
        "transform(a, __ch_x -> __ch_x / sqrt(aggregate(a,"
        " CAST(0.0 AS DOUBLE),"
        " (__ch_s, __ch_v) -> __ch_s + __ch_v * __ch_v)))",
    ),
    # typed empty-array constructors
    "emptyArrayUInt8": ("() RETURNS ARRAY<SMALLINT>", "CAST(array() AS ARRAY<SMALLINT>)"),
    "emptyArrayUInt16": ("() RETURNS ARRAY<INT>", "CAST(array() AS ARRAY<INT>)"),
    "emptyArrayUInt32": ("() RETURNS ARRAY<BIGINT>", "CAST(array() AS ARRAY<BIGINT>)"),
    "emptyArrayUInt64": ("() RETURNS ARRAY<BIGINT>", "CAST(array() AS ARRAY<BIGINT>)"),
    "emptyArrayInt8": ("() RETURNS ARRAY<TINYINT>", "CAST(array() AS ARRAY<TINYINT>)"),
    "emptyArrayInt16": ("() RETURNS ARRAY<SMALLINT>", "CAST(array() AS ARRAY<SMALLINT>)"),
    "emptyArrayInt32": ("() RETURNS ARRAY<INT>", "CAST(array() AS ARRAY<INT>)"),
    "emptyArrayInt64": ("() RETURNS ARRAY<BIGINT>", "CAST(array() AS ARRAY<BIGINT>)"),
    "emptyArrayFloat32": ("() RETURNS ARRAY<FLOAT>", "CAST(array() AS ARRAY<FLOAT>)"),
    "emptyArrayFloat64": ("() RETURNS ARRAY<DOUBLE>", "CAST(array() AS ARRAY<DOUBLE>)"),
    "emptyArrayString": ("() RETURNS ARRAY<STRING>", "CAST(array() AS ARRAY<STRING>)"),
    "emptyArrayDate": ("() RETURNS ARRAY<DATE>", "CAST(array() AS ARRAY<DATE>)"),
    "emptyArrayDateTime": ("() RETURNS ARRAY<TIMESTAMP>", "CAST(array() AS ARRAY<TIMESTAMP>)"),
    # erf/erfc via Abramowitz-Stegun 7.1.26 (|error| < 1.5e-7) — the
    # same scalar spellings ClickHouse exposes
    "erf": (
        "(x DOUBLE) RETURNS DOUBLE",
        "sign(x) * (1.0 - (0.254829592 / (1.0 + 0.3275911 * abs(x))"
        " - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * abs(x)), 2)"
        " + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * abs(x)), 3)"
        " - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * abs(x)), 4)"
        " + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * abs(x)), 5))"
        " * exp(-x * x))",
    ),
    "erfc": ("(x DOUBLE) RETURNS DOUBLE", "1.0 - erf(x)"),
    # Acklam's rational approximation of the standard-normal quantile
    # (|relative error| < 1.15e-9); the helper proportionsZTest's CI
    # needs, exposed under a ClickHouse-style spelling
    "normalQuantile": (
        "(p DOUBLE) RETURNS DOUBLE",
        "CASE"
        " WHEN p <= 0 OR p >= 1 THEN CAST('NaN' AS DOUBLE)"
        " WHEN p < 0.02425 THEN"
        "  (((((-7.784894002430293e-03 * sqrt(-2.0 * ln(p))"
        "  - 3.223964580411365e-01) * sqrt(-2.0 * ln(p))"
        "  - 2.400758277161838e+00) * sqrt(-2.0 * ln(p))"
        "  - 2.549732539343734e+00) * sqrt(-2.0 * ln(p))"
        "  + 4.374664141464968e+00) * sqrt(-2.0 * ln(p))"
        "  + 2.938163982698783e+00)"
        "  / ((((7.784695709041462e-03 * sqrt(-2.0 * ln(p))"
        "  + 3.224671290700398e-01) * sqrt(-2.0 * ln(p))"
        "  + 2.445134137142996e+00) * sqrt(-2.0 * ln(p))"
        "  + 3.754408661907416e+00) * sqrt(-2.0 * ln(p)) + 1.0)"
        " WHEN p > 0.97575 THEN"
        "  -((((((-7.784894002430293e-03 * sqrt(-2.0 * ln(1.0 - p))"
        "  - 3.223964580411365e-01) * sqrt(-2.0 * ln(1.0 - p))"
        "  - 2.400758277161838e+00) * sqrt(-2.0 * ln(1.0 - p))"
        "  - 2.549732539343734e+00) * sqrt(-2.0 * ln(1.0 - p))"
        "  + 4.374664141464968e+00) * sqrt(-2.0 * ln(1.0 - p))"
        "  + 2.938163982698783e+00)"
        "  / ((((7.784695709041462e-03 * sqrt(-2.0 * ln(1.0 - p))"
        "  + 3.224671290700398e-01) * sqrt(-2.0 * ln(1.0 - p))"
        "  + 2.445134137142996e+00) * sqrt(-2.0 * ln(1.0 - p))"
        "  + 3.754408661907416e+00) * sqrt(-2.0 * ln(1.0 - p)) + 1.0))"
        " ELSE"
        "  (((((-3.969683028665376e+01 * pow(p - 0.5, 2)"
        "  + 2.209460984245205e+02) * pow(p - 0.5, 2)"
        "  - 2.759285104469687e+02) * pow(p - 0.5, 2)"
        "  + 1.383577518672690e+02) * pow(p - 0.5, 2)"
        "  - 3.066479806614716e+01) * pow(p - 0.5, 2)"
        "  + 2.506628277459239e+00) * (p - 0.5)"
        "  / (((((-5.447609879822406e+01 * pow(p - 0.5, 2)"
        "  + 1.615858368580409e+02) * pow(p - 0.5, 2)"
        "  - 1.556989798598866e+02) * pow(p - 0.5, 2)"
        "  + 6.680131188771972e+01) * pow(p - 0.5, 2)"
        "  - 1.328068155288572e+01) * pow(p - 0.5, 2) + 1.0)"
        " END",
    ),
    # two-proportion z-test over pre-aggregated counts, the ClickHouse
    # tuple re-expressed as a named struct; two-sided p via erfc
    # nullif guards: a degenerate input (zero trials, or zero variance
    # when every/no trial converts) yields NULL fields, never an ANSI
    # divide-by-zero
    "proportionsZTest": (
        "(sx DOUBLE, sy DOUBLE, tx DOUBLE, ty DOUBLE, conf DOUBLE,"
        " usevar STRING) RETURNS"
        " STRUCT<z_statistic: DOUBLE, p_value: DOUBLE,"
        " ci_lower: DOUBLE, ci_upper: DOUBLE>",
        "named_struct("
        " 'z_statistic', (sx / nullif(tx, 0.0) - sy / nullif(ty, 0.0))"
        " / nullif(CASE lower(usevar)"
        "   WHEN 'pooled' THEN sqrt(((sx + sy) / nullif(tx + ty, 0.0))"
        "     * (1.0 - (sx + sy) / nullif(tx + ty, 0.0))"
        "     * (1.0 / nullif(tx, 0.0) + 1.0 / nullif(ty, 0.0)))"
        "   ELSE sqrt((sx / nullif(tx, 0.0)) * (1.0 - sx / nullif(tx, 0.0))"
        "     / nullif(tx, 0.0)"
        "     + (sy / nullif(ty, 0.0)) * (1.0 - sy / nullif(ty, 0.0))"
        "     / nullif(ty, 0.0)) END, 0.0),"
        " 'p_value', erfc(abs((sx / nullif(tx, 0.0) - sy / nullif(ty, 0.0))"
        " / nullif(CASE lower(usevar)"
        "   WHEN 'pooled' THEN sqrt(((sx + sy) / nullif(tx + ty, 0.0))"
        "     * (1.0 - (sx + sy) / nullif(tx + ty, 0.0))"
        "     * (1.0 / nullif(tx, 0.0) + 1.0 / nullif(ty, 0.0)))"
        "   ELSE sqrt((sx / nullif(tx, 0.0)) * (1.0 - sx / nullif(tx, 0.0))"
        "     / nullif(tx, 0.0)"
        "     + (sy / nullif(ty, 0.0)) * (1.0 - sy / nullif(ty, 0.0))"
        "     / nullif(ty, 0.0)) END, 0.0)) / sqrt(2.0)),"
        " 'ci_lower', (sx / nullif(tx, 0.0) - sy / nullif(ty, 0.0))"
        " - normalQuantile(1.0 - (1.0 - conf) / 2.0)"
        "   * sqrt((sx / nullif(tx, 0.0)) * (1.0 - sx / nullif(tx, 0.0))"
        "     / nullif(tx, 0.0)"
        "     + (sy / nullif(ty, 0.0)) * (1.0 - sy / nullif(ty, 0.0))"
        "     / nullif(ty, 0.0)),"
        " 'ci_upper', (sx / nullif(tx, 0.0) - sy / nullif(ty, 0.0))"
        " + normalQuantile(1.0 - (1.0 - conf) / 2.0)"
        "   * sqrt((sx / nullif(tx, 0.0)) * (1.0 - sx / nullif(tx, 0.0))"
        "     / nullif(tx, 0.0)"
        "     + (sy / nullif(ty, 0.0)) * (1.0 - sy / nullif(ty, 0.0))"
        "     / nullif(ty, 0.0)))",
    ),
    "SHA256": ("(s STRING) RETURNS BINARY", "unhex(sha2(s, 256))"),
    # bit-shift spellings
    "bitShiftLeft": ("(a BIGINT, n INT) RETURNS BIGINT", "shiftleft(a, n)"),
    "bitShiftRight": ("(a BIGINT, n INT) RETURNS BIGINT", "shiftright(a, n)"),
    # sub-hour time buckets (monitoring-dashboard staple; date_trunc
    # has no 5/10/15-minute unit)
    "toStartOfFiveMinutes": (
        "(x TIMESTAMP) RETURNS TIMESTAMP",
        "to_timestamp(floor(unix_timestamp(x) / 300) * 300)",
    ),
    "toStartOfTenMinutes": (
        "(x TIMESTAMP) RETURNS TIMESTAMP",
        "to_timestamp(floor(unix_timestamp(x) / 600) * 600)",
    ),
    "toStartOfFifteenMinutes": (
        "(x TIMESTAMP) RETURNS TIMESTAMP",
        "to_timestamp(floor(unix_timestamp(x) / 900) * 900)",
    ),
    # calendar niladics + compact date keys
    "today": ("() RETURNS DATE", "current_date()"),
    "yesterday": ("() RETURNS DATE", "date_sub(current_date(), 1)"),
    "toYYYYMMDD": ("(x TIMESTAMP) RETURNS INT", "CAST(date_format(x, 'yyyyMMdd') AS INT)"),
    "addMinutes": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x + make_interval(0, 0, 0, 0, 0, n)"),
    "addSeconds": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x + make_interval(0, 0, 0, 0, 0, 0, n)"),
    "addMonths": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x + make_interval(0, n)"),
    "addYears": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x + make_interval(n)"),
    # haversine on a spherical Earth (R=6372797.56 m, ClickHouse's
    # constant for greatCircleDistance)
    "greatCircleDistance": (
        "(lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE) RETURNS DOUBLE",
        "2 * 6372797.560856 * asin(sqrt("
        "pow(sin(radians(lat2 - lat1) / 2), 2) + "
        "cos(radians(lat1)) * cos(radians(lat2)) * "
        "pow(sin(radians(lon2 - lon1) / 2), 2)))",
    ),
    # vector distance family (ClickHouse L1Distance/L2Distance/
    # cosineDistance/dotProduct) — JVM higher-order folds, the SQL-land
    # spellings of the same math operators/similarity.py uses
    "dotProduct": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, v) -> s + v)",
    ),
    "L1Distance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), CAST(0.0 AS DOUBLE), (s, v) -> s + v)",
    ),
    "L2Distance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (s, v) -> s + v))",
    ),
    "L2Norm": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
        "sqrt(aggregate(a, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))",
    ),
    # general-p Minkowski forms (ClickHouse LpNorm/LpDistance)
    "LpNorm": (
        "(a ARRAY<DOUBLE>, p DOUBLE) RETURNS DOUBLE",
        "power(aggregate(a, CAST(0.0 AS DOUBLE),"
        " (s, x) -> s + power(abs(x), p)), 1.0 / p)",
    ),
    "LpDistance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>, p DOUBLE) RETURNS DOUBLE",
        "power(aggregate(zip_with(a, b, (x, y) -> power(abs(x - y), p)),"
        " CAST(0.0 AS DOUBLE), (s, v) -> s + v), 1.0 / p)",
    ),
    "cosineDistance": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "1.0 - aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
        " / (sqrt(aggregate(a, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))"
        "    * sqrt(aggregate(b, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x)))",
    ),
    # array membership / structure (ClickHouse has/hasAny/arrayZip/...)
    "has": ("(a ARRAY<STRING>, x STRING) RETURNS BOOLEAN", "array_contains(a, x)"),
    "hasAny": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS BOOLEAN",
        "arrays_overlap(a, b)",
    ),
    "arrayFlatten": (
        "(a ARRAY<ARRAY<STRING>>) RETURNS ARRAY<STRING>",
        "flatten(a)",
    ),
    "arrayPushBack": (
        "(a ARRAY<STRING>, x STRING) RETURNS ARRAY<STRING>",
        "concat(a, array(x))",
    ),
    "arrayPushFront": (
        "(a ARRAY<STRING>, x STRING) RETURNS ARRAY<STRING>",
        "concat(array(x), a)",
    ),
    "arrayPopBack": (
        "(a ARRAY<STRING>) RETURNS ARRAY<STRING>",
        "slice(a, 1, greatest(size(a) - 1, 0))",
    ),
    "arrayPopFront": (
        "(a ARRAY<STRING>) RETURNS ARRAY<STRING>",
        "slice(a, 2, greatest(size(a) - 1, 0))",
    ),
    # startsWith/endsWith/now need no alias: Spark's startswith/endswith/
    # now built-ins already answer the ClickHouse spellings (SQL function
    # names are case-insensitive), and SQL UDFs may not shadow built-ins.
    # ClickHouse dateDiff: both operands truncated to the unit, then the
    # boundary count between them (NOT elapsed/floor semantics).
    # Registered as chDateDiff — Spark's 2-arg datediff builtin owns the
    # name and SQL UDFs may not shadow built-ins; chsql.translate rewrites
    # the camelCase ClickHouse spelling onto this.
    "chDateDiff": (
        "(u STRING, a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT",
        "CASE lower(u)"
        " WHEN 'second' THEN unix_timestamp(date_trunc('SECOND', b)) - unix_timestamp(date_trunc('SECOND', a))"
        " WHEN 'minute' THEN (unix_timestamp(date_trunc('MINUTE', b)) - unix_timestamp(date_trunc('MINUTE', a))) div 60"
        " WHEN 'hour' THEN (unix_timestamp(date_trunc('HOUR', b)) - unix_timestamp(date_trunc('HOUR', a))) div 3600"
        " WHEN 'day' THEN datediff(CAST(b AS DATE), CAST(a AS DATE))"
        " WHEN 'week' THEN datediff(CAST(date_trunc('WEEK', b) AS DATE), CAST(date_trunc('WEEK', a) AS DATE)) div 7"
        " WHEN 'month' THEN (year(b) - year(a)) * 12 + (month(b) - month(a))"
        " WHEN 'quarter' THEN (year(b) - year(a)) * 4 + (quarter(b) - quarter(a))"
        " WHEN 'year' THEN year(b) - year(a)"
        " END",
    ),
    # accepts both spellings ClickHouse does: a datetime string and a
    # numeric unix-epoch value (which arrives here as a digit string)
    "toDateTime": (
        "(s STRING) RETURNS TIMESTAMP",
        "CASE WHEN s RLIKE '^[0-9]+(\\\\.[0-9]+)?$'"
        " THEN to_timestamp(CAST(s AS DOUBLE))"
        " ELSE CAST(s AS TIMESTAMP) END",
    ),
    # geohash (ClickHouse geohashEncode/geohashDecode): the classic
    # interleaved-bisection algorithm as a pure codegen aggregate fold —
    # per-bit lon/lat interval halving, base32 char emitted every 5 bits.
    # No UDF; verified against the public test vectors
    # (e.g. (-5.60303, 42.60498, 5) -> 'ezs42').
    "geohashEncode": (
        "(lon DOUBLE, lat DOUBLE, p INT) RETURNS STRING",
        "aggregate(sequence(0, p * 5 - 1),"
        " named_struct("
        "  'la1', CAST(-90.0 AS DOUBLE), 'la2', CAST(90.0 AS DOUBLE),"
        "  'lo1', CAST(-180.0 AS DOUBLE), 'lo2', CAST(180.0 AS DOUBLE),"
        "  'cur', 0, 's', CAST('' AS STRING)),"
        " (acc, i) -> named_struct("
        "  'la1', IF(i % 2 = 1 AND lat >= (acc.la1 + acc.la2) / 2, (acc.la1 + acc.la2) / 2, acc.la1),"
        "  'la2', IF(i % 2 = 1 AND lat <  (acc.la1 + acc.la2) / 2, (acc.la1 + acc.la2) / 2, acc.la2),"
        "  'lo1', IF(i % 2 = 0 AND lon >= (acc.lo1 + acc.lo2) / 2, (acc.lo1 + acc.lo2) / 2, acc.lo1),"
        "  'lo2', IF(i % 2 = 0 AND lon <  (acc.lo1 + acc.lo2) / 2, (acc.lo1 + acc.lo2) / 2, acc.lo2),"
        "  'cur', IF(i % 5 = 4, 0,"
        "            acc.cur * 2 + IF(i % 2 = 0,"
        "                             IF(lon >= (acc.lo1 + acc.lo2) / 2, 1, 0),"
        "                             IF(lat >= (acc.la1 + acc.la2) / 2, 1, 0))),"
        "  's', IF(i % 5 = 4,"
        "          concat(acc.s, substring('0123456789bcdefghjkmnpqrstuvwxyz',"
        "            acc.cur * 2 + IF(i % 2 = 0,"
        "                             IF(lon >= (acc.lo1 + acc.lo2) / 2, 1, 0),"
        "                             IF(lat >= (acc.la1 + acc.la2) / 2, 1, 0)) + 1, 1)),"
        "          acc.s)),"
        " acc -> acc.s)",
    ),
    "geohashDecode": (
        "(s STRING) RETURNS ARRAY<DOUBLE>",
        "aggregate(sequence(0, length(s) * 5 - 1),"
        " named_struct("
        "  'la1', CAST(-90.0 AS DOUBLE), 'la2', CAST(90.0 AS DOUBLE),"
        "  'lo1', CAST(-180.0 AS DOUBLE), 'lo2', CAST(180.0 AS DOUBLE)),"
        " (acc, i) -> named_struct("
        "  'la1', IF(i % 2 = 1 AND ((locate(substring(s, i div 5 + 1, 1), '0123456789bcdefghjkmnpqrstuvwxyz') - 1) div CAST(pow(2, 4 - i % 5) AS INT)) % 2 = 1,"
        "            (acc.la1 + acc.la2) / 2, acc.la1),"
        "  'la2', IF(i % 2 = 1 AND ((locate(substring(s, i div 5 + 1, 1), '0123456789bcdefghjkmnpqrstuvwxyz') - 1) div CAST(pow(2, 4 - i % 5) AS INT)) % 2 = 0,"
        "            (acc.la1 + acc.la2) / 2, acc.la2),"
        "  'lo1', IF(i % 2 = 0 AND ((locate(substring(s, i div 5 + 1, 1), '0123456789bcdefghjkmnpqrstuvwxyz') - 1) div CAST(pow(2, 4 - i % 5) AS INT)) % 2 = 1,"
        "            (acc.lo1 + acc.lo2) / 2, acc.lo1),"
        "  'lo2', IF(i % 2 = 0 AND ((locate(substring(s, i div 5 + 1, 1), '0123456789bcdefghjkmnpqrstuvwxyz') - 1) div CAST(pow(2, 4 - i % 5) AS INT)) % 2 = 0,"
        "            (acc.lo1 + acc.lo2) / 2, acc.lo2)),"
        " acc -> array((acc.lo1 + acc.lo2) / 2, (acc.la1 + acc.la2) / 2))",
    ),
    # ---- dashboard-battery spellings (round 3): functions found missing
    # by running a corpus of real ClickHouse monitoring/analytics SQL
    # through Engine.ch_sql end-to-end ----
    "match": ("(s STRING, re STRING) RETURNS BOOLEAN", "s RLIKE re"),
    "toMonday": ("(x TIMESTAMP) RETURNS DATE", "CAST(date_trunc('WEEK', x) AS DATE)"),
    "toDate32": ("(x TIMESTAMP) RETURNS DATE", "CAST(x AS DATE)"),
    # Spark timestamps are already micro-precision; the precision arg of
    # DateTime64 only matters for storage rendering
    "toDateTime64": ("(x TIMESTAMP, p INT) RETURNS TIMESTAMP", "x"),
    "toRelativeDayNum": (
        "(x TIMESTAMP) RETURNS INT",
        "datediff(CAST(x AS DATE), DATE'1970-01-01')",
    ),
    "toRelativeHourNum": ("(x TIMESTAMP) RETURNS BIGINT", "unix_timestamp(x) div 3600"),
    "toRelativeMinuteNum": ("(x TIMESTAMP) RETURNS BIGINT", "unix_timestamp(x) div 60"),
    "fromUnixTimestamp": ("(x BIGINT) RETURNS TIMESTAMP", "timestamp_seconds(x)"),
    "dateName": (
        "(part STRING, x TIMESTAMP) RETURNS STRING",
        "CASE lower(part)"
        " WHEN 'year' THEN CAST(year(x) AS STRING)"
        " WHEN 'quarter' THEN CAST(quarter(x) AS STRING)"
        " WHEN 'month' THEN date_format(x, 'MMMM')"
        " WHEN 'week' THEN CAST(weekofyear(x) AS STRING)"
        " WHEN 'dayofyear' THEN CAST(dayofyear(x) AS STRING)"
        " WHEN 'day' THEN CAST(day(x) AS STRING)"
        " WHEN 'weekday' THEN date_format(x, 'EEEE')"
        " WHEN 'hour' THEN CAST(hour(x) AS STRING)"
        " WHEN 'minute' THEN CAST(minute(x) AS STRING)"
        " WHEN 'second' THEN CAST(second(x) AS STRING)"
        " END",
    ),
    # ClickHouse age(): COMPLETE elapsed units between a and b (floor
    # semantics — distinct from dateDiff's boundary-count semantics)
    "age": (
        "(u STRING, a TIMESTAMP, b TIMESTAMP) RETURNS BIGINT",
        "CASE lower(u)"
        " WHEN 'second' THEN unix_timestamp(b) - unix_timestamp(a)"
        " WHEN 'minute' THEN (unix_timestamp(b) - unix_timestamp(a)) div 60"
        " WHEN 'hour' THEN (unix_timestamp(b) - unix_timestamp(a)) div 3600"
        " WHEN 'day' THEN (unix_timestamp(b) - unix_timestamp(a)) div 86400"
        " WHEN 'week' THEN (unix_timestamp(b) - unix_timestamp(a)) div 604800"
        " WHEN 'month' THEN CAST(floor(months_between(b, a)) AS BIGINT)"
        " WHEN 'quarter' THEN CAST(floor(months_between(b, a) / 3) AS BIGINT)"
        " WHEN 'year' THEN CAST(floor(months_between(b, a) / 12) AS BIGINT)"
        " END",
    ),
    # first 8 bytes of the MD5, big-endian — same BITS as ClickHouse's
    # UInt64, reinterpreted as Spark's signed 64-bit (shiftleft/OR wrap,
    # they never overflow-throw under ANSI)
    "halfMD5": (
        "(s STRING) RETURNS BIGINT",
        "shiftleft(CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT), 32)"
        " | CAST(conv(substring(md5(s), 9, 8), 16, 10) AS BIGINT)",
    ),
    "formatReadableQuantity": (
        "(x DOUBLE) RETURNS STRING",
        "CASE WHEN abs(x) >= 1e12 THEN concat(format_number(x / 1e12, 2), ' trillion')"
        " WHEN abs(x) >= 1e9 THEN concat(format_number(x / 1e9, 2), ' billion')"
        " WHEN abs(x) >= 1e6 THEN concat(format_number(x / 1e6, 2), ' million')"
        " WHEN abs(x) >= 1e3 THEN concat(format_number(x / 1e3, 2), ' thousand')"
        " ELSE format_number(x, 2) END",
    ),
    # visitParam* = the legacy spellings of JSONExtract* (same fast-path
    # JSON role; get_json_object is Spark's equivalent)
    "visitParamExtractString": (
        "(j STRING, k STRING) RETURNS STRING",
        "get_json_object(j, concat('$.', k))",
    ),
    "visitParamExtractInt": (
        "(j STRING, k STRING) RETURNS BIGINT",
        "try_cast(get_json_object(j, concat('$.', k)) AS BIGINT)",
    ),
    "visitParamExtractFloat": (
        "(j STRING, k STRING) RETURNS DOUBLE",
        "try_cast(get_json_object(j, concat('$.', k)) AS DOUBLE)",
    ),
    "visitParamExtractBool": (
        "(j STRING, k STRING) RETURNS BOOLEAN",
        "try_cast(get_json_object(j, concat('$.', k)) AS BOOLEAN)",
    ),
    "visitParamHas": (
        "(j STRING, k STRING) RETURNS BOOLEAN",
        "get_json_object(j, concat('$.', k)) IS NOT NULL",
    ),
    # CLI bar chart: full blocks + a 1/8-resolution partial block, the
    # same glyph ramp ClickHouse renders
    "bar": (
        "(x DOUBLE, mn DOUBLE, mx DOUBLE, w DOUBLE) RETURNS STRING",
        "concat("
        " repeat('█', CAST(floor(greatest(least((x - mn) / (mx - mn) * w, w), 0)) AS INT)),"
        " CASE CAST(round((greatest(least((x - mn) / (mx - mn) * w, w), 0)"
        "   - floor(greatest(least((x - mn) / (mx - mn) * w, w), 0))) * 8) AS INT)"
        "  WHEN 1 THEN '▏' WHEN 2 THEN '▎' WHEN 3 THEN '▍' WHEN 4 THEN '▌'"
        "  WHEN 5 THEN '▋' WHEN 6 THEN '▊' WHEN 7 THEN '▉' WHEN 8 THEN '█'"
        "  ELSE '' END)",
    ),
    "parseDateTimeBestEffort": (
        "(s STRING) RETURNS TIMESTAMP",
        "coalesce(try_cast(s AS TIMESTAMP),"
        " try_to_timestamp(s, 'dd/MM/yyyy HH:mm:ss'),"
        " try_to_timestamp(s, 'dd.MM.yyyy HH:mm:ss'),"
        " try_to_timestamp(s, 'dd/MM/yyyy'),"
        " try_to_timestamp(s, 'dd.MM.yyyy'),"
        " try_to_timestamp(s, 'yyyyMMdd'),"
        # r8 batch 54: the month-name and RFC shapes CH's best-effort
        # parser accepts ('15 Mar 2024' returned NULL before)
        " try_to_timestamp(s, 'dd MMM yyyy HH:mm:ss'),"
        " try_to_timestamp(s, 'dd MMM yyyy'),"
        " try_to_timestamp(s, 'dd-MMM-yyyy'),"
        " try_to_timestamp(s, 'MMM dd yyyy'),"
        " try_to_timestamp(s, 'MMM dd, yyyy'),"
        # RFC-1123 minus the weekday: Spark's new datetime parser
        # rejects the 'EEE' pattern outright, so strip a leading
        # 'Www, ' before the month-name retry
        " try_to_timestamp(regexp_replace(s, '^[A-Za-z]{3}, ', ''),"
        " 'dd MMM yyyy HH:mm:ss'))",
    ),
    "intDivOrZero": (
        "(a BIGINT, b BIGINT) RETURNS BIGINT",
        "CASE WHEN b = 0 THEN 0 ELSE a div b END",
    ),
    # wave-2 battery spellings
    "exp2": ("(x DOUBLE) RETURNS DOUBLE", "pow(2, x)"),
    "exp10": ("(x DOUBLE) RETURNS DOUBLE", "pow(10, x)"),
    "intExp2": ("(x INT) RETURNS BIGINT", "shiftleft(CAST(1 AS BIGINT), x)"),
    "now64": ("() RETURNS TIMESTAMP", "now()"),
    "timeSlot": (
        "(x TIMESTAMP) RETURNS TIMESTAMP",
        "timestamp_seconds((unix_timestamp(x) div 1800) * 1800)",
    ),
    # time-of-day mounted on the 1970-01-02 epoch day, CH's convention
    "toTime": (
        "(x TIMESTAMP) RETURNS TIMESTAMP",
        "timestamp_seconds(86400 + unix_timestamp(x) % 86400)",
    ),
    # 24.x renamed toTime to toTimeWithFixedDate (probe batch 55)
    "toTimeWithFixedDate": (
        "(x TIMESTAMP) RETURNS TIMESTAMP",
        "timestamp_seconds(86400 + unix_timestamp(x) % 86400)",
    ),
    "emptyArrayString": ("() RETURNS ARRAY<STRING>", "CAST(array() AS ARRAY<STRING>)"),
    "emptyArrayInt64": ("() RETURNS ARRAY<BIGINT>", "CAST(array() AS ARRAY<BIGINT>)"),
    "countEqual": (
        "(a ARRAY<STRING>, x STRING) RETURNS INT",
        "size(filter(a, y -> y = x))",
    ),
    "bitTest": (
        "(a BIGINT, i INT) RETURNS TINYINT",
        "CAST(shiftright(a, i) & 1 AS TINYINT)",
    ),
    "arrayWithConstant": (
        "(n INT, x STRING) RETURNS ARRAY<STRING>",
        "array_repeat(x, n)",
    ),
    "arrayResize": (
        "(a ARRAY<STRING>, n INT, fill STRING) RETURNS ARRAY<STRING>",
        "concat(slice(a, 1, least(n, size(a))),"
        " array_repeat(fill, greatest(n - size(a), 0)))",
    ),
    "formatReadableTimeDelta": (
        "(s BIGINT) RETURNS STRING",
        "concat_ws(', ',"
        " IF(s >= 86400, concat(s div 86400, IF(s div 86400 = 1, ' day', ' days')), NULL),"
        " IF(s % 86400 >= 3600, concat(s % 86400 div 3600,"
        "    IF(s % 86400 div 3600 = 1, ' hour', ' hours')), NULL),"
        " IF(s % 3600 >= 60, concat(s % 3600 div 60,"
        "    IF(s % 3600 div 60 = 1, ' minute', ' minutes')), NULL),"
        " IF(s % 60 > 0 OR s = 0, concat(s % 60,"
        "    IF(s % 60 = 1, ' second', ' seconds')), NULL))",
    ),
    "moduloOrZero": (
        "(a BIGINT, b BIGINT) RETURNS BIGINT",
        "CASE WHEN b = 0 THEN 0 ELSE a % b END",
    ),
    # long-tail date arithmetic (completes the add*/subtract* family)
    "addWeeks": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x + make_interval(0, 0, n)"),
    "subtractWeeks": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x - make_interval(0, 0, n)"),
    "subtractMonths": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x - make_interval(0, n)"),
    "subtractYears": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x - make_interval(n)"),
    "subtractHours": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x - make_interval(0, 0, 0, 0, n)"),
    "subtractMinutes": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x - make_interval(0, 0, 0, 0, 0, n)"),
    "subtractSeconds": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x - make_interval(0, 0, 0, 0, 0, 0, n)"),
    "addQuarters": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x + make_interval(0, 3 * n)"),
    "subtractQuarters": ("(x TIMESTAMP, n INT) RETURNS TIMESTAMP", "x - make_interval(0, 3 * n)"),
    # ISO-year start = the Monday of the week containing Jan 4 of the
    # ISO year (weekday(): Monday = 0); the ISO year itself is the
    # calendar year of the week's Thursday (same anchor as toISOYear)
    "toStartOfISOYear": (
        "(x TIMESTAMP) RETURNS DATE",
        "date_sub(make_date(year(date_add(CAST(date_trunc('WEEK', x) AS DATE), 3)), 1, 4),"
        " weekday(make_date(year(date_add(CAST(date_trunc('WEEK', x) AS DATE), 3)), 1, 4)))",
    ),
    # proleptic-Gregorian day number: 1970-01-01 is day 719528 in
    # ClickHouse's toDaysSinceYearZero
    "toDaysSinceYearZero": (
        "(x TIMESTAMP) RETURNS INT",
        "CAST(datediff(CAST(x AS DATE), DATE'1970-01-01') + 719528 AS INT)",
    ),
    # Modified Julian Day epoch is 1858-11-17
    "toModifiedJulianDay": (
        "(s STRING) RETURNS INT",
        "datediff(CAST(s AS DATE), DATE'1858-11-17')",
    ),
    "fromModifiedJulianDay": (
        "(n INT) RETURNS DATE",
        "date_add(DATE'1858-11-17', n)",
    ),
    "toISOWeek": ("(x TIMESTAMP) RETURNS INT", "weekofyear(x)"),
    # toWeek default mode 0 (Sunday-based, 0..53): week 1 starts at the
    # year's first Sunday, earlier days are week 0 — NOT ISO weekofyear.
    # first-Sunday day-of-year = 1 if Jan 1 is a Sunday else
    # 9 - dayofweek(Jan 1)  (Spark dayofweek: 1=Sunday .. 7=Saturday).
    "toWeek": (
        "(x TIMESTAMP) RETURNS INT",
        "CAST(CASE WHEN dayofyear(x) <"
        " (CASE WHEN dayofweek(trunc(CAST(x AS DATE), 'YEAR')) = 1 THEN 1"
        " ELSE 9 - dayofweek(trunc(CAST(x AS DATE), 'YEAR')) END)"
        " THEN 0 ELSE floor((dayofyear(x) -"
        " (CASE WHEN dayofweek(trunc(CAST(x AS DATE), 'YEAR')) = 1 THEN 1"
        " ELSE 9 - dayofweek(trunc(CAST(x AS DATE), 'YEAR')) END)) / 7) + 1"
        " END AS INT)",
    ),
    # ISO year = calendar year of the ISO week's THURSDAY (Monday-trunc
    # + 3 days), correct across year-boundary weeks: 2024-12-30 is ISO
    # 2025 even though its Monday is in 2024.
    "toISOYear": (
        "(x TIMESTAMP) RETURNS INT",
        "year(date_add(CAST(date_trunc('WEEK', x) AS DATE), 3))",
    ),
    "toStartOfSecond": ("(x TIMESTAMP) RETURNS TIMESTAMP", "date_trunc('SECOND', x)"),
    "toYYYYMMDDhhmmss": (
        "(x TIMESTAMP) RETURNS BIGINT",
        "CAST(date_format(x, 'yyyyMMddHHmmss') AS BIGINT)",
    ),
    # string tail
    "trimLeft": ("(s STRING) RETURNS STRING", "ltrim(s)"),
    "trimRight": ("(s STRING) RETURNS STRING", "rtrim(s)"),
    "base64Encode": ("(s STRING) RETURNS STRING", "base64(CAST(s AS BINARY))"),
    "base64Decode": ("(s STRING) RETURNS STRING", "CAST(unbase64(s) AS STRING)"),
    "tryBase64Decode": (
        "(s STRING) RETURNS STRING",
        # NULL on invalid input (CH returns '' — NULL is Spark's idiom
        # for try_*; validate the alphabet first since unbase64 throws)
        "CASE WHEN s RLIKE '^[A-Za-z0-9+/]*={0,2}$'"
        " AND length(s) % 4 = 0 THEN CAST(unbase64(s) AS STRING) END",
    ),
    # URL-safe base64 (batch-76): RFC 4648 base64url alphabet, no
    # padding on encode; decode re-pads. Both the 25.1 URL spelling
    # and the earlier Url spelling register.
    "base64URLEncode": (
        "(s STRING) RETURNS STRING",
        # regexp strip, not TRIM(TRAILING ... FROM ...): the FROM
        # keyword inside a CREATE FUNCTION ... RETURN body trips the
        # parser
        "regexp_replace(translate(base64(CAST(s AS BINARY)),"
        " '+/', '-_'), '=+$', '')",
    ),
    "base64URLDecode": (
        "(s STRING) RETURNS STRING",
        "CAST(unbase64(concat(translate(s, '-_', '+/'),"
        " repeat('=', (4 - length(s) % 4) % 4))) AS STRING)",
    ),
    "tryBase64URLDecode": (
        "(s STRING) RETURNS STRING",
        "CASE WHEN s RLIKE '^[A-Za-z0-9_-]*$'"
        " AND length(s) % 4 != 1"
        " THEN CAST(unbase64(concat(translate(s, '-_', '+/'),"
        " repeat('=', (4 - length(s) % 4) % 4))) AS STRING) END",
    ),
    # NOTE: the pre-25.1 base64Url*/tryBase64UrlDecode spellings need
    # no entries — Spark function names are case-insensitive, so they
    # resolve to the URL forms above (a separate alias whose body
    # calls the URL form would OVERWRITE it and self-recurse)
    "reverseUTF8": ("(s STRING) RETURNS STRING", "reverse(s)"),
    "toFixedString": (
        # ClickHouse errors when s exceeds n; keeping the prefix is the
        # lenient superset (Spark strings are unbounded anyway)
        "(s STRING, n INT) RETURNS STRING",
        "substring(s, 1, n)",
    ),
    "splitByWhitespace": (
        "(s STRING) RETURNS ARRAY<STRING>",
        r"filter(split(s, '\\s+'), x -> x != '')",
    ),
    "toBool": ("(s STRING) RETURNS BOOLEAN", "CAST(s AS BOOLEAN)"),
    "YYYYMMDDToDate": (
        "(n BIGINT) RETURNS DATE",
        "to_date(CAST(n AS STRING), 'yyyyMMdd')",
    ),
    # Date32 only widens the representable range — same conversion
    # (Spark DATE already covers the Date32 span)
    "YYYYMMDDToDate32": (
        "(n BIGINT) RETURNS DATE",
        "to_date(CAST(n AS STRING), 'yyyyMMdd')",
    ),
    "YYYYMMDDhhmmssToDateTime": (
        "(n BIGINT) RETURNS TIMESTAMP",
        "to_timestamp(CAST(n AS STRING), 'yyyyMMddHHmmss')",
    ),
    # OrZero date forms land on the epoch like ClickHouse's
    "toDateOrZero": (
        "(s STRING) RETURNS DATE",
        "coalesce(try_cast(s AS DATE), DATE'1970-01-01')",
    ),
    "toDateTimeOrZero": (
        "(s STRING) RETURNS TIMESTAMP",
        "coalesce(try_cast(s AS TIMESTAMP), TIMESTAMP'1970-01-01 00:00:00')",
    ),
    # the variants share the base's whole format chain (CH's differ
    # only in the unparseable fallback: NULL vs epoch zero)
    "parseDateTimeBestEffortOrNull": (
        "(s STRING) RETURNS TIMESTAMP",
        "parseDateTimeBestEffort(s)",
    ),
    "parseDateTimeBestEffortOrZero": (
        "(s STRING) RETURNS TIMESTAMP",
        "coalesce(parseDateTimeBestEffort(s),"
        " TIMESTAMP'1970-01-01 00:00:00')",
    ),
    "generateUUIDv4": ("() RETURNS STRING", "uuid()"),
    # UUIDv7 (RFC 9562): 48-bit unix-ms timestamp, version nibble 7 +
    # 12 random bits, variant nibble (8..b) + 60 random bits. Assembled
    # from hex pieces so the id stays time-ordered like ClickHouse's.
    "generateUUIDv7": (
        "() RETURNS STRING",
        "lower(concat("
        " substr(lpad(hex(unix_millis(current_timestamp())), 12, '0'), 1, 8), '-',"
        " substr(lpad(hex(unix_millis(current_timestamp())), 12, '0'), 9, 4),"
        " '-7', lpad(hex(CAST(rand() * 4096 AS INT)), 3, '0'),"
        " '-', hex(8 + CAST(rand() * 4 AS INT)),"
        " lpad(hex(CAST(rand() * 4096 AS INT)), 3, '0'),"
        " '-', lpad(hex(CAST(rand() * 281474976710656 AS BIGINT)), 12, '0')))",
    ),
    # 64-bit epoch spellings: Spark keeps micros natively; nanos render
    # as micros * 1000 (sub-microsecond digits are not stored)
    "toUnixTimestamp64Milli": ("(x TIMESTAMP) RETURNS BIGINT", "unix_millis(x)"),
    "toUnixTimestamp64Micro": ("(x TIMESTAMP) RETURNS BIGINT", "unix_micros(x)"),
    "toUnixTimestamp64Nano": (
        "(x TIMESTAMP) RETURNS BIGINT",
        "unix_micros(x) * CAST(1000 AS BIGINT)",
    ),
    "fromUnixTimestamp64Milli": (
        "(x BIGINT) RETURNS TIMESTAMP", "timestamp_millis(x)"
    ),
    "fromUnixTimestamp64Micro": (
        "(x BIGINT) RETURNS TIMESTAMP", "timestamp_micros(x)"
    ),
    "fromUnixTimestamp64Nano": (
        "(x BIGINT) RETURNS TIMESTAMP", "timestamp_micros(x div 1000)"
    ),
    # XML entity escaping: & first so encoded entities don't re-encode
    "encodeXMLComponent": (
        "(s STRING) RETURNS STRING",
        "replace(replace(replace(replace(replace(s,"
        " '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),"
        " '\"', '&quot;'), \"'\", '&apos;')",
    ),
    # numeric entities (decimal + hex) via a reduce over the distinct
    # matches — Character.toString handles full Unicode codepoints
    # (Spark's char() wraps mod 256) — then the five named entities,
    # amp last so freshly decoded '&' cannot re-form an entity. Known
    # corner vs CH's single-pass scan: '&#38;lt;' double-decodes to
    # '<' where CH leaves '&lt;'; the encode path never emits it.
    "decodeXMLComponent": (
        "(s STRING) RETURNS STRING",
        "replace(replace(replace(replace(replace("
        " aggregate(array_distinct(regexp_extract_all("
        "   aggregate(array_distinct(regexp_extract_all(s,"
        "     '&#[0-9]+;', 0)), s, (acc, m) -> replace(acc, m,"
        "     reflect('java.lang.Character', 'toString',"
        "       CAST(substring(m, 3, length(m) - 3) AS INT)))),"
        "   '&#x[0-9a-fA-F]+;', 0)),"
        "   aggregate(array_distinct(regexp_extract_all(s,"
        "     '&#[0-9]+;', 0)), s, (acc, m) -> replace(acc, m,"
        "     reflect('java.lang.Character', 'toString',"
        "       CAST(substring(m, 3, length(m) - 3) AS INT)))),"
        "   (acc, m) -> replace(acc, m,"
        "     reflect('java.lang.Character', 'toString',"
        "       CAST(conv(substring(m, 4, length(m) - 4), 16, 10)"
        "         AS INT)))),"
        " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'),"
        " '&apos;', \"'\"), '&amp;', '&')",
    ),
    # Tukey fences outlier flags (ClickHouse seriesOutliersDetectTukey
    # default form: k = 1.5 over the 25/75 quartiles, linear-
    # interpolation quantiles); <4 points -> NULL (CH raises)
    "seriesOutliersDetectTukey": (
        "(a ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE>",
        "(CASE WHEN size(a) >= 4 THEN"
        " element_at(transform(array(array_sort(a)), __s ->"
        "  element_at(transform(array(named_struct("
        "   'q1', element_at(__s, CAST(floor((size(__s) - 1) * 0.25)"
        "      AS INT) + 1)"
        "    + ((size(__s) - 1) * 0.25"
        "       - floor((size(__s) - 1) * 0.25))"
        "      * (element_at(__s, least(CAST(floor((size(__s) - 1)"
        "          * 0.25) AS INT) + 2, size(__s)))"
        "         - element_at(__s, CAST(floor((size(__s) - 1) * 0.25)"
        "            AS INT) + 1)),"
        "   'q3', element_at(__s, CAST(floor((size(__s) - 1) * 0.75)"
        "      AS INT) + 1)"
        "    + ((size(__s) - 1) * 0.75"
        "       - floor((size(__s) - 1) * 0.75))"
        "      * (element_at(__s, least(CAST(floor((size(__s) - 1)"
        "          * 0.75) AS INT) + 2, size(__s)))"
        "         - element_at(__s, CAST(floor((size(__s) - 1) * 0.75)"
        "            AS INT) + 1)))), __q ->"
        "   transform(a, __x -> IF("
        "     __x < __q.q1 - 1.5 * (__q.q3 - __q.q1)"
        "     OR __x > __q.q3 + 1.5 * (__q.q3 - __q.q1),"
        "     1.0, 0.0))), 1)), 1)"
        " END)",
    ),
    # 0-based positions of set bits, ascending (64-bit range)
    "bitPositionsToArray": (
        "(n BIGINT) RETURNS ARRAY<INT>",
        "filter(sequence(0, 63),"
        " __i -> ((n >> __i) & 1) = 1)",
    ),
    # CH port(url): the explicit port or 0 when absent
    "port": (
        "(u STRING) RETURNS INT",
        "coalesce(CAST(nullif(regexp_extract(u,"
        " '^(?:[a-z][a-z0-9+.-]*:)?//[^/?#]*?:([0-9]+)(?:[/?#]|$)', 1),"
        " '') AS INT), 0)",
    ),
    # single-node topology stand-ins: one shard, number 1
    "shardNum": ("() RETURNS INT", "1"),
    "shardCount": ("() RETURNS INT", "1"),
    # introspection stand-ins (the serverUUID/uptime family): values a
    # dashboard can render without a ClickHouse server behind them
    "buildId": ("() RETURNS STRING", "md5(version())"),
    "tcpPort": ("() RETURNS INT", "9000"),  # CH default port stand-in
    "getOSKernelVersion": (
        "() RETURNS STRING",
        "reflect('java.lang.System', 'getProperty', 'os.version')",
    ),
    # result-compatible no-ops: return 0 like CH without throttling
    # (Spark has no per-row sleep; bench pacing belongs outside SQL)
    "sleep": ("(n DOUBLE) RETURNS INT", "CAST(n * 0 AS INT)"),
    "sleepEachRow": ("(n DOUBLE) RETURNS INT", "CAST(n * 0 AS INT)"),
    # the predicate is a pruning HINT in CH; result is constant 1
    "indexHint": (
        "(c BOOLEAN) RETURNS INT",
        "IF(c IS NULL OR c IS NOT NULL, 1, 1)",
    ),
    # per element, its occurrence ordinal among equal values so far:
    # arrayEnumerateUniq(['a','b','a']) = [1, 1, 2]. Implicit cast to
    # ARRAY<STRING> is injective for the numeric element types, so
    # counts are type-independent. O(n^2) per array — CH arrays are
    # row-local, never the distributed axis.
    "arrayEnumerateUniq": (
        "(a ARRAY<STRING>) RETURNS ARRAY<INT>",
        "transform(sequence(1, size(a)),"
        " i -> size(filter(slice(a, 1, i), x -> x <=> element_at(a, i))))",
    ),
    # inverse of bin(): 8-bit chunks (left-padded to a byte boundary)
    # decoded to their characters
    "unbin": (
        "(s STRING) RETURNS STRING",
        "(CASE WHEN s = '' THEN ''"
        " ELSE concat_ws('', transform("
        "   sequence(1, CAST(ceil(length(s) / 8.0) AS INT)),"
        "   i -> char(CAST(conv(substring("
        "     lpad(s, CAST(ceil(length(s) / 8.0) * 8 AS INT), '0'),"
        "     (i - 1) * 8 + 1, 8), 2, 10) AS INT)))) END)",
    ),
    "randBernoulli": (
        "(p DOUBLE) RETURNS INT", "CAST(rand() < p AS INT)"
    ),
    # ClickHouse default delimiters (':' key-value; ',', ';', space as
    # pair separators). The quoting_character escape syntax is NOT
    # parsed — quoted values keep their quotes; pre-clean if you need
    # CH's quoted form.
    "extractKeyValuePairs": (
        "(s STRING) RETURNS MAP<STRING, STRING>",
        "str_to_map(s, '[,; ]+', ':')",
    ),
    # 2-D Morton (Z-order) interleave over 32 bits per coordinate — the
    # same curve sources/zorder.py clusters by; pure codegen bit fold
    "mortonEncode": (
        "(x BIGINT, y BIGINT) RETURNS BIGINT",
        "aggregate(sequence(0, 31), CAST(0 AS BIGINT),"
        " (acc, i) -> acc + shiftleft((x >> i) & 1, 2 * i)"
        " + shiftleft((y >> i) & 1, 2 * i + 1))",
    ),
    # DDSketch quantile read-out (the quantileMerge read side of the
    # engine's quantileState MV states; see streaming/matview.py).
    # The map is a log-bucket histogram: key 0 = exact zero, key
    # B+k = positive bucket gamma^(k-1) < x <= gamma^k, key -(B+k) the
    # negative mirror. gamma = (1+a)/(1-a) at a = 1% relative accuracy
    # (Masson, Rim & Lee, "DDSketch", VLDB 2019 — public algorithm).
    # Walk the sorted buckets to the target rank; report the bucket
    # midpoint gamma^(k-0.5) (relative error <= a by construction).
    # the rank walk: first bucket key whose cumulative count reaches
    # rank(p) over the key-sorted histogram; NULL on an empty sketch
    "chDDBucketKey": (
        "(m MAP<INT, BIGINT>, p DOUBLE) RETURNS INT",
        "aggregate(array_sort(map_entries(m)),"
        " named_struct('cum', CAST(0 AS BIGINT), 'found', CAST(NULL AS INT)),"
        " (acc, e) -> IF(acc.found IS NOT NULL, acc,"
        "   IF(acc.cum + e.value >= greatest(CAST(ceil(p *"
        "       aggregate(map_values(m), CAST(0 AS BIGINT), (s, v) -> s + v)"
        "      ) AS BIGINT), CAST(1 AS BIGINT)),"
        "      named_struct('cum', acc.cum, 'found', e.key),"
        "      named_struct('cum', acc.cum + e.value,"
        "                   'found', CAST(NULL AS INT)))),"
        " acc -> acc.found)",
    ),
    "chDDQuantile": (
        "(m MAP<INT, BIGINT>, p DOUBLE) RETURNS DOUBLE",
        "CASE"
        " WHEN chDDBucketKey(m, p) IS NULL THEN CAST(NULL AS DOUBLE)"
        " WHEN chDDBucketKey(m, p) = 0 THEN CAST(0.0 AS DOUBLE)"
        " WHEN chDDBucketKey(m, p) > 0 THEN power(1.0202020202020203,"
        "      CAST(chDDBucketKey(m, p) - 1048576 AS DOUBLE) - 0.5)"
        " ELSE -power(1.0202020202020203,"
        "      CAST(-chDDBucketKey(m, p) - 1048576 AS DOUBLE) - 0.5)"
        " END",
    ),
    # ---- round-5 tail batch (defined last so bodies may reference any
    # alias above) ----
    # ClickHouse's fixed age buckets
    "roundAge": (
        "(a BIGINT) RETURNS BIGINT",
        "CASE WHEN a < 1 THEN 0 WHEN a < 18 THEN 17 WHEN a < 25 THEN 18"
        " WHEN a < 35 THEN 25 WHEN a < 45 THEN 35 WHEN a < 55 THEN 45"
        " ELSE 55 END",
    ),
    # ClickHouse's fixed duration buckets (largest bucket <= d)
    "roundDuration": (
        "(d BIGINT) RETURNS BIGINT",
        "coalesce(array_max(filter(array(1, 10, 30, 60, 120, 180, 240,"
        " 300, 600, 1200, 1800, 3600, 7200, 18000, 36000),"
        " __b -> __b <= d)), 0)",
    ),
    "formatReadableDecimalSize": (
        "(b DOUBLE) RETURNS STRING",
        "CASE WHEN b >= 1000000000 THEN concat(CAST(ROUND(b / 1000000000, 2) AS STRING), ' GB')"
        "     WHEN b >= 1000000 THEN concat(CAST(ROUND(b / 1000000, 2) AS STRING), ' MB')"
        "     WHEN b >= 1000 THEN concat(CAST(ROUND(b / 1000, 2) AS STRING), ' KB')"
        "     ELSE concat(CAST(CAST(b AS BIGINT) AS STRING), ' B') END",
    ),
    # central angle in degrees: the haversine distance over the mean
    # earth radius ClickHouse uses
    "greatCircleAngle": (
        "(lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE) RETURNS DOUBLE",
        "degrees(greatCircleDistance(lon1, lat1, lon2, lat2) / 6372797.560856)",
    ),
    "parseDateTime64BestEffort": (
        "(s STRING) RETURNS TIMESTAMP",
        "parseDateTimeBestEffort(s)",
    ),
    # timezone introspection/conversion — the session is pinned UTC
    # (session.py), so toTimeZone re-expresses the same instant in the
    # target zone's wall clock via from_utc_timestamp
    "timeZone": ("() RETURNS STRING", "current_timezone()"),
    "serverTimeZone": ("() RETURNS STRING", "current_timezone()"),
    "timeZoneOf": ("(x TIMESTAMP) RETURNS STRING", "current_timezone()"),
    "toTimeZone": (
        "(x TIMESTAMP, tz STRING) RETURNS TIMESTAMP",
        "from_utc_timestamp(x, tz)",
    ),
    "UTCTimestamp": ("() RETURNS TIMESTAMP", "current_timestamp()"),
    "nowInBlock": ("() RETURNS TIMESTAMP", "current_timestamp()"),
    "toStartOfMillisecond": (
        "(x TIMESTAMP) RETURNS TIMESTAMP",
        "date_trunc('MILLISECOND', x)",
    ),
    "toStartOfMicrosecond": (
        "(x TIMESTAMP) RETURNS TIMESTAMP",
        "date_trunc('MICROSECOND', x)",
    ),
    # Spark timestamps store microseconds, so the nanosecond floor is
    # the identity at this engine's precision (probe batch 55)
    "toStartOfNanosecond": (
        "(x TIMESTAMP) RETURNS TIMESTAMP",
        "date_trunc('MICROSECOND', x)",
    ),
    "toMillisecond": (
        "(x TIMESTAMP) RETURNS INT",
        "CAST(date_format(x, 'SSS') AS INT)",
    ),
    # mode-0 weeks start Sunday, like toStartOfWeek; the last day is
    # the following Saturday
    "toLastDayOfWeek": (
        "(x TIMESTAMP) RETURNS DATE",
        "date_add(date_sub(CAST(x AS DATE), dayofweek(x) - 1), 6)",
    ),
    # NOTE (batch-80): arguments evaluate BEFORE the finiteness check,
    # and the session's ANSI `/` operator throws on a zero divisor —
    # so ifNotFinite(a / b, d) errors where CH returns d. Spell the
    # division as divide(a, b) (CH IEEE semantics) and the combination
    # runs verbatim.
    "ifNotFinite": (
        "(x DOUBLE, y DOUBLE) RETURNS DOUBLE",
        "CASE WHEN isnan(x) OR abs(x) = double('Infinity') THEN y"
        " ELSE x END",
    ),
    "isZeroOrNull": (
        "(x DOUBLE) RETURNS BOOLEAN",
        "x IS NULL OR x = 0",
    ),
    "bitAnd": ("(a BIGINT, b BIGINT) RETURNS BIGINT", "a & b"),
    "bitOr": ("(a BIGINT, b BIGINT) RETURNS BIGINT", "a | b"),
    "bitXor": ("(a BIGINT, b BIGINT) RETURNS BIGINT", "a ^ b"),
    "bitNot": ("(a BIGINT) RETURNS BIGINT", "~a"),
    "bitRotateLeft": (
        "(x BIGINT, n INT) RETURNS BIGINT",
        "shiftleft(x, n) | shiftrightunsigned(x, 64 - n)",
    ),
    "bitRotateRight": (
        "(x BIGINT, n INT) RETURNS BIGINT",
        "shiftrightunsigned(x, n) | shiftleft(x, 64 - n)",
    ),
    "bitHammingDistance": (
        "(a BIGINT, b BIGINT) RETURNS INT",
        "bit_count(a ^ b)",
    ),
    # differing positions count; NULL-padded tails from the unaligned
    # zip count as differences, covering unequal lengths
    "byteHammingDistance": (
        "(a STRING, b STRING) RETURNS INT",
        "size(filter(zip_with(split(a, ''), split(b, ''),"
        " (x, y) -> x <=> y), __v -> NOT __v))",
    ),
    "countMatchesCaseInsensitive": (
        "(h STRING, p STRING) RETURNS INT",
        "CAST(regexp_count(h, concat('(?i)', p)) AS INT)",
    ),
    "randomPrintableASCII": (
        "(n INT) RETURNS STRING",
        "concat_ws('', transform(sequence(1, n),"
        " __i -> chr(33 + CAST(floor(rand() * 94) AS INT))))",
    ),
    # CH randomString emits arbitrary BYTES; Spark strings must stay
    # valid UTF-8 (same boundary note as toValidUTF8), so this lands on
    # the printable generator — documented deviation
    "randomString": (
        "(n INT) RETURNS STRING",
        "concat_ws('', transform(sequence(1, n),"
        " __i -> chr(33 + CAST(floor(rand() * 94) AS INT))))",
    ),
    # vector normalization over embedding arrays (zero vectors yield
    # NaN elements, matching the division CH performs)
    "normalizeL2": (
        "(v ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE>",
        "transform(v, __e -> __e / sqrt(aggregate(v, CAST(0.0 AS DOUBLE),"
        " (__a, __b) -> __a + __b * __b)))",
    ),
    "normalizeL1": (
        "(v ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE>",
        "transform(v, __e -> __e / aggregate(v, CAST(0.0 AS DOUBLE),"
        " (__a, __b) -> __a + abs(__b)))",
    ),
    "normalizeLinf": (
        "(v ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE>",
        "transform(v, __e -> __e / array_max(transform(v, __b -> abs(__b))))",
    ),
    # inverse of toDaysSinceYearZero (1970-01-01 = day 719528)
    "fromDaysSinceYearZero": (
        "(n INT) RETURNS DATE", "date_add(DATE'1970-01-01', n - 719528)"
    ),
    # DateTime64 Or* parse variants (batch-73): Spark timestamps are
    # microsecond-resolution regardless of the declared precision, so
    # the precision argument is accepted and ignored
    "toDateTime64OrNull": (
        "(s STRING, p INT) RETURNS TIMESTAMP",
        "try_cast(s AS TIMESTAMP)",
    ),
    "toDateTime64OrZero": (
        "(s STRING, p INT) RETURNS TIMESTAMP",
        "coalesce(try_cast(s AS TIMESTAMP),"
        " TIMESTAMP'1970-01-01 00:00:00')",
    ),
    # digamma via 6-step recurrence + the asymptotic series at x+6
    # (|err| ~ 1e-9 for x > 0; poles and the negative domain are NULL
    # — same stance as chLgammaPos). psi(x) = psi(x+6) - sum 1/(x+k)
    "digamma": (
        "(x DOUBLE) RETURNS DOUBLE",
        "CASE WHEN x IS NULL OR x <= 0 THEN CAST(NULL AS DOUBLE) ELSE"
        " ln(x + 6) - 1 / (2 * (x + 6))"
        " - 1 / (12 * pow(x + 6, 2)) + 1 / (120 * pow(x + 6, 4))"
        " - 1 / (252 * pow(x + 6, 6))"
        " - 1/x - 1/(x+1) - 1/(x+2) - 1/(x+3) - 1/(x+4) - 1/(x+5)"
        " END",
    ),
    # '1 hour 30 minutes' -> seconds (batch-69). CH's unit table:
    # s/sec/second(s), m/min/minute(s) (bare 'm' is minutes in CH's
    # parser, not months — ADVICE r10), h/hr/hour(s), d/day(s),
    # w/week(s), mo/month(s) = 30.5 d, y/year(s) = 365 d; ms/us/ns
    # fractions. Unknown units contribute NULL (the whole result goes
    # NULL) rather than a silent 0.
    "parseTimeDelta": (
        "(s STRING) RETURNS DOUBLE",
        "aggregate(regexp_extract_all(lower(s),"
        " '([0-9]*\\\\.?[0-9]+)\\\\s*([a-z]+)', 0),"
        " CAST(0 AS DOUBLE), (__acc, __p) -> __acc"
        " + CAST(regexp_extract(__p, '([0-9]*\\\\.?[0-9]+)', 1)"
        "   AS DOUBLE)"
        " * CASE regexp_extract(__p, '([a-z]+)$', 1)"
        "   WHEN 'ns' THEN 1e-9 WHEN 'us' THEN 1e-6"
        "   WHEN 'ms' THEN 1e-3 WHEN 'millisecond' THEN 1e-3"
        "   WHEN 'milliseconds' THEN 1e-3"
        "   WHEN 's' THEN 1 WHEN 'sec' THEN 1 WHEN 'secs' THEN 1"
        "   WHEN 'second' THEN 1 WHEN 'seconds' THEN 1"
        "   WHEN 'm' THEN 60"
        "   WHEN 'min' THEN 60 WHEN 'mins' THEN 60"
        "   WHEN 'minute' THEN 60 WHEN 'minutes' THEN 60"
        "   WHEN 'h' THEN 3600 WHEN 'hr' THEN 3600"
        "   WHEN 'hrs' THEN 3600 WHEN 'hour' THEN 3600"
        "   WHEN 'hours' THEN 3600"
        "   WHEN 'd' THEN 86400 WHEN 'day' THEN 86400"
        "   WHEN 'days' THEN 86400"
        "   WHEN 'w' THEN 604800 WHEN 'week' THEN 604800"
        "   WHEN 'weeks' THEN 604800"
        "   WHEN 'mo' THEN 2635200 WHEN 'month' THEN 2635200"
        "   WHEN 'months' THEN 2635200"
        "   WHEN 'y' THEN 31536000 WHEN 'year' THEN 31536000"
        "   WHEN 'years' THEN 31536000"
        "   ELSE CAST(NULL AS DOUBLE) END)",
    ),
    # legacy Twitter-epoch snowflake pair (epoch 1288834974657 ms); the
    # new *ID functions take an explicit epoch via the splice rewrites
    "snowflakeToDateTime": (
        "(x BIGINT) RETURNS TIMESTAMP",
        "timestamp_millis((x >> 22) + 1288834974657)",
    ),
    "dateTimeToSnowflake": (
        "(x TIMESTAMP) RETURNS BIGINT",
        "shiftleft(unix_millis(x) - 1288834974657, 22)",
    ),
    # the DateTime64 twins share the millisecond math (batch-68)
    "snowflakeToDateTime64": (
        "(x BIGINT) RETURNS TIMESTAMP",
        "timestamp_millis((x >> 22) + 1288834974657)",
    ),
    "dateTime64ToSnowflake": (
        "(x TIMESTAMP) RETURNS BIGINT",
        "shiftleft(unix_millis(x) - 1288834974657, 22)",
    ),
    # 128/256-bit integer spellings land on DECIMAL(38,0) — covers
    # ±10^38 (beyond Int128's ±1.7e38 range only at the extreme tail;
    # documented range deviation)
    "toInt128": (
        "(s STRING) RETURNS DECIMAL(38,0)",
        "COALESCE(try_cast(s AS DECIMAL(38,0)),"
        " CAST(CAST(s AS DOUBLE) AS DECIMAL(38,0)))",
    ),
    # Or* variants of the wide-integer spellings (batch-71)
    "toInt128OrNull": (
        "(s STRING) RETURNS DECIMAL(38,0)", "try_cast(s AS DECIMAL(38,0))"
    ),
    "toInt128OrZero": (
        "(s STRING) RETURNS DECIMAL(38,0)",
        "coalesce(try_cast(s AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0)))",
    ),
    "toInt256OrNull": (
        "(s STRING) RETURNS DECIMAL(38,0)", "try_cast(s AS DECIMAL(38,0))"
    ),
    "toInt256OrZero": (
        "(s STRING) RETURNS DECIMAL(38,0)",
        "coalesce(try_cast(s AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0)))",
    ),
    "toUInt128OrNull": (
        "(s STRING) RETURNS DECIMAL(38,0)", "try_cast(s AS DECIMAL(38,0))"
    ),
    "toUInt128OrZero": (
        "(s STRING) RETURNS DECIMAL(38,0)",
        "coalesce(try_cast(s AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0)))",
    ),
    "toUInt256OrNull": (
        "(s STRING) RETURNS DECIMAL(38,0)", "try_cast(s AS DECIMAL(38,0))"
    ),
    "toUInt256OrZero": (
        "(s STRING) RETURNS DECIMAL(38,0)",
        "coalesce(try_cast(s AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0)))",
    ),
    "toInt256": (
        "(s STRING) RETURNS DECIMAL(38,0)",
        "COALESCE(try_cast(s AS DECIMAL(38,0)),"
        " CAST(CAST(s AS DOUBLE) AS DECIMAL(38,0)))",
    ),
    "toUInt128": (
        "(s STRING) RETURNS DECIMAL(38,0)",
        "COALESCE(try_cast(s AS DECIMAL(38,0)),"
        " CAST(CAST(s AS DOUBLE) AS DECIMAL(38,0)))",
    ),
    "toUInt256": (
        "(s STRING) RETURNS DECIMAL(38,0)",
        "COALESCE(try_cast(s AS DECIMAL(38,0)),"
        " CAST(CAST(s AS DOUBLE) AS DECIMAL(38,0)))",
    ),
    # string tail batch 17: UTF8-suffixed pads/slices are plain renames
    # (Spark is codepoint-aware), token membership via word-boundary
    # regex like ClickHouse's tokenizer
    "leftPadUTF8": ("(s STRING, n INT, p STRING) RETURNS STRING", "lpad(s, n, p)"),
    "rightPadUTF8": ("(s STRING, n INT, p STRING) RETURNS STRING", "rpad(s, n, p)"),
    "leftUTF8": ("(s STRING, n INT) RETURNS STRING", "left(s, n)"),
    "rightUTF8": ("(s STRING, n INT) RETURNS STRING", "right(s, n)"),
    "mid": ("(s STRING, p INT, n INT) RETURNS STRING", "substring(s, p, n)"),
    "byteSlice": ("(s STRING, p INT, n INT) RETURNS STRING", "substring(s, p, n)"),
    "concatWithSeparatorAssumeInjective": (
        "(sep STRING, a STRING, b STRING) RETURNS STRING",
        "concat_ws(sep, a, b)",
    ),
    "toStringCutToZero": (
        "(s STRING) RETURNS STRING",
        "substring_index(s, chr(0), 1)",
    ),
    "hasToken": (
        "(h STRING, t STRING) RETURNS BOOLEAN",
        "h RLIKE concat('(^|[^A-Za-z0-9_])', t, '($|[^A-Za-z0-9_])')",
    ),
    "hasTokenCaseInsensitive": (
        "(h STRING, t STRING) RETURNS BOOLEAN",
        "lower(h) RLIKE concat('(^|[^a-z0-9_])', lower(t), '($|[^a-z0-9_])')",
    ),
    "multiSearchAllPositions": (
        "(s STRING, pats ARRAY<STRING>) RETURNS ARRAY<INT>",
        "transform(pats, __p -> instr(s, __p))",
    ),
    "multiSearchAnyCaseInsensitive": (
        "(s STRING, pats ARRAY<STRING>) RETURNS BOOLEAN",
        "exists(pats, __p -> instr(lower(s), lower(__p)) > 0)",
    ),
    # MySQL-style YEARWEEK (mode 0): week-0 days belong to the previous
    # year's final week, exactly like ClickHouse
    "toYearWeek": (
        "(x TIMESTAMP) RETURNS INT",
        "CAST(CASE WHEN toWeek(x) = 0 THEN"
        " (year(x) - 1) * 100"
        "   + toWeek(make_date(year(x) - 1, 12, 31))"
        " ELSE year(x) * 100 + toWeek(x) END AS INT)",
    ),
}


def _detect_language_body() -> str:
    """SQL twin of ``operators.text.language_id`` — same stopword lists,
    same (hits desc, code asc) tie-break, 'und' when nothing hits — so
    the SQL spelling and the DataFrame operator can never disagree."""
    from ed_clickhouse_spark.operators.text import STOPWORDS

    structs = []
    for code, ws in sorted(STOPWORDS.items()):
        arr = ", ".join("'" + w.replace("'", "''") + "'" for w in ws)
        structs.append(
            "named_struct('hits', size(array_intersect("
            f"array_distinct(split(s, ' ')), array({arr}))),"
            f" 'code', '{code}')"
        )
    return (
        "aggregate(array(" + ", ".join(structs) + "),"
        " named_struct('hits', -1, 'code', 'zz'),"
        " (__ch_acc, __ch_x) -> IF(__ch_x.hits > __ch_acc.hits"
        " OR (__ch_x.hits = __ch_acc.hits AND __ch_x.code < __ch_acc.code),"
        " __ch_x, __ch_acc),"
        " __ch_acc -> IF(__ch_acc.hits > 0, __ch_acc.code, 'und'))"
    )


_SQL_SCALAR_ALIASES["detectLanguage"] = (
    "(s STRING) RETURNS STRING",
    _detect_language_body(),
)


def _hostname_literal() -> str:
    """The engine host, embedded at registration time — in local mode
    the driver IS the server, matching ClickHouse's server-side
    hostName(); escape quotes defensively."""
    import socket

    return socket.gethostname().replace("'", "''")


_SQL_SCALAR_ALIASES["hostName"] = (
    "() RETURNS STRING", f"'{_hostname_literal()}'"
)
# FQDN is hostName's fully-qualified twin; same stand-in value here
_SQL_SCALAR_ALIASES["FQDN"] = (
    "() RETURNS STRING", f"'{_hostname_literal()}'"
)


def _server_uuid_literal() -> str:
    """Stable per-host stand-in for ClickHouse serverUUID(): uuid5 of
    the hostname — deterministic across sessions on one machine (CH
    persists its UUID in the data dir; local mode has no such dir)."""
    import uuid

    return str(uuid.uuid5(uuid.NAMESPACE_DNS, _hostname_literal()))


_ULID_ALPHABET = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"  # Crockford base32

# --- probe batch 24 (round 7): spellings that translated untouched and
# died at run time with UNRESOLVED_ROUTINE — each gets a pure-SQL twin
# (the algorithmic codecs punycode/idna/sqids refuse loudly instead;
# see chsql._OPERATOR_ONLY_AGGS) ---
_SQL_SCALAR_ALIASES.update(
    {
        "toFirstDayOfMonth": (
            "(x TIMESTAMP) RETURNS DATE",
            "CAST(date_trunc('MONTH', x) AS DATE)",
        ),
        # ClickHouse timeDiff(first, second) = second - first in seconds
        "timeDiff": (
            "(x TIMESTAMP, y TIMESTAMP) RETURNS BIGINT",
            "unix_timestamp(y) - unix_timestamp(x)",
        ),
        "stringCompare": (
            "(a STRING, b STRING) RETURNS INT",
            "CASE WHEN a < b THEN -1 WHEN a > b THEN 1 ELSE 0 END",
        ),
        "scalarProduct": (
            "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
            "aggregate(zip_with(a, b, (x, y) -> x * y),"
            " CAST(0.0 AS DOUBLE), (s, v) -> s + v)",
        ),
        "positionCaseInsensitiveUTF8": (
            "(h STRING, n STRING) RETURNS INT",
            "locate(lower(n), lower(h))",
        ),
        # subsequence check: fold the needle chars, advancing a search
        # cursor through the haystack; cursor 0 = dead. Empty needle is
        # a subsequence of anything (CH returns 1).
        "hasSubsequence": (
            "(h STRING, n STRING) RETURNS BOOLEAN",
            "aggregate(filter(split(n, ''), __c -> __c != ''), 1,"
            " (__p, __c) -> CASE WHEN __p = 0 THEN 0"
            " WHEN locate(__c, h, __p) = 0 THEN 0"
            " ELSE locate(__c, h, __p) + 1 END) > 0",
        ),
        "hasSubsequenceCaseInsensitive": (
            "(h STRING, n STRING) RETURNS BOOLEAN",
            "aggregate(filter(split(lower(n), ''), __c -> __c != ''), 1,"
            " (__p, __c) -> CASE WHEN __p = 0 THEN 0"
            " WHEN locate(__c, lower(h), __p) = 0 THEN 0"
            " ELSE locate(__c, lower(h), __p) + 1 END) > 0",
        ),
        "hasSubsequenceUTF8": (
            "(h STRING, n STRING) RETURNS BOOLEAN",
            "hasSubsequence(h, n)",
        ),
        "hasSubsequenceCaseInsensitiveUTF8": (
            "(h STRING, n STRING) RETURNS BOOLEAN",
            "hasSubsequenceCaseInsensitive(h, n)",
        ),
        # NULL when the needle is not one whole token (CH semantics);
        # otherwise exactly hasToken
        "hasTokenOrNull": (
            "(h STRING, t STRING) RETURNS BOOLEAN",
            "CASE WHEN t = '' OR t RLIKE '[^A-Za-z0-9_]'"
            " THEN CAST(NULL AS BOOLEAN)"
            " ELSE h RLIKE concat('(^|[^A-Za-z0-9_])', t,"
            " '($|[^A-Za-z0-9_])') END",
        ),
        "hasTokenCaseInsensitiveOrNull": (
            "(h STRING, t STRING) RETURNS BOOLEAN",
            "CASE WHEN t = '' OR t RLIKE '[^A-Za-z0-9_]'"
            " THEN CAST(NULL AS BOOLEAN)"
            " ELSE lower(h) RLIKE concat('(^|[^a-z0-9_])', lower(t),"
            " '($|[^a-z0-9_])') END",
        ),
        # 1-based index of the needle with the LEFTMOST occurrence
        # (ties -> smallest index), 0 when none found — struct sort on
        # (position, index)
        "multiSearchFirstIndex": (
            "(s STRING, pats ARRAY<STRING>) RETURNS INT",
            "coalesce(try_element_at(array_sort(filter(transform(pats,"
            " (__p, __i) -> named_struct('p', instr(s, __p),"
            " 'i', __i + 1)), __s -> __s.p > 0)), 1).i, 0)",
        ),
        "multiSearchFirstIndexCaseInsensitive": (
            "(s STRING, pats ARRAY<STRING>) RETURNS INT",
            "multiSearchFirstIndex(lower(s),"
            " transform(pats, __p -> lower(__p)))",
        ),
    }
)


def _parse_readable_size_expr(on_bad: str) -> str:
    """Bytes from a human-readable size ('1.5 KiB', '23 MB'): decimal
    units are powers of 1000, binary (``*iB``) powers of 1024, rounded up
    (ceiling) exactly like ClickHouse. ``on_bad`` supplies the
    unparseable-input branch."""
    rx = "'^ *([0-9]+(?:[.][0-9]+)?) *([A-Za-z]+) *$'"
    mult = (
        "CASE lower(regexp_extract(s, " + rx + ", 2))"
        " WHEN 'b' THEN 1.0"
        " WHEN 'kb' THEN 1e3 WHEN 'mb' THEN 1e6 WHEN 'gb' THEN 1e9"
        " WHEN 'tb' THEN 1e12 WHEN 'pb' THEN 1e15 WHEN 'eb' THEN 1e18"
        " WHEN 'kib' THEN 1024.0 WHEN 'mib' THEN pow(1024.0, 2)"
        " WHEN 'gib' THEN pow(1024.0, 3) WHEN 'tib' THEN pow(1024.0, 4)"
        " WHEN 'pib' THEN pow(1024.0, 5) WHEN 'eib' THEN pow(1024.0, 6)"
        " END"
    )
    return (
        f"CASE WHEN s RLIKE {rx} AND ({mult}) IS NOT NULL"
        f" THEN CAST(ceil(CAST(regexp_extract(s, {rx}, 1) AS DOUBLE)"
        f" * ({mult})) AS BIGINT)"
        f" ELSE {on_bad} END"
    )


_SQL_SCALAR_ALIASES.update(
    {
        "parseReadableSize": (
            "(s STRING) RETURNS BIGINT",
            _parse_readable_size_expr(
                "CAST(raise_error(concat('parseReadableSize: cannot"
                " parse ', s)) AS BIGINT)"
            ),
        ),
        "parseReadableSizeOrNull": (
            "(s STRING) RETURNS BIGINT",
            _parse_readable_size_expr("CAST(NULL AS BIGINT)"),
        ),
        "parseReadableSizeOrZero": (
            "(s STRING) RETURNS BIGINT",
            _parse_readable_size_expr("CAST(0 AS BIGINT)"),
        ),
        # ULID: 48-bit unix-ms timestamp + 80 random bits in Crockford
        # base32 (26 chars). Randomness from rand() per char — the
        # monotonicity-within-ms guarantee of reference implementations
        # is NOT provided (documented; CH's generateULID does not
        # guarantee it across threads either).
        "generateULID": (
            "() RETURNS STRING",
            "concat("
            "concat_ws('', transform(sequence(9, 0, -1),"
            f" __i -> substr('{_ULID_ALPHABET}',"
            " 1 + CAST((unix_millis(now()) >> (5 * __i)) & 31 AS INT),"
            " 1))),"
            " concat_ws('', transform(sequence(1, 16),"
            f" __i -> substr('{_ULID_ALPHABET}',"
            " 1 + CAST(floor(rand() * 32) AS INT), 1))))",
        ),
        "ULIDStringToDateTime": (
            "(s STRING) RETURNS TIMESTAMP",
            "timestamp_millis(aggregate(sequence(1, 10),"
            " CAST(0 AS BIGINT), (__a, __i) -> __a * 32"
            f" + CAST(locate(substr(upper(s), __i, 1),"
            f" '{_ULID_ALPHABET}') - 1 AS BIGINT)))",
        ),
        "serverUUID": (
            "() RETURNS STRING", f"'{_server_uuid_literal()}'"
        ),
        # display_name defaults to the hostname in ClickHouse config
        "displayName": (
            "() RETURNS STRING", f"'{_hostname_literal()}'"
        ),
        # query-id stand-ins: one UUID per REGISTRATION (constant
        # within a session, like CH's constant-within-a-query id;
        # local mode has no per-query id to surface)
        "queryID": (
            "() RETURNS STRING", f"'{__import__('uuid').uuid4()}'"
        ),
        "initialQueryID": (
            "() RETURNS STRING", f"'{__import__('uuid').uuid4()}'"
        ),
        # filesystem introspection stand-ins: the DRIVER host's disk at
        # registration time (like uptime/serverUUID — local-mode values;
        # a cluster has no single filesystem to report)
        "filesystemAvailable": (
            "() RETURNS BIGINT",
            f"CAST({__import__('shutil').disk_usage('/').free} AS BIGINT)",
        ),
        "filesystemUnreserved": (
            "() RETURNS BIGINT",
            f"CAST({__import__('shutil').disk_usage('/').free} AS BIGINT)",
        ),
        "filesystemCapacity": (
            "() RETURNS BIGINT",
            f"CAST({__import__('shutil').disk_usage('/').total}"
            " AS BIGINT)",
        ),
    }
)


def _uptime_anchor() -> int:
    """Engine start stand-in: module import time (local mode has no
    long-lived server process; uptime() measures this session's age)."""
    import time

    return int(time.time())


_SQL_SCALAR_ALIASES["uptime"] = (
    "() RETURNS BIGINT",
    f"unix_timestamp(now()) - {_uptime_anchor()}",
)

# remaining server-introspection spellings: stable stand-ins (local
# mode has no ClickHouse build number, connection registry, or
# ZooKeeper — each returns the documented neutral value)
_SQL_SCALAR_ALIASES.update(
    {
        # a fixed protocol-revision stand-in (CH 24.x era); monitoring
        # dashboards only compare it for change
        "revision": ("() RETURNS BIGINT", "54500"),
        "connectionId": ("() RETURNS BIGINT", "0"),
        "currentSchemas": (
            "(b BOOLEAN) RETURNS ARRAY<STRING>", "array(current_schema())"
        ),
        "zookeeperSessionUptime": (
            "() RETURNS BIGINT", "CAST(NULL AS BIGINT)"
        ),
    }
)


def _reinterpret_uint_body(n_bytes: int) -> str:
    """Little-endian unsigned int from the first ``n_bytes`` of the
    string's bytes: hex the bytes, reverse the hex PAIRS (byte order,
    not nibble order), conv base 16 -> 10."""
    return (
        "CAST(coalesce(conv(concat_ws('', reverse(regexp_extract_all("
        f"hex(CAST(left(s, {n_bytes}) AS BINARY)), '(..)'))), 16, 10), '0')"
        " AS BIGINT)"
    )


# --- probe batch 26 (round 7): conversion / date / string tails that
# translated untouched and died at run time ---
_SQL_SCALAR_ALIASES.update(
    {
        "parseDateTime64BestEffortOrNull": (
            "(s STRING) RETURNS TIMESTAMP", "try_cast(s AS TIMESTAMP)"
        ),
        "parseDateTime64BestEffortOrZero": (
            "(s STRING) RETURNS TIMESTAMP",
            "coalesce(try_cast(s AS TIMESTAMP),"
            " TIMESTAMP'1970-01-01 00:00:00')",
        ),
        "toModifiedJulianDayOrNull": (
            "(s STRING) RETURNS INT",
            "datediff(try_cast(s AS DATE), DATE'1858-11-17')",
        ),
        "toRelativeYearNum": (
            "(x TIMESTAMP) RETURNS INT", "year(x)"
        ),
        "toRelativeQuarterNum": (
            "(x TIMESTAMP) RETURNS INT", "year(x) * 4 + quarter(x) - 1"
        ),
        "toRelativeMonthNum": (
            "(x TIMESTAMP) RETURNS INT", "year(x) * 12 + month(x) - 1"
        ),
        "toRelativeWeekNum": (
            "(x TIMESTAMP) RETURNS INT",
            "CAST((unix_timestamp(x) + 345600) div 604800 AS INT)",
        ),
        "toRelativeSecondNum": (
            "(x TIMESTAMP) RETURNS BIGINT", "unix_timestamp(x)"
        ),
        "toUnixTimestamp64Second": (
            "(x TIMESTAMP) RETURNS BIGINT", "unix_timestamp(x)"
        ),
        # escape every regex metacharacter (including backslash itself)
        "regexpQuoteMeta": (
            "(s STRING) RETURNS STRING",
            r"regexp_replace(s, r'([\\^$.|?*+()\[\]{}-])', r'\\$1')",
        ),
        # decimal digits of the integer magnitude (CH counts the digits
        # of the underlying representation; fractional digits of
        # decimals are counted via the string form)
        "countDigits": (
            "(x DOUBLE) RETURNS INT",
            "length(replace(replace(replace(CAST("
            "CASE WHEN x = CAST(x AS BIGINT) THEN"
            " CAST(abs(CAST(x AS BIGINT)) AS STRING)"
            " ELSE CAST(abs(x) AS STRING) END AS STRING),"
            " '.', ''), '-', ''), 'E', ''))",
        ),
        # reinterpret*: little-endian byte reinterpretation, the CH wire
        # debugging helpers. Signed variants share the unsigned body
        # (values above 2^63-1 are out of scope, documented).
        "reinterpretAsUInt8": (
            "(s STRING) RETURNS BIGINT", _reinterpret_uint_body(1)
        ),
        "reinterpretAsUInt16": (
            "(s STRING) RETURNS BIGINT", _reinterpret_uint_body(2)
        ),
        "reinterpretAsUInt32": (
            "(s STRING) RETURNS BIGINT", _reinterpret_uint_body(4)
        ),
        "reinterpretAsUInt64": (
            "(s STRING) RETURNS BIGINT", _reinterpret_uint_body(8)
        ),
        "reinterpretAsInt8": (
            "(s STRING) RETURNS BIGINT", _reinterpret_uint_body(1)
        ),
        "reinterpretAsInt16": (
            "(s STRING) RETURNS BIGINT", _reinterpret_uint_body(2)
        ),
        "reinterpretAsInt32": (
            "(s STRING) RETURNS BIGINT", _reinterpret_uint_body(4)
        ),
        "reinterpretAsInt64": (
            "(s STRING) RETURNS BIGINT", _reinterpret_uint_body(8)
        ),
        # int -> its little-endian bytes as text (trailing zero bytes
        # drop out of hex() naturally)
        "reinterpretAsString": (
            "(x BIGINT) RETURNS STRING",
            "CASE WHEN x = 0 THEN ''"
            " ELSE decode(unhex(concat_ws('', reverse(regexp_extract_all("
            "lpad(hex(x), CAST(ceil(length(hex(x)) / 2.0) * 2 AS INT),"
            " '0'), '(..)')))), 'UTF-8') END",
        ),
    }
)


# ---- r9: Cartesian polygon algebra + WKT I/O (previously refused) ----
# Geometry model: Point = STRUCT<x,y DOUBLE> (CH Tuple(Float64,
# Float64)), Ring/LineString = ARRAY<Point>, Polygon = ARRAY<Ring>
# (ring 1 = outer boundary, rest = holes — CH/boost convention),
# MultiPolygon = ARRAY<Polygon>. Area is the shoelace fold; the
# wrap-around term vanishes on closed rings (last point = first), so
# open and closed rings both compute correctly. All pure-JVM HOFs —
# no geometry kernel, no UDF. Spherical variants stay refused
# (boost's geographic kernel has no faithful SQL spelling).
_GEO_POINT_T = "STRUCT<x: DOUBLE, y: DOUBLE>"
_GEO_RING_T = f"ARRAY<{_GEO_POINT_T}>"
_GEO_POLY_T = f"ARRAY<{_GEO_RING_T}>"

# "x y, x y, ..." -> ARRAY<Point>  (template over the source string)
def _geo_ring_parse(src: str) -> str:
    return (
        "transform(split(" + src + ", ','), __p -> named_struct("
        "'x', CAST(element_at(split(trim(__p), '\\\\s+'), 1) AS DOUBLE),"
        " 'y', CAST(element_at(split(trim(__p), '\\\\s+'), 2) AS DOUBLE)))"
    )


# strip 'TYPE ((' ... '))' then split rings on ')...('
def _geo_poly_parse(src: str) -> str:
    stripped = (
        "regexp_replace(" + src +
        ", '^[A-Za-z ]*\\\\(\\\\s*\\\\(|\\\\)\\\\s*\\\\)\\\\s*$', '')"
    )
    return (
        "transform(split(" + stripped + ", '\\\\)\\\\s*,\\\\s*\\\\('),"
        " __r -> " + _geo_ring_parse("__r") + ")"
    )


def _geo_shoelace2(r: str) -> str:
    # |2 * signed area| of one ring; < 3 points -> 0
    return (
        "(CASE WHEN size(" + r + ") < 3 THEN CAST(0 AS DOUBLE)"
        " ELSE abs(aggregate(sequence(1, size(" + r + ")),"
        " CAST(0 AS DOUBLE), (__a, __i) -> __a"
        " + element_at(" + r + ", __i).x"
        " * element_at(" + r + ", __i % size(" + r + ") + 1).y"
        " - element_at(" + r + ", __i % size(" + r + ") + 1).x"
        " * element_at(" + r + ", __i).y)) END)"
    )


def _geo_ring_perim(r: str) -> str:
    # closed-boundary length; the wrap edge is 0 when last = first
    return (
        "(CASE WHEN size(" + r + ") < 2 THEN CAST(0 AS DOUBLE)"
        " ELSE aggregate(sequence(1, size(" + r + ")),"
        " CAST(0 AS DOUBLE), (__a, __i) -> __a + sqrt("
        "pow(element_at(" + r + ", __i).x"
        " - element_at(" + r + ", __i % size(" + r + ") + 1).x, 2)"
        " + pow(element_at(" + r + ", __i).y"
        " - element_at(" + r + ", __i % size(" + r + ") + 1).y, 2))) END)"
    )


_GEO_RING_AREAS = "transform(p, __r -> " + _geo_shoelace2("__r") + " / 2)"
_SQL_SCALAR_ALIASES.update(
    {
        "readWKTPoint": (
            "(s STRING) RETURNS " + _GEO_POINT_T,
            "named_struct("
            "'x', CAST(regexp_extract(s,"
            " '\\\\(\\\\s*([-+0-9.eE]+)', 1) AS DOUBLE),"
            " 'y', CAST(regexp_extract(s,"
            " '\\\\(\\\\s*[-+0-9.eE]+\\\\s+([-+0-9.eE]+)', 1) AS DOUBLE))",
        ),
        "readWKTLineString": (
            "(s STRING) RETURNS " + _GEO_RING_T,
            _geo_ring_parse(
                "regexp_replace(s, '^[A-Za-z ]*\\\\(|\\\\)\\\\s*$', '')"
            ),
        ),
        "readWKTMultiLineString": (
            "(s STRING) RETURNS " + _GEO_POLY_T,
            _geo_poly_parse("s"),
        ),
        # CH's readWKTRing parses a POLYGON string's outer ring
        "readWKTRing": (
            "(s STRING) RETURNS " + _GEO_RING_T,
            "element_at(" + _geo_poly_parse("s") + ", 1)",
        ),
        "readWKTPolygon": (
            "(s STRING) RETURNS " + _GEO_POLY_T,
            _geo_poly_parse("s"),
        ),
        "readWKTMultiPolygon": (
            "(s STRING) RETURNS ARRAY<" + _GEO_POLY_T + ">",
            # strip 'MULTIPOLYGON (((' / ')))', split polygons on
            # ')),((' boundaries, then rings within each
            "transform(split(regexp_replace(s,"
            " '^[A-Za-z ]*\\\\(\\\\s*\\\\(\\\\s*\\\\("
            "|\\\\)\\\\s*\\\\)\\\\s*\\\\)\\\\s*$', ''),"
            " '\\\\)\\\\s*\\\\)\\\\s*,\\\\s*\\\\(\\\\s*\\\\('),"
            " __pg -> transform(split(__pg, '\\\\)\\\\s*,\\\\s*\\\\('),"
            " __r -> " + _geo_ring_parse("__r") + "))",
        ),
        # outer ring minus holes: 2*a1 - sum(a) = a1 - (sum - a1)
        "polygonAreaCartesian": (
            "(p " + _GEO_POLY_T + ") RETURNS DOUBLE",
            "(CASE WHEN size(p) = 0 THEN CAST(0 AS DOUBLE)"
            " ELSE 2 * element_at(" + _GEO_RING_AREAS + ", 1)"
            " - aggregate(" + _GEO_RING_AREAS + ","
            " CAST(0 AS DOUBLE), (__s, __v) -> __s + __v) END)",
        ),
        # boost perimeter sums every ring's boundary (holes included)
        "polygonPerimeterCartesian": (
            "(p " + _GEO_POLY_T + ") RETURNS DOUBLE",
            "aggregate(transform(p, __r -> " + _geo_ring_perim("__r")
            + "), CAST(0 AS DOUBLE), (__s, __v) -> __s + __v)",
        ),
        # WKT render of the Polygon model (CH's wkt() is polymorphic;
        # this engine types it for the most common geometry — points
        # render via concat directly)
        # function spellings of the [NOT] [I]LIKE operators (batch 65)
        "notLike": (
            "(s STRING, p STRING) RETURNS BOOLEAN", "NOT (s LIKE p)",
        ),
        "notILike": (
            "(s STRING, p STRING) RETURNS BOOLEAN", "NOT ilike(s, p)",
        ),
        # ---- probe batch 64 tails ----
        "parseDateTimeInJodaSyntaxOrZero": (
            "(s STRING, f STRING) RETURNS TIMESTAMP",
            "coalesce(try_to_timestamp(s, f),"
            " TIMESTAMP'1970-01-01 00:00:00')",
        ),
        "L2SquaredNorm": (
            "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
            "aggregate(a, CAST(0 AS DOUBLE),"
            " (__s, __x) -> __s + __x * __x)",
        ),
        # nanosecond add/subtract at the engine's microsecond storage:
        # sub-microsecond remainders truncate (documented — same
        # stance as toStartOfNanosecond)
        "addNanoseconds": (
            "(x TIMESTAMP, n BIGINT) RETURNS TIMESTAMP",
            "timestampadd(MICROSECOND, CAST(n / 1000 AS BIGINT), x)",
        ),
        "subtractNanoseconds": (
            "(x TIMESTAMP, n BIGINT) RETURNS TIMESTAMP",
            "timestampadd(MICROSECOND, -CAST(n / 1000 AS BIGINT), x)",
        ),
        # ---- probe batch 57 tails ----
        # RFC-spelling twins: the RFC variants differ only in stricter
        # hostname validation, which parse_url already applies
        "domainRFC": ("(u STRING) RETURNS STRING", "parse_url(u, 'HOST')"),
        "portRFC": (
            "(u STRING) RETURNS INT",
            "coalesce(CAST(nullif(regexp_extract(u,"
            " '^(?:[a-z][a-z0-9+.-]*:)?//[^/?#]*?:([0-9]+)(?:[/?#]|$)',"
            " 1), '') AS INT), 0)",
        ),
        # same splitter as extractKeyValuePairs — the escaping variant
        # differs only in decoding backslash escapes inside values,
        # which the [,; ]/: grammar this engine supports never emits
        "extractKeyValuePairsWithEscaping": (
            "(s STRING) RETURNS MAP<STRING, STRING>",
            "str_to_map(s, '[,; ]+', ':')",
        ),
        # layout matches dateTimeToSnowflakeID's default epoch so the
        # round-trip through snowflakeIDToDateTime is exact; low 22
        # bits are the machine/sequence randomness
        "generateSnowflakeID": (
            "() RETURNS BIGINT",
            "shiftleft(unix_millis(current_timestamp()), 22)"
            " + CAST(floor(rand() * 4194304) AS BIGINT)",
        ),
        # drop one query parameter, keeping the separators CH keeps:
        # mid-query eats the trailing '&', tail eats the leading '&',
        # a lone parameter leaves the bare '?'
        "cutURLParameter": (
            "(u STRING, p STRING) RETURNS STRING",
            "regexp_replace(regexp_replace(regexp_replace(u,"
            " concat('([?&])', regexpQuoteMeta(p), '=[^&#]*&'), '$1'),"
            " concat('&', regexpQuoteMeta(p), '=[^&#]*'), ''),"
            " concat('\\\\?', regexpQuoteMeta(p), '=[^&#]*'), '?')",
        ),
        "wkt": (
            "(p " + _GEO_POLY_T + ") RETURNS STRING",
            # whole-valued coordinates print bare (CH prints 40, not
            # 40.0); fractional ones keep the double rendering
            "concat('POLYGON (', concat_ws(', ', transform(p,"
            " __r -> concat('(', concat_ws(', ', transform(__r,"
            " __pt -> concat("
            "IF(__pt.x = floor(__pt.x),"
            " CAST(CAST(__pt.x AS BIGINT) AS STRING),"
            " CAST(__pt.x AS STRING)), ' ',"
            "IF(__pt.y = floor(__pt.y),"
            " CAST(CAST(__pt.y AS BIGINT) AS STRING),"
            " CAST(__pt.y AS STRING))))), ')'))), ')')",
        ),
    }
)


# sessions already carrying the aliases — registration is ~165 driver
# round-trips (~1.4 s), and suite/dialect entry points call this per
# query, so repeat calls must be free. WeakSet: a stopped session's
# entry dies with it; a foreachBatch CLONED session is a different
# object and correctly re-registers (temp functions are per-session).
import weakref

_ALIASED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def register_sql_aliases(spark: SparkSession, force: bool = False) -> list[str]:
    """Register every ``ch_*`` name ``chsql.translate`` can emit on
    this session: the ClickHouse scalar spellings as temporary SQL
    functions plus the Arrow-batched pandas-UDF families
    (string-distance/codec, random distributions). A translate()
    consumer that calls this resolves ALL translated SQL on any
    session — including a bare driver-provided one that never went
    through ``session.get_spark`` (the q234 round-7 driver failure:
    the SQL aliases were registered but ``ch_extract_text_from_html``
    is a pandas UDF). Idempotent and memoized per session. Returns
    the list of registered SQL-alias names."""
    if not force and spark in _ALIASED_SESSIONS:
        return list(_SQL_SCALAR_ALIASES)
    from ed_clickhouse_spark.functions.randdist import register_randdist
    from ed_clickhouse_spark.functions.strdist import register_strdist

    register_strdist(spark)
    register_randdist(spark)
    registered = []
    for name, (sig, body) in _SQL_SCALAR_ALIASES.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")
        registered.append(name)
    _ALIASED_SESSIONS.add(spark)
    return registered
