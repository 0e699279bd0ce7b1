"""Second scalar/collection function batch (SURVEY.md §2 B8): maps,
higher-order array functions, sequence generation (gap filling),
posexplode, bitwise ops, cryptographic hashes."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import dsum, t


@query(
    "q66_map_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           1 AS n_keys,
           'k' AS first_key
    FROM events
    WHERE event_id < 100
    """,
)
def q66_map_functions(spark, sf_dir):
    """JSON-in-string -> MapType -> map_keys/element_at (the `props` map
    family the reference's event_details column motivates)."""
    e = t(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return e.filter(F.col("event_id") < 100).select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@query(
    "q67_higher_order_fns",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> length(x) > 5)) AS n_long_tokens,
           array_to_string(list_sort(list_transform(string_split(text, ' ')[1:5], x -> upper(x))), ',') AS first5_upper,
           len(string_split(text, ' ')) > len(list_filter(string_split(text, ' '), x -> x <> 'spark')) AS mentions_spark,
           CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS total_chars_in_tokens
    FROM documents
    WHERE lang = 'fr'
    """,
)
def q67_higher_order_fns(spark, sf_dir):
    """transform / filter / exists / aggregate — Spark's higher-order
    array functions (≙ ClickHouse arrayMap/arrayFilter/arrayExists/
    arrayReduce). All JVM lambda expressions inside codegen."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.filter(F.col("lang") == "fr").select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).cast("bigint").alias("n_long_tokens"),
        F.concat_ws(
            ",", F.sort_array(F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x)))
        ).alias("first5_upper"),
        F.exists(toks, lambda x: x == "spark").alias("mentions_spark"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("total_chars_in_tokens"),
    )


@query(
    "q68_calendar_gapfill",
    oracle="""
    WITH cal AS (
      SELECT CAST(d AS DATE) AS day
      FROM generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) t(d)
    ),
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1
    )
    SELECT cal.day, COALESCE(daily.n, 0) AS n, COALESCE(daily.v, 0) AS v
    FROM cal LEFT JOIN daily ON cal.day = daily.day
    """,
)
def q68_calendar_gapfill(spark, sf_dir):
    """Gap filling: generate a calendar with sequence+explode, left-join
    daily aggregates, zero-fill missing days (the ClickHouse WITH FILL
    idiom). The generated side is tiny -> broadcast."""
    e = t(spark, sf_dir, "events")
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count("*").alias("n"), dsum("value", "v")
    )
    return (
        # bounded: cal is a generated day spine (one row per calendar day)
        F.broadcast(cal)
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("v", F.lit(0.0)).alias("v"),
        )
    )


@query(
    "q69_posexplode",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents WHERE doc_id < 20
    )
    SELECT doc_id,
           CAST(generate_subscripts(ts, 1) - 1 AS INT) AS pos,
           unnest(ts) AS token
    FROM toks
    """,
)
def q69_posexplode(spark, sf_dir):
    """posexplode — token with its position (≙ arrayJoin + arrayEnumerate;
    DuckDB oracle via range join on the index)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
    )


@query(
    "q70_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 1 AS set_low,
           xor(event_id, 255) AS flipped,
           event_id << 2 AS shifted,
           CAST(bit_count(event_id) AS BIGINT) AS popcount
    FROM events
    WHERE event_id < 1000
    """,
)
def q70_bitwise(spark, sf_dir):
    """Bitwise family (ClickHouse bitAnd/bitOr/bitXor/bitShiftLeft/
    bitCount)."""
    e = t(spark, sf_dir, "events")
    c = F.col("event_id")
    return e.filter(c < 1000).select(
        "event_id",
        c.bitwiseAND(F.lit(255)).alias("low_byte"),
        c.bitwiseOR(F.lit(1)).alias("set_low"),
        c.bitwiseXOR(F.lit(255)).alias("flipped"),
        F.shiftleft(c, 2).alias("shifted"),
        F.bit_count(c).cast("bigint").alias("popcount"),
    )


@query(
    "q72_sliding_window",
    oracle="""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
             event_type, value
      FROM events, unnest([0, 1, 2, 3]) t(k)
    )
    SELECT window_start, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
    FROM expanded
    GROUP BY 1, 2
    """,
)
def q72_sliding_window(spark, sf_dir):
    """Sliding window (1 h, slide 15 min): each event lands in 4
    overlapping windows (SURVEY §2 B9). Same expression runs under
    readStream; the oracle expands windows via unnest."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "v"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "v")
    )


@query(
    "q71_crypto_hash",
    oracle="""
    SELECT doc_id,
           md5(source) AS src_md5,
           sha256(lang) AS lang_sha256,
           length(md5(text)) AS fp_len
    FROM documents
    WHERE doc_id < 50
    """,
)
def q71_crypto_hash(spark, sf_dir):
    """md5/sha256 — engine-portable content hashes (the hash/id family,
    SURVEY §2 B8; xxhash64 is Spark-internal, these are standard)."""
    d = t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.md5("source").alias("src_md5"),
        F.sha2("lang", 256).alias("lang_sha256"),
        F.length(F.md5("text")).cast("bigint").alias("fp_len"),
    )


@query(
    "q166_array_enumerate_uniq",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_transform(
               range(1, len(toks) + 1),
               i -> CAST(len(list_filter(toks[1:i], y -> y = toks[i])) AS VARCHAR)
             ), ',') AS occ
    FROM (
      SELECT doc_id, string_split(text, ' ')[1:12] AS toks
      FROM documents WHERE doc_id < 20
    )
    """,
)
def q166_array_enumerate_uniq(spark, sf_dir):
    """ClickHouse arrayEnumerateUniq(arr): the occurrence index of each
    element within its array (1st 'the' -> 1, 2nd 'the' -> 2, ...) —
    the building block of per-array dedup counters. Pure codegen HOFs
    (transform + filter over a running slice), per-row, no shuffle;
    serialized to a comma string for the scalar-only canonicalizer."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = F.slice(F.split("text", " "), 1, 12)
    occ = F.transform(
        toks,
        lambda x, i: F.size(
            F.filter(
                F.slice(toks, 1, i + 1),
                lambda y, j: (y == x) & (j <= i),
            )
        ),
    )
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(occ, lambda c: c.cast("string")), ","
        ).alias("occ"),
    )


@query(
    "q167_group_array_sample",
    oracle="""
    WITH r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT source,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS sample_ids
    FROM r WHERE rn <= 5 GROUP BY source
    """,
)
def q167_group_array_sample(spark, sf_dir):
    """ClickHouse groupArraySample(5): a fixed-size uniform sample of
    doc ids per source — deterministic md5 ranking instead of CH's
    seeded RNG, so the SAME sample on every engine and every run (the
    property that makes sampled audits reproducible). One window pass +
    one sorted serialization."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.concat_ws(":", F.col("source"), F.col("doc_id"))), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("sample_ids")
        )
    )
