"""Contract tests for __spark_entry__: the three driver hooks exist,
agree on keys, and the flagship query runs."""

from __future__ import annotations

import __spark_entry__ as ep


def test_entry_returns_rows(spark):
    df = ep.entry(spark)
    assert len(df.collect()) > 0


def test_queries_and_oracles_align():
    q = ep.queries()
    o = ep.oracle_sql()
    assert len(q) >= 50
    assert set(o) <= set(q), "oracle without a query"
    # hash/approx-based ops are the only ones allowed to skip the oracle
    allowed_no_oracle = {
        "q06_approx_distinct",
        "q46_minhash_lsh",
        "q47_simhash",
        "q50_ann_lsh",
        "q80_heavy_hitters",
        "q87_ann_ivf",
        "q141_pq_ann",
        # q103/q104 carry tolerance-banded oracles since r8; the
        # remaining seven are approximate/hash-based by design, each
        # with an error-band audit twin (q240-q246)
    }
    assert set(q) - set(o) == allowed_no_oracle


def test_approx_distinct_error_bound(spark):
    """q06 has no oracle (HLL sketches differ per engine); pin the
    approximation error against the exact count instead."""
    from pyspark.sql import functions as F

    from ed_clickhouse_spark.suite import QUERIES
    from ed_clickhouse_spark.suite._util import t

    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["q06_approx_distinct"](spark, "/root/testdata/sf0.001").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in t(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) / n < 0.05, (et, approx[et], n)


def test_every_query_is_callable(spark):
    # analysis-only check (no execution): each callable builds a valid plan
    for name, fn in ep.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.schema is not None, name


def test_integer_widths_match_oracle(spark):
    """Pin integer output widths against the oracle: the driver's
    schema comparison has been lenient on int widths so far, but a
    stricter driver would flip schema_match on a Spark `int` facing a
    DuckDB `BIGINT` (q173's n_scan/n_the were the last offenders).
    DuckDB DESCRIBE binds the oracle SQL without executing it, so this
    covers all 200+ oracles in seconds."""
    import duckdb

    from ed_clickhouse_spark.catalog import TABLES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for tname in TABLES:
        con.sql(f"CREATE VIEW {tname} AS SELECT * FROM '{sf}/{tname}.parquet'")

    def duck_int_family(t: str) -> str | None:
        t = t.upper()
        if t == "HUGEINT":
            return "i128"
        if t in ("BIGINT", "UBIGINT"):
            return "i64"
        if t in ("INTEGER", "SMALLINT", "TINYINT", "UINTEGER", "USMALLINT", "UTINYINT"):
            return "i32"
        return None

    def spark_int_family(dt) -> str | None:
        from pyspark.sql import types as T

        if isinstance(dt, T.LongType):
            return "i64"
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            return "i32"
        return None

    queries = ep.queries()
    mismatches = []
    for name, sql in ep.oracle_sql().items():
        duck_types = {
            r[0]: r[1]
            for r in con.sql(f"DESCRIBE ({sql})").fetchall()
        }
        spark_types = {
            f.name: f.dataType
            for f in queries[name](spark, sf).schema.fields
        }
        for col, dt in spark_types.items():
            sf_fam = spark_int_family(dt)
            dk_fam = duck_int_family(str(duck_types.get(col, "")))
            if sf_fam and dk_fam and sf_fam != dk_fam:
                mismatches.append(f"{name}.{col}: spark={sf_fam} duckdb={dk_fam}")
    assert not mismatches, mismatches


def test_no_unhashable_output_columns(spark):
    """Driver-hash contract: the correctness driver canonicalizes every
    output cell, and it cannot hash Decimal (round-3 failures q105/q106/
    q111/q112/q192/q193) or nested values (round-1 failures q12/q67).
    Rule: every registered query surfaces only scalar, non-decimal
    columns — keep decimal/array/map/struct arithmetic INTERNAL and cast
    or serialize at the final select."""
    from pyspark.sql import types as T

    banned = (T.DecimalType, T.ArrayType, T.MapType, T.StructType)
    offenders = []
    for name, fn in ep.queries().items():
        for field in fn(spark, "/root/testdata/sf0.001").schema.fields:
            if isinstance(field.dataType, banned):
                offenders.append((name, field.name, str(field.dataType)))
    assert not offenders, offenders


def test_red_rotation_numeric_rounds(tmp_path):
    """A red verdict from round 10 must not be cleared by a green row
    from round 2 (lexicographic glob order puts _r10 before _r2), and a
    green row from a strictly NEWER round must clear it."""
    import json

    green = {"rows_match": True, "hash_match": True, "err": None}
    red = {"rows_match": True, "hash_match": False, "err": None}
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps({"qa": green}))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps({"qa": red}))
    assert ep._latest_checked_rounds(str(tmp_path))["qa"] == ep._RED
    # a newer green row clears the red and restores round-based aging
    (tmp_path / "CORRECTNESS_r11.json").write_text(json.dumps({"qa": green}))
    assert ep._latest_checked_rounds(str(tmp_path))["qa"] == 11
    # rows-only-by-design entries are green, not red
    (tmp_path / "CORRECTNESS_r12.json").write_text(
        json.dumps({"qa": {"err": "no_oracle", "rows_match": True}})
    )
    assert ep._latest_checked_rounds(str(tmp_path))["qa"] == 12
