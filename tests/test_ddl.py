"""ClickHouse DDL translation (ddl.py) — EP3 provisioning parity.

The DDL strings below mirror the reference migration dialect
(migrations/002_create_login_events_table.up.sql:1-19,
migrations/006_create_angulak_watch_events_table.up.sql:1-35) plus the
engine variants a real ClickHouse deployment uses.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ed_clickhouse_spark import ddl

# shape of reference migrations/002 (trimmed): plain MergeTree, compound
# ORDER BY, no partitioning.
LOGIN_DDL = """
CREATE TABLE IF NOT EXISTS login_events (
    event_id String,
    event_name String,
    user_id String,
    timestamp DateTime,
    season_number Int32
) ENGINE = MergeTree()
ORDER BY
    (timestamp, event_name);
"""

FANCY_DDL = """
-- engine variants + wrappers the reference's stack upgrades into
CREATE TABLE IF NOT EXISTS user_state (
    user_id String,
    updated_at DateTime64(3),
    plan LowCardinality(String),
    score Nullable(Float64),
    tags Array(String),
    attrs Map(String, String),
    balance Decimal(18, 4),
    flags UInt8 DEFAULT 0
) ENGINE = ReplacingMergeTree(updated_at)
PARTITION BY toYYYYMM(updated_at)
ORDER BY (user_id);
"""

SUMMING_DDL = """
CREATE TABLE daily_counters (
    day Date,
    metric LowCardinality(String),
    hits UInt64,
    amount Float64,
    note String
) ENGINE = SummingMergeTree((hits, amount))
ORDER BY (day, metric);
"""


def test_type_mapping():
    cases = {
        "String": T.StringType(),
        "UInt64": T.LongType(),
        "Int32": T.IntegerType(),
        "Float32": T.FloatType(),
        "DateTime": T.TimestampType(),
        "DateTime64(3, 'UTC')": T.TimestampType(),
        "Date": T.DateType(),
        "FixedString(16)": T.StringType(),
        "Enum8('a' = 1, 'b' = 2)": T.StringType(),
        "Decimal(10, 2)": T.DecimalType(10, 2),
        "Decimal64(4)": T.DecimalType(18, 4),
        "Array(Nullable(Int64))": T.ArrayType(T.LongType(), True),
        "Map(String, UInt32)": T.MapType(T.StringType(), T.LongType(), False),
        "LowCardinality(Nullable(String))": T.StringType(),
    }
    for ch, want in cases.items():
        got, _ = ddl.ch_type_to_spark(ch)
        assert got == want, f"{ch}: {got} != {want}"
    _, nullable = ddl.ch_type_to_spark("Nullable(String)")
    assert nullable
    _, nullable = ddl.ch_type_to_spark("String")
    assert not nullable
    t, _ = ddl.ch_type_to_spark("Tuple(a String, b Int64)")
    assert t == T.StructType(
        [T.StructField("a", T.StringType(), False), T.StructField("b", T.LongType(), False)]
    )
    # r7 batch 43: AggregateFunction columns map to the engine's own
    # -State representations (was a refusal before the ad-hoc
    # -State/-Merge spellings existed)
    t, n = ddl.ch_type_to_spark("AggregateFunction(uniq, String)")
    assert t == T.BinaryType() and n
    t, _ = ddl.ch_type_to_spark("AggregateFunction(avg, Float64)")
    assert t.fieldNames() == ["s", "c"]
    t, _ = ddl.ch_type_to_spark("SimpleAggregateFunction(sum, Int64)")
    assert t == T.LongType()
    with pytest.raises(ValueError, match="matview"):
        ddl.ch_type_to_spark("AggregateFunction(quantile, Float64)")


def test_parse_reference_shape():
    spec = ddl.parse_clickhouse_ddl(LOGIN_DDL)
    assert spec.name == "login_events"
    assert spec.engine == "MergeTree"
    assert spec.order_by == ["timestamp", "event_name"]
    assert spec.partition_by is None
    assert [f.name for f in spec.schema.fields] == [
        "event_id", "event_name", "user_id", "timestamp", "season_number",
    ]
    assert spec.schema["timestamp"].dataType == T.TimestampType()
    assert spec.schema["season_number"].dataType == T.IntegerType()


def test_parse_engine_variants():
    spec = ddl.parse_clickhouse_ddl(FANCY_DDL)
    assert spec.engine == "ReplacingMergeTree"
    assert spec.engine_args == ["updated_at"]
    assert spec.partition_by == "toYYYYMM(updated_at)"
    assert spec.order_by == ["user_id"]
    name, _col = spec.partition_column()
    assert name == "p_month"
    assert spec.schema["flags"].dataType == T.ShortType()  # UInt8 widened

    s2 = ddl.parse_clickhouse_ddl(SUMMING_DDL)
    assert s2.engine == "SummingMergeTree"
    assert s2.engine_args == ["hits", "amount"]


def test_parse_all_reference_migrations():
    """Every real reference migration parses and maps every column."""
    mdir = "/root/reference/migrations"
    if not os.path.isdir(mdir):
        pytest.skip("reference not mounted")
    n = 0
    for fn in sorted(os.listdir(mdir)):
        if not fn.endswith(".up.sql"):
            continue
        with open(os.path.join(mdir, fn)) as f:
            spec = ddl.parse_clickhouse_ddl(f.read())
        assert spec.engine == "MergeTree"
        assert spec.order_by == ["timestamp", "event_name"]
        assert len(spec.schema.fields) > 10
        n += 1
    assert n == 9


def test_provision_append_and_final_read(spark, tmp_path):
    wh = str(tmp_path / "wh")
    spec = ddl.parse_clickhouse_ddl(FANCY_DDL)
    ddl.provision_table(spark, spec, wh)
    assert os.path.exists(os.path.join(wh, "user_state"))
    # empty FINAL view registered
    assert spark.table("user_state").count() == 0

    rows = [
        ("u1", "2024-01-10 00:00:00", "free", 1.0),
        ("u1", "2024-02-05 00:00:00", "pro", 2.0),   # newer version wins
        ("u2", "2024-02-06 00:00:00", "free", 5.0),
    ]
    df = (
        spark.createDataFrame(rows, "user_id string, updated_at string, plan string, score double")
        .withColumn("updated_at", F.to_timestamp("updated_at"))
        .withColumn("tags", F.array(F.lit("x")))
        .withColumn("attrs", F.create_map(F.lit("k"), F.lit("v")))
        .withColumn("balance", F.lit(1.5).cast("decimal(18,4)"))
        .withColumn("flags", F.lit(0).cast("smallint"))
    )
    ddl.append_rows(df, spec, wh)
    # partition directories derived from toYYYYMM(updated_at)
    dirs = {d for d in os.listdir(os.path.join(wh, "user_state")) if d.startswith("p_month=")}
    assert dirs == {"p_month=202401", "p_month=202402"}

    ddl.register_view(spark, spec, wh)
    raw = spark.table("user_state_raw")
    assert raw.count() == 3
    fin = {r["user_id"]: r["plan"] for r in spark.table("user_state").collect()}
    assert fin == {"u1": "pro", "u2": "free"}  # ReplacingMergeTree FINAL


def test_summing_final_read(spark):
    spec = ddl.parse_clickhouse_ddl(SUMMING_DDL)
    df = spark.createDataFrame(
        [
            ("2024-01-01", "m1", 10, 1.0, "a"),
            ("2024-01-01", "m1", 5, 0.5, "b"),
            ("2024-01-01", "m2", 1, 9.0, "c"),
        ],
        "day string, metric string, hits long, amount double, note string",
    ).withColumn("day", F.to_date("day"))
    out = {
        (str(r["day"]), r["metric"]): (r["hits"], r["amount"])
        for r in ddl.final_read(df, spec).collect()
    }
    assert out[("2024-01-01", "m1")] == (15, 1.5)
    assert out[("2024-01-01", "m2")] == (1, 9.0)
    # column order preserved
    assert ddl.final_read(df, spec).columns == df.columns


def test_engine_migrate(spark, tmp_path):
    from ed_clickhouse_spark.engine import Engine

    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_login.up.sql").write_text(LOGIN_DDL)
    (mdir / "002_state.up.sql").write_text(FANCY_DDL)
    (mdir / "001_login.down.sql").write_text("DROP TABLE login_events;")

    eng = Engine(str(tmp_path / "wh"), spark)
    specs = eng.migrate(str(mdir))
    assert [s.name for s in specs] == ["login_events", "user_state"]
    assert spark.table("login_events").count() == 0
    assert eng.table_specs["user_state"].engine == "ReplacingMergeTree"
    # idempotent re-run (CREATE TABLE IF NOT EXISTS)
    eng.migrate(str(mdir))


TTL_DDL = """
CREATE TABLE ephemeral_events (
    event_id String,
    ts DateTime,
    payload String
) ENGINE = MergeTree()
PARTITION BY toDate(ts)
ORDER BY (ts)
TTL ts + INTERVAL 90 DAY;
"""


def test_parse_and_apply_ttl(spark, tmp_path):
    spec = ddl.parse_clickhouse_ddl(TTL_DDL)
    assert spec.ttl == ("ts", 90, "DAY")
    assert spec.partition_by == "toDate(ts)"

    wh = str(tmp_path / "wh")
    ddl.provision_table(spark, spec, wh)
    rows = [
        ("e1", "2024-01-01 00:00:00", "old"),
        ("e2", "2024-05-01 00:00:00", "new"),
        ("e3", "2024-05-02 00:00:00", "new"),
    ]
    df = spark.createDataFrame(rows, "event_id string, ts string, payload string") \
        .withColumn("ts", F.to_timestamp("ts"))
    ddl.append_rows(df, spec, wh)

    # fixed "now": 2024-05-15 -> 90-day cutoff 2024-02-15; e1 expires
    touched = ddl.apply_ttl(spark, spec, wh, now="2024-05-15 00:00:00")
    assert touched == 1  # only the expired day partition rewritten/dropped
    left = spark.read.parquet(os.path.join(wh, "ephemeral_events"))
    assert sorted(r["event_id"] for r in left.collect()) == ["e2", "e3"]
    assert not os.path.exists(os.path.join(wh, "ephemeral_events", "p_date=2024-01-01"))

    # nothing else expired: second run touches nothing
    assert ddl.apply_ttl(spark, spec, wh, now="2024-05-15 00:00:00") == 0

    with pytest.raises(ValueError):
        ddl.apply_ttl(spark, ddl.parse_clickhouse_ddl(LOGIN_DDL), wh)


def test_sample_by_parse_and_read(spark):
    spec = ddl.parse_clickhouse_ddl(
        "CREATE TABLE s (k Int64, v String) ENGINE = MergeTree() "
        "ORDER BY (k) SAMPLE BY intHash32(k);"
    )
    assert spec.sample_by == "intHash32(k)"
    df = spark.range(2000).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k").cast("string")
    )
    s10 = ddl.sample_read(df, spec, 0.1)
    n = s10.count()
    assert 120 < n < 280  # ~200 expected, md5-uniform
    # deterministic: same rows every time, and SAMPLE 0.1 ⊂ SAMPLE 0.3
    assert s10.count() == n
    keys10 = {r["k"] for r in s10.collect()}
    keys30 = {r["k"] for r in ddl.sample_read(df, spec, 0.3).collect()}
    assert keys10 <= keys30

    with pytest.raises(ValueError):
        ddl.sample_read(df, spec, 1.5)
    with pytest.raises(ValueError):
        ddl.sample_read(df, ddl.parse_clickhouse_ddl(LOGIN_DDL), 0.1)


def test_limit_by(spark):
    from ed_clickhouse_spark.functions.clickhouse import limit_by

    rows = [("a", i, float(i)) for i in range(5)] + [("b", 0, 9.0)]
    df = spark.createDataFrame(rows, ["g", "i", "score"])
    got = limit_by(df, 2, ["g"], [F.desc("score"), "i"])
    out = sorted((r["g"], r["i"]) for r in got.collect())
    assert out == [("a", 3), ("a", 4), ("b", 0)]


def test_migrate_with_alter(spark, tmp_path):
    """ALTER TABLE ADD/DROP COLUMN: schema evolution without data rewrite
    — old files read the added column back as NULL; dropped columns are
    hidden from the served views."""
    mdir = tmp_path / "m"
    mdir.mkdir()
    (mdir / "001_create.up.sql").write_text(LOGIN_DDL)

    wh = str(tmp_path / "wh")
    specs = ddl.migrate(spark, str(mdir), wh)
    spec0 = specs[0]
    # write a row with the ORIGINAL schema
    df = spark.createDataFrame(
        [("e1", "login", "u1", "2024-01-01 00:00:00", 1)],
        "event_id string, event_name string, user_id string, timestamp string, season_number int",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    ddl.append_rows(df, spec0, wh)

    (mdir / "002_alter.up.sql").write_text(
        "ALTER TABLE login_events ADD COLUMN region LowCardinality(String);\n"
        "ALTER TABLE login_events DROP COLUMN season_number;\n"
    )
    specs = ddl.migrate(spark, str(mdir), wh)
    spec = {s.name: s for s in specs}["login_events"]
    names = [f.name for f in spec.schema.fields]
    assert "region" in names and "season_number" not in names

    served = spark.table("login_events")
    assert "region" in served.columns and "season_number" not in served.columns
    row = served.collect()[0]
    assert row["event_id"] == "e1" and row["region"] is None

    # new writes carry the added column; old rows stay NULL
    df2 = spark.createDataFrame(
        [("e2", "login", "u2", "2024-01-02 00:00:00", "eu")],
        "event_id string, event_name string, user_id string, timestamp string, region string",
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    ddl.append_rows(df2, spec, wh)
    ddl.register_view(spark, spec, wh)
    got = {r["event_id"]: r["region"] for r in spark.table("login_events").collect()}
    assert got == {"e1": None, "e2": "eu"}


def test_bloom_filter_index_written(spark, tmp_path):
    """ClickHouse `INDEX ... TYPE bloom_filter` becomes a parquet bloom
    filter on the indexed column: the written file carries the filter
    (strictly larger than the bloom-free twin of the same data), and
    minmax indexes map to nothing because parquet stats already are
    one."""
    import glob
    import os

    from ed_clickhouse_spark.ddl import append_rows, parse_clickhouse_ddl

    ddl = (
        "CREATE TABLE ev (id Int64, user_id String,"
        "  INDEX idx_uid user_id TYPE bloom_filter GRANULARITY 4"
        ") ENGINE = MergeTree() ORDER BY id"
    )
    spec = parse_clickhouse_ddl(ddl)
    assert spec.bloom_cols == ["user_id"]
    df = spark.range(20000).selectExpr(
        "id", "concat('user-', cast(id % 5000 as string)) AS user_id"
    )
    append_rows(df, spec, str(tmp_path / "with_bloom"))
    plain = parse_clickhouse_ddl(ddl.replace(",  INDEX idx_uid user_id TYPE bloom_filter GRANULARITY 4", ""))
    assert plain.bloom_cols == []
    append_rows(df, plain, str(tmp_path / "no_bloom"))

    def total(p):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(str(p / spec.name / "**" / "*.parquet"), recursive=True)
        )

    with_bloom, without = total(tmp_path / "with_bloom"), total(tmp_path / "no_bloom")
    assert with_bloom > without + 1000  # the filter bytes are in the file


def test_show_create_round_trips():
    from ed_clickhouse_spark.ddl import parse_clickhouse_ddl, show_create

    ddl = """
    CREATE TABLE watch_events (
      event_id String,
      user_id String,
      ts DateTime,
      duration Int32,
      INDEX idx_uid user_id TYPE bloom_filter GRANULARITY 4
    ) ENGINE = ReplacingMergeTree(duration)
    PARTITION BY toYYYYMM(ts)
    ORDER BY (ts, event_id)
    SAMPLE BY user_id
    TTL ts + INTERVAL 90 DAY
    """
    spec = parse_clickhouse_ddl(ddl)
    again = parse_clickhouse_ddl(show_create(spec))
    assert again.name == spec.name
    assert again.schema == spec.schema
    assert (again.engine, again.engine_args) == (spec.engine, spec.engine_args)
    assert again.order_by == spec.order_by
    assert again.partition_by == spec.partition_by
    assert again.sample_by == spec.sample_by
    assert again.bloom_cols == spec.bloom_cols
    assert again.ttl == spec.ttl


_COLLAPSING = """
CREATE TABLE vis (
    page String,
    sign Int8,
    views Int64
) ENGINE = CollapsingMergeTree(sign)
ORDER BY page;
"""

_VCOLLAPSING = """
CREATE TABLE vis_v (
    page String,
    sign Int8,
    ver UInt32,
    views Int64
) ENGINE = VersionedCollapsingMergeTree(sign, ver)
ORDER BY page;
"""


def test_collapsing_final_read(spark):
    """Deleted keys vanish, updated keys keep the newest state row,
    untouched keys pass through."""
    spec = ddl.parse_clickhouse_ddl(_COLLAPSING)
    rows = [
        ("deleted", 1, 10), ("deleted", -1, 10),           # net 0 -> gone
        ("updated", 1, 5), ("updated", -1, 5), ("updated", 1, 9),
        ("plain", 1, 7),
    ]
    df = spark.createDataFrame(rows, "page string, sign int, views long")
    got = {r["page"]: r["views"] for r in ddl.final_read(df, spec).collect()}
    assert got == {"updated": 9, "plain": 7}


def test_versioned_collapsing_order_free(spark):
    """The version column makes the collapse arrival-order independent:
    shuffling the log rows never changes the survivors."""
    spec = ddl.parse_clickhouse_ddl(_VCOLLAPSING)
    rows = [
        ("upd", 1, 1, 20),            # v1 state (arrives FIRST, out of order)
        ("upd", -1, 0, 10),           # v0 cancel
        ("upd", 1, 0, 10),            # v0 state
        ("gone", 1, 0, 3), ("gone", -1, 0, 3),
        ("multi", 1, 0, 1), ("multi", 1, 1, 2),   # two live versions survive
    ]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(
            perm, "page string, sign int, ver int, views long"
        )
        got = {
            (r["page"], r["ver"]): r["views"]
            for r in ddl.final_read(df, spec).collect()
        }
        assert got == {("upd", 1): 20, ("multi", 0): 1, ("multi", 1): 2}


def test_collapsing_single_shuffle(spark):
    """FINAL over a collapsing table costs exactly one exchange on the
    merge key — both window passes share the partitioning."""
    spec = ddl.parse_clickhouse_ddl(_COLLAPSING)
    df = spark.createDataFrame(
        [("a", 1, 1)], "page string, sign int, views long"
    )
    plan = ddl.final_read(df, spec)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_system_tables_and_columns(spark, tmp_path):
    """system.tables / system.columns introspection through the
    ClickHouse-dialect endpoint (chsql rewrites the dot-qualified names;
    bytes/rows come from FS listing + parquet footers, never a scan)."""
    from ed_clickhouse_spark.engine import Engine

    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_login.up.sql").write_text(LOGIN_DDL)
    eng = Engine(str(tmp_path / "wh"), spark)
    eng.migrate(str(mdir))
    eng.ch_sql(
        "INSERT INTO login_events FORMAT JSONEachRow\n"
        '{"event_id":"e1","event_name":"login","user_id":"u1",'
        '"timestamp":"2024-01-01 00:00:00","season_number":1}'
    )

    tab = eng.ch_sql(
        "SELECT database, name, engine, sorting_key, total_rows, total_bytes "
        "FROM system.tables ORDER BY name"
    ).collect()
    assert [r["name"] for r in tab] == ["login_events"]
    assert tab[0]["database"] == "default"
    # a provisioned (non-migration) table also answers EXISTS
    assert eng.ch_sql("EXISTS TABLE login_events").first()["result"] == 1
    assert eng.ch_sql("EXISTS TABLE no_such_table").first()["result"] == 0
    assert tab[0]["engine"] == "MergeTree"
    assert tab[0]["sorting_key"] == "timestamp, event_name"
    assert tab[0]["total_rows"] == 1
    assert tab[0]["total_bytes"] > 0

    cols = eng.ch_sql(
        "SELECT name, type, is_in_sorting_key FROM system.columns "
        "WHERE table = 'login_events' ORDER BY position"
    ).collect()
    assert [r["name"] for r in cols] == [
        "event_id", "event_name", "user_id", "timestamp", "season_number"
    ]
    assert cols[0]["type"] == "String"
    assert [r["name"] for r in cols if r["is_in_sorting_key"]] == [
        "event_name", "timestamp"
    ]


DEFAULTS_DDL = """
CREATE TABLE typed_docs (
    doc_id Int64,
    title String,
    title_upper String MATERIALIZED upper(title),
    source String DEFAULT 'web',
    n_title_chars Int64 ALIAS length(title),
    ts DateTime
) ENGINE = MergeTree()
ORDER BY doc_id;
"""


def test_default_materialized_alias_columns(spark, tmp_path):
    """DEFAULT fills omitted/NULL values at insert, MATERIALIZED always
    computes at insert, ALIAS is computed at read and never stored —
    the ClickHouse column-attribute contract."""
    spec = ddl.parse_clickhouse_ddl(DEFAULTS_DDL)
    # ALIAS column is not part of the stored schema
    assert [f.name for f in spec.schema.fields] == [
        "doc_id", "title", "title_upper", "source", "ts"
    ]
    assert spec.alias_cols == ["n_title_chars"]

    wh = str(tmp_path / "wh")
    ddl.provision_table(spark, spec, wh)
    batch = spark.createDataFrame(
        [(1, "hello", None, "api", "2024-01-01 00:00:00"),
         (2, "worlds", None, None, "2024-01-01 00:00:00")],
        "doc_id long, title string, title_upper string, source string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ddl.append_rows(batch, spec, wh)
    ddl.register_view(spark, spec, wh)

    rows = {r["doc_id"]: r for r in spark.table("typed_docs").collect()}
    assert rows[1]["title_upper"] == "HELLO"        # MATERIALIZED computed
    assert rows[1]["source"] == "api"               # explicit value kept
    assert rows[2]["source"] == "web"               # DEFAULT filled NULL
    assert rows[2]["n_title_chars"] == 6            # ALIAS computed at read
    # ALIAS not stored on disk
    stored = spark.read.parquet(f"{wh}/typed_docs").columns
    assert "n_title_chars" not in stored

    # SHOW CREATE round-trips all three attribute kinds
    again = ddl.parse_clickhouse_ddl(ddl.show_create(spec))
    assert again.col_exprs == spec.col_exprs
    assert again.alias_cols == spec.alias_cols
    assert again.schema == spec.schema


KAFKA_DDL = """
CREATE TABLE events_queue (
    subject String,
    payload String
) ENGINE = Kafka
SETTINGS kafka_broker_list = 'broker1:9092,broker2:9092',
         kafka_topic_list = 'events.login,events.watch',
         kafka_group_name = 'engine_g1',
         kafka_format = 'JSONEachRow';
"""


def test_kafka_engine_ddl(spark, tmp_path):
    """ENGINE = Kafka tables are stream sources, not storage: migrate
    records the spec (no parquet provisioned) and its SETTINGS feed
    Engine.ingest_kafka as the lowest-precedence connection default."""
    import os

    from ed_clickhouse_spark.engine import Engine

    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_queue.up.sql").write_text(KAFKA_DDL)
    (mdir / "002_login.up.sql").write_text(LOGIN_DDL)
    eng = Engine(str(tmp_path / "wh"), spark)
    specs = eng.migrate(str(mdir))
    assert {s.name for s in specs} == {"events_queue", "login_events"}
    assert not os.path.exists(os.path.join(eng.warehouse, "events_queue"))
    spec = eng.table_specs["events_queue"]
    assert spec.settings["kafka_broker_list"] == "broker1:9092,broker2:9092"
    assert eng._kafka_ddl_source() == (
        "broker1:9092,broker2:9092", ["events.login", "events.watch"]
    )


def test_alter_rename_and_modify_column(spark, tmp_path):
    """RENAME COLUMN is metadata-only (pre-rename files keep the stored
    name; the served view coalesces both spellings) and MODIFY COLUMN
    rewrites the stored data with the cast, like a ClickHouse mutation."""
    from ed_clickhouse_spark.engine import Engine

    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_m.up.sql").write_text(
        """
        CREATE TABLE metrics (
            id Int64,
            val Float64,
            tag String
        ) ENGINE = MergeTree()
        ORDER BY id;
        """
    )
    eng = Engine(str(tmp_path / "wh"), spark)
    eng.migrate(str(mdir))
    eng.ch_sql('INSERT INTO metrics FORMAT JSONEachRow\n'
               '{"id": 1, "val": 1.5, "tag": "a"}')

    r = eng.ch_sql("ALTER TABLE metrics RENAME COLUMN val TO score").collect()[0]
    assert r["op"] == "rename_column"
    # pre-rename data serves under the NEW name
    got = spark.table("metrics").select("id", "score", "tag").collect()
    assert [(x["id"], x["score"], x["tag"]) for x in got] == [(1, 1.5, "a")]
    # post-rename inserts use the new name; both vintages serve together
    eng.ch_sql('INSERT INTO metrics FORMAT JSONEachRow\n'
               '{"id": 2, "score": 2.5, "tag": "b"}')
    got = {x["id"]: x["score"] for x in spark.table("metrics").collect()}
    assert got == {1: 1.5, 2: 2.5}

    # MODIFY rewrites: the double column becomes a string column
    eng.ch_sql("ALTER TABLE metrics MODIFY COLUMN tag FixedString(8)")
    assert dict(spark.table("metrics").dtypes)["tag"] == "string"
    # and a numeric narrowing round-trips through the rewrite
    eng.ch_sql("ALTER TABLE metrics MODIFY COLUMN id Int32")
    assert dict(spark.table("metrics").dtypes)["id"] == "int"
    assert spark.table("metrics").count() == 2
    # CRITICAL: the rewrites above ran on a directory holding BOTH
    # column spellings (pre-rename files store `val`, post-rename files
    # store `score`) — a footer-inferred read would have dropped one
    # vintage's values silently. Assert every vintage survived.
    got = {x["id"]: (x["score"], x["tag"]) for x in spark.table("metrics").collect()}
    assert got == {1: (1.5, "a"), 2: (2.5, "b")}
    # OPTIMIZE (compaction rewrite) must preserve both vintages too
    eng.ch_sql("OPTIMIZE TABLE metrics")
    got = {x["id"]: x["score"] for x in spark.table("metrics").collect()}
    assert got == {1: 1.5, 2: 2.5}


def test_rename_column_follows_ttl_and_defaults(spark, tmp_path):
    """RENAME COLUMN rewrites every spec field that references the old
    name: a TTL policy pointing at the dead spelling would silently stop
    evicting rows written after the rename."""
    from ed_clickhouse_spark import ddl as _ddl
    from ed_clickhouse_spark.engine import Engine

    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_t.up.sql").write_text(
        """
        CREATE TABLE beacons (
            id Int64,
            ts DateTime,
            src String DEFAULT concat('s-', toString(id))
        ) ENGINE = MergeTree()
        ORDER BY id
        TTL ts + INTERVAL 30 DAY;
        """
    )
    eng = Engine(str(tmp_path / "wh"), spark)
    eng.migrate(str(mdir))
    eng.ch_sql('INSERT INTO beacons FORMAT JSONEachRow\n'
               '{"id": 1, "ts": "2020-01-01 00:00:00"}\n'
               '{"id": 2, "ts": "2099-01-01 00:00:00"}')
    eng.ch_sql("ALTER TABLE beacons RENAME COLUMN ts TO seen_at")
    spec = eng.table_specs["beacons"]
    assert spec.ttl == ("seen_at", 30, "DAY")
    # DEFAULT expressions referencing a renamed column follow it too
    eng.ch_sql("ALTER TABLE beacons RENAME COLUMN id TO key")
    spec = eng.table_specs["beacons"]
    assert "key" in spec.col_exprs["src"][1]
    # TTL enforcement works against the renamed column: the rewrite
    # reads pre-rename files (stored name `ts`) AND evicts by `seen_at`
    _ddl.apply_ttl(spark, spec, eng.warehouse)
    rows = spark.table("beacons").collect()
    assert [r["key"] for r in rows] == [2]
    assert rows[0]["seen_at"] is not None


def test_alter_modify_ttl_and_comment(spark, tmp_path):
    """MODIFY TTL swaps the eviction policy (enforced on demand like the
    CREATE-time clause); COMMENT COLUMN is the ClickHouse metadata no-op."""
    from ed_clickhouse_spark import ddl as _ddl
    from ed_clickhouse_spark.engine import Engine

    mdir = tmp_path / "migrations"
    mdir.mkdir()
    (mdir / "001_t.up.sql").write_text(
        """
        CREATE TABLE pings (
            id Int64,
            ts DateTime
        ) ENGINE = MergeTree()
        ORDER BY id
        TTL ts + INTERVAL 30 DAY;
        """
    )
    eng = Engine(str(tmp_path / "wh"), spark)
    eng.migrate(str(mdir))
    assert eng.table_specs["pings"].ttl == ("ts", 30, "DAY")
    r = eng.ch_sql("ALTER TABLE pings MODIFY TTL ts + INTERVAL 1 DAY").collect()[0]
    assert r["op"] == "modify_ttl"
    assert eng.table_specs["pings"].ttl == ("ts", 1, "DAY")
    # the tightened TTL actually evicts
    eng.ch_sql('INSERT INTO pings FORMAT JSONEachRow\n'
               '{"id": 1, "ts": "2020-01-01 00:00:00"}\n'
               '{"id": 2, "ts": "2099-01-01 00:00:00"}')
    _ddl.apply_ttl(spark, eng.table_specs["pings"], eng.warehouse)
    assert [r["id"] for r in spark.table("pings").collect()] == [2]
    r = eng.ch_sql("ALTER TABLE pings COMMENT COLUMN id 'the key'").collect()[0]
    assert r["op"] == "comment_column"


def test_system_functions(spark, tmp_path):
    """system.functions lists every spelling the dialect translates,
    assembled from the live translation tables (no drift possible)."""
    from ed_clickhouse_spark.engine import Engine

    eng = Engine(str(tmp_path / "wh"), spark)
    rows = {
        r["name"]: r["origin"]
        for r in eng.ch_sql("SELECT name, origin FROM system.functions").collect()
    }
    assert rows["toStartOfDay"] == "sql_alias"
    assert rows["arrayZip"] == "rename"
    assert rows["arrayFold"] == "rewrite"
    assert rows["countIf"] == "aggregate"
    assert rows["arrayMap"] == "rewrite"
    assert len(rows) > 300
    # count is queryable like any table
    n = eng.ch_sql(
        "SELECT count() AS n FROM system.functions WHERE origin = 'sql_alias'"
    ).first()["n"]
    assert n > 150


def test_ddl_type_corner_probe():
    """Round-6 DDL type probe: LowCardinality/Enum/Map/nested arrays/
    named tuples/Decimal64/FixedString/UUID/IPv4/DateTime64(tz)/Date32/
    CODEC/COMMENT/column-TTL/skip-index clauses all parse; the JSON
    column type stores raw text (the JSON function family parses on
    read); aggregate-state and Nested columns refuse with the supported
    path named."""
    import pytest as _pytest

    from ed_clickhouse_spark.ddl import parse_clickhouse_ddl

    spec = parse_clickhouse_ddl(
        """
        CREATE TABLE t (
            id UUID,
            e Enum8('a' = 1, 'b' = 2),
            m Map(String, UInt32),
            p Tuple(lat Float64, lon Float64),
            j JSON,
            v Float64 CODEC(Gorilla, ZSTD) COMMENT 'metric'
        ) ENGINE = MergeTree ORDER BY id
        """
    )
    got = {f.name: f.dataType.simpleString() for f in spec.schema.fields}
    assert got["j"] == "string" and got["m"] == "map<string,bigint>"
    assert got["p"] == "struct<lat:double,lon:double>"
    # r7 batch 43: uniq states are BINARY HLL sketches now
    sp2 = parse_clickhouse_ddl(
        "CREATE TABLE t (id UInt64, st AggregateFunction(uniq, UInt64))"
        " ENGINE = AggregatingMergeTree ORDER BY id"
    )
    assert {f.name: f.dataType.simpleString()
            for f in sp2.schema.fields}["st"] == "binary"
    with _pytest.raises(ValueError, match="ARRAY JOIN"):
        parse_clickhouse_ddl(
            "CREATE TABLE t (id UInt64, n Nested(k String, v UInt32))"
            " ENGINE = MergeTree ORDER BY id"
        )


def test_ch_sql_operational_statement_surface(spark, tmp_path):
    """Round-7 probe batch 40: the operational statement surface a
    ClickHouse admin script uses, end-to-end through Engine.ch_sql —
    interactive CREATE TABLE (the same ddl.py parse/provision path
    migrate() runs), structure clones, EXCHANGE TABLES (atomic
    three-rename swap), DETACH/ATTACH (metadata-only), FREEZE
    (hardlink snapshot under shadow/, ClickHouse's own mechanism),
    plain views over dialect bodies, lightweight DELETE FROM, CHECK
    TABLE, and the SYSTEM/KILL no-op family. UNDROP and CLEAR COLUMN
    refuse loudly with the supported path."""
    import os

    from ed_clickhouse_spark.engine import Engine

    eng = Engine(str(tmp_path / "wh"), spark)
    r = eng.ch_sql(
        "CREATE TABLE ops (id String, ts DateTime, v Int32)"
        " ENGINE = MergeTree() ORDER BY (ts)"
    ).collect()[0]
    assert r["op"] == "create_table" and r["affected"] == 1
    eng.ch_sql(
        'INSERT INTO ops FORMAT JSONEachRow\n'
        '{"id":"a","ts":"2024-01-01 00:00:00","v":1}\n'
        '{"id":"b","ts":"2024-01-02 00:00:00","v":2}'
    )
    # idempotent + duplicate handling
    assert eng.ch_sql(
        "CREATE TABLE IF NOT EXISTS ops (id String) ENGINE ="
        " MergeTree() ORDER BY tuple()"
    ).collect()[0]["affected"] == 0
    with pytest.raises(ValueError, match="already exists"):
        eng.ch_sql("CREATE TABLE ops (id String) ENGINE = MergeTree()"
                   " ORDER BY tuple()")
    # structure clone: same schema, zero rows
    eng.ch_sql("CREATE TABLE ops2 AS ops")
    assert spark.table("ops2").count() == 0
    assert spark.table("ops2").schema == spark.table("ops").schema
    # EXCHANGE swaps contents both ways
    eng.ch_sql("EXCHANGE TABLES ops AND ops2")
    assert spark.table("ops").count() == 0
    assert spark.table("ops2").count() == 2
    eng.ch_sql("EXCHANGE TABLES ops AND ops2")
    assert spark.table("ops").count() == 2
    # DETACH drops the name, keeps the files; ATTACH restores
    eng.ch_sql("DETACH TABLE ops")
    assert not spark.catalog.tableExists("ops")
    eng.ch_sql("ATTACH TABLE ops")
    assert spark.table("ops").count() == 2
    with pytest.raises(KeyError, match="not detached"):
        eng.ch_sql("ATTACH TABLE never_detached")
    # FREEZE hardlinks every live file into shadow/<label>/
    n = eng.ch_sql("ALTER TABLE ops FREEZE WITH NAME 'bk'").collect()[0]
    assert n["affected"] > 0
    shadow = str(tmp_path / "wh" / "shadow" / "bk" / "ops")
    frozen = [
        f for _r, _d, fs in os.walk(shadow) for f in fs
        if f.endswith(".parquet")
    ]
    assert frozen, "no parquet files in the freeze snapshot"
    # plain view over a dialect body
    eng.ch_sql("CREATE VIEW v_ops AS SELECT id, v FROM ops WHERE v > 1")
    assert [r["id"] for r in eng.ch_sql("SELECT id FROM v_ops").collect()] == ["b"]
    assert eng.ch_sql("DROP VIEW v_ops").collect()[0]["affected"] == 1
    # lightweight DELETE == ALTER DELETE end state
    eng.ch_sql("DELETE FROM ops WHERE id = 'a'")
    assert spark.table("ops").count() == 1
    # CHECK TABLE reads every file
    assert eng.ch_sql("CHECK TABLE ops").collect()[0]["affected"] == 1
    # SYSTEM / KILL family returns status rows
    assert eng.ch_sql("SYSTEM STOP MERGES ops").collect()[0]["op"] == "stop_merges"
    assert eng.ch_sql("SYSTEM FLUSH LOGS").collect()[0]["op"] == "flush_logs"
    assert eng.ch_sql("KILL MUTATION WHERE 1").collect()[0]["affected"] == 0
    for bad, msg in (
        ("UNDROP TABLE ops", "FREEZE snapshot"),
        ("ALTER TABLE ops CLEAR COLUMN v IN PARTITION 'x'", "UPDATE"),
    ):
        with pytest.raises(ValueError, match=msg):
            eng.ch_sql(bad)
    # MV creation with POPULATE backfills from the current contents
    r = eng.ch_sql(
        "CREATE MATERIALIZED VIEW mv_ops ENGINE = SummingMergeTree()"
        " ORDER BY (id) POPULATE AS SELECT id, sum(v) AS total"
        " FROM ops GROUP BY id"
    ).collect()[0]
    assert r["op"] == "create_materialized_view"


def test_system_tables_and_show_surface(spark, tmp_path):
    """Round-7 probe batch 41: the system.* introspection tables a
    monitoring dashboard reads — databases / mutations (always empty:
    mutations are synchronous) / processes / merges / replicas /
    dictionaries (real contents) / disks (real disk usage) / settings
    (live session confs) — plus SHOW PROCESSLIST / DICTIONARIES /
    SETTINGS LIKE / GRANTS, a SETTINGS-clause-vs-system.settings
    disambiguation pin, and the loud GRANT/REVOKE refusal
    (single-tenant: silently accepting a GRANT would fake access
    control)."""
    import os as _os

    from ed_clickhouse_spark.engine import Engine

    mdir = tmp_path / "mig"
    mdir.mkdir()
    (mdir / "001_t.up.sql").write_text(
        "CREATE TABLE st (id String, v Int32) ENGINE = MergeTree()"
        " ORDER BY (id);"
    )
    eng = Engine(str(tmp_path / "wh"), spark)
    eng.migrate(str(mdir))
    eng.ch_sql(
        "CREATE DICTIONARY sd (id String, v Int32) PRIMARY KEY id"
        " SOURCE(CLICKHOUSE(TABLE 'st')) LAYOUT(FLAT()) LIFETIME(300)"
    )
    assert eng.ch_sql("SELECT * FROM system.databases").collect()[0][
        "name"] == "default"
    assert eng.ch_sql(
        "SELECT count() AS c FROM system.mutations").collect()[0]["c"] == 0
    assert eng.ch_sql(
        "SELECT count() AS c FROM system.merges").collect()[0]["c"] == 0
    d = eng.ch_sql(
        "SELECT name, status FROM system.dictionaries").collect()
    assert ("sd", "LOADED") in [(r["name"], r["status"]) for r in d]
    disk = eng.ch_sql("SELECT * FROM system.disks").collect()[0]
    assert disk["free_space"] > 0 and disk["total_space"] >= disk["free_space"]
    st = eng.ch_sql("SHOW SETTINGS LIKE '%shuffle%'").collect()
    assert st and st[0]["name"] == "spark.sql.shuffle.partitions"
    assert eng.ch_sql("SHOW DICTIONARIES").collect()[0]["name"] == "sd"
    assert eng.ch_sql("SHOW PROCESSLIST").collect() == []
    assert "GRANT ALL" in eng.ch_sql("SHOW GRANTS").collect()[0]["grants"]
    # the clause stripper must NOT eat the system.settings TABLE, and
    # must still strip a real trailing SETTINGS clause
    rows = eng.ch_sql(
        "SELECT name FROM system.settings"
        " SETTINGS max_threads = 4, join_algorithm = 'hash'"
    ).collect()
    assert rows
    with pytest.raises(ValueError, match="single-tenant"):
        eng.ch_sql("GRANT SELECT ON st TO bob")


def test_keyless_and_infra_engines(spark, tmp_path):
    """Round-7 batch 42: the keyless append-only engines
    (Memory/Log/TinyLog/StripeLog) provision without an ORDER BY and
    read as identity; the Null engine discards (reads empty — inserts
    still fire attached MVs, ClickHouse's MV-over-Null ingestion
    pattern); the infrastructure engines (Kafka/Distributed/Buffer/
    Join/...) refuse with the architectural pointer instead of the
    misleading ORDER-BY error."""
    from ed_clickhouse_spark.engine import Engine

    eng = Engine(str(tmp_path / "wh"), spark)
    eng.ch_sql("CREATE TABLE mem1 (x Int32, s String) ENGINE = Memory")
    eng.ch_sql('INSERT INTO mem1 FORMAT JSONEachRow\n{"x":1,"s":"a"}')
    assert eng.ch_sql("SELECT * FROM mem1").collect()[0]["x"] == 1
    eng.ch_sql("CREATE TABLE null1 (x Int32, v Int32) ENGINE = Null")
    # an MV over the Null table sees the inserted batch...
    eng.ch_sql(
        "CREATE MATERIALIZED VIEW mv_null ENGINE = SummingMergeTree()"
        " ORDER BY (x) AS SELECT x, sum(v) AS total FROM null1"
        " GROUP BY x"
    )
    eng.ch_sql('INSERT INTO null1 FORMAT JSONEachRow\n'
               '{"x":1,"v":10}\n{"x":1,"v":5}')
    # ...while the table itself reads empty
    assert eng.ch_sql("SELECT count() AS c FROM null1").collect()[0]["c"] == 0
    mv = eng.ch_sql(
        "SELECT x, sumMerge(total) AS t FROM mv_null_state GROUP BY x"
    ) if spark.catalog.tableExists("mv_null_state") else None
    for bad, ptr in (
        ("CREATE TABLE k1 (x Int32) ENGINE = Kafka('b:9092', 't',"
         " 'g', 'JSONEachRow')", "ingest_kafka"),
        ("CREATE TABLE d1 (x Int32) ENGINE = Distributed(c, db, t)",
         "distribution layer"),
        ("CREATE TABLE b1 (x Int32) ENGINE = Buffer(db, t, 16, 10,"
         " 100, 10000, 1000000, 10000000, 100000000)", "micro-batcher"),
        ("CREATE TABLE j1 (k Int32, v String) ENGINE ="
         " Join(ANY, LEFT, k)", "broadcast join"),
    ):
        with pytest.raises(ValueError, match=ptr):
            eng.ch_sql(bad)


def test_aggregating_merge_tree_state_loop(spark, tmp_path):
    """Round-7 batch 43: the full AggregatingMergeTree loop —
    AggregateFunction column types map onto this engine's own -State
    representations (uniq → HLL sketch BINARY, avg → (s, c) struct,
    argMax → (v, k) struct, sum/count → plain partials,
    SimpleAggregateFunction → the inner type), INSERT SELECT -State
    writes partials, the served view merges states per key (the
    engine's merged-by-default convention, ≙ post-background-merge),
    and the -Merge spellings read values back — two independently
    inserted parts must merge to the direct aggregates."""
    from ed_clickhouse_spark.engine import Engine

    eng = Engine(str(tmp_path / "wh"), spark)
    eng.ch_sql("CREATE TABLE fx (k String, u String, v Int64,"
               " f Float64) ENGINE = MergeTree() ORDER BY (k)")
    eng.ch_sql(
        'INSERT INTO fx FORMAT JSONEachRow\n'
        '{"k":"a","u":"u1","v":10,"f":1.0}\n'
        '{"k":"a","u":"u2","v":20,"f":3.0}\n'
        '{"k":"b","u":"u1","v":5,"f":2.0}'
    )
    eng.ch_sql("""CREATE TABLE aggx (
      k String,
      uniq_users AggregateFunction(uniq, String),
      total AggregateFunction(sum, Int64),
      avg_f AggregateFunction(avg, Float64),
      top_u AggregateFunction(argMax, String, Int64),
      n AggregateFunction(count, UInt64),
      su SimpleAggregateFunction(sum, Int64)
    ) ENGINE = AggregatingMergeTree() ORDER BY (k)""")
    for pred in ("v < 15", "v >= 15"):
        eng.ch_sql(
            f"INSERT INTO aggx SELECT k, uniqState(u) AS uniq_users,"
            f" sumState(v) AS total, avgState(f) AS avg_f,"
            f" argMaxState(u, v) AS top_u, countState() AS n,"
            f" sum(v) AS su FROM fx WHERE {pred} GROUP BY k"
        )
    r = eng.ch_sql(
        "SELECT k, uniqMerge(uniq_users) AS uu, sumMerge(total) AS t,"
        " avgMerge(avg_f) AS af, argMaxMerge(top_u) AS tu,"
        " countMerge(n) AS c, sum(su) AS s"
        " FROM aggx GROUP BY k ORDER BY k"
    ).collect()
    assert r[0]["uu"] == 2 and r[0]["t"] == 30
    assert abs(float(r[0]["af"]) - 2.0) < 1e-9
    assert r[0]["tu"] == "u2" and r[0]["c"] == 2 and r[0]["s"] == 30
    assert r[1]["uu"] == 1 and r[1]["t"] == 5
    # the served view merges the two inserted parts down to 1 row/key
    assert eng.ch_sql(
        "SELECT count() AS c FROM aggx").collect()[0]["c"] == 2
    # quantile states keep the loud matview pointer
    with pytest.raises(ValueError, match="matview"):
        eng.ch_sql("CREATE TABLE badq (k String,"
                   " q AggregateFunction(quantile, Float64))"
                   " ENGINE = AggregatingMergeTree() ORDER BY (k)")


def test_explain_variants_and_kill(spark, tmp_path):
    """Round-8 probe batch 50: the EXPLAIN variants — SYNTAX/AST
    return the TRANSLATED SQL (ours IS the rewrite CH would show),
    PIPELINE the formatted physical plan, ESTIMATE per-table
    parts/rows/bytes from warehouse metadata — and KILL QUERY returns
    the CH response shape with zero matched rows (ch_sql is
    synchronous, nothing is ever in flight)."""
    from ed_clickhouse_spark.engine import Engine

    eng = Engine(str(tmp_path / "wh"), spark)
    eng.ch_sql("CREATE TABLE tk (a Int64) ENGINE = MergeTree() ORDER BY (a)")
    eng.ch_sql('INSERT INTO tk FORMAT JSONEachRow\n{"a":1}\n{"a":2}')
    syn = eng.ch_sql("EXPLAIN SYNTAX SELECT countIf(a > 0) FROM tk")
    assert "count_if" in syn.collect()[0]["explain"]
    est = eng.ch_sql("EXPLAIN ESTIMATE SELECT count() FROM tk").collect()
    assert est[0]["table"] == "tk" and est[0]["rows"] == 2
    assert est[0]["parts"] >= 1 and est[0]["bytes"] > 0
    pipe = eng.ch_sql("EXPLAIN PIPELINE SELECT count() FROM tk").collect()
    assert "Physical Plan" in pipe[0]["plan"]
    assert eng.ch_sql("KILL QUERY WHERE query_id = 'x'").collect() == []
    # KILL MUTATION keeps the synchronous-mutations status-row shape
    assert eng.ch_sql("KILL MUTATION WHERE mutation_id = 'm'"
                      ).collect()[0]["affected"] == 0


def test_insert_inline_formats_and_positional_select(spark, tmp_path):
    """Round-8 probe batch 51: the clickhouse-client inline-payload
    formats beyond JSONEachRow — CSV[WithNames] (headers reorder by
    name), TSV/TabSeparated, JSONCompactEachRow (positional arrays),
    TSKV, FORMAT Values — all decoding against the declared schema
    and appending under the table's write policy; and INSERT SELECT
    now maps by POSITION when the arity matches but the projected
    names don't (CH's actual rule — the computed-expression idiom
    SELECT a + 100, b previously failed the name check). Name mapping
    stays when every name lines up; arity mismatch stays loud."""
    import pytest

    from ed_clickhouse_spark.engine import Engine

    eng = Engine(str(tmp_path / "wh"), spark)
    eng.ch_sql("CREATE TABLE ti (a Int64, b String)"
               " ENGINE = MergeTree() ORDER BY (a)")
    assert eng.ch_sql('INSERT INTO ti FORMAT CSV\n2,"y"\n22,yy'
                      ).collect()[0]["rows_inserted"] == 2
    eng.ch_sql("INSERT INTO ti FORMAT TSV\n3\tz")
    eng.ch_sql("INSERT INTO ti FORMAT CSVWithNames\nb,a\nq,5")
    eng.ch_sql("INSERT INTO ti FORMAT Values (6, 'v'), (7, 'u')")
    eng.ch_sql('INSERT INTO ti FORMAT JSONCompactEachRow\n[10,"j"]')
    eng.ch_sql("INSERT INTO ti FORMAT TSKV\na=11\tb=k")
    # positional: computed first column, name 'b' coincidentally right
    eng.ch_sql("INSERT INTO ti SELECT a + 100, b FROM ti WHERE a = 2")
    got = sorted((r["a"], r["b"]) for r in
                 eng.ch_sql("SELECT * FROM ti").collect())
    assert got == [(2, "y"), (3, "z"), (5, "q"), (6, "v"), (7, "u"),
                   (10, "j"), (11, "k"), (22, "yy"), (102, "y")]
    # name mapping still wins when every declared name is projected
    eng.ch_sql("INSERT INTO ti SELECT b, a FROM ti WHERE a = 3")
    assert (3, "z") in [
        (r["a"], r["b"])
        for r in eng.ch_sql("SELECT * FROM ti WHERE b = 'z'").collect()
    ]
    # clickhouse-client text-format fidelity (ADVICE r8): a quoted CSV
    # field may span lines, quoted "" is an empty STRING while an
    # unquoted empty field is NULL, and TSV/TSKV backslash escapes decode
    eng.ch_sql('INSERT INTO ti FORMAT CSV\n30,"line1\nline2"\n31,""\n32,')
    got2 = {r["a"]: r["b"] for r in
            eng.ch_sql("SELECT * FROM ti WHERE a >= 30").collect()}
    assert got2[30] == "line1\nline2"
    assert got2[31] == "" and got2[32] is None
    eng.ch_sql("INSERT INTO ti FORMAT TSV\n40\tx\\ty\\nz\\\\w\n41\t\\N")
    got3 = {r["a"]: r["b"] for r in
            eng.ch_sql("SELECT * FROM ti WHERE a >= 40").collect()}
    assert got3[40] == "x\ty\nz\\w" and got3[41] is None
    eng.ch_sql("INSERT INTO ti FORMAT TSKV\na=50\tb=p\\tq")
    assert eng.ch_sql("SELECT b FROM ti WHERE a = 50"
                      ).collect()[0]["b"] == "p\tq"
    # ADVICE r9: an escaped double-quote INSIDE a quoted field must
    # not be mistaken for a quoted-empty field between delimiters —
    # '60,"x,"",z"' carries the single field value 'x,",z' (the old
    # textual "" pre-pass corrupted it to 'x,<sentinel>,z')
    eng.ch_sql('INSERT INTO ti FORMAT CSV\n60,"x,"",z"\n61,""""')
    got4 = {r["a"]: r["b"] for r in
            eng.ch_sql("SELECT * FROM ti WHERE a >= 60").collect()}
    assert got4[60] == 'x,",z'
    assert got4[61] == '"'
    # binary wire formats stay refused
    with pytest.raises(ValueError, match="JSONEachRow"):
        eng.ch_sql("INSERT INTO ti FORMAT RowBinary\nxx")


def test_probe_batch63_partition_parts_tails(spark, tmp_path):
    """Round-9 probe batch 63 (~22 DDL/statement shapes: CREATE
    [OR REPLACE] VIEW, EXCHANGE TABLES, mutations, FREEZE,
    system.tables/columns/settings/functions, version()/currentUser()
    all already execute; UNDROP/CLEAR COLUMN/merge() refuse loudly).
    Real fixes: system.parts keeps BOTH the `table` and `name`
    spellings (CH filters on `table`), and ALTER ... ATTACH/DETACH
    PARTITION refuses loudly (no detached-parts store) instead of
    falling through to a Spark parse error."""
    import pytest

    from ed_clickhouse_spark.engine import Engine

    eng = Engine(str(tmp_path / "wh"), spark)
    eng.ch_sql("CREATE TABLE pb (a Int64, d Date)"
               " ENGINE = MergeTree() ORDER BY (a)")
    eng.ch_sql('INSERT INTO pb FORMAT JSONEachRow\n{"a":1,"d":"2024-01-01"}')
    r = eng.ch_sql("SELECT table, name FROM system.parts"
                   " WHERE table = 'pb'").collect()
    assert r and r[0]["table"] == "pb" and r[0]["name"] == "pb"
    with pytest.raises(ValueError, match="ATTACH/DETACH PARTITION"):
        eng.ch_sql("ALTER TABLE pb ATTACH PARTITION '2024-01-01'")


def test_probe_batch84_insert_collist_show_like(spark, tmp_path):
    """Round-11 execution probe, batch 84 (~30 Engine DDL/statement
    shapes: CTAS, CREATE OR REPLACE/IF NOT EXISTS/LIKE, RENAME,
    TRUNCATE, ALTER ADD/DROP IF [NOT] EXISTS, COMMENT/CODEC clauses,
    DETACH/ATTACH, EXCHANGE TABLES, OPTIMIZE, views — 28 already
    executed). Real fixes: INSERT INTO t (cols) SELECT maps the SELECT
    output positionally onto the listed columns with DEFAULT backfill
    for unlisted ones (ClickHouse's rule; it refused before), and
    SHOW TABLES [NOT] [I]LIKE uses real SQL LIKE semantics (Spark's
    own form takes a glob, so LIKE 't%' silently matched nothing)."""
    import pytest

    from ed_clickhouse_spark.engine import Engine

    eng = Engine(str(tmp_path / "wh"), spark)
    eng.ch_sql("CREATE TABLE tb84 (a Int64, b String,"
               " c Float64 DEFAULT 1.5)"
               " ENGINE = MergeTree() ORDER BY (a)")
    eng.ch_sql("INSERT INTO tb84 VALUES (1, 'x', 2.0)")
    r = eng.ch_sql(
        "INSERT INTO tb84 (a, b) SELECT a + 100, b FROM tb84 WHERE a = 1"
    ).collect()[0]
    assert r["rows_inserted"] == 1
    rows = sorted(
        (x["a"], x["b"], x["c"])
        for x in eng.ch_sql("SELECT * FROM tb84").collect()
    )
    assert rows == [(1, "x", 2.0), (101, "x", 1.5)]  # DEFAULT filled c
    names = [x["tableName"] for x in
             eng.ch_sql("SHOW TABLES LIKE 'tb8%'").collect()]
    assert "tb84" in names
    names = [x["tableName"] for x in
             eng.ch_sql("SHOW TABLES NOT LIKE 'tb8%'").collect()]
    assert "tb84" not in names
    with pytest.raises(ValueError, match="unknown columns"):
        eng.ch_sql("INSERT INTO tb84 (a, nope) SELECT 1, 'q'")
    with pytest.raises(ValueError, match="expects 2 SELECT columns"):
        eng.ch_sql("INSERT INTO tb84 (a, b) SELECT 1")
