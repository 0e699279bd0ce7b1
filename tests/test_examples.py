"""examples/dashboard.sql — a saved ClickHouse dashboard executed
statement-by-statement through the dialect front-end. This is the
"switch engines without rewriting your queries" contract as one
durable regression suite: every panel query a reference-stack user
has in Grafana runs verbatim and returns rows."""

from __future__ import annotations

import os

import pytest

DASH = os.path.join(os.path.dirname(__file__), "..", "examples", "dashboard.sql")


def _statements():
    with open(DASH) as f:
        text = f.read()
    # strip comment lines, split on ';'
    body = "\n".join(
        ln for ln in text.splitlines() if not ln.strip().startswith("--")
    )
    return [s.strip() for s in body.split(";") if s.strip()]


@pytest.fixture(scope="module")
def dash_views(spark, sf_dir):
    from ed_clickhouse_spark.catalog import read_table
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    specs = {}
    for name in ("events", "documents", "orders", "customer", "lineitem"):
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        specs[name] = df.columns  # star-modifier expansion (panel 37)
    spark.__dash_specs = specs
    return spark


def test_every_dashboard_statement_runs(dash_views):
    from ed_clickhouse_spark.chsql import translate

    stmts = _statements()
    assert len(stmts) == 50
    for i, stmt in enumerate(stmts, start=1):
        tr = translate(stmt, dash_views.__dash_specs)
        rows = dash_views.sql(tr.sql).collect()
        assert rows, f"statement {i} returned no rows: {stmt[:80]}"


def test_dashboard_spot_values(dash_views):
    """Spot-check two panels against idiomatic-Spark twins so the file
    can't silently drift into translate-but-wrong territory."""
    from ed_clickhouse_spark.chsql import translate

    stmts = _statements()
    # panel 2: event mix — ratio = conditional count / count
    got = {
        r["event_type"]: (r["n"], r["with_value"])
        for r in dash_views.sql(translate(stmts[1]).sql).collect()
    }
    twin = {
        r["event_type"]: (r["n"], r["wv"])
        for r in dash_views.sql(
            "SELECT event_type, count(*) AS n, "
            "count_if(value > 0) AS wv FROM events GROUP BY 1"
        ).collect()
    }
    assert got == twin
    # panel 20: health check
    r = dash_views.sql(translate(stmts[19]).sql).first()
    t = dash_views.sql(
        "SELECT count(*) AS c, count(DISTINCT user_id) AS u FROM events"
    ).first()
    assert r["total_events"] == t["c"] and r["exact_users"] == t["u"]
