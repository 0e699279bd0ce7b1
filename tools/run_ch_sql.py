"""clickhouse-client-shaped query runner: paste the SQL you ran against
the reference stack, get results in the FORMAT you asked for.

Usage:
    python tools/run_ch_sql.py [--sf-dir /root/testdata/sf0.01] \
        "SELECT source, count(*) AS n FROM documents GROUP BY source \
         ORDER BY n DESC LIMIT 5 FORMAT JSONEachRow"
    # query parameters, clickhouse-client spelling:
    python tools/run_ch_sql.py "SELECT count(*) AS n FROM events \
        WHERE event_type = {et:String}" --param_et=click

Registers the test tables as views, the ClickHouse function spellings,
and pushes the query through the dialect rewriter (chsql.translate) —
PREWHERE / ARRAY JOIN / LIMIT BY / WITH TOTALS / WITH FILL / SAMPLE /
numbers() all work. Output honors the trailing FORMAT clause:
JSONEachRow (default), CSV / CSVWithNames, TSV / TSVWithNames, Pretty.
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as `python tools/run_ch_sql.py` from anywhere: the package
# lives next to tools/, not on the script-dir sys.path entry
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def run(
    query: str, sf_dir: str, spark=None, params: dict | None = None
) -> tuple[list, list[str], str | None]:
    """Execute a ClickHouse-dialect query against the sf_dir tables.
    ``params`` fills clickhouse-client {name:Type} placeholders.
    Returns (rows, column_names, format_name)."""
    from ed_clickhouse_spark.catalog import read_table
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases
    from ed_clickhouse_spark.session import get_spark

    spark = spark or get_spark("run_ch_sql")
    register_sql_aliases(spark)
    for name in TABLES:
        try:
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception:  # noqa: BLE001 — table absent from this sf_dir
            pass
    tr = translate(query, params=params)
    df = spark.sql(tr.sql)
    return df.collect(), df.columns, tr.format


def render(rows: list, cols: list[str], fmt: str | None) -> str:
    fmt = (fmt or "JSONEachRow").lower()
    if fmt == "jsoneachrow":
        import json

        return "\n".join(
            json.dumps({c: _plain(r[c]) for c in cols}) for r in rows
        )
    if fmt in ("csv", "csvwithnames", "tsv", "tsvwithnames", "tabseparated",
               "tabseparatedwithnames"):
        sep = "," if fmt.startswith("csv") else "\t"
        out = []
        if "withnames" in fmt:
            out.append(sep.join(cols))
        out += [sep.join(str(_plain(r[c])) for c in cols) for r in rows]
        return "\n".join(out)
    if fmt == "pretty":
        widths = [
            max(len(c), *(len(str(_plain(r[c]))) for r in rows)) if rows else len(c)
            for c in cols
        ]
        line = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
        head = "|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|"
        body = [
            "|" + "|".join(f" {str(_plain(r[c])):<{w}} " for c, w in zip(cols, widths)) + "|"
            for r in rows
        ]
        return "\n".join([line, head, line, *body, line])
    raise ValueError(f"unsupported FORMAT {fmt!r}")


def _plain(v):
    import datetime
    import decimal

    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    # clickhouse-client spelling: --param_name=value (repeatable)
    args, extra = ap.parse_known_args()
    params = {}
    for tok in extra:
        if tok.startswith("--param_") and "=" in tok:
            k, v = tok[len("--param_"):].split("=", 1)
            params[k] = v
        else:
            ap.error(f"unrecognized argument: {tok}")
    rows, cols, fmt = run(args.query, args.sf_dir, params=params or None)
    print(render(rows, cols, fmt))
    return 0


if __name__ == "__main__":
    sys.exit(main())
