"""Local driver-mimic: run every suite query on Spark AND its DuckDB
oracle, compare row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from ed_clickhouse_spark.catalog import TABLES
from ed_clickhouse_spark.session import get_spark
from ed_clickhouse_spark.suite import ORACLES, QUERIES


def norm_type(t: str) -> str:
    """Normalize spark/duckdb type spellings to comparable families."""
    t = str(t).lower()
    for pat, fam in [
        ("hugeint", "int128!"),  # deliberately distinct: flag un-cast SUMs
        ("bigint", "i64"), ("int64", "i64"),
        ("smallint", "i32"), ("tinyint", "i32"), ("integer", "i32"), ("int", "i32"),
        ("double", "f64"), ("float8", "f64"), ("float", "f32"),
        ("decimal", "dec"), ("varchar", "str"), ("string", "str"),
        ("boolean", "bool"), ("timestamp", "ts"), ("date", "date"),
    ]:
        if pat in t:
            if t.startswith(("array", "list", "struct", "map")) or "[]" in t:
                return f"list<{fam}>"
            return fam
    return t


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes exact values; we normalize representation only
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(str(norm_cell(x)) for x in v) + "]"
    return str(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"rows-only {name}: {len(srows)} rows")
            n_rows_only += 1
            continue
        try:
            res = con.sql(ORACLES[name])
            dcols = [c for c in res.columns]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        if len(srows) != len(drows):
            print(f"FAIL {name}: row count spark={len(srows)} duckdb={len(drows)}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duckdb={sorted(dcols)}")
            ok = False
        else:
            stypes = {f.name: norm_type(f.dataType.simpleString()) for f in sdf.schema.fields}
            dtypes = {c: norm_type(ty) for c, ty in zip(res.columns, res.types)}
            for c in scols:
                if stypes[c] != dtypes[c]:
                    print(f"TYPE? {name}.{c}: spark={stypes[c]} duckdb={dtypes[c]}")
        if ok:
            sk = rows_key(scols, srows)
            dk = rows_key(dcols, drows)
            if sk != dk:
                diff = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
