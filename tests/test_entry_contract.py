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
        "q43_language_id",
        "q46_minhash_lsh",
        "q47_simhash",
        "q50_ann_lsh",
    }
    assert set(q) - set(o) == allowed_no_oracle


def test_every_query_is_callable(spark):
    # analysis-only check (no execution): each callable builds a valid plan
    for name, fn in ep.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.schema is not None, name
