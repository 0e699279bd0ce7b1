"""ClickHouse-dialect front-end in the graded loop: one query written
in the syntax a reference-stack user would actually paste in (PREWHERE,
ARRAY JOIN with a ClickHouse spelling, LIMIT n BY, FORMAT), pushed
through chsql.translate and hash-checked against a DuckDB oracle."""

from __future__ import annotations

from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t

_CH_QUERY = """
SELECT source, tok, count(*) AS n
FROM documents
ARRAY JOIN splitByChar(' ', text) AS tok
PREWHERE n_chars > 200
GROUP BY source, tok
ORDER BY n DESC, source ASC, tok ASC
LIMIT 3 BY source
FORMAT JSONEachRow
"""


@query(
    "q156_ch_dialect",
    oracle="""
    WITH ex AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE n_chars > 200
    ),
    c AS (
      SELECT source, tok, COUNT(*) AS n FROM ex GROUP BY 1, 2
    ),
    r AS (
      SELECT source, tok, n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n DESC, source ASC, tok ASC) AS rn
      FROM c
    )
    SELECT source, tok, n FROM r WHERE rn <= 3
    """,
)
def q156_ch_dialect(spark, sf_dir):
    """The ClickHouse SQL a reference user would paste in, run verbatim
    through the dialect rewriter (chsql.translate): PREWHERE merges
    into WHERE, ARRAY JOIN becomes LATERAL VIEW explode (with the
    splitByChar macro inlined — Spark refuses SQL UDFs in a Generate),
    LIMIT 3 BY becomes a row_number window, FORMAT strips. Top-3 tokens
    per source over the long documents."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(translate(_CH_QUERY).sql)
