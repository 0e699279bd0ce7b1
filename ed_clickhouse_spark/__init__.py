"""ed_clickhouse_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference (arshia-rgh/ED_clickhouse, a NATS->ClickHouse
event-ingestion tier plus the ClickHouse OLAP surface its MergeTree schema
is designed for — see SURVEY.md).

Layers (SURVEY.md §2):
  A — streaming ingestion dataflow (``sources``/``streaming``)
  B — relational OLAP query surface (``operators``, Spark SQL built-ins)
  C — LLM-data-pipeline operators: dedup, similarity, text, multimodal
"""

from ed_clickhouse_spark.session import get_spark
from ed_clickhouse_spark.catalog import TABLES, load_tables

__all__ = ["get_spark", "load_tables", "TABLES"]
__version__ = "0.1.0"
