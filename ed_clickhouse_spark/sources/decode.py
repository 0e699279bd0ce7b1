"""Payload decode (Layer A6 in SURVEY.md §2).

The reference never parses payloads — it ships raw protobuf bytes and
lets ClickHouse decode them against ``dto.proto``
(reference ``src/click_house.rs:61-92``). Our engine decodes inside the
stream: the JSON wire format is the test harness (``from_json`` with the
family's wire schema); protobuf decode (``from_protobuf``, Spark 3.4+)
plugs in behind the same interface when descriptor files are available.

Decode failures yield a null struct -> routed to the DLQ, mirroring the
reference's "Cannot parse" => permanent error => Term classification
(``src/handler.rs:206-212``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ed_clickhouse_spark.sources.registry import EventFamily


def decode_json(df: DataFrame, family: EventFamily, payload_col: str = "payload") -> DataFrame:
    """Decode JSON payloads for one family into typed columns.

    Output columns: the family's at-rest schema + ``_corrupt`` flag for
    rows whose payload didn't parse (null struct). The wire int64
    unix-seconds timestamp becomes TimestampType here — the same coercion
    ClickHouse applies during protobuf INSERT."""
    parsed = F.from_json(F.col(payload_col), family.wire_schema)
    out = df.withColumn("__p", parsed).withColumn(
        "_corrupt", F.col("__p").isNull() | F.col(f"__p.event_id").isNull()
    )
    cols = []
    for f in family.wire_schema.fields:
        c: Column = F.col(f"__p.{f.name}")
        if f.name == "timestamp":
            c = F.timestamp_seconds(c)
        cols.append(c.alias(f.name))
    return out.select(*cols, "_corrupt", F.col(payload_col).alias("_raw"))


def try_decode_protobuf(
    df: DataFrame, family: EventFamily, desc_file: str, payload_col: str = "payload"
):
    """Protobuf decode path (optional): requires a compiled descriptor
    set for dto.proto. Gated behind import so environments without
    spark-protobuf simply use the JSON harness."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "spark-protobuf not available in this environment; use decode_json"
        ) from e
    message_name = _proto_message_name(family)
    return df.withColumn(
        "__p", from_protobuf(F.col(payload_col), message_name, descFilePath=desc_file)
    )


def _proto_message_name(family: EventFamily) -> str:
    """dto.proto message name per family (reference dto.proto:6-226
    spells them in CamelCase of the table base name)."""
    base = family.table.removesuffix("_events")
    return "".join(p.capitalize() for p in base.split("_")) + "Event"
