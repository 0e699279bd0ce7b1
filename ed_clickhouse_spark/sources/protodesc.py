"""Protobuf descriptor + message encoding, generated from the registry.

The reference's wire format is protobuf: producers serialize one of nine
messages (reference ``build/format_schemas/dto.proto``) and ClickHouse
decodes them server-side against the mounted schema file. Spark's
``from_protobuf`` needs a compiled *descriptor set* — normally produced
by ``protoc``, which this environment doesn't have. The protobuf wire
format and descriptor.proto layout are public and tiny, so this module
hand-encodes both:

  * :func:`build_descriptor_set` — a ``FileDescriptorSet`` for all nine
    event families, derived from the same registry that drives routing
    (single source of truth; no drift between decode schema and tables);
  * :func:`encode_event` — a wire-format encoder used by tests/producers.

Only the four scalar types the data model uses (string, int64, int32,
bool) plus repeated string are implemented — exactly the reference's
type inventory (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

from ed_clickhouse_spark.sources.registry import FAMILIES, EventFamily

# FieldDescriptorProto.Type values (descriptor.proto, public)
_TYPE_INT64 = 3
_TYPE_INT32 = 5
_TYPE_BOOL = 8
_TYPE_STRING = 9
_LABEL_OPTIONAL = 1
_LABEL_REPEATED = 3


def _varint(n: int) -> bytes:
    # negative ints encode as 10-byte two's-complement varints (proto
    # spec); mask to unsigned 64-bit first or the shift loop never ends
    n &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field_no: int, wire_type: int) -> bytes:
    return _varint((field_no << 3) | wire_type)


def _len_delim(field_no: int, payload: bytes) -> bytes:
    return _tag(field_no, 2) + _varint(len(payload)) + payload


def _varint_field(field_no: int, value: int) -> bytes:
    return _tag(field_no, 0) + _varint(value)


def _spark_to_proto_type(dt: T.DataType) -> tuple[int, int]:
    """Spark type -> (proto type enum, label)."""
    if isinstance(dt, T.StringType):
        return _TYPE_STRING, _LABEL_OPTIONAL
    if isinstance(dt, T.LongType):
        return _TYPE_INT64, _LABEL_OPTIONAL
    if isinstance(dt, T.IntegerType):
        return _TYPE_INT32, _LABEL_OPTIONAL
    if isinstance(dt, T.BooleanType):
        return _TYPE_BOOL, _LABEL_OPTIONAL
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StringType):
        return _TYPE_STRING, _LABEL_REPEATED
    raise TypeError(f"unsupported wire type {dt}")


def message_name(family: EventFamily) -> str:
    """CamelCase message name, e.g. login_events -> LoginEvent."""
    base = family.table.removesuffix("_events")
    return "".join(p.capitalize() for p in base.split("_")) + "Event"


def _field_descriptor(name: str, number: int, ptype: int, label: int) -> bytes:
    return (
        _len_delim(1, name.encode())       # FieldDescriptorProto.name
        + _varint_field(3, number)         # .number
        + _varint_field(4, label)          # .label
        + _varint_field(5, ptype)          # .type
    )


def _message_descriptor(family: EventFamily) -> bytes:
    body = _len_delim(1, message_name(family).encode())  # DescriptorProto.name
    for i, f in enumerate(family.wire_schema.fields, start=1):
        ptype, label = _spark_to_proto_type(f.dataType)
        body += _len_delim(2, _field_descriptor(f.name, i, ptype, label))
    return body


def build_descriptor_set(path: str) -> str:
    """Write a FileDescriptorSet covering all nine event messages; returns
    ``path`` (pass as descFilePath to from_protobuf)."""
    file_proto = _len_delim(1, b"dto.proto")          # FileDescriptorProto.name
    for fam in FAMILIES:
        file_proto += _len_delim(4, _message_descriptor(fam))  # .message_type
    file_proto += _len_delim(12, b"proto3")           # .syntax
    fds = _len_delim(1, file_proto)                   # FileDescriptorSet.file
    with open(path, "wb") as f:
        f.write(fds)
    return path


def decode_event(family: EventFamily, payload: bytes) -> dict:
    """Pure-Python wire-format decoder for one event (the mapInPandas
    fallback when the spark-protobuf jar isn't on the classpath).
    Raises ValueError on malformed input; unknown fields are skipped
    (proto3 semantics)."""
    fields = {
        i: (f.name, f.dataType)
        for i, f in enumerate(family.wire_schema.fields, start=1)
    }
    out: dict = {}
    pos, n = 0, len(payload)

    def read_varint() -> int:
        nonlocal pos
        shift = result = 0
        while True:
            if pos >= n:
                raise ValueError("truncated varint")
            b = payload[pos]
            pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                return result
            shift += 7
            if shift > 63:
                raise ValueError("varint too long")

    while pos < n:
        key = read_varint()
        field_no, wt = key >> 3, key & 0x07
        if wt == 0:
            v = read_varint()
        elif wt == 2:
            ln = read_varint()
            if pos + ln > n:
                raise ValueError("truncated bytes")
            v = payload[pos : pos + ln]
            pos += ln
        elif wt == 1:
            pos += 8
            continue
        elif wt == 5:
            pos += 4
            continue
        else:
            raise ValueError(f"bad wire type {wt}")
        spec = fields.get(field_no)
        if spec is None:
            continue
        name, dt = spec
        if isinstance(dt, T.ArrayType):
            out.setdefault(name, []).append(v.decode("utf-8", "replace"))
        elif isinstance(dt, T.StringType):
            out[name] = v.decode("utf-8", "replace")
        elif isinstance(dt, T.BooleanType):
            out[name] = bool(v)
        else:  # int32/int64: varints are unsigned on the wire — sign-extend
            v = int(v)
            if v >= 1 << 63:
                v -= 1 << 64
            out[name] = v
    return out


def encode_event(family: EventFamily, event: dict) -> bytes:
    """Encode one event dict to protobuf wire format (test/producer
    helper; field numbers follow wire_schema order, envelope = 1..16
    like the reference's dto.proto)."""
    out = b""
    for i, f in enumerate(family.wire_schema.fields, start=1):
        if f.name not in event or event[f.name] is None:
            continue
        v = event[f.name]
        if isinstance(f.dataType, T.StringType):
            out += _len_delim(i, str(v).encode())
        elif isinstance(f.dataType, (T.LongType, T.IntegerType)):
            out += _varint_field(i, int(v))
        elif isinstance(f.dataType, T.BooleanType):
            out += _varint_field(i, 1 if v else 0)
        elif isinstance(f.dataType, T.ArrayType):
            for item in v:
                out += _len_delim(i, str(item).encode())
        else:  # pragma: no cover
            raise TypeError(f"unsupported {f.dataType}")
    return out
