"""Pure-Python protobuf wire-format row serialization (reference A18).

The reference's proto path derives a protobuf descriptor from the live
table schema and serializes each row to message bytes before appending
(``client/BigQueryProtoClientProvider.java:45-46`` —
``BQTableSchemaToProtoDescriptor.convertBQTableSchemaToProtoDescriptor``;
``client/ProtoStreamWriter.java:24-39`` — ``ByteString.copyFrom(
rowSerializer.serialize(r))`` per row).  This module re-implements that
pipeline without any protobuf dependency: the wire format is tiny (varint
+ fixed64 + length-delimited, `https://protobuf.dev/programming-guides/
encoding/`), and the descriptor we need is just an ordered field list.

Field numbering matches the storage-API convention: fields are numbered
1..N in table-schema order, recursively for STRUCTs.  Scalar mapping
follows the public AppendRows accepted representations:

    BOOL       -> varint 0/1
    INT64      -> varint (two's-complement, 10 bytes when negative)
    FLOAT64    -> fixed64 (IEEE-754 little-endian)
    STRING/JSON/GEOGRAPHY/TIME/INTERVAL -> length-delimited UTF-8
    BYTES      -> length-delimited raw
    DATE       -> varint days-since-epoch (int32 range)
    DATETIME   -> length-delimited civil string "YYYY-MM-DD HH:MM:SS[.ffffff]"
    TIMESTAMP  -> varint epoch MICROS
    NUMERIC / BIGNUMERIC -> length-delimited decimal string (the write API
                 accepts string-typed decimals; avoids the scaled-bytes
                 encoding's fixed-scale pitfalls and covers BIGNUMERIC's
                 full 76-digit range, which Spark's DecimalType cannot)
    STRUCT     -> length-delimited nested message
    REPEATED   -> one tagged occurrence per element (unpacked — legal for
                 every type and what proto2 descriptors emit by default)

NULL handling is proto-native: an absent (None) NULLABLE field emits no
bytes; a None in a REQUIRED field raises, mirroring the storage API's
rejection of missing required values.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import struct as _struct
from typing import Any, Callable

# module-level so the pandas_udf type hints in proto_rows_py resolve under
# ``from __future__ import annotations`` (get_type_hints uses these globals)
import pandas as pd

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

# wire types
_VARINT = 0
_FIXED64 = 1
_LEN = 2


def encode_varint(n: int) -> bytes:
    """Base-128 varint of an unsigned 64-bit value."""
    if n < 0:
        # two's-complement: negative int64 always occupies 10 bytes
        n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field_number: int, wire_type: int) -> bytes:
    return encode_varint((field_number << 3) | wire_type)


def _enc_bool(v: Any) -> bytes:
    return b"\x01" if v else b"\x00"


def _enc_int64(v: Any) -> bytes:
    return encode_varint(int(v))


def _enc_double(v: Any) -> bytes:
    return _struct.pack("<d", float(v))


def _enc_string(v: Any) -> bytes:
    s = v if isinstance(v, str) else str(v)
    b = s.encode("utf-8")
    return encode_varint(len(b)) + b


def _enc_bytes(v: Any) -> bytes:
    b = bytes(v)
    return encode_varint(len(b)) + b


def _enc_date(v: Any) -> bytes:
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        days = (v - _EPOCH_DATE).days
    else:
        days = int(v)
    return encode_varint(days)


def _enc_datetime(v: Any) -> bytes:
    if isinstance(v, _dt.datetime):
        s = v.replace(tzinfo=None).isoformat(sep=" ")
    else:
        s = str(v)
    return _enc_string(s)


def _enc_timestamp(v: Any) -> bytes:
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        # exact micros from the timedelta parts (float seconds lose precision
        # far from the epoch)
        delta = v - _EPOCH_DT
        micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    else:
        micros = int(v)
    return encode_varint(micros)


def _enc_numeric(v: Any) -> bytes:
    if isinstance(v, _decimal.Decimal):
        s = format(v, "f")  # no exponent notation
    else:
        s = str(v)
    return _enc_string(s)


# BQ type -> (wire_type, encoder)
_SCALARS: dict[str, tuple[int, Callable[[Any], bytes]]] = {
    "BOOL": (_VARINT, _enc_bool),
    "BOOLEAN": (_VARINT, _enc_bool),
    "INT64": (_VARINT, _enc_int64),
    "INTEGER": (_VARINT, _enc_int64),
    "FLOAT64": (_FIXED64, _enc_double),
    "FLOAT": (_FIXED64, _enc_double),
    "STRING": (_LEN, _enc_string),
    "JSON": (_LEN, _enc_string),
    "GEOGRAPHY": (_LEN, _enc_string),
    "TIME": (_LEN, _enc_string),
    "INTERVAL": (_LEN, _enc_string),
    "BYTES": (_LEN, _enc_bytes),
    "DATE": (_VARINT, _enc_date),
    "DATETIME": (_LEN, _enc_datetime),
    "TIMESTAMP": (_VARINT, _enc_timestamp),
    "NUMERIC": (_LEN, _enc_numeric),
    "BIGNUMERIC": (_LEN, _enc_numeric),
}


class _Field:
    __slots__ = ("name", "number", "repeated", "required", "wire_type",
                 "encoder", "message")

    def __init__(self, name: str, number: int, repeated: bool,
                 required: bool, wire_type: int,
                 encoder: Callable[[Any], bytes] | None,
                 message: "ProtoDescriptor | None"):
        self.name = name
        self.number = number
        self.repeated = repeated
        self.required = required
        self.wire_type = wire_type
        self.encoder = encoder
        self.message = message


class ProtoDescriptor:
    """Ordered field list derived from a BigQuery JSON schema dict
    (the same ``{"fields": [...]}`` shape ``schema.transformer`` uses) —
    the pure-Python analogue of the reference's descriptor derivation at
    ``client/BigQueryProtoClientProvider.java:45``."""

    def __init__(self, bq_schema: dict):
        self.fields: list[_Field] = []
        for i, f in enumerate(bq_schema.get("fields", []), start=1):
            ftype = f["type"].upper()
            mode = (f.get("mode") or "NULLABLE").upper()
            repeated = mode == "REPEATED"
            required = mode == "REQUIRED"
            if ftype in ("STRUCT", "RECORD"):
                sub = ProtoDescriptor({"fields": f.get("fields", [])})
                self.fields.append(
                    _Field(f["name"], i, repeated, required, _LEN, None, sub))
            else:
                if ftype not in _SCALARS:
                    raise ValueError(f"unsupported BigQuery type: {ftype}")
                wt, enc = _SCALARS[ftype]
                self.fields.append(
                    _Field(f["name"], i, repeated, required, wt, enc, None))

    def encode_row(self, row: dict) -> bytes:
        out = bytearray()
        for f in self.fields:
            v = row.get(f.name)
            if v is None:
                if f.required:
                    raise ValueError(f"required field {f.name!r} is null")
                continue
            values = v if f.repeated else (v,)
            for item in values:
                if item is None:
                    raise ValueError(
                        f"repeated field {f.name!r} contains null element")
                if f.message is not None:
                    body = f.message.encode_row(item)
                    out += _tag(f.number, _LEN)
                    out += encode_varint(len(body))
                    out += body
                else:
                    out += _tag(f.number, f.wire_type)
                    out += f.encoder(item)
        return bytes(out)


class ProtoRowSerializer:
    """``RowValueSerializer`` with proto output — drop-in for the JSON
    serializer in every sink path (``serializer/ProtoValueSerializer.java``
    is an empty marker interface; the behavior lives in the writer, which
    we mirror in :func:`serialize`)."""

    def __init__(self, bq_schema: dict):
        self.descriptor = ProtoDescriptor(bq_schema)

    def serialize(self, row: dict) -> bytes:
        return self.descriptor.encode_row(row)


def proto_rows_py(df):
    """DataFrame column of proto-encoded row bytes via an Arrow-batched
    pandas UDF (the no-JVM-protobuf fallback for ``serializers.proto_rows``).

    Row-at-a-time CPU cost is inherent to custom byte-level encoding
    without the spark-protobuf jar; Arrow batching keeps the transfer
    vectorized.  Use :func:`serializers.proto_rows` (native
    ``to_protobuf``) when the jar is on the classpath.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from ..schema.transformer import struct_type_to_bq_schema
    from ..session import ensure_package_on_executors

    # the UDF closure pickles a ProtoRowSerializer by module reference;
    # executor workers need the package on their sys.path
    ensure_package_on_executors(df.sparkSession)
    ser = ProtoRowSerializer(struct_type_to_bq_schema(df.schema))
    names = list(df.columns)

    def _denull(v):
        # Arrow nulls surface as None/pd.NA/NaT depending on dtype; a float
        # NaN stays a VALUE (NaN is a legal DOUBLE and must round-trip).
        if v is None or v is pd.NA:
            return None
        if isinstance(v, float):
            return v
        try:
            if v != v:  # NaT
                return None
        except (TypeError, ValueError):
            pass
        return v

    @pandas_udf("binary")
    def _encode(batch: pd.DataFrame) -> pd.Series:
        recs = batch.to_dict("records")
        return pd.Series(
            [ser.serialize({k: _denull(v) for k, v in r.items()}) for r in recs]
        )

    return _encode(F.struct(*names))
