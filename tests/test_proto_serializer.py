"""Golden-byte tests for the pure-Python proto serializer (reference A18,
``client/ProtoStreamWriter.java:24-39`` + descriptor derivation at
``client/BigQueryProtoClientProvider.java:45-46``).

Fixtures are hand-computed from the protobuf wire-format spec
(varint / fixed64 / length-delimited); the int64=150 and string="testing"
cases are the spec's own canonical examples, so any drift from real
protobuf encoding fails loudly here without needing the protobuf package.
"""

import datetime as dt
import decimal
import struct

import pytest

from flink_big_query_connector_spark.streaming.proto import (
    ProtoRowSerializer,
    encode_varint,
)


def ser(fields):
    return ProtoRowSerializer({"fields": fields})


def test_varint_canonical():
    assert encode_varint(0) == b"\x00"
    assert encode_varint(1) == b"\x01"
    assert encode_varint(150) == b"\x96\x01"
    assert encode_varint(300) == b"\xac\x02"
    # negative int64: two's complement, always 10 bytes
    assert encode_varint(-1) == b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    assert encode_varint(-2) == b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"


def test_int64_spec_example():
    # protobuf.dev encoding guide: field 1 (int64) = 150 -> 08 96 01
    s = ser([{"name": "a", "type": "INT64"}])
    assert s.serialize({"a": 150}) == b"\x08\x96\x01"


def test_string_spec_example():
    # field 2 (string) = "testing" -> 12 07 74 65 73 74 69 6e 67
    s = ser([{"name": "pad", "type": "INT64"}, {"name": "b", "type": "STRING"}])
    assert s.serialize({"b": "testing"}) == b"\x12\x07testing"


def test_nested_struct_spec_example():
    # field 3 (message{field 1 int64 = 150}) -> 1a 03 08 96 01
    s = ser([
        {"name": "x", "type": "INT64"},
        {"name": "y", "type": "INT64"},
        {"name": "c", "type": "STRUCT", "fields": [{"name": "a", "type": "INT64"}]},
    ])
    assert s.serialize({"c": {"a": 150}}) == b"\x1a\x03\x08\x96\x01"


def test_double_fixed64():
    s = ser([{"name": "d", "type": "FLOAT64"}])
    assert s.serialize({"d": 1.5}) == b"\x09" + struct.pack("<d", 1.5)
    # NaN is a value, not a null
    out = s.serialize({"d": float("nan")})
    assert out[:1] == b"\x09" and len(out) == 9


def test_bool_bytes_date_timestamp():
    s = ser([
        {"name": "b", "type": "BOOL"},
        {"name": "by", "type": "BYTES"},
        {"name": "d", "type": "DATE"},
        {"name": "t", "type": "TIMESTAMP"},
    ])
    row = {
        "b": True,
        "by": b"\x00\xff",
        "d": dt.date(1970, 1, 11),  # 10 days
        "t": dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
    }
    micros = 1_704_067_200_000_000
    expected = (
        b"\x08\x01"                      # bool field 1
        + b"\x12\x02\x00\xff"            # bytes field 2
        + b"\x18\x0a"                    # date field 3 = varint 10
        + b"\x20" + encode_varint(micros)  # timestamp field 4
    )
    assert s.serialize(row) == expected


def test_repeated_unpacked():
    s = ser([
        {"name": "tags", "type": "STRING", "mode": "REPEATED"},
        {"name": "ns", "type": "INT64", "mode": "REPEATED"},
    ])
    out = s.serialize({"tags": ["a", "b"], "ns": [1, 150]})
    assert out == b"\x0a\x01a\x0a\x01b" + b"\x10\x01\x10\x96\x01"


def test_numeric_as_decimal_string():
    s = ser([{"name": "n", "type": "BIGNUMERIC"}])
    v = decimal.Decimal("12345678901234567890.123456789")
    out = s.serialize({"n": v})
    assert out == b"\x0a" + bytes([len(str(v))]) + str(v).encode()
    # no exponent notation even for tiny values
    tiny = decimal.Decimal("1E-30")
    assert b"E" not in s.serialize({"n": tiny})


def test_datetime_civil_string():
    s = ser([{"name": "dt", "type": "DATETIME"}])
    out = s.serialize({"dt": dt.datetime(2024, 5, 6, 7, 8, 9, 123456)})
    assert out == b"\x0a\x1a" + b"2024-05-06 07:08:09.123456"


def test_null_handling():
    s = ser([
        {"name": "a", "type": "INT64"},
        {"name": "b", "type": "STRING", "mode": "REQUIRED"},
    ])
    # nullable null -> absent field bytes
    assert s.serialize({"a": None, "b": "x"}) == b"\x12\x01x"
    with pytest.raises(ValueError, match="required"):
        s.serialize({"a": 1, "b": None})
    with pytest.raises(ValueError, match="null element"):
        ser([{"name": "r", "type": "INT64", "mode": "REPEATED"}]).serialize(
            {"r": [1, None]}
        )


def test_field_numbers_follow_schema_order():
    s = ser([
        {"name": "first", "type": "INT64"},
        {"name": "second", "type": "INT64"},
        {"name": "third", "type": "INT64"},
    ])
    assert s.serialize({"third": 1}) == b"\x18\x01"  # (3<<3)|0 = 0x18


def test_dataframe_proto_rows_matches_row_serializer(spark):
    from flink_big_query_connector_spark.schema.transformer import (
        struct_type_to_bq_schema,
    )
    from flink_big_query_connector_spark.streaming.serializers import proto_rows

    df = spark.createDataFrame(
        [(1, "alpha", 1.5, True), (2, None, float("nan"), False)],
        "id long, name string, score double, flag boolean",
    )
    out = {
        r["id"]: bytes(r["proto"])
        for r in df.withColumn("proto", proto_rows(df)).select("id", "proto").collect()
    }
    ref = ProtoRowSerializer(struct_type_to_bq_schema(df.schema))
    assert out[1] == ref.serialize(
        {"id": 1, "name": "alpha", "score": 1.5, "flag": True}
    )
    expect2 = ref.serialize({"id": 2, "name": None, "score": float("nan"), "flag": False})
    assert out[2] == expect2
    assert b"\x96" not in out[1][:1]  # sanity: first byte is the id tag 0x08
    assert out[1][:2] == b"\x08\x01"


# -- property-based roundtrip ------------------------------------------------
#
# A minimal wire-format decoder lives HERE (test-side oracle only): if the
# encoder drifts from the protobuf spec in tag layout, varint termination,
# or length prefixes, random rows will fail to parse back.

def _decode_varint(b: bytes, i: int):
    shift, out = 0, 0
    while True:
        x = b[i]
        i += 1
        out |= (x & 0x7F) << shift
        if not x & 0x80:
            return out, i
        shift += 7


def _decode_message(b: bytes):
    """-> dict field_number -> list of (wire_type, raw_value)."""
    out: dict = {}
    i = 0
    while i < len(b):
        tag, i = _decode_varint(b, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _decode_varint(b, i)
        elif wt == 1:
            v, i = b[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _decode_varint(b, i)
            v, i = b[i:i + ln], i + ln
        else:
            raise AssertionError(f"unexpected wire type {wt}")
        out.setdefault(fn, []).append((wt, v))
    return out


def _u64_to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row_strategy = st.fixed_dictionaries(
        {
            "a": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            "b": st.one_of(st.none(), st.text(max_size=40)),
            "c": st.one_of(st.none(), st.floats(allow_nan=True)),
            "d": st.one_of(st.none(), st.booleans()),
            "e": st.lists(st.integers(-(2**31), 2**31 - 1), max_size=5),
            "f": st.one_of(st.none(), st.binary(max_size=20)),
        }
    )

    @settings(max_examples=200, deadline=None)
    @given(row_strategy)
    def test_random_rows_roundtrip_through_wire_format(row):
        import math
        import struct as _struct

        s = ser([
            {"name": "a", "type": "INT64"},
            {"name": "b", "type": "STRING"},
            {"name": "c", "type": "FLOAT64"},
            {"name": "d", "type": "BOOL"},
            {"name": "e", "type": "INT64", "mode": "REPEATED"},
            {"name": "f", "type": "BYTES"},
        ])
        decoded = _decode_message(s.serialize(row))
        if row["a"] is None:
            assert 1 not in decoded
        else:
            assert _u64_to_i64(decoded[1][0][1]) == row["a"]
        if row["b"] is None:
            assert 2 not in decoded
        else:
            assert decoded[2][0][1].decode("utf-8") == row["b"]
        if row["c"] is None:
            assert 3 not in decoded
        else:
            got = _struct.unpack("<d", decoded[3][0][1])[0]
            assert got == row["c"] or (math.isnan(got) and math.isnan(row["c"]))
        if row["d"] is None:
            assert 4 not in decoded
        else:
            assert decoded[4][0][1] == (1 if row["d"] else 0)
        assert [_u64_to_i64(v) for _, v in decoded.get(5, [])] == row["e"]
        if row["f"] is None:
            assert 6 not in decoded
        else:
            assert decoded[6][0][1] == row["f"]
except ImportError:  # pragma: no cover - hypothesis always in this container
    pass


def test_dataframe_proto_rows_nested_and_repeated(spark):
    """Arrow hands nested structs to pandas as dicts and arrays as numpy
    arrays; the encoder must serialize both identically to the plain-dict
    row path."""
    from flink_big_query_connector_spark.schema.transformer import (
        struct_type_to_bq_schema,
    )
    from flink_big_query_connector_spark.streaming.serializers import proto_rows

    df = spark.createDataFrame(
        [(1, ["a", "b"], {"city": "x", "zips": [10, 20]})],
        "id long, tags array<string>, "
        "address struct<city: string, zips: array<long>>",
    )
    [r] = df.withColumn("p", proto_rows(df)).select("p").collect()
    ref = ProtoRowSerializer(struct_type_to_bq_schema(df.schema))
    expected = ref.serialize(
        {"id": 1, "tags": ["a", "b"], "address": {"city": "x", "zips": [10, 20]}}
    )
    assert bytes(r["p"]) == expected
    # and the nested bytes parse back to the right field tree
    decoded = _decode_message(bytes(r["p"]))
    addr = _decode_message(decoded[3][0][1])
    assert addr[1][0][1] == b"x"
    assert [_u64_to_i64(v) for _, v in addr[2]] == [10, 20]
