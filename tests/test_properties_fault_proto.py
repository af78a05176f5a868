"""Property tests for the retry state machine under RANDOM fault scripts
and for the proto wire encoder against an INDEPENDENT decoder.

The example-based suite pins each gRPC-status branch of
``write_with_retry`` (reference ``BigQueryBufferedSinkWriter.java``
status taxonomy) one at a time; these sweep the composition space —
arbitrary interleavings of retryable statuses, an oversized-batch split,
and a checkpoint-replay prefix in ONE call — and assert the only
invariant that matters at 100 TB: every row lands exactly once, in
order.  The proto test decodes ``ProtoDescriptor.encode_row`` output
with a from-scratch wire-format parser written here (never imported
from the encoder module), so agreement is two independent
implementations of the protobuf spec meeting at the byte level."""

from __future__ import annotations

import datetime as dt
import decimal
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_big_query_connector_spark.streaming.proto import ProtoDescriptor

# ---------------------------------------------------------------------------
# write_with_retry: exactly-once under arbitrary fault interleavings
# ---------------------------------------------------------------------------

# Each script entry pops on one append attempt (FIFO, "OK" = no fault).
# Retryable taxonomy only: fatal statuses are example-tested to raise.
_FAULTS = ["UNAVAILABLE", "ABORTED", "INTERNAL", "CANCELLED", "UNKNOWN"]


@settings(max_examples=120, deadline=None)
@given(
    n_rows=st.integers(1, 24),
    replay_from=st.integers(0, 24),
    faults=st.lists(st.sampled_from(_FAULTS + ["OK"]), max_size=5),
    split_first=st.booleans(),
)
def test_random_fault_scripts_land_every_row_exactly_once(
    tmp_path_factory, n_rows, replay_from, faults, split_first
):
    """Any script of <= 5 transient faults (optionally opening with an
    oversized-batch split) against a replay from any prefix must end
    with the stream containing rows 0..n-1 exactly once.  Splits reset
    the per-call attempt budget (fresh recursive calls), the trim path
    consumes the pre-stored prefix, and every transient status must be
    absorbed — the composition the one-fault-at-a-time tests can't see."""
    from flink_big_query_connector_spark.sources.fake_bigquery import (
        FakeBigQuery,
    )
    from flink_big_query_connector_spark.streaming.config import (
        WriterSettings,
    )
    from flink_big_query_connector_spark.streaming.sinks import (
        write_with_retry,
    )

    replay_from = min(replay_from, n_rows)
    bq = FakeBigQuery(str(tmp_path_factory.mktemp("bq")))
    table = "p.d.fault_sweep"
    stream = bq.create_write_stream(table, "BUFFERED")
    rows = [{"i": i} for i in range(n_rows)]
    # a previous attempt durably stored a prefix, then "crashed" —
    # BEFORE the fault script is armed (this append must not pop one)
    if replay_from:
        bq.append(table, stream, rows[:replay_from], 0)
    script = list(faults)
    if split_first and n_rows >= 2:
        # one oversized rejection: the machine must split and re-derive
        # offsets for both halves (reference :167-173); sub-calls then
        # absorb the remaining scripted faults with fresh attempt budgets
        bq.script_append_failures(
            ["INVALID_ARGUMENT"], message="MessageSize exceeds the limit"
        )
    if script:
        bq.script_append_failures(script)

    appended = write_with_retry(
        bq, table, stream, rows, 0,
        WriterSettings(retry_count=6, retry_pause_s=0.0),
        sleep=lambda _s: None,
    )

    assert appended == n_rows - replay_from
    if n_rows:
        bq.flush_rows(table, stream, n_rows - 1)
    got = [r["i"] for r in bq.read_rows(table)]
    assert got == list(range(n_rows))


# ---------------------------------------------------------------------------
# proto wire format: independent decoder round-trip
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _decode_message(buf: bytes, desc: ProtoDescriptor) -> dict:
    """From-scratch protobuf wire parser: tag -> (field_number, wire
    type), dispatch on wire type, invert each BigQuery encoder.  Shares
    NOTHING with proto.py beyond the descriptor's (number, type) map."""
    by_number = {f.number: f for f in desc.fields}
    out: dict = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        number, wire = key >> 3, key & 0x7
        f = by_number[number]
        if wire == 0:
            raw, pos = _read_varint(buf, pos)
            val = _scalar_from_varint(f, raw)
        elif wire == 1:
            (val,) = struct.unpack("<d", buf[pos:pos + 8])
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            payload = buf[pos:pos + ln]
            pos += ln
            if f.message is not None:
                val = _decode_message(payload, f.message)
            else:
                val = payload
        else:  # pragma: no cover - encoder never emits other wire types
            raise AssertionError(f"unexpected wire type {wire}")
        if f.repeated:
            out.setdefault(f.name, []).append(val)
        else:
            assert f.name not in out, "non-repeated field emitted twice"
            out[f.name] = val
    return out


def _scalar_from_varint(f, raw: int):
    # the test schema maps field name prefixes to BQ types (see below)
    t = f.name.split("_")[0]
    if t == "b":
        assert raw in (0, 1)
        return bool(raw)
    if t == "i":
        return _signed64(raw)
    if t == "d":
        return dt.date(1970, 1, 1) + dt.timedelta(days=_signed64(raw))
    if t == "ts":
        micros = _signed64(raw)
        return dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
            microseconds=micros
        )
    raise AssertionError(f"unexpected varint field {f.name}")


# Field-name prefix encodes the BQ type so the decoder can invert it:
# b_=BOOL i_=INT64 f_=FLOAT64 s_=STRING by_=BYTES d_=DATE ts_=TIMESTAMP
# n_=NUMERIC r_=nested RECORD
_VALUE_STRATEGIES = {
    "b": ("BOOL", st.booleans()),
    "i": ("INT64", st.integers(-(2**63), 2**63 - 1)),
    "f": ("FLOAT64", st.floats(allow_nan=False, width=64)),
    "s": ("STRING", st.text(max_size=40)),
    "by": ("BYTES", st.binary(max_size=40)),
    "d": ("DATE", st.dates(dt.date(1, 1, 1), dt.date(9999, 12, 31))),
    "ts": (
        "TIMESTAMP",
        st.datetimes(
            dt.datetime(1902, 1, 1), dt.datetime(2200, 1, 1)
        ).map(lambda v: v.replace(tzinfo=dt.timezone.utc)),
    ),
    "n": (
        "NUMERIC",
        st.decimals(
            allow_nan=False, allow_infinity=False, places=9,
            min_value=decimal.Decimal(-(10**20)),
            max_value=decimal.Decimal(10**20),
        ),
    ),
}


@st.composite
def _schema_and_row(draw, allow_nested: bool = True):
    fields: list[dict] = []
    row: dict = {}
    prefixes = draw(
        st.lists(
            st.sampled_from(sorted(_VALUE_STRATEGIES)), min_size=1,
            max_size=6,
        )
    )
    for idx, p in enumerate(prefixes):
        bq_type, vals = _VALUE_STRATEGIES[p]
        mode = draw(st.sampled_from(["NULLABLE", "REQUIRED", "REPEATED"]))
        name = f"{p}_{idx}"
        fields.append({"name": name, "type": bq_type, "mode": mode})
        if mode == "REPEATED":
            row[name] = draw(st.lists(vals, max_size=4))
        elif mode == "REQUIRED":
            row[name] = draw(vals)
        else:
            row[name] = draw(st.one_of(st.none(), vals))
    if allow_nested and draw(st.booleans()):
        sub_fields, sub_row = draw(_schema_and_row(allow_nested=False))
        fields.append(
            {
                "name": f"r_{len(fields)}",
                "type": "STRUCT",
                "mode": "NULLABLE",
                "fields": sub_fields,
            }
        )
        row[f"r_{len(fields) - 1}"] = sub_row
    return fields, row


def _expected(fields: list[dict], row: dict) -> dict:
    """Canonical post-decode image of ``row``: None vanishes, empty
    repeated vanishes (proto3 presence), strings arrive as utf-8 bytes,
    NUMERIC/datetime-naive TIMESTAMP arrive in their wire canonical
    forms."""
    out: dict = {}
    for f in fields:
        v = row.get(f["name"])
        if v is None or (f["mode"] == "REPEATED" and v == []):
            continue
        vals = v if f["mode"] == "REPEATED" else [v]
        conv = []
        for item in vals:
            if f["type"] == "STRUCT":
                conv.append(_expected(f["fields"], item))
            elif f["type"] == "STRING":
                conv.append(item.encode("utf-8"))
            elif f["type"] == "NUMERIC":
                conv.append(format(item, "f").encode("utf-8"))
            else:
                conv.append(item)
        out[f["name"]] = conv if f["mode"] == "REPEATED" else conv[0]
    return out


@settings(max_examples=250, deadline=None)
@given(sr=_schema_and_row())
def test_proto_encoder_round_trips_through_independent_decoder(sr):
    fields, row = sr
    desc = ProtoDescriptor({"fields": fields})
    encoded = desc.encode_row(row)
    decoded = _decode_message(encoded, desc)
    assert decoded == _expected(fields, row)
