"""GoogleStorageWriteClient adapter tests over a mocked module graph.

The real ``google-cloud-bigquery-storage`` package is not installed in
this environment (by design), so these tests inject a minimal in-memory
implementation of the surfaces the adapter drives —
``google.cloud.bigquery_storage_v1`` (+ ``.types``, ``.writer``) and
``google.api_core.exceptions`` — into ``sys.modules`` and EXECUTE the
verb mapping: offset semantics, ALREADY_EXISTS/OUT_OF_RANGE/finalized/
NotFound translation, the 10 MB refusal, alias-keyed deterministic
stream names, and the A12–A14 retry/trim/split machine composed on top.
Reference parity: ``client/BigQueryProtoClientProvider.java:45-101``,
``sink/buffered/BigQueryBufferedSinkWriter.java:72-190``,
``sink/async/AsyncClientProvider.java:87-99``.
"""

from __future__ import annotations

import types as pytypes
from types import SimpleNamespace

import pytest

from flink_big_query_connector_spark.streaming.config import WriterSettings
from flink_big_query_connector_spark.streaming.errors import (
    BigQueryError,
    MessageTooLargeError,
    OffsetAlreadyExistsError,
    OffsetOutOfRangeError,
    StatusCode,
    StreamFinalizedError,
    StreamNotFoundError,
)
from flink_big_query_connector_spark.streaming.sinks import write_with_retry


# ---------------------------------------------------------------------------
# mock google module graph
# ---------------------------------------------------------------------------


def _exceptions_module() -> pytypes.ModuleType:
    mod = pytypes.ModuleType("google.api_core.exceptions")

    class GoogleAPIError(Exception):
        pass

    names = [
        "AlreadyExists", "OutOfRange", "NotFound", "InvalidArgument",
        "FailedPrecondition", "Aborted", "ServiceUnavailable",
        "InternalServerError", "Cancelled", "Unknown", "DeadlineExceeded",
        "PermissionDenied",
    ]
    mod.GoogleAPIError = GoogleAPIError
    for n in names:
        setattr(mod, n, type(n, (GoogleAPIError,), {}))
    return mod


class MockService:
    """In-memory Storage Write API: service-assigned stream names,
    offset-checked appends, flush visibility, finalization — raising the
    google.api_core exception types with service-shaped messages."""

    def __init__(self, exc_mod):
        self.exc = exc_mod
        self.streams: dict[str, dict] = {}
        self.counter = 0
        self.scripted: list[Exception] = []  # popped per append

    def _st(self, name: str) -> dict:
        if name.endswith("/_default"):
            return self.streams.setdefault(
                name,
                {"rows": [], "type": "DEFAULT", "finalized": False,
                 "flushed": 0},
            )
        if name not in self.streams:
            raise self.exc.NotFound(f"write stream {name} not found")
        return self.streams[name]

    def create(self, parent: str, ws):
        self.counter += 1
        name = f"{parent}/streams/svc{self.counter:04d}"
        self.streams[name] = {
            "rows": [], "type": getattr(ws, "type_", "BUFFERED"),
            "finalized": False, "flushed": 0,
        }
        return SimpleNamespace(
            name=name, type_=SimpleNamespace(name="BUFFERED")
        )

    def get(self, name: str):
        self._st(name)
        return SimpleNamespace(
            name=name, type_=SimpleNamespace(name="BUFFERED")
        )

    def finalize(self, name: str):
        self._st(name)["finalized"] = True
        return SimpleNamespace(row_count=len(self.streams[name]["rows"]))

    def append(self, req):
        if self.scripted:
            raise self.scripted.pop(0)
        st = self._st(req.write_stream)
        if st["finalized"]:
            raise self.exc.FailedPrecondition(
                f"stream {req.write_stream} is finalized"
            )
        end = len(st["rows"])
        off = req.offset
        if off is not None:
            if off < end:
                raise self.exc.AlreadyExists(
                    "ALREADY_EXISTS: the offset is within stream, "
                    f"expected offset {end}, received {off}"
                )
            if off > end:
                raise self.exc.OutOfRange(
                    "OUT_OF_RANGE: the offset is beyond stream, "
                    f"expected offset {end}, received {off}"
                )
        st["rows"].extend(req.proto_rows.rows.serialized_rows)
        if st["type"] == "DEFAULT":
            st["flushed"] = len(st["rows"])
        return SimpleNamespace(
            append_result=SimpleNamespace(offset=SimpleNamespace(value=end))
        )

    def flush(self, request):
        st = self._st(request.write_stream)
        if request.offset + 1 > len(st["rows"]):
            raise self.exc.OutOfRange(
                f"flush offset {request.offset} beyond stream end "
                f"{len(st['rows'])}"
            )
        st["flushed"] = max(st["flushed"], request.offset + 1)
        return SimpleNamespace(offset=request.offset)


def _install_mock_google(monkeypatch) -> MockService:
    exc_mod = _exceptions_module()
    service = MockService(exc_mod)

    types_mod = pytypes.ModuleType("google.cloud.bigquery_storage_v1.types")

    class WriteStream:
        class Type:
            BUFFERED = "BUFFERED"
            COMMITTED = "COMMITTED"
            PENDING = "PENDING"

        def __init__(self, type_=None):
            self.type_ = type_

    class ProtoRows:
        def __init__(self, serialized_rows=None):
            self.serialized_rows = list(serialized_rows or [])

    class ProtoSchema:
        def __init__(self, proto_descriptor=None):
            self.proto_descriptor = proto_descriptor

    class AppendRowsRequest:
        class ProtoData:
            def __init__(self, rows=None, writer_schema=None):
                self.rows = rows
                self.writer_schema = writer_schema

        def __init__(self, write_stream=None, proto_rows=None):
            self.write_stream = write_stream
            self.proto_rows = proto_rows
            self.offset = None  # proto-plus wrapper: None when unset

    class FlushRowsRequest:
        def __init__(self, write_stream=None, offset=None):
            self.write_stream = write_stream
            self.offset = offset

    for k, v in {
        "WriteStream": WriteStream, "ProtoRows": ProtoRows,
        "ProtoSchema": ProtoSchema, "AppendRowsRequest": AppendRowsRequest,
        "FlushRowsRequest": FlushRowsRequest,
    }.items():
        setattr(types_mod, k, v)

    class BigQueryWriteClient:
        def __init__(self, **kwargs):
            self.service = service

        def create_write_stream(self, parent, write_stream):
            return service.create(parent, write_stream)

        def get_write_stream(self, name):
            return service.get(name)

        def finalize_write_stream(self, name):
            return service.finalize(name)

        def flush_rows(self, request):
            return service.flush(request)

    bqs_mod = pytypes.ModuleType("google.cloud.bigquery_storage_v1")
    bqs_mod.BigQueryWriteClient = BigQueryWriteClient
    bqs_mod.types = types_mod

    class _Future:
        def __init__(self, fn):
            self._fn = fn

        def result(self, timeout=None):
            return self._fn()

    class AppendRowsStream:
        def __init__(self, client, template):
            self._client = client
            self.template = template

        def send(self, req):
            return _Future(lambda: self._client.service.append(req))

    writer_mod = pytypes.ModuleType("google.cloud.bigquery_storage_v1.writer")
    writer_mod.AppendRowsStream = AppendRowsStream

    import sys

    for name, mod in {
        "google": pytypes.ModuleType("google"),
        "google.cloud": pytypes.ModuleType("google.cloud"),
        "google.api_core": pytypes.ModuleType("google.api_core"),
        "google.api_core.exceptions": exc_mod,
        "google.cloud.bigquery_storage_v1": bqs_mod,
        "google.cloud.bigquery_storage_v1.types": types_mod,
        "google.cloud.bigquery_storage_v1.writer": writer_mod,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return service


@pytest.fixture
def mock_google(monkeypatch):
    return _install_mock_google(monkeypatch)


@pytest.fixture
def provider(mock_google, tmp_path):
    from flink_big_query_connector_spark.streaming.client_provider import (
        GoogleBigQueryStorageClientProvider,
    )

    return GoogleBigQueryStorageClientProvider(
        project="proj", alias_root=str(tmp_path / "aliases")
    )


TABLE = "ds.t"


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_client_satisfies_protocol_and_paths(provider):
    from flink_big_query_connector_spark.streaming.client_provider import (
        StorageWriteClient,
    )

    c = provider.client()
    assert isinstance(c, StorageWriteClient)
    assert c._table_path("ds.t") == "projects/proj/datasets/ds/tables/t"
    assert c._table_path("p2.ds.t") == "projects/p2/datasets/ds/tables/t"
    with pytest.raises(BigQueryError):
        c._table_path("just_a_table")


def test_stream_lifecycle_offsets_and_flush(provider, mock_google):
    c = provider.client()
    stream = c.create_write_stream(TABLE, "BUFFERED")
    assert stream.startswith("projects/proj/datasets/ds/tables/t/streams/")

    assert c.append(TABLE, stream, [{"a": 1}, {"a": 2}], 0) == 2
    assert c.append(TABLE, stream, [b"\x08\x01"], 2) == 3  # proto bytes path
    info = c.get_write_stream(TABLE, stream)
    assert info.offset == 3 and not info.finalized

    # buffered rows invisible until FlushRows; normalized to "visible count"
    st = mock_google.streams[stream]
    assert st["flushed"] == 0
    assert c.flush_rows(TABLE, stream, 1) == 2
    assert st["flushed"] == 2

    c.finalize_stream(TABLE, stream)
    with pytest.raises(StreamFinalizedError):
        c.append(TABLE, stream, [{"a": 4}], 3)


def test_offset_error_translation(provider):
    c = provider.client()
    stream = c.create_write_stream(TABLE, "BUFFERED")
    c.append(TABLE, stream, [{"a": 1}, {"a": 2}], 0)
    # behind the end -> ALREADY_EXISTS with the durable end parsed from
    # the service message (expected offset N)
    with pytest.raises(OffsetAlreadyExistsError) as ae:
        c.append(TABLE, stream, [{"a": 1}], 0)
    assert ae.value.expected_offset == 0
    assert ae.value.actual_offset == 2
    with pytest.raises(OffsetOutOfRangeError):
        c.append(TABLE, stream, [{"a": 9}], 10)
    with pytest.raises(StreamNotFoundError):
        c.get_write_stream(TABLE, "nope")


def test_oversized_append_refused_client_side(provider, mock_google):
    c = provider.client()
    stream = c.create_write_stream(TABLE, "BUFFERED")
    big = {"a": "x" * (20 * 1024 * 1024)}
    with pytest.raises(MessageTooLargeError):
        c.append(TABLE, stream, [big], 0)
    # the refusal happened BEFORE any RPC (StreamWriter parity)
    assert mock_google.streams[stream]["rows"] == []


def test_server_side_messagesize_translates_to_split_error(
    provider, mock_google
):
    c = provider.client()
    stream = c.create_write_stream(TABLE, "BUFFERED")
    mock_google.scripted.append(
        mock_google.exc.InvalidArgument(
            "INVALID_ARGUMENT: MessageSize is too large. Max allow: "
            "10000000 Actual: 12345678"
        )
    )
    with pytest.raises(MessageTooLargeError):
        c.append(TABLE, stream, [{"a": 1}], 0)


def test_transient_statuses_and_writer_recreation(provider, mock_google):
    c = provider.client()
    stream = c.create_write_stream(TABLE, "BUFFERED")
    c.append(TABLE, stream, [{"a": 1}], 0)
    assert len(c._writers) == 1
    for klass, code, recreates in (
        (mock_google.exc.Aborted, StatusCode.ABORTED, False),
        (mock_google.exc.ServiceUnavailable, StatusCode.UNAVAILABLE, True),
        (mock_google.exc.InternalServerError, StatusCode.INTERNAL, False),
        (mock_google.exc.DeadlineExceeded, StatusCode.UNKNOWN, True),
    ):
        mock_google.scripted.append(klass("transient"))
        with pytest.raises(BigQueryError) as exc:
            c.append(TABLE, stream, [{"a": 2}], 1)
        assert exc.value.code == code
        # A10: a broken-connection status drops the cached stream writer
        assert (len(c._writers) == 0) == recreates
        c.append(TABLE, stream, [{"a": 2}], 1)  # reopens and succeeds
        mock_google.streams[stream]["rows"].pop()  # reset for next loop


def test_retry_machine_trims_against_mocked_real_backend(provider):
    """A12–A14 composed over the adapter: duplicate-offset replay trims
    via the translated ALREADY_EXISTS, exactly as with the fake."""
    c = provider.client()
    settings = WriterSettings()
    stream = c.create_write_stream(TABLE, "BUFFERED")
    rows = [{"a": i} for i in range(4)]
    assert write_with_retry(c, TABLE, stream, rows, 0, settings) == 4
    # fresh client (fresh task after crash): no tracked offsets — the
    # trim must come from the PARSED service message
    c2 = provider.client()
    assert write_with_retry(c2, TABLE, stream, rows, 0, settings) == 0
    more = rows + [{"a": 4}, {"a": 5}]
    assert write_with_retry(c2, TABLE, stream, more, 0, settings) == 2
    assert c2.flush_rows(TABLE, stream, 5) == 6


def test_deterministic_name_alias_reattach(provider, mock_google):
    """The 2PC sink's replay keys: same requested name -> same service
    stream across client instances (the checkpointed StreamState.name
    role); losing a create race finalizes the orphan."""
    c1 = provider.client()
    s1 = c1.create_write_stream(TABLE, "BUFFERED", name="ds.t/streams/b7-p0")
    c2 = provider.client()  # fresh task replay
    s2 = c2.create_write_stream(TABLE, "BUFFERED", name="ds.t/streams/b7-p0")
    assert s1 == s2
    assert len([s for s in mock_google.streams if not s.endswith("_default")]) == 1

    from flink_big_query_connector_spark.streaming.client_provider import (
        GoogleBigQueryStorageClientProvider,
    )

    bare = GoogleBigQueryStorageClientProvider(project="proj").client()
    with pytest.raises(BigQueryError) as exc:
        bare.create_write_stream(TABLE, "BUFFERED", name="x")
    assert exc.value.code == StatusCode.INVALID_ARGUMENT
    assert "alias_root" in str(exc.value)


def test_default_stream_append_no_offset(provider, mock_google):
    c = provider.client()
    stream = c.create_write_stream(TABLE, "DEFAULT")
    assert stream.endswith("/streams/_default")
    end = c.append(TABLE, stream, [{"a": 1}, {"a": 2}])
    assert end == 2
    # default-stream rows are immediately visible
    assert mock_google.streams[stream]["flushed"] == 2


def test_provider_is_picklable_under_mock(provider):
    import pickle

    p2 = pickle.loads(pickle.dumps(provider))
    assert p2.client() is not None


def test_construction_fails_fast_without_package():
    """ADVICE r11: __post_init__ probes the import, so a misconfigured
    deployment fails at sink WIRING, not first use.  (No mock installed
    here — the real package is absent in this environment.)"""
    from flink_big_query_connector_spark.streaming.client_provider import (
        GoogleBigQueryStorageClientProvider,
    )

    with pytest.raises(ImportError) as exc:
        GoogleBigQueryStorageClientProvider(project="p1")
    assert "google-cloud-bigquery-storage" in str(exc.value)


# ---------------------------------------------------------------------------
# serialized DescriptorProto derivation (no protobuf runtime needed)
# ---------------------------------------------------------------------------


def _walk_message(buf: bytes) -> list[tuple[int, int, object]]:
    """Minimal proto wire walker: [(field_number, wire_type, value)]."""
    out = []
    i = 0
    while i < len(buf):
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            out.append((fnum, wt, v))
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            out.append((fnum, wt, buf[i : i + ln]))
            i += ln
        else:  # pragma: no cover - descriptor uses only varint/LEN
            raise AssertionError(f"unexpected wire type {wt}")
    return out


def test_serialized_descriptor_proto_wire_shape():
    """serialized_descriptor_proto emits a valid proto2 DescriptorProto:
    schema-ordered 1-based field numbers, _SCALARS-matched types,
    mode-mapped labels, nested RECORDs as nested_type + TYPE_MESSAGE."""
    from flink_big_query_connector_spark.streaming.client_provider import (
        serialized_descriptor_proto,
    )

    schema = {
        "fields": [
            {"name": "id", "type": "INT64", "mode": "REQUIRED"},
            {"name": "v", "type": "STRING"},
            {"name": "tags", "type": "STRING", "mode": "REPEATED"},
            {
                "name": "meta",
                "type": "RECORD",
                "fields": [{"name": "ts", "type": "TIMESTAMP"}],
            },
        ]
    }
    msg = _walk_message(serialized_descriptor_proto(schema))
    names = [v for f, _, v in msg if f == 1]
    assert names == [b"Row"]
    fields = [dict(
        (fn, val) for fn, _, val in _walk_message(v)
    ) for f, _, v in msg if f == 2]
    assert [f[1] for f in fields] == [b"id", b"v", b"tags", b"meta"]
    assert [f[3] for f in fields] == [1, 2, 3, 4]         # numbers
    assert [f[4] for f in fields] == [2, 1, 3, 1]         # labels
    assert [f[5] for f in fields] == [3, 9, 9, 11]        # types
    assert fields[3][6] == b".Row.F4"                     # nested type ref
    nested = [v for f, _, v in msg if f == 3]
    assert len(nested) == 1
    sub = _walk_message(nested[0])
    assert [v for f, _, v in sub if f == 1] == [b"F4"]
    subfields = [dict((fn, val) for fn, _, val in _walk_message(v))
                 for f, _, v in sub if f == 2]
    assert [f[1] for f in subfields] == [b"ts"]
    assert [f[5] for f in subfields] == [3]               # TIMESTAMP->int64
