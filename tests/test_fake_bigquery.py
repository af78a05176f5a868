"""FakeBigQuery backend semantics (the MockJsonClientProvider analogue)."""

import pytest

from flink_big_query_connector_spark.sources.fake_bigquery import (
    DEFAULT_STREAM,
    FakeBigQuery,
)
from flink_big_query_connector_spark.streaming.errors import (
    BigQueryError,
    MessageTooLargeError,
    OffsetAlreadyExistsError,
    OffsetOutOfRangeError,
    StatusCode,
    StreamFinalizedError,
    StreamNotFoundError,
)


def rows(n, start=0):
    return [{"value": i} for i in range(start, start + n)]


def test_default_stream_append_visible(bq):
    bq.append("t1", DEFAULT_STREAM, rows(3))
    assert bq.table_count("t1") == 3
    assert bq.read_rows("t1") == rows(3)


def test_default_stream_rejects_explicit_offset(bq):
    """Storage API semantics: offsets are only meaningful on BUFFERED
    (and PENDING/COMMITTED) streams; the default stream rejects them with
    INVALID_ARGUMENT instead of silently ignoring the offset."""
    import pytest

    from flink_big_query_connector_spark.streaming.errors import (
        BigQueryError,
        StatusCode,
    )

    bq.append("t1", DEFAULT_STREAM, rows(2))  # offset -1: fine
    with pytest.raises(BigQueryError) as e:
        bq.append("t1", DEFAULT_STREAM, rows(2), 2)
    assert e.value.code == StatusCode.INVALID_ARGUMENT
    assert bq.table_count("t1") == 2  # rejected append stored nothing


def test_buffered_stream_offsets(bq):
    s = bq.create_write_stream("t1", "BUFFERED")
    assert bq.append("t1", s, rows(2), 0) == 2
    assert bq.append("t1", s, rows(2, 2), 2) == 4
    # buffered rows invisible until flushed
    assert bq.table_count("t1") == 0
    bq.flush_rows("t1", s, 3)
    assert bq.table_count("t1") == 4


def test_offset_already_exists_carries_expected_actual(bq):
    s = bq.create_write_stream("t1", "BUFFERED")
    bq.append("t1", s, rows(4), 0)
    with pytest.raises(OffsetAlreadyExistsError) as e:
        bq.append("t1", s, rows(4), 2)
    assert e.value.expected_offset == 2
    assert e.value.actual_offset == 4


def test_offset_out_of_range(bq):
    s = bq.create_write_stream("t1", "BUFFERED")
    with pytest.raises(OffsetOutOfRangeError):
        bq.append("t1", s, rows(1), 5)


def test_finalized_stream_rejects_appends(bq):
    s = bq.create_write_stream("t1", "BUFFERED")
    bq.finalize_stream("t1", s)
    with pytest.raises(StreamFinalizedError):
        bq.append("t1", s, rows(1), 0)


def test_get_write_stream_not_found(bq):
    with pytest.raises(StreamNotFoundError):
        bq.get_write_stream("t1", "missing")


def test_message_size_limit(bq):
    big = [{"value": "x" * 11_000_000}]
    with pytest.raises(MessageTooLargeError):
        bq.append("t1", DEFAULT_STREAM, big)


def test_scripted_failures_fifo(bq):
    bq.script_append_failures(["UNAVAILABLE", "OK"])
    with pytest.raises(BigQueryError) as e:
        bq.append("t1", DEFAULT_STREAM, rows(1))
    assert e.value.code == StatusCode.UNAVAILABLE
    bq.append("t1", DEFAULT_STREAM, rows(1))  # second entry is OK
    assert bq.table_count("t1") == 1


def test_flush_replay_tolerated(bq):
    s = bq.create_write_stream("t1", "BUFFERED")
    bq.append("t1", s, rows(3), 0)
    bq.flush_rows("t1", s, 2)
    bq.flush_rows("t1", s, 2)  # committer replay: ALREADY_EXISTS tolerated
    assert bq.table_count("t1") == 3


def test_cross_handle_durability(tmp_path):
    root = str(tmp_path / "bq")
    FakeBigQuery(root).append("t1", DEFAULT_STREAM, rows(2))
    assert FakeBigQuery(root).table_count("t1") == 2
