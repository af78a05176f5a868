"""Error model for the sink writers.

Mirrors the reference's exception surface (``sink/AppendException.java``,
``sink/async/AsyncWriterException.java``) and the gRPC status codes its
retry state machines branch on, without depending on grpc being installed.
"""

from __future__ import annotations

from enum import Enum


class StatusCode(str, Enum):
    OK = "OK"
    INTERNAL = "INTERNAL"
    CANCELLED = "CANCELLED"
    UNAVAILABLE = "UNAVAILABLE"
    ABORTED = "ABORTED"
    ALREADY_EXISTS = "ALREADY_EXISTS"
    OUT_OF_RANGE = "OUT_OF_RANGE"
    INVALID_ARGUMENT = "INVALID_ARGUMENT"
    NOT_FOUND = "NOT_FOUND"
    PERMISSION_DENIED = "PERMISSION_DENIED"
    UNKNOWN = "UNKNOWN"


class BigQueryError(Exception):
    """Base error carrying a status code + message."""

    def __init__(self, code: StatusCode, message: str = "", **details):
        super().__init__(f"{code.value}: {message}")
        self.code = code
        self.message = message
        self.details = details


class OffsetAlreadyExistsError(BigQueryError):
    """Rows at this offset were already durably stored (replay after
    recovery).  Carries expected/actual so the writer can trim."""

    def __init__(self, expected_offset: int, actual_offset: int):
        super().__init__(
            StatusCode.ALREADY_EXISTS,
            f"offset already exists: expected {expected_offset}, "
            f"stream is at {actual_offset}",
            expected_offset=expected_offset,
            actual_offset=actual_offset,
        )
        self.expected_offset = expected_offset
        self.actual_offset = actual_offset


class OffsetOutOfRangeError(BigQueryError):
    def __init__(self, expected_offset: int, actual_offset: int):
        super().__init__(
            StatusCode.OUT_OF_RANGE,
            f"offset out of range: expected {expected_offset}, "
            f"stream is at {actual_offset}",
        )
        self.expected_offset = expected_offset
        self.actual_offset = actual_offset


class StreamFinalizedError(BigQueryError):
    def __init__(self, stream: str):
        super().__init__(
            StatusCode.INVALID_ARGUMENT, f"stream finalized: {stream}"
        )
        self.stream = stream


class StreamNotFoundError(BigQueryError):
    def __init__(self, stream: str):
        super().__init__(StatusCode.NOT_FOUND, f"stream not found: {stream}")
        self.stream = stream


class MessageTooLargeError(BigQueryError):
    """AppendRows payload over the 10 MB service limit — the writer must
    split the batch in half and retry the halves."""

    def __init__(self, size: int, limit: int = 10_000_000):
        super().__init__(
            StatusCode.INVALID_ARGUMENT,
            f"MessageSize is too large. Max allow: {limit} Actual: {size}",
        )
        self.size = size
        self.limit = limit


class AppendException(Exception):
    """Carries the failed batch context through retries (reference
    ``sink/AppendException.java:5-19``)."""

    def __init__(self, trace_id: str, table: str, stream: str, offset: int,
                 retry_count: int, cause: Exception):
        super().__init__(
            f"append failed trace={trace_id} table={table} stream={stream} "
            f"offset={offset} retries={retry_count}: {cause}"
        )
        self.trace_id = trace_id
        self.table = table
        self.stream = stream
        self.offset = offset
        self.retry_count = retry_count
        self.cause = cause


class AsyncWriterException(Exception):
    def __init__(self, trace_id: str, code: StatusCode, cause: Exception):
        super().__init__(f"async writer failed trace={trace_id} code={code}: {cause}")
        self.trace_id = trace_id
        self.code = code
        self.cause = cause
