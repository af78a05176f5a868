"""``fakebigquery`` — a Spark DataSource (Python DataSource API, Spark 4)
over the FakeBigQuery backend.

This is the connector-shaped surface of the engine.  The reference is a
Flink *sink* connector (`BigQueryStreamSink.java:50-55`); Spark's native
connector contract is DataSource V2, so the engine exposes the same
capabilities idiomatically:

- **batch write** = the reference's at-least-once default-stream append
  (`sink/defaultStream/BigQueryDefaultSinkWriter.java:60-80`): per-task
  chunked appends bounded by the 10 MB AppendRows limit (proactive
  equivalent of the split-on-too-large path,
  `sink/buffered/BigQueryBufferedSinkWriter.java:167-173`);
- **streaming write** = the reference's exactly-once buffered-stream 2PC
  (`sink/buffered/BigQuerySinkCommitter.java:23-50`): each task appends to
  a fresh BUFFERED stream at explicit offsets and the driver-side
  ``commit(messages, batchId)`` flushes them — visibility is atomic with
  epoch commit, and a crash before commit leaves the partial streams
  invisible forever (``abort`` finalizes them).  ``WriterCommitMessage`` is
  the structural twin of ``BigQueryCommittable`` (SURVEY §3.2);
- **read** = new scope the reference lacks (it never reads): partitioned
  scans with filter pushdown, shaped like the BigQuery Storage READ API —
  one input partition per (stream, row-range) "read stream", pushed
  filters applied server-side (here: inside the partition reader) as a row
  restriction.  At 100 TB the analogue is a read session fanning out to
  thousands of ranges; parallelism is the ``partitions`` option, decoupled
  from file layout.

Schema travels with the table (``schema.json`` written at commit), mirroring
the reference's fetch-schema-at-writer-creation behavior
(`client/BigQueryProtoClientProvider.java:45-46,89-101`).
"""

from __future__ import annotations

import json
import math
import os
import sys
import uuid
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal
from typing import Any, Iterable, Iterator, List, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from ..streaming.config import WriterSettings
from ..streaming.sinks import write_with_retry
from .fake_bigquery import DEFAULT_STREAM, FakeBigQuery, default_stream_name

SOURCE_NAME = "fakebigquery"
_DEFAULT_READ_PARTITIONS = 8
_DEFAULT_BATCH_ROWS = 1000
_ARROW_BATCH_ROWS = 8192

# BigQuery wildcard tables: `table=prefix*` unions every table whose name
# starts with the prefix, and the matched tail is exposed as this STRING
# pseudo-column (the `_TABLE_SUFFIX` analogue; lowercase to match the
# engine's column style).  Supported-comparison filters on it prune whole
# TABLES at split planning — the wildcard's point at scale.
SUFFIX_COL = "_table_suffix"


def _is_wildcard(table: str) -> bool:
    return table.endswith("*")


def _wildcard_tables(root: str, pattern: str) -> list[tuple[str, str]]:
    """Tables matching ``prefix*`` as (table_name, suffix), sorted.

    Matches directory names under ``tables/`` (the backend's catalog);
    a directory counts as a table once it has a persisted schema or any
    write stream.  Only a single TRAILING ``*`` is supported — exactly
    BigQuery's wildcard-table shape."""
    prefix = pattern[:-1]
    if "*" in prefix:
        raise ValueError(
            f"fakebigquery: only one trailing '*' is supported in a "
            f"wildcard table (got '{pattern}')"
        )
    dir_prefix = prefix.replace("/", "__")
    tdir = os.path.join(root, "tables")
    out: list[tuple[str, str]] = []
    if not os.path.isdir(tdir):
        return out
    for d in sorted(os.listdir(tdir)):
        if not d.startswith(dir_prefix):
            continue
        p = os.path.join(tdir, d)
        if os.path.isfile(os.path.join(p, "schema.json")) or os.path.isdir(
            os.path.join(p, "streams")
        ):
            out.append((prefix + d[len(dir_prefix):], d[len(dir_prefix):]))
    return out


# ---------------------------------------------------------------------------
# schema persistence (the "live table schema" the connector fetches)
# ---------------------------------------------------------------------------


def _schema_path(root: str, table: str) -> str:
    return os.path.join(root, "tables", table.replace("/", "__"), "schema.json")


def _save_schema(root: str, table: str, schema: StructType) -> None:
    path = _schema_path(root, table)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(schema.json())
    os.replace(tmp, path)


def _merge_schema(root: str, table: str, schema: StructType) -> None:
    """Additive evolution on write-commit, mirroring the reference's
    ``SchemaTools.updateTable`` add-new-fields diff
    (`schema/SchemaTools.java:87-100`): existing columns keep their
    position and type; columns new in this write are appended.  Rows
    written before a column existed read back as NULL for it."""
    path = _schema_path(root, table)
    if os.path.exists(path):
        with open(path) as f:
            existing = StructType.fromJson(json.load(f))
        have = {fld.name for fld in existing.fields}
        merged = StructType(
            existing.fields
            + [fld for fld in schema.fields if fld.name not in have]
        )
    else:
        merged = schema
    _save_schema(root, table, merged)


def _load_schema(root: str, table: str) -> StructType:
    path = _schema_path(root, table)
    if not os.path.exists(path):
        raise ValueError(
            f"fakebigquery: no schema for table '{table}' under '{root}' — "
            "write the table first or pass .schema(...) explicitly"
        )
    with open(path) as f:
        return StructType.fromJson(json.load(f))


# ---------------------------------------------------------------------------
# JSON <-> typed-row coercion
# ---------------------------------------------------------------------------


def _coerce(v: Any, dt: DataType) -> Any:
    """JSON-decoded value -> Python value for ``dt`` (rows are stored as
    JSON lines by the backend; timestamps/decimals arrive as strings)."""
    if v is None:
        return None
    if isinstance(dt, (LongType, IntegerType)):
        return int(v)
    if isinstance(dt, (DoubleType, FloatType)):
        return float(v)
    if isinstance(dt, StringType):
        return str(v)
    if isinstance(dt, BooleanType):
        return bool(v)
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return v if isinstance(v, datetime) else datetime.fromisoformat(str(v))
    if isinstance(dt, DateType):
        return v if isinstance(v, date) else date.fromisoformat(str(v))
    if isinstance(dt, DecimalType):
        return Decimal(str(v))
    if isinstance(dt, ArrayType):
        return [_coerce(x, dt.elementType) for x in v]
    return v


def _json_default(v: Any) -> Any:
    from pyspark.sql import Row as _Row

    if isinstance(v, _Row):  # nested struct
        return v.asDict(recursive=True)
    return str(v)  # datetime/date/Decimal -> ISO/plain text


# ---------------------------------------------------------------------------
# filter evaluation (the connector-side "row restriction")
# ---------------------------------------------------------------------------

_SIMPLE_FILTERS = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    In,
    IsNull,
    IsNotNull,
    StringStartsWith,
    StringEndsWith,
    StringContains,
)


def _supported(f: Filter) -> bool:
    inner = f.child if isinstance(f, Not) else f
    return isinstance(inner, _SIMPLE_FILTERS) and len(inner.attribute) == 1


def _eval_filter(f: Filter, row: dict) -> bool:
    if isinstance(f, Not):
        return not _eval_filter(f.child, row)
    v = row.get(f.attribute[0])
    if isinstance(f, IsNull):
        return v is None
    if isinstance(f, IsNotNull):
        return v is not None
    if v is None:
        return False  # SQL three-valued logic: NULL comparisons don't match
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    if isinstance(f, In):
        return v in f.value
    if isinstance(f, StringStartsWith):
        return isinstance(v, str) and v.startswith(f.value)
    if isinstance(f, StringEndsWith):
        return isinstance(v, str) and v.endswith(f.value)
    if isinstance(f, StringContains):
        return isinstance(v, str) and f.value in v
    raise AssertionError(f"unreachable: {f}")


# ---------------------------------------------------------------------------
# Arrow fast path: C++ JSON parse + vectorized filter evaluation
# ---------------------------------------------------------------------------


class _ArrowFastPathUnsupported(Exception):
    pass


def _session_timezone() -> str:
    """Spark session timezone, captured DRIVER-side at reader construction
    (readers are built on the driver, then pickled to workers)."""
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            return s.conf.get("spark.sql.session.timeZone")
    except Exception:
        pass
    return "UTC"


def _arrow_parse_type(dt):
    """Arrow type to PARSE the JSON lines as (temporal/decimal values are
    stored as strings by the writer and cast after parsing)."""
    import pyarrow as pa

    if (
        pa.types.is_integer(dt)
        or pa.types.is_floating(dt)
        or pa.types.is_boolean(dt)
        or pa.types.is_string(dt)
    ):
        return dt
    if pa.types.is_list(dt):
        return pa.list_(_arrow_parse_type(dt.value_type))
    if (
        pa.types.is_timestamp(dt)
        or pa.types.is_date(dt)
        or pa.types.is_decimal(dt)
    ):
        return pa.string()
    raise _ArrowFastPathUnsupported(str(dt))


def _arrow_read_slice(
    data_path: str,
    spark_schema: StructType,
    start: int,
    end: int,
    session_tz: str = "UTC",
):
    """Parse the JSON-lines stream file in C++, slice [start, end), and
    cast to the table's Arrow schema.  A real backend would serve the range
    directly (a Storage READ API stream); here planning is row-indexed so
    the parse covers the file and the slice is zero-copy."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.json as pj
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(spark_schema)
    parse_schema = pa.schema(
        [pa.field(f.name, _arrow_parse_type(f.type)) for f in target]
    )
    opts = pj.ParseOptions(
        explicit_schema=parse_schema, unexpected_field_behavior="ignore"
    )
    tbl = pj.read_json(
        data_path,
        read_options=pj.ReadOptions(use_threads=False),
        parse_options=opts,
    ).slice(start, end - start)
    cols = []
    for i, f in enumerate(target):
        col = tbl.column(i)
        if not col.type.equals(f.type):
            if pa.types.is_timestamp(f.type) and f.type.tz is not None:
                try:
                    # offset-carrying text (JVM to_json) casts directly
                    col = col.cast(f.type)
                except pa.ArrowInvalid:
                    # session-local wall-clock text (Python json.dumps):
                    # parse naive, pin the session zone, then convert
                    naive = col.cast(pa.timestamp(f.type.unit))
                    col = pc.assume_timezone(naive, timezone=session_tz).cast(f.type)
            else:
                col = col.cast(f.type)  # ISO text -> ntz-timestamp/date/decimal
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=target)


def _arrow_mask(f: "Filter", tbl):
    """Pushed filter -> boolean mask with SQL three-valued null semantics
    (null stays null; Table.filter drops null-mask rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(f, Not):
        return pc.invert(_arrow_mask(f.child, tbl))
    col = tbl[f.attribute[0]]
    if isinstance(f, IsNull):
        return pc.is_null(col)
    if isinstance(f, IsNotNull):
        return pc.is_valid(col)
    if isinstance(f, In):
        vs = pa.array(list(f.value), type=col.type)
        hit = pc.is_in(col, value_set=vs)
        null = pa.scalar(None, pa.bool_())
        return pc.if_else(pc.is_valid(col), hit, null)
    val = pa.scalar(f.value, type=col.type) if not isinstance(f.value, bool) else f.value
    if isinstance(f, EqualTo):
        return pc.equal(col, val)
    if isinstance(f, GreaterThan):
        return pc.greater(col, val)
    if isinstance(f, GreaterThanOrEqual):
        return pc.greater_equal(col, val)
    if isinstance(f, LessThan):
        return pc.less(col, val)
    if isinstance(f, LessThanOrEqual):
        return pc.less_equal(col, val)
    if isinstance(f, StringStartsWith):
        return pc.starts_with(col, pattern=f.value)
    if isinstance(f, StringEndsWith):
        return pc.ends_with(col, pattern=f.value)
    if isinstance(f, StringContains):
        return pc.match_substring(col, pattern=f.value)
    raise AssertionError(f"unreachable: {f}")


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


@dataclass
class _RangeSplit(InputPartition):
    """A (stream, row-range) split — the unit of read parallelism, like one
    stream of a BigQuery Storage read session.  For wildcard reads the
    split additionally names its table and carries the matched suffix
    (every row of a split shares one suffix, so the pseudo-column is a
    per-split constant)."""

    stream: str
    start: int
    end: int
    table: str = ""
    suffix: str = ""


class FakeBigQueryReader(DataSourceReader):
    """Batch reader over (stream, row-range) splits.

    Filters push down (``pushFilters``); columns do NOT — the Python
    DataSource API has no ``pruneColumns`` hook, so ``read()`` always
    ships ``out_schema``-wide Arrow batches and a post-``load`` select
    prunes JVM-side only.  Server-side pruning = narrow the schema via
    the ``fields`` option or an explicit ``.schema(...)`` (see
    :class:`FakeBigQueryDataSource`)."""

    def __init__(self, schema: StructType, options: dict):
        self.out_schema = schema
        self.root = options["root"]
        self.table = options["table"]
        self.only_visible = str(options.get("only_visible", "true")).lower() == "true"
        self.num_partitions = int(
            options.get("partitions", _DEFAULT_READ_PARTITIONS)
        )
        self.filters: List[Filter] = []
        self.suffix_filters: List[Filter] = []
        self.session_tz = _session_timezone()

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        """Accept every single-column comparison we can evaluate row-side
        (the Storage READ API row-restriction analogue); hand anything else
        back to Spark.  On a wildcard read, supported comparisons on the
        ``_table_suffix`` pseudo-column are consumed at SPLIT PLANNING —
        they prune whole tables (the suffix is constant per table, so
        table-level evaluation satisfies them exactly)."""
        unsupported = []
        wildcard = _is_wildcard(self.table)
        for f in filters:
            inner = f.child if isinstance(f, Not) else f
            if not _supported(f):
                unsupported.append(f)
            elif wildcard and inner.attribute[0] == SUFFIX_COL:
                self.suffix_filters.append(f)
            else:
                self.filters.append(f)
        return unsupported

    def _tables(self) -> list[tuple[str, str]]:
        """(table, suffix) pairs this read covers, after suffix pruning."""
        if not _is_wildcard(self.table):
            return [(self.table, "")]
        return [
            (t, sfx)
            for t, sfx in _wildcard_tables(self.root, self.table)
            if all(
                _eval_filter(f, {SUFFIX_COL: sfx})
                for f in self.suffix_filters
            )
        ]

    def partitions(self) -> Sequence[InputPartition]:
        """Plan (table, stream, row-range) splits proportional to stream
        sizes across every (suffix-pruned) table.

        Planning reads only stream METADATA (row counts), never data — the
        driver-side cost is O(#streams) however large the tables are."""
        bq = FakeBigQuery(self.root)
        sizes: list[tuple[str, str, str, int]] = []
        for table, sfx in self._tables():
            for stream in bq.list_streams(table):
                info = bq.get_write_stream(table, stream)
                n = info.flushed if self.only_visible else info.offset
                if n > 0:
                    sizes.append((table, sfx, stream, n))
        total = sum(n for *_, n in sizes)
        if total == 0:
            return [_RangeSplit(DEFAULT_STREAM, 0, 0)]
        splits: list[_RangeSplit] = []
        for table, sfx, stream, n in sizes:
            k = max(1, min(n, round(self.num_partitions * n / total)))
            step = math.ceil(n / k)
            for s in range(0, n, step):
                splits.append(
                    _RangeSplit(
                        stream, s, min(s + step, n), table=table, suffix=sfx
                    )
                )
        return splits

    def read(self, partition: _RangeSplit) -> Iterator:
        """Yield Arrow RecordBatches: parse the stream file with Arrow's
        C++ JSON-lines reader, slice the partition's row range, evaluate
        the pushed filters with Arrow compute kernels, and stream the
        result to the JVM as columnar Arrow — the Python-source analogue
        of the Storage READ API's Arrow wire format.  Falls back to the
        row-at-a-time path for types the fast path can't cast."""
        if partition.end <= partition.start:
            return
        table = partition.table or self.table
        # wildcard reads: parse the DATA fields, inject the per-split
        # constant suffix column at its schema position afterwards
        data_schema = StructType(
            [f for f in self.out_schema.fields if f.name != SUFFIX_COL]
        )
        has_suffix = len(data_schema.fields) != len(self.out_schema.fields)
        bq = FakeBigQuery(self.root)
        data_path, _ = bq._stream_paths(table, partition.stream)
        if has_suffix and not data_schema.fields:
            # degenerate projection: ONLY the pseudo-column was selected
            n = partition.end - partition.start
            yield from ((partition.suffix,) for _ in range(n))
            return
        try:
            tbl = _arrow_read_slice(
                data_path,
                data_schema,
                partition.start,
                partition.end,
                self.session_tz,
            )
        except _ArrowFastPathUnsupported:
            yield from self._read_rows(data_path, partition)
            return
        except Exception as e:  # unparseable text for the target type etc.
            import pyarrow as pa

            if not isinstance(e, pa.ArrowInvalid):
                raise
            yield from self._read_rows(data_path, partition)
            return
        for f in self.filters:
            mask = _arrow_mask(f, tbl)
            tbl = tbl.filter(mask)  # null mask entries drop (SQL 3VL)
        if has_suffix:
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema

            target = to_arrow_schema(self.out_schema)
            const = pa.array(
                [partition.suffix] * tbl.num_rows, type=pa.string()
            )
            cols = [
                const if f.name == SUFFIX_COL else tbl.column(f.name)
                for f in target
            ]
            tbl = pa.Table.from_arrays(cols, schema=target)
        yield from tbl.to_batches(max_chunksize=_ARROW_BATCH_ROWS)

    def _read_rows(self, data_path: str, partition: _RangeSplit) -> Iterator[Tuple]:
        fields = self.out_schema.fields
        filters = self.filters
        with open(data_path) as f:
            for i, line in enumerate(f):
                if i < partition.start:
                    continue
                if i >= partition.end:
                    break
                raw = json.loads(line)
                row = {
                    fld.name: partition.suffix
                    if fld.name == SUFFIX_COL
                    else _coerce(raw.get(fld.name), fld.dataType)
                    for fld in fields
                }
                if all(_eval_filter(flt, row) for flt in filters):
                    yield tuple(row[fld.name] for fld in fields)


# ---------------------------------------------------------------------------
# streaming reader (change capture over write streams)
# ---------------------------------------------------------------------------


class FakeBigQueryStreamReader(DataSourceStreamReader):
    """Micro-batch source over the backend's write streams.

    An offset is ``{stream_name: visible_row_count}`` — the structural twin
    of the BigQuery Storage READ API's per-stream cursor, and the read-side
    mirror of the write-side offsets the reference tracks per stream
    (`process/StreamState.java:47-49`).  Each micro-batch covers the delta
    ``start[s]..end[s]`` per stream, split into range partitions, so a
    table being appended to (by the default-stream or 2PC sink) is
    consumable as an exactly-once stream: rows enter an epoch exactly when
    they become *visible* (buffered rows appear only after FlushRows).

    Planning touches stream metadata only — O(#streams) per trigger
    regardless of table size.
    """

    def __init__(self, schema: StructType, options: dict):
        self.out_schema = schema
        self.root = options["root"]
        self.table = options["table"]
        self.rows_per_partition = int(options.get("stream_rows_per_partition", 10_000))
        # Admission control (maxOffsetsPerTrigger analogue / read-side
        # BatchTrigger): cap how many newly visible rows one micro-batch
        # admits, so a backlog drains in bounded batches instead of one
        # giant epoch.  0 = unbounded.
        self.max_rows_per_trigger = int(options.get("max_rows_per_trigger", 0))
        # Scope the admission cursor per QUERY, not per table: two
        # concurrent throttled readers of the same table each need the
        # full stream (a shared cursor would split it between them).  The
        # reader has no access to the sink's checkpoint path, so the query
        # identity is an explicit read option; the default (empty) keeps
        # one shared cursor per table for single-reader pipelines.
        self.cursor_id = str(options.get("cursor_id", ""))
        self.session_tz = _session_timezone()

    # -- admission cursor ---------------------------------------------------
    # Spark materializes SEVERAL reader instances for one query (stream
    # analysis + the execution runner), so admission state cannot live on
    # the instance: a fresh instance would hand back an offset BELOW what
    # Spark already committed, and offsets moving backward make the engine
    # re-read ranges (observed: duplicates).  The cursor is therefore a
    # monotonic per-table file in the backend, advanced under a file lock.

    def _cursor_path(self) -> str:
        name = "read_cursor.json"
        if self.cursor_id:
            import hashlib

            h = hashlib.sha1(self.cursor_id.encode()).hexdigest()[:12]
            name = f"read_cursor_{h}.json"
        return os.path.join(
            self.root, "tables", self.table.replace("/", "__"), name
        )

    def _advance_cursor(self, floor: dict, cap: int, latest: dict) -> dict:
        """max(stored, floor) advanced by at most ``cap`` rows toward
        ``latest``; stores and returns the new cursor (never decreasing)."""
        import fcntl

        path = self._cursor_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".lock", "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                cur: dict = {}
                if os.path.exists(path):
                    with open(path) as f:
                        cur = json.load(f)
                for s, v in floor.items():
                    cur[s] = max(int(cur.get(s, 0)), int(v))
                budget = cap if cap > 0 else None
                for s, hi in sorted(latest.items()):
                    lo = int(cur.get(s, 0))
                    take = int(hi) - lo
                    if budget is not None:
                        take = min(take, budget)
                    if take > 0:
                        cur[s] = lo + take
                        if budget is not None:
                            budget -= take
                    if budget == 0:
                        break
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(cur, f)
                os.replace(tmp, path)
                return cur
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _snapshot(self) -> dict:
        bq = FakeBigQuery(self.root)
        out = {}
        for stream in bq.list_streams(self.table):
            n = bq.get_write_stream(self.table, stream).flushed
            if n > 0:
                out[stream] = n
        return out

    def initialOffset(self) -> dict:
        return {}

    def latestOffset(self) -> dict:
        latest = self._snapshot()
        if self.max_rows_per_trigger <= 0:
            return latest
        return self._advance_cursor({}, self.max_rows_per_trigger, latest)

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        if self.max_rows_per_trigger > 0 and end:
            # absorb Spark's authoritative position (checkpoint restarts
            # with a stale/absent cursor file)
            self._advance_cursor(end, 0, {})
        splits: list[_RangeSplit] = []
        for stream, hi in end.items():
            lo = int(start.get(stream, 0))
            hi = int(hi)
            for s in range(lo, hi, self.rows_per_partition):
                splits.append(_RangeSplit(stream, s, min(s + self.rows_per_partition, hi)))
        # Spark requires >=1 partition per batch; an empty batch reads nothing.
        return splits or [_RangeSplit(DEFAULT_STREAM, 0, 0)]

    def read(self, partition: _RangeSplit) -> Iterator[Tuple]:
        reader = FakeBigQueryReader.__new__(FakeBigQueryReader)
        reader.out_schema = self.out_schema
        reader.root, reader.table = self.root, self.table
        reader.only_visible, reader.filters = True, []
        reader.session_tz = self.session_tz
        return reader.read(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in Spark's checkpoint WAL

    def stop(self) -> None:
        pass


# ---------------------------------------------------------------------------
# batch writer (at-least-once, default stream)
# ---------------------------------------------------------------------------


@dataclass
class _AppendResult(WriterCommitMessage):
    rows: int
    appends: int


class FakeBigQueryBatchWriter(DataSourceArrowWriter):
    """r14: an ARROW writer (``DataSourceArrowWriter``) — the row-based
    ``DataSourceWriter`` shipped every row to the Python worker as a
    pickled ``Row``, and the transfer alone was the whole write cost
    (measured at sf0.1: 1.5 s consume-only vs 1.5 s full — serialization
    and appends were noise).  Arrow batches cross the boundary columnar;
    rows serialize to the identical JSON strings (same key order, same
    ``separators``, same ``_json_default`` text forms), so the backend
    files and the read-back values are unchanged."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["root"]
        self.table = options["table"]
        self.batch_rows = int(options.get("batch_rows", _DEFAULT_BATCH_ROWS))
        self.max_bytes = int(options.get("max_append_bytes", 0)) or None

    def _chunk_strings(self, lines: Iterator[str]) -> Iterator[list[str]]:
        """Count- and byte-bounded chunking: stay under the AppendRows limit
        proactively instead of splitting reactively.  Rows are serialized
        exactly once (by the caller); the backend appends the strings
        verbatim."""
        bq_limit = self.max_bytes or FakeBigQuery(self.root).max_append_bytes
        budget = bq_limit // 2  # headroom: JSON size estimate is pre-framing
        buf: list[str] = []
        size = 0
        for s in lines:
            sz = len(s) + 1
            if buf and (len(buf) >= self.batch_rows or size + sz > budget):
                yield buf
                buf, size = [], 0
            buf.append(s)
            size += sz
        if buf:
            yield buf

    def _serialize_rows(self, iterator) -> Iterator[str]:
        """Row-iterator serialization (the pre-r14 path; kept for callers
        that still hold plain row tuples)."""
        names = [f.name for f in self.schema.fields]
        for row in iterator:
            yield json.dumps(
                dict(zip(names, row)), separators=(",", ":"), default=_json_default
            )

    def _serialize_batches(self, batches) -> Iterator[str]:
        """Arrow RecordBatches -> the same JSON strings ``_serialize_rows``
        produces: ``to_pylist`` yields one dict per row in schema field
        order (identical key order to ``dict(zip(names, row))``), and the
        Python values (int/float/str/datetime/Decimal/list/dict) are the
        same objects the pickled-Row path carried, so ``json.dumps`` with
        the same options emits byte-identical lines for every type the
        writers see."""
        for batch in batches:
            for d in batch.to_pylist():
                yield json.dumps(
                    d, separators=(",", ":"), default=_json_default
                )

    def _chunks(self, iterator) -> Iterator[list[str]]:
        """Backward-compatible row-iterator chunking (stream-writer reuse
        and tests)."""
        yield from self._chunk_strings(self._serialize_rows(iterator))

    def write(self, iterator) -> _AppendResult:
        """Chunked appends through the full retry state machine (A12-A14:
        status-code branching, pause-retry, recursive oversized split) —
        the same writer core the foreachBatch sinks use.  ``iterator``
        yields ``pyarrow.RecordBatch`` (the Arrow writer contract)."""
        bq = FakeBigQuery(self.root)
        stream = default_stream_name(self.table)
        settings = WriterSettings()
        rows = appends = 0
        for chunk in self._chunk_strings(self._serialize_batches(iterator)):
            rows += write_with_retry(bq, self.table, stream, chunk, -1, settings)
            appends += 1
        return _AppendResult(rows=rows, appends=appends)

    def commit(self, messages) -> None:
        _merge_schema(self.root, self.table, self.schema)

    def abort(self, messages) -> None:
        # Default-stream appends are immediately visible: at-least-once, a
        # failed job may leave rows behind — exactly the reference's
        # default-sink guarantee (job restart implies possible duplicates).
        pass


# ---------------------------------------------------------------------------
# streaming writer (exactly-once, buffered streams + 2PC)
# ---------------------------------------------------------------------------


@dataclass
class _BufferedResult(WriterCommitMessage):
    stream: str
    rows: int


class FakeBigQueryStreamWriter(DataSourceStreamArrowWriter):
    """r14: Arrow variant (``DataSourceStreamArrowWriter``) for the same
    reason as :class:`FakeBigQueryBatchWriter` — the pickled-Row transfer
    WAS the write cost; the 2PC protocol (fresh buffered stream per task,
    offset-checked appends, commit-time flush) is unchanged."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["root"]
        self.table = options["table"]
        self.batch_rows = int(options.get("batch_rows", _DEFAULT_BATCH_ROWS))

    def write(self, iterator) -> _BufferedResult:
        """Append this partition's rows to a FRESH buffered stream at
        explicit offsets.  Rows are invisible until the epoch commit —
        a replay after a crash re-writes into a new stream and the orphan
        stays unflushed, so visibility is exactly-once."""
        bq = FakeBigQuery(self.root)
        stream = bq.create_write_stream(
            self.table, "BUFFERED",
            name=f"{self.table}/streams/ep_{uuid.uuid4().hex[:16]}",
        )
        writer = FakeBigQueryBatchWriter.__new__(FakeBigQueryBatchWriter)
        writer.schema, writer.root, writer.table = self.schema, self.root, self.table
        writer.batch_rows, writer.max_bytes = self.batch_rows, None
        settings = WriterSettings()
        offset = 0
        for chunk in writer._chunk_strings(writer._serialize_batches(iterator)):
            offset += write_with_retry(
                bq, self.table, stream, chunk, offset, settings
            )
        return _BufferedResult(stream=stream, rows=offset)

    def commit(self, messages, batchId: int) -> None:
        """FlushRows per stream — the committer half of the 2PC
        (`sink/buffered/BigQuerySinkCommitter.java:23-50`); flushing at or
        below the current point is tolerated, so commit replay is a no-op."""
        bq = FakeBigQuery(self.root)
        for m in messages:
            if m is not None and m.rows > 0:
                bq.flush_rows(self.table, m.stream, m.rows - 1)
        _merge_schema(self.root, self.table, self.schema)

    def abort(self, messages, batchId: int) -> None:
        """Finalize (never flush) the epoch's streams: buffered rows stay
        permanently invisible."""
        bq = FakeBigQuery(self.root)
        for m in messages:
            if m is not None:
                try:
                    bq.finalize_stream(self.table, m.stream)
                except Exception:
                    pass  # stream may not exist if the task died pre-create


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------


class FakeBigQueryDataSource(DataSource):
    """``spark.read.format("fakebigquery").option("root", ...).option("table", ...)``.

    Options: ``root`` (backend directory), ``table``, ``partitions`` (read
    parallelism), ``only_visible`` (read uncommitted rows when false),
    ``fields`` (comma-separated server-side field list, below),
    ``batch_rows`` / ``max_append_bytes`` (writer chunking).

    **Wildcard tables** (batch read only): ``table=prefix*`` unions every
    table whose name starts with the prefix — BigQuery's wildcard-table
    idiom — exposing the matched tail as the STRING pseudo-column
    ``_table_suffix`` (the ``_TABLE_SUFFIX`` analogue).  All matched
    tables must share one schema.  Supported-comparison filters on the
    pseudo-column prune whole TABLES at split planning, so
    ``WHERE _table_suffix = 'click'`` plans splits for one table however
    many the wildcard matches.

    **Column-width contract.** The PySpark DataSource API has no
    ``pruneColumns`` hook, so a ``.select(...)`` placed AFTER ``.load()``
    cannot narrow what crosses the Python->JVM Arrow boundary: the reader
    always materializes and ships its full reader schema, and Spark
    projects afterwards.  To prune server-side — the ``selected_fields``
    of a real Storage READ API session — narrow the reader schema itself,
    either with ``option("fields", "a,b")`` (subsets the catalog schema,
    in the requested order) or by passing an explicit narrow
    ``.schema(...)``.  Both paths reach the Arrow JSON parser as an
    explicit schema with ``unexpected_field_behavior="ignore"``, so
    unlisted columns are never parsed, materialized, or transferred.
    """

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def _opts(self) -> dict:
        for req in ("root", "table"):
            if req not in self.options:
                raise ValueError(f"fakebigquery: missing required option '{req}'")
        return dict(self.options)

    def schema(self) -> StructType:
        opts = self._opts()
        if _is_wildcard(opts["table"]):
            matches = _wildcard_tables(opts["root"], opts["table"])
            if not matches:
                raise ValueError(
                    f"fakebigquery: no tables match wildcard "
                    f"'{opts['table']}' under '{opts['root']}'"
                )
            schemas = [
                (t, _load_schema(opts["root"], t)) for t, _ in matches
            ]
            first_t, first_s = schemas[0]
            for t, s in schemas[1:]:
                if s != first_s:
                    raise ValueError(
                        "fakebigquery: wildcard tables have mismatched "
                        f"schemas ('{first_t}' vs '{t}'); a wildcard read "
                        "requires identical schemas"
                    )
            from pyspark.sql.types import StringType, StructField

            full = StructType(
                first_s.fields + [StructField(SUFFIX_COL, StringType())]
            )
        else:
            full = _load_schema(opts["root"], opts["table"])
        if "fields" not in opts:
            return full
        # server-side field list (Storage READ API selected_fields): the
        # catalog schema narrows BEFORE the reader exists, so unlisted
        # columns never reach the Arrow parse or the JVM transfer
        by_name = {f.name: f for f in full.fields}
        names = [s.strip() for s in str(opts["fields"]).split(",") if s.strip()]
        unknown = [n for n in names if n not in by_name]
        if unknown:
            raise ValueError(
                f"fakebigquery: fields option names unknown columns "
                f"{unknown}; table '{opts['table']}' has "
                f"{sorted(by_name)}"
            )
        if not names:
            raise ValueError("fakebigquery: fields option is empty")
        return StructType([by_name[n] for n in names])

    def reader(self, schema: StructType) -> DataSourceReader:
        return FakeBigQueryReader(schema, self._opts())

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        opts = self._opts()
        if _is_wildcard(opts["table"]):
            raise ValueError(
                "fakebigquery: cannot WRITE to a wildcard table "
                f"('{opts['table']}') — wildcards are a read-side union; "
                "route writes with MultiTableSink/MultiTableBufferedSink"
            )
        if overwrite:
            import shutil

            table_dir = os.path.join(
                opts["root"], "tables", opts["table"].replace("/", "__")
            )
            shutil.rmtree(table_dir, ignore_errors=True)
        return FakeBigQueryBatchWriter(schema, opts)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return FakeBigQueryStreamWriter(schema, self._opts())

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        opts = self._opts()
        if _is_wildcard(opts["table"]):
            raise ValueError(
                "fakebigquery: wildcard tables are batch-read only "
                f"(got '{opts['table']}' on readStream)"
            )
        return FakeBigQueryStreamReader(schema, opts)


def register(spark) -> None:
    """Register the source for this session (idempotent).

    Two delivery paths, because two kinds of Python workers deserialize the
    DataSource:

    - executor data workers get the package via ``addPyFile``;
    - the driver-side *streaming source planning runner*
      (``python_streaming_source_runner.py``) is a separate process that
      does NOT see pyFiles — so the connector's module closure is marked
      pickle-by-value, making the pickled DataSource self-contained and
      importable-from-nowhere."""
    from pyspark import cloudpickle

    from .. import session as _session
    from ..streaming import batching as _batching
    from ..streaming import client_provider as _cprov
    from ..streaming import config as _config
    from ..streaming import errors as _errors
    from ..streaming import sinks as _sinks
    from . import fake_bigquery as _fbq

    _session.ensure_package_on_executors(spark)
    # One consistent pickle graph: every module whose classes cross the
    # worker boundary is by-value, so e.g. the BigQueryError raised by the
    # unpickled FakeBigQuery IS the class write_with_retry catches.
    # client_provider MUST ride along: the sinks' writer factories are
    # provider objects from that module, and a by-reference provider
    # would hand workers the REAL FakeBigQuery whose exception classes
    # the by-value write_with_retry cannot catch (the round-11 ordering
    # bug: any test registering this DataSource made later sink replay
    # tests' ALREADY_EXISTS trims miss on class identity).
    for mod in (
        _errors, _batching, _config, _sinks, _fbq, _cprov,
        sys.modules[__name__],
    ):
        cloudpickle.register_pickle_by_value(mod)
    spark.dataSource.register(FakeBigQueryDataSource)
