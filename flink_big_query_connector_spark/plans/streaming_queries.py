"""Structured Streaming queries (SURVEY.md §2 B21–B26).

Every query replays the ``events`` parquet table as a real file-source
stream (chunked into time-ordered files, one file per micro-batch via
``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow``) and runs to completion
into an in-memory sink; the returned DataFrame is the final sink table.

The DuckDB oracles are exact because Structured Streaming's semantics are
deterministic given a deterministic file arrival order:

- append-mode windowed/session aggregations emit exactly the windows whose
  end <= final watermark (``max(event_time) - delay``);
- late rows (delivered in a later chunk than their timestamp warrants) are
  dropped iff their window closed before the batch that carries them — the
  oracle recomputes the per-batch watermark in SQL;
- streaming ``dropDuplicates`` over key columns equals batch ``DISTINCT``.

Reference parity: the reference batches with processing-time-only triggers
(``process/BatchTrigger.java:31-56``, ``GlobalWindows``) and has **no**
event-time support (SURVEY §2 "explicitly absent"); B21–B24 are the
event-time surface mandated for the Spark engine, and B25/B26 re-express
the reference's batching (``process/RowBatcher.java:21-26``) and sink
delivery guarantees (``sink/defaultStream/BigQueryDefaultSinkWriter.java``)
as registry-checkable queries.
"""

from __future__ import annotations

import itertools
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import numeric
from ..functions.numeric import dbl, dec
from ..sources.tables import load_tables, ts_event_time, ts_micros
from ..scratch import scratch_dir, unique_name
from .registry import register

# ---------------------------------------------------------------------------
# event-time plumbing
# ---------------------------------------------------------------------------

# event-time extraction lives in sources.tables.ts_event_time: it inspects
# the actual read schema (int64-nanos vs timestamp-micros) and ALWAYS yields
# a plain TIMESTAMP — withWatermark rejects TIMESTAMP_NTZ
# (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so the raw column is never legal
# event time on the NTZ read.

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _ns(iso_day: str) -> int:
    """Nanoseconds since epoch for a UTC date string (chunk boundaries)."""
    d = datetime.fromisoformat(iso_day).replace(tzinfo=timezone.utc)
    return int((d - _EPOCH).total_seconds()) * 1_000_000_000


# events span 2024-01-01 .. 2024-01-31 at every sf.
# Three ordered chunks (not four): every ordered-scheme oracle depends only
# on the FINAL watermark, and one fewer micro-batch saves a state-store
# commit cycle per streaming query.
CHUNK_BOUNDS = [_ns(d) for d in ("2024-01-11", "2024-01-21")]
LATE_SPLIT_NS = _ns("2024-01-20")
MID_SPLIT_NS = _ns("2024-01-26")
LATE_MOD = 13  # event_id % 13 == 0 rows older than the split arrive late

_chunk_cache: dict[tuple, str] = {}
_name_counter = itertools.count()


def _write_chunks(sf_dir: str, scheme: str) -> str:
    """Materialize the events table as ordered chunk files for replay.

    ``ordered``: 3 files split at fixed date boundaries — pure in-order
    arrival, nothing is ever late.  ``late``: 2 files split at
    2024-01-20, except rows with ``event_id % 13 == 0`` older than the
    split travel in file 1 — deterministic late arrivals.

    Driver-side pyarrow write; at production scale the chunks already
    exist (the stream IS arriving over time), so this helper is test-only
    replay machinery, not a scale path.
    """
    key = (sf_dir, scheme)
    if key in _chunk_cache and os.path.isdir(_chunk_cache[key]):
        return _chunk_cache[key]
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    # normalize ts to int64 NANOS regardless of the on-disk unit (the
    # chunk-boundary constants are nanos); cast through timestamp[ns] so
    # s/ms/us units all land at the right magnitude instead of only us.
    ts_col = tbl["ts"]
    if pa.types.is_timestamp(ts_col.type):
        ts = pc.cast(pc.cast(ts_col, pa.timestamp("ns")), "int64")
    else:
        ts = pc.cast(ts_col, "int64")  # already integer nanos
    out_dir = scratch_dir(f"events_{scheme}_")
    if scheme == "ordered":
        bounds = [None, *CHUNK_BOUNDS, None]
        masks = []
        for i in range(len(bounds) - 1):
            m = pc.greater_equal(ts, bounds[i]) if bounds[i] else None
            if bounds[i + 1]:
                hi = pc.less(ts, bounds[i + 1])
                m = hi if m is None else pc.and_(m, hi)
            masks.append(m)
    else:  # late
        # Three files, not two: Spark's late-event filter watermark lags the
        # eviction watermark by one batch (filter at batch N uses max event
        # time through batch N-2), so late rows must arrive two batches
        # after the data that defines their filter watermark to actually be
        # dropped (verified empirically; see b23 docstring).
        import numpy as np
        import pyarrow as pa

        ts_np = ts.to_numpy()
        ids_np = pc.cast(tbl["event_id"], "int64").to_numpy()
        is_old = ts_np < LATE_SPLIT_NS
        is_mid = (~is_old) & (ts_np < MID_SPLIT_NS)
        on_time_old = np.asarray(is_old & (ids_np % LATE_MOD != 0))
        masks = [
            pa.array(on_time_old),
            pa.array(is_mid),
            pa.array(~on_time_old & ~is_mid),
        ]
    for i, m in enumerate(masks):
        chunk = tbl if m is None else tbl.filter(m)
        path = os.path.join(out_dir, f"chunk{i:02d}.parquet")
        pq.write_table(chunk, path)
        # file source orders by (mtime, path): force arrival order
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    _chunk_cache[key] = out_dir
    return out_dir


def _events_stream(spark: SparkSession, sf_dir: str, scheme: str = "ordered"):
    """events as a file-source stream, one chunk file per micro-batch."""
    chunk_dir = _write_chunks(sf_dir, scheme)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )
    return stream.withColumn("etime", ts_event_time(stream))


STREAM_SHUFFLE_PARTITIONS = "2"  # measured: 4->2 cuts replay ~18%


def _adaptive_stream_partitions(
    sf_dir: str, table: str = "events", rows_per_partition: int = 100_000
) -> str:
    """Stateful-op partition count scaled to the streamed table's size.

    The pinned count freezes into the checkpoint at first batch, so it
    must be chosen at plan time — and it is a genuine two-sided
    trade-off, measured both ways: at driver scales (sf0.1, second-long
    replays) per-partition checkpoint snapshot I/O dominates and 2 is
    optimal (the 4->2 ~18% note above); at sf1 the per-KEY work of a
    keyed-state operator dominates and serializing 15k keys' state
    round-trips into 2 tasks starved the cores — the native-TWS offset
    assigner measured 114 s @2 vs 44.6 s @10 vs 43.1 s @24 at sf1
    (round 11, idle box).  One partition per ~100k input rows keeps the
    driver scales EXACTLY at the measured-optimal 2 and reaches ~10 at
    sf1 / 32 at sf10 — the "size to key cardinality / executor count"
    production rule, made concrete.  Parquet footer metadata only; no
    Spark job."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        n = pq.ParquetFile(
            os.path.join(sf_dir, f"{table}.parquet")
        ).metadata.num_rows
    except (OSError, pa.ArrowInvalid, KeyError) as exc:
        # Narrow on purpose (ADVICE r11): a typo'd sf_dir or a corrupt
        # footer falls back LOUDLY to the fixed floor instead of being
        # swallowed — a silent '2' would reintroduce the 114 s per-key
        # starvation at sf1 this helper exists to fix.
        import warnings

        warnings.warn(
            f"_adaptive_stream_partitions: cannot read {table} footer "
            f"under {sf_dir!r} ({exc}); falling back to the fixed "
            f"{STREAM_SHUFFLE_PARTITIONS}-partition floor",
            stacklevel=2,
        )
        return STREAM_SHUFFLE_PARTITIONS
    return str(
        min(
            32,
            max(int(STREAM_SHUFFLE_PARTITIONS), n // rows_per_partition),
        )
    )


class _stream_partitions:
    """Pin a small stateful-op partition count for the replay streams.

    Stateful operators snapshot every state partition to the checkpoint on
    every micro-batch, and AQE cannot coalesce them (the count is frozen
    into the checkpoint at first batch) — 32 partitions of per-batch file
    IO dominates these second-long replays.  Production streams size this
    to key cardinality / executor count; the conf is restored afterwards so
    batch queries keep the session default.  Keyed-state-heavy queries
    pass ``n=_adaptive_stream_partitions(sf_dir)`` so the pin grows with
    the data instead of starving per-key work at scale."""

    def __init__(self, spark: SparkSession, n: str | None = None):
        self.spark = spark
        self.n = n or STREAM_SHUFFLE_PARTITIONS

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def _run_to_table(
    df: DataFrame, mode: str, checkpoint: str | None = None
) -> DataFrame:
    """Run the streaming DataFrame to completion into a memory sink.
    Pass ``checkpoint`` to resume the same query across calls (restart
    tests); default is a fresh scratch checkpoint per run."""
    name = f"stream_result_{os.getpid()}_{next(_name_counter)}"
    ckpt = checkpoint or scratch_dir("ckpt_")
    with _stream_partitions(df.sparkSession):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return df.sparkSession.table(name)


# DuckDB fragments ----------------------------------------------------------

_US = 1_000_000
_ORACLE_TS = "ts"  # duckdb reads the same parquet as TIMESTAMP (micros)


def _sql_bucket(col: str, seconds: int, offset_s: int = 0) -> str:
    """Epoch-aligned window start via exact integer micros arithmetic."""
    w = seconds * _US
    o = offset_s * _US
    return (
        f"make_timestamp((((epoch_us({col}) - {o}) // {w}) * {w}) + {o})"
    )


# Watermark ledger for the b23 late-data side-output router.  Module-level
# (not closed over) so the replay/idempotence contract is unit-testable:
# tests/test_streaming_queries.py pins both properties.


def _ledger_record(cum: dict[int, int | None], batch_id: int,
                   hi: int | None) -> None:
    """Record max-event-time-through-``batch_id`` into the ledger.

    ``hi`` is the batch's own max (None for an empty batch).  Keyed by
    batch_id: a re-delivered batch (task retry) recomputes the SAME value
    and overwrites its own entry — idempotent — instead of appending a
    duplicate that would shift every later positional lookup."""
    prev = cum.get(batch_id - 1)
    cum[batch_id] = (
        prev if hi is None else (hi if prev is None else max(prev, hi))
    )


def _ledger_watermark(cum: dict[int, int | None], batch_id: int,
                      delay_us: int) -> int | None:
    """Filter watermark for ``batch_id``: max through batch_id-2, minus
    the delay — the two-batch lag Spark's own late-event filter applies
    (eviction lags one batch, the filter one more)."""
    base = cum.get(batch_id - 2)
    return base - delay_us if base is not None else None


# ---------------------------------------------------------------------------
# B21 — tumbling & sliding event-time windows
# ---------------------------------------------------------------------------


@register(
    "b21_stream_tumbling_window",
    oracle=f"""
        WITH agg AS (
          SELECT {_sql_bucket(_ORACLE_TS, 21600)} AS window_start,
                 {_sql_bucket(_ORACLE_TS, 21600)} + INTERVAL 6 HOUR AS window_end,
                 event_type,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          FROM events GROUP BY 1, 2, 3
        )
        SELECT * FROM agg
        WHERE window_end <= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
    """,
    tags=("streaming",),
)
def b21_stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour tumbling event-time windows per event_type, append mode with a
    1-hour watermark: only windows the watermark has closed are emitted."""
    load_tables(spark, sf_dir)  # session tuning (tz, nanosAsLong)
    ev = _events_stream(spark, sf_dir)
    out = (
        ev.withWatermark("etime", "1 hour")
        .groupBy(F.window("etime", "6 hours"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec(F.col("value")))).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return _run_to_table(out, "append")


@register(
    "b21_stream_sliding_window",
    oracle=f"""
        WITH starts AS (
          SELECT e.*, {_sql_bucket('e.ts', 21600)} - (k.k * INTERVAL 6 HOUR)
                       AS window_start
          FROM events e CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
        )
        SELECT window_start, window_start + INTERVAL 12 HOUR AS window_end,
               COUNT(*) AS n
        FROM starts
        GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def b21_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-hour windows sliding every 6 hours, complete mode (every event
    lands in exactly two windows; the sink holds the final state)."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    out = (
        ev.groupBy(F.window("etime", "12 hours", "6 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
        )
    )
    return _run_to_table(out, "complete")


@register(
    "b21_stream_interval_join",
    oracle="""
        SELECT c.user_id AS user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
    tags=("streaming", "join"),
)
def b21_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join: each click pairs with the same
    user's purchases in the following 30 minutes.

    Both sides carry a 1-hour watermark; Spark retains join state only
    while a row can still match (event time >= watermark - interval) and
    emits inner matches eagerly.  Replay is fully in-order (`ordered`
    chunking), so a left row is never evicted before its last possible
    match arrives — proof: a purchase in batch j has ptime > bound(j-1),
    so any click it matches has ctime > bound(j-1) - 30min, while eviction
    at batch j requires ctime < bound(j-1) - delay - 30min — impossible
    for delay >= 0.  The streamed result therefore equals the batch
    interval join bit-for-bit, which is the DuckDB oracle.

    At 100 TB: state is bounded by (watermark delay + interval) × ingest
    rate per key partition; the join shuffles both sides on user_id once.
    """
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("etime").alias("ctime"),
        )
        .withWatermark("ctime", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("etime").alias("ptime"),
        )
        .withWatermark("ptime", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            ptime >= ctime AND
            ptime <= ctime + INTERVAL 30 MINUTES
            """
        ),
    ).select("user_id", "click_id", "purchase_id")
    return _run_to_table(joined, "append")


@register(
    "b21_stream_outer_interval_join",
    oracle="""
        WITH pairs AS (
          SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
          FROM events c JOIN events p
            ON c.user_id = p.user_id
           AND c.event_type = 'click' AND p.event_type = 'purchase'
           AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        ),
        -- Two watermarked inputs: the global watermark is the MIN of the
        -- per-side maxima (multipleWatermarkPolicy=min), ms-truncated
        -- (Spark's event-time stats are millisecond precision).
        final_wm AS (
          SELECT make_timestamp(
                   (LEAST(
                      (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'click'),
                      (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase')
                    ) // 1000) * 1000)
                 - INTERVAL 1 HOUR AS wm
        )
        SELECT user_id, click_id, purchase_id FROM pairs
        UNION ALL
        SELECT c.user_id, c.event_id AS click_id, NULL AS purchase_id
        FROM events c
        WHERE c.event_type = 'click'
          AND c.ts + INTERVAL 30 MINUTE < (SELECT wm FROM final_wm)
          AND NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.click_id = c.event_id)
    """,
    tags=("streaming", "join"),
)
def b21_stream_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: matched pairs emit eagerly
    (same as the inner join); a click with NO purchase inside its 30-minute
    window emits a null-padded row only once the watermark proves the
    window closed (state eviction).  Clicks whose window is still open at
    end-of-stream — ``ctime + 30min >= max(ts) - 1h`` — never emit, and the
    oracle reproduces exactly that boundary.  Requires the no-data final
    micro-batch (Spark default) to advance the terminal watermark."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("etime").alias("ctime"),
        )
        .withWatermark("ctime", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("etime").alias("ptime"),
        )
        .withWatermark("ptime", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            ptime >= ctime AND
            ptime <= ctime + INTERVAL 30 MINUTES
            """
        ),
        "leftOuter",
    ).select("user_id", "click_id", "purchase_id")
    return _run_to_table(joined, "append")


@register(
    "b21_stream_join_then_window",
    oracle="""
        WITH pairs AS (
          SELECT c.ts AS cts
          FROM events c JOIN events p
            ON c.user_id = p.user_id
           AND c.event_type = 'click' AND p.event_type = 'purchase'
           AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        ),
        final_wm AS (
          SELECT make_timestamp(
                   (LEAST(
                      (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'click'),
                      (SELECT MAX(epoch_us(ts)) FROM events WHERE event_type = 'purchase')
                    ) // 1000) * 1000)
                 - INTERVAL 1 HOUR AS wm
        )
        SELECT make_timestamp((epoch_us(cts) // 86400000000) * 86400000000)
                 AS window_start,
               make_timestamp((epoch_us(cts) // 86400000000) * 86400000000)
                 + INTERVAL 1 DAY AS window_end,
               COUNT(*) AS conversions
        FROM pairs
        GROUP BY 1, 2
        HAVING window_end <= (SELECT wm FROM final_wm)
    """,
    tags=("streaming", "join", "chained-stateful"),
)
def b21_stream_join_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators: stream-stream interval join feeding a
    downstream tumbling-window aggregation in one query (daily conversion
    counts).  Spark >= 3.5 propagates the watermark through the join, so
    the window operator evicts on the same min-of-inputs watermark; with
    in-order replay the join output is exact (see b21_stream_interval_join)
    and the emitted windows are exactly those closed by the final
    watermark."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("etime").alias("ctime"))
        .withWatermark("ctime", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("etime").alias("ptime"),
        )
        .withWatermark("ptime", "1 hour")
    )
    pairs = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            ptime >= ctime AND
            ptime <= ctime + INTERVAL 30 MINUTES
            """
        ),
    )
    out = (
        pairs.groupBy(F.window("ctime", "1 day"))
        .agg(F.count(F.lit(1)).alias("conversions"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "conversions",
        )
    )
    return _run_to_table(out, "append")


# ---------------------------------------------------------------------------
# B22 — session windows
# ---------------------------------------------------------------------------


@register(
    "b22_stream_session_window",
    oracle=f"""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - LAG(ts) OVER w > INTERVAL 12 HOUR
                      OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
          SELECT user_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS sid
          FROM marked
        ),
        agg AS (
          SELECT user_id, MIN(ts) AS session_start,
                 MAX(ts) + INTERVAL 12 HOUR AS session_end,
                 COUNT(*) AS n_events
          FROM sess GROUP BY user_id, sid
        )
        SELECT * FROM agg
        WHERE session_end <= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
    """,
    tags=("streaming",),
)
def b22_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 12-hour inactivity gap (append mode;
    sessions emitted once the watermark passes session end).  Oracle is the
    batch gaps-and-islands equivalent."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    out = (
        ev.withWatermark("etime", "1 hour")
        .groupBy(F.session_window("etime", "12 hours"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_table(out, "append")


@register(
    "b22_session_dynamic_gap",
    oracle="""
        WITH g AS (
          SELECT user_id, ts,
                 ts + CASE WHEN event_type IN ('purchase', 'signup')
                           THEN INTERVAL 16 HOUR
                           ELSE INTERVAL 8 HOUR END AS ev_end
          FROM events
        ),
        marked AS (
          SELECT user_id, ts, ev_end,
                 CASE WHEN MAX(ev_end) OVER (PARTITION BY user_id
                          ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) >= ts
                      THEN 0 ELSE 1 END AS new_sess
          FROM g
        ),
        sess AS (
          SELECT user_id, ts, ev_end,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts)
                     AS sid
          FROM marked
        ),
        agg AS (
          SELECT user_id, MIN(ts) AS session_start,
                 MAX(ev_end) AS session_end,
                 COUNT(*) AS n_events
          FROM sess GROUP BY user_id, sid
        )
        SELECT * FROM agg
        WHERE session_end <= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
    """,
    tags=("streaming",),
)
def b22_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC per-event gap (``session_window``
    with a Column gap — Spark's expression-gap sessionization): purchase
    and signup events hold a session open 16 hours, everything else 8 —
    the checkout-flow idiom where high-intent actions extend the
    session.  Unlike the constant-gap oracle's LAG test, dynamic ends
    are not monotone, so the batch twin is gaps-and-islands on the
    RUNNING MAX of event ends: a row starts a new session iff it opens
    after every previous event's hold expired.  Append mode emits only
    watermark-closed sessions; same cutoff as the constant-gap query."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    gap = F.when(
        F.col("event_type").isin("purchase", "signup"), F.lit("16 hours")
    ).otherwise(F.lit("8 hours"))
    out = (
        ev.withWatermark("etime", "1 hour")
        .groupBy(F.session_window("etime", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    return _run_to_table(out, "append")


# ---------------------------------------------------------------------------
# B23 — watermark semantics: late rows dropped
# ---------------------------------------------------------------------------


@register(
    "b23_stream_late_data_drop",
    oracle=f"""
        WITH w0 AS (
          SELECT MAX(ts) - INTERVAL 1 HOUR AS wm FROM events
          WHERE ts < TIMESTAMP '2024-01-20'
            AND NOT (event_id % {LATE_MOD} = 0)
        ),
        kept AS (
          SELECT e.* FROM events e, w0
          WHERE NOT (
            e.event_id % {LATE_MOD} = 0
            AND e.ts < TIMESTAMP '2024-01-20'
            AND {_sql_bucket('e.ts', 21600)} + INTERVAL 6 HOUR <= w0.wm
          )
        ),
        agg AS (
          SELECT {_sql_bucket(_ORACLE_TS, 21600)} AS window_start,
                 {_sql_bucket(_ORACLE_TS, 21600)} + INTERVAL 6 HOUR AS window_end,
                 COUNT(*) AS n
          FROM kept GROUP BY 1, 2
        )
        SELECT * FROM agg
        WHERE window_end <= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
    """,
    tags=("streaming",),
)
def b23_stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics, end to end: rows older than 2024-01-20
    with ``event_id % 13 == 0`` are withheld until the third micro-batch,
    by which point the 1-hour watermark has closed (almost all of) their
    6-hour windows, so they are dropped (numRowsDroppedByWatermark > 0).
    Two batches of lead are required because Spark's late-event filter
    watermark lags eviction by one batch.  The oracle recomputes the
    filter watermark (max on-time-old event time - 1h) and excludes exactly
    the late rows whose window end precedes it."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir, scheme="late")
    out = (
        ev.withWatermark("etime", "1 hour")
        .groupBy(F.window("etime", "6 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
        )
    )
    return _run_to_table(out, "append")


@register(
    "b23_stream_late_side_output",
    oracle=f"""
        WITH w0 AS (
          SELECT MAX(ts) - INTERVAL 1 HOUR AS wm FROM events
          WHERE ts < TIMESTAMP '2024-01-20'
            AND NOT (event_id % {LATE_MOD} = 0)
        )
        SELECT e.event_id,
               {_sql_bucket(_ORACLE_TS, 21600)} AS window_start,
               'late' AS reason
        FROM events e, w0
        WHERE e.event_id % {LATE_MOD} = 0
          AND e.ts < TIMESTAMP '2024-01-20'
          AND {_sql_bucket(_ORACLE_TS, 21600)} + INTERVAL 6 HOUR <= w0.wm
        ORDER BY event_id
    """,
    tags=("streaming",),
)
def b23_stream_late_side_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data SIDE OUTPUT — the Flink pattern
    (``OutputTag``/``sideOutputLateData``) the reference ecosystem routes
    dead letters with, on Spark: instead of silently dropping what the
    watermark closed (``b23_stream_late_data_drop``), each micro-batch
    routes its late rows to a dead-letter table carrying the closed
    window and a reason tag, so an auditor can replay or backfill them.

    Spark's aggregation operator never exposes the rows it drops, so the
    router reproduces the engine's own two-phase watermark IN foreachBatch:
    the filter watermark for batch N is max(event time through batch N-2)
    minus the delay — the two-batch lag Spark's own late-event filter
    applies (eviction lags one batch, the filter one more; see
    ``_write_chunks``' late-scheme note) — and a row is late when its
    6-hour window end is at or below it.  Integer-micros arithmetic end
    to end; per-batch dead-letter dirs are overwrite-idempotent under
    replay, and the watermark ledger is keyed by batch_id so a
    re-delivered batch overwrites its own entry instead of corrupting
    later lookups.  The oracle derives the same set from the replay
    schedule: the withheld old rows whose window closed against the
    on-time watermark."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir, scheme="late")
    store = scratch_dir("late_dlq_")
    # cum_max[i] = max event time through batch i; Spark's late-event
    # FILTER watermark lags eviction by one batch (the filter applied at
    # batch N is max event time through batch N-2, minus the delay —
    # see _write_chunks' late scheme note), so the router replays that
    # exact two-batch lag.  Keyed by batch_id (not list order): if the
    # engine re-invokes foreachBatch for a batch_id (task retry), the
    # recompute overwrites that id's own entry — deterministic and
    # idempotent — instead of shifting every later lookup.
    state = {"cum_max": {}}
    delay_us = 3600 * _US
    win_us = 21600 * _US

    def route(batch_df, batch_id: int) -> None:
        us = ts_micros(batch_df).alias("us")
        rows = batch_df.select("event_id", us)
        cum = state["cum_max"]
        wm = _ledger_watermark(cum, batch_id, delay_us)
        if wm is not None:
            win_start = (F.floor(F.col("us") / win_us) * win_us).cast("long")
            late = rows.filter(
                (win_start + F.lit(win_us)) <= F.lit(wm)
            ).select(
                "event_id",
                F.timestamp_micros(win_start).alias("window_start"),
                F.lit("late").alias("reason"),
            )
            late.write.mode("overwrite").parquet(
                os.path.join(store, f"b{batch_id}")
            )
        # Deliberate per-batch scalar recompute (one aggregate job whose
        # result is a single collected row — negligible at any scale):
        # Spark exposes its own watermark only through
        # StreamingQueryProgress, which is published AFTER the batch
        # completes and whose update timing differs across engine
        # versions; recomputing the ledger from the data keeps the late
        # contract deterministic under checkpoint replay.  Contract
        # pinned by tests/test_streaming_queries.py (DLQ router ledger).
        hi = rows.agg(F.max("us")).collect()[0][0]
        _ledger_record(cum, batch_id, hi)

    ckpt = scratch_dir("ckpt_dlq_")
    with _stream_partitions(spark):
        q = (
            ev.writeStream.foreachBatch(route)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import glob as _glob

    dirs = _glob.glob(os.path.join(store, "b*"))
    schema = "event_id long, window_start timestamp, reason string"
    if not dirs:  # zero-batch replay (empty source): nothing was routed
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema).parquet(*dirs).orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# B24 — stateful streaming dedup
# ---------------------------------------------------------------------------


@register(
    "b24_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming",),
)
def b24_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ``dropDuplicates`` on (user_id, event_type) across the
    micro-batches — dedup state carries across batches, so the emitted set
    equals batch DISTINCT.  Only the key columns are projected (the 'first'
    row per key is partition-order-dependent; the key set is not)."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    out = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return _run_to_table(out, "append")


@register(
    "b24_stream_dedup_within_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming",),
)
def b24_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark``: unlike plain streaming dedup, key
    state is EVICTED once the watermark passes first-seen + delay — the
    production-safe variant (bounded state at 100 TB: state size ~ keys per
    delay window, not keys ever seen).  With a delay exceeding the replayed
    event-time span nothing is evicted mid-run, so the emitted key set
    equals batch DISTINCT exactly; the state-store semantics still run for
    real across the ordered micro-batches."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    out = (
        ev.select("user_id", "event_type", "etime")
        .withWatermark("etime", "3650 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_table(out, "append")


# ---------------------------------------------------------------------------
# B25 — declarative batching (reference BatchTrigger/RowBatcher semantics)
# ---------------------------------------------------------------------------


@register(
    "b25_batch_assign_count",
    oracle="""
        SELECT event_id, user_id,
               CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY event_id) - 1) / 50) AS BIGINT) AS batch_index
        FROM events
    """,
    tags=("batching",),
)
def b25_batch_assign_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-bounded batch assignment (reference CountTrigger semantics,
    ``process/BatchTrigger.java:27``): one shuffle on the key, window
    row_number arithmetic."""
    from ..streaming.batching import assign_batches_by_count

    t = load_tables(spark, sf_dir)
    return assign_batches_by_count(
        t["events"], "user_id", ["event_id"], 50
    ).select("event_id", "user_id", "batch_index")


@register(
    "b25_batch_assign_size",
    oracle="""
        WITH sized AS (
          SELECT event_id, user_id,
                 CAST(strlen(event_type) + strlen(props) + 16 AS BIGINT) AS sz
          FROM events
        )
        SELECT event_id, user_id,
               CAST(FLOOR(CAST(SUM(sz) OVER (PARTITION BY user_id
                    ORDER BY event_id ROWS UNBOUNDED PRECEDING) - sz
                    AS DOUBLE) / 4096) AS BIGINT) AS batch_index
        FROM sized
    """,
    tags=("batching",),
)
def b25_batch_assign_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-bounded batch assignment (reference size trigger,
    ``process/BatchTrigger.java:33-48``): exclusive running byte sum
    bucketed at 4 KiB."""
    from ..streaming.batching import assign_batches_by_size

    t = load_tables(spark, sf_dir)
    sized = t["events"].withColumn(
        "sz",
        (F.length("event_type") + F.length("props") + F.lit(16)).cast("long"),
    )
    return assign_batches_by_size(
        sized, "user_id", ["event_id"], 4096, "sz"
    ).select("event_id", "user_id", "batch_index")


# ---------------------------------------------------------------------------
# B26 — end-to-end streaming sink (at-least-once default stream)
# ---------------------------------------------------------------------------


@register(
    "b26_sink_roundtrip",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
    tags=("sink",),
)
def b26_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline: events replayed as a stream -> count/size batching ->
    at-least-once append to the FakeBigQuery default stream -> read the sink
    table back.  Row-for-row equality with the source proves no loss and no
    duplication across micro-batch boundaries (reference
    ``sink/defaultStream/BigQueryDefaultSinkWriter.java:60-80``)."""
    from ..streaming.config import BatchTriggerSettings
    from ..streaming.sinks import DefaultStreamSink

    load_tables(spark, sf_dir)
    backend_root = scratch_dir("fbq_sink_")
    table = "proj.ds.events_sink"
    ev = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    sink = DefaultStreamSink(
        backend_root,
        table,
        trigger=BatchTriggerSettings(max_count=500, max_bytes=256 * 1024),
    )
    q = sink.start(
        ev, scratch_dir("ckpt_sink_"), available_now=True
    )
    q.awaitTermination()
    # read back through the connector: distributed (stream, row-range)
    # splits + Arrow transfer instead of a driver-side collect
    from ..sources import bq_datasource as dsrc

    dsrc.register(spark)
    return (
        spark.read.format(dsrc.SOURCE_NAME)
        .schema("event_id long, user_id long, event_type string, value double")
        .option("root", backend_root)
        .option("table", table)
        .load()
    )


@register(
    "b26_sink_exactly_once",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
    tags=("sink",),
)
def b26_sink_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once pipeline: events replayed over ordered micro-batches into
    the BufferedStreamSink (deterministic per-(batchId, partition) BUFFERED
    streams, offset-checked appends, two-phase commit keyed by batchId) —
    only rows flushed visible by the commit phase are read back, and they
    equal the source exactly once each (reference
    ``sink/buffered/BigQueryBufferedSinkWriter.java:45-202``)."""
    from ..streaming.sinks import BufferedStreamSink

    load_tables(spark, sf_dir)
    backend_root = scratch_dir("fbq_eo_")
    table = "proj.ds.events_eo"
    ev = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    sink = BufferedStreamSink(backend_root, table)
    q = sink.start(
        ev, scratch_dir("ckpt_eo_"), available_now=True
    )
    q.awaitTermination()
    # distributed read of the VISIBLE (flushed) rows only — unflushed
    # buffered streams are excluded by the connector's visibility cursor
    from ..sources import bq_datasource as dsrc

    dsrc.register(spark)
    return (
        spark.read.format(dsrc.SOURCE_NAME)
        .schema("event_id long, user_id long, event_type string, value double")
        .option("root", backend_root)
        .option("table", table)
        .load()
    )


@register(
    "b26_sink_multi_table",
    oracle="""
        SELECT event_id, user_id, value,
               'proj.ds.ev_' || event_type AS sink_table
        FROM events
    """,
    tags=("sink",),
)
def b26_sink_multi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record multi-table routing (reference ``BigQueryRecord
    .getTable()`` / ``Rows.table`` — ``model/BigQueryRecord.java:7``,
    ``model/Rows.java:9-22``, ``process/RowBatcher.java:22,28-30``): one
    event stream fans into one table per event_type inside a single
    ``foreachBatch``, each partition task batching per table and driving
    one WriterPool append chain per table group.  Read-back re-attaches
    each row's table name, so the UNION equals the source WITH its
    routing column — proving every row landed in exactly its own table
    (no loss, no duplication, no cross-table bleed)."""
    from ..streaming.config import BatchTriggerSettings
    from ..streaming.sinks import MultiTableSink

    load_tables(spark, sf_dir)
    backend_root = scratch_dir("fbq_mt_")
    ev = _events_stream(spark, sf_dir).select(
        "event_id",
        "user_id",
        "value",
        F.concat(F.lit("proj.ds.ev_"), F.col("event_type")).alias("sink_table"),
    )
    sink = MultiTableSink(
        backend_root,
        "sink_table",
        trigger=BatchTriggerSettings(max_count=500, max_bytes=256 * 1024),
    )
    q = sink.start(ev, scratch_dir("ckpt_mt_"), available_now=True)
    q.awaitTermination()
    # read back through ONE wildcard scan (the BigQuery `prefix*` +
    # _TABLE_SUFFIX idiom): every table the router created unions in a
    # single load, the matched suffix re-derives the routing column
    from ..sources import bq_datasource as dsrc

    dsrc.register(spark)
    return (
        spark.read.format(dsrc.SOURCE_NAME)
        .schema(
            "event_id long, user_id long, value double, _table_suffix string"
        )
        .option("root", backend_root)
        .option("table", "proj.ds.ev_*")
        .load()
        .select(
            "event_id",
            "user_id",
            "value",
            F.concat(F.lit("proj.ds.ev_"), F.col("_table_suffix")).alias(
                "sink_table"
            ),
        )
    )


@register(
    "b26_sink_multi_table_eo",
    oracle="""
        SELECT event_id, user_id, value,
               'proj.ds.eo_' || event_type AS sink_table
        FROM events
    """,
    tags=("sink",),
)
def b26_sink_multi_table_eo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE per-record multi-table routing — the reference's
    buffered writer takes stream AND table from every envelope
    (``sink/buffered/BigQueryBufferedSinkWriter.java:53-58``), so one
    2PC sink serves N destination tables and a batch commits atomically
    across all of them.  Events fan into one table per event_type
    through per-(table, batch, partition) BUFFERED streams; after the
    run, a committed batch id is REPLAYED in-query (write_batch with an
    already-committed id) to prove the no-op path through the oracle —
    the read-back UNION still equals the source exactly once, per
    table."""
    from ..streaming.sinks import MultiTableBufferedSink

    load_tables(spark, sf_dir)
    backend_root = scratch_dir("fbq_mteo_")
    route_col = F.concat(
        F.lit("proj.ds.eo_"), F.col("event_type")
    ).alias("sink_table")
    ev = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", "value", route_col
    )
    sink = MultiTableBufferedSink(backend_root, "sink_table")
    q = sink.start(ev, scratch_dir("ckpt_mteo_"), available_now=True)
    q.awaitTermination()
    # replay a committed batch id with the full source: exactly-once
    # means this is a no-op — proven by the oracle equality below
    replay = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id", "user_id", "value", route_col)
    )
    sink.write_batch(replay, 0)
    from ..sources import bq_datasource as dsrc

    dsrc.register(spark)
    # single wildcard scan over every destination table (visible rows
    # only — the 2PC flush cursor gates what the read session sees)
    return (
        spark.read.format(dsrc.SOURCE_NAME)
        .schema(
            "event_id long, user_id long, value double, _table_suffix string"
        )
        .option("root", backend_root)
        .option("table", "proj.ds.eo_*")
        .load()
        .select(
            "event_id",
            "user_id",
            "value",
            F.concat(F.lit("proj.ds.eo_"), F.col("_table_suffix")).alias(
                "sink_table"
            ),
        )
    )


@register(
    "b26_stream_state_offsets",
    oracle="""
        SELECT user_id, COUNT(*) AS end_offset
        FROM events GROUP BY user_id
    """,
    tags=("sink", "state"),
)
def b26_stream_state_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed write-stream/offset assignment (reference A4,
    ``process/StreamStateHandler.java:53-145``): every micro-batch acquires
    (stream, base_offset) per user key and appends at that offset; after
    the replay each key's stored offset equals its total row count —
    proving per-key monotonic offsets across batches with no gaps.

    The acquire/append protocol runs DISTRIBUTED: each micro-batch shuffles
    by key once and every key's partition executes acquire -> offset-checked
    append inside ``applyInPandas`` on the executors (the keyed-operator
    placement of the reference); nothing but the tiny per-key envelope ever
    reaches the driver.  State is the handler's durable per-key store, as in
    a per-subtask keyed operator."""
    import json as _json

    from ..session import ensure_package_on_executors

    load_tables(spark, sf_dir)
    ensure_package_on_executors(spark)
    backend_root = scratch_dir("fbq_ss_")
    state_dir = os.path.join(backend_root, "state")
    table = "proj.ds.events_keyed"

    def handle_batch(df: DataFrame, batch_id: int) -> None:
        import pandas as pd

        def per_key(pdf: "pd.DataFrame") -> "pd.DataFrame":
            from ..sources.fake_bigquery import FakeBigQuery
            from ..streaming.config import WriterSettings
            from ..streaming.sinks import write_with_retry
            from ..streaming.stream_state import StreamStateHandler

            client = FakeBigQuery(backend_root)
            handler = StreamStateHandler(client, state_dir)
            key = int(pdf["user_id"].iloc[0])
            rows = pdf.sort_values("event_id").to_dict("records")
            # batch_id makes the acquire idempotent under task retry /
            # speculation: a re-run of this (key, batch) gets the same base
            # and the offset-checked append trims what's already durable.
            stream, offset = handler.acquire(
                str(key), table, len(rows), batch_id=batch_id
            )
            write_with_retry(
                client, table, stream, rows, offset, WriterSettings()
            )
            return pd.DataFrame({"user_id": [key], "n": [len(rows)]})

        (
            df.groupBy("user_id")
            .applyInPandas(per_key, "user_id long, n long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    ev = _events_stream(spark, sf_dir).select("event_id", "user_id")
    q = (
        ev.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", scratch_dir("ckpt_ss_"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = []
    for fn in os.listdir(state_dir):
        if fn.endswith(".json"):
            with open(os.path.join(state_dir, fn)) as f:
                d = _json.load(f)
            out.append((int(fn[: -len(".json")]), d["offset"]))
    return spark.createDataFrame(out, "user_id long, end_offset long")


@register(
    "b25_stateful_batcher",
    oracle="""
        SELECT user_id, event_id,
               CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY event_id) - 1) / 50) AS BIGINT) AS batch_index
        FROM events
    """,
    tags=("batching", "stateful"),
)
def b25_stateful_batcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-trigger batching as a custom stateful streaming operator
    (applyInPandasWithState): the per-key row counter carries across the
    micro-batches, so batches span micro-batch boundaries exactly like the
    reference's keyed window trigger.  Deterministic because chunk arrival
    is time-ordered and event_id is monotone in event time."""
    from ..streaming.batching import stateful_batch_assign

    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir).select("user_id", "event_id")
    out = stateful_batch_assign(ev, "user_id", "event_id", 50)
    return _run_to_table(out, "append")


@register(
    "b26_stream_state_tws",
    oracle="""
        WITH per_chunk AS (
          SELECT user_id,
                 CASE WHEN ts < TIMESTAMP '2024-01-11' THEN 0
                      WHEN ts < TIMESTAMP '2024-01-21' THEN 1
                      ELSE 2 END AS chunk,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY chunk)
                    - n AS BIGINT) AS base_offset,
               CAST(n AS BIGINT) AS n
        FROM per_chunk
    """,
    tags=("sink", "state"),
)
def b26_stream_state_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed write-stream offset assignment as a NATIVE stateful streaming
    operator (applyInPandasWithState, Spark state store — the idiomatic A4
    port; see keyed_offset_assignment_tws for why not the newer TWS API).
    Each (key, micro-batch) emits its (base_offset, n) envelope;
    offsets are gapless and monotonic per key across the ordered chunks,
    and the oracle reproduces them from the chunk boundaries."""
    from ..streaming.stream_state import keyed_offset_assignment_tws

    load_tables(spark, sf_dir)
    backend_root = scratch_dir("fbq_tws_")
    ev = _events_stream(spark, sf_dir).select("event_id", "user_id")
    out = keyed_offset_assignment_tws(
        ev, "user_id", backend_root, "proj.ds.events_tws"
    )
    return _run_to_table(out, "append")


@register(
    "b26_stream_state_native_tws",
    oracle="""
        WITH per_chunk AS (
          SELECT user_id,
                 CASE WHEN ts < TIMESTAMP '2024-01-11' THEN 0
                      WHEN ts < TIMESTAMP '2024-01-21' THEN 1
                      ELSE 2 END AS chunk,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY chunk)
                    - n AS BIGINT) AS base_offset,
               CAST(n AS BIGINT) AS n
        FROM per_chunk
    """,
    tags=("sink", "state"),
)
def b26_stream_state_native_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b26_stream_state_tws on the NATIVE ``transformWithStateInPandas``
    API — ValueState with store-managed TTL (the reference's 7-day
    idle-stream expiry, ``process/StreamStateHandler.java:33``), RocksDB
    state store, protobuf-serialized worker state protocol.  Offsets are
    gapless and monotonic per key across the ordered chunks, so the
    SAME oracle as the applyInPandasWithState twin pins both — which is
    the equivalence the A4 port claims.  Falls back to that twin where
    the worker protobuf stack is genuinely unavailable (identical output
    contract either way; `compat.enable_bundled_protobuf` makes the
    native path the one that actually runs here) — and, LOUDLY, when
    the native runner's Python worker dies on both attempts
    (TwsWorkerCrashError: transient host fork/memory pressure, the
    r8/r9 driver failure): the equivalence the oracle pins is exactly
    what makes the twin a sound degradation, and the crash evidence
    (worker faulthandler stacks, or their absence = OOM SIGKILL) is in
    the error log rather than silently discarded."""
    import logging

    from ..streaming import stream_state as ss

    load_tables(spark, sf_dir)
    backend_root = scratch_dir("fbq_ntws_")
    ev = _events_stream(spark, sf_dir).select("event_id", "user_id")

    def _classic(root: str) -> DataFrame:
        out = ss.keyed_offset_assignment_tws(
            ev, "user_id", root, "proj.ds.events_ntws"
        )
        return _run_to_table(out, "append")

    if not ss.tws_runtime_available():
        return _classic(backend_root)
    out = ss.keyed_offset_assignment_native_tws(
        ev, "user_id", backend_root, "proj.ds.events_ntws"
    )
    # adaptive pin: the per-key state-protocol work (two round-trips +
    # one backend append per key per batch) serializes within each state
    # partition — 2 partitions starved 15k keys at sf1 (114 s -> 44.6 s
    # at 10; see _adaptive_stream_partitions)
    with _stream_partitions(spark, _adaptive_stream_partitions(sf_dir)):
        try:
            return ss.run_native_tws_to_table(out, "append")
        except ss.TwsWorkerCrashError as exc:
            logging.getLogger(__name__).error(
                "native TWS runner crashed on both attempts; degrading "
                "to the applyInPandasWithState twin (oracle-pinned "
                "identical output contract). Crash evidence:\n%s",
                exc,
            )
            # fresh backend: the crashed native attempts may have
            # part-written streams/offsets into the original root
            return _classic(scratch_dir("fbq_ntws_fallback_"))


@register(
    "b21_stream_static_enrich",
    oracle="""
        SELECT c.c_mktsegment,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    tags=("streaming", "join"),
)
def b21_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream inner-joins a static
    dimension (customer) per micro-batch.  The static side is broadcast —
    stateless, no watermark, no join state store; at 100 TB/day of events
    the dimension re-broadcasts per batch and the stream side never
    shuffles.  The final appended row set equals the batch join exactly,
    so the aggregate over the sink table has an exact SQL oracle."""
    t = load_tables(spark, sf_dir)
    customers = F.broadcast(
        t["customer"].select("c_custkey", "c_mktsegment")
    )
    ev = _events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    joined = ev.join(
        customers, ev.user_id == customers.c_custkey, "inner"
    ).select("event_id", "c_mktsegment", "value")
    sunk = _run_to_table(joined, "append")
    return (
        sunk.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dbl(F.sum(dec("value", 14, 4))).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "b21_stream_update_mode",
    oracle=f"""
        SELECT {_sql_bucket('ts', 86400)} AS window_start,
               event_type, COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def b21_stream_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode: every trigger re-emits the rows whose aggregate
    changed; the memory sink therefore accumulates intermediate versions.
    Counts are MONOTONE per key, so MAX(n) per (window, type) over the
    sink equals the final state — giving the non-final-emitting mode an
    exact batch oracle.  (Append emits once-at-close, complete re-emits
    everything; update is the third mode and the one a key-value upsert
    sink consumes.)"""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    out = (
        ev.groupBy(
            F.window("etime", "1 day").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n"
        )
    )
    sunk = _run_to_table(out, "update")
    return (
        sunk.groupBy("window_start", "event_type")
        .agg(F.max("n").alias("n"))
    )


@register(
    "b21_stream_complete_mode",
    oracle=f"""
        SELECT {_sql_bucket(_ORACLE_TS, 86400)} AS window_start,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def b21_stream_complete_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPLETE output mode — the third of the mode triple (append emits
    once-at-close: b21_stream_tumbling_window; update re-emits changed
    rows: b21_stream_update_mode): every trigger re-emits the ENTIRE
    result table, so the sink's final contents simply ARE the full
    aggregate — the mode a dashboard-refresh sink consumes.  The memory
    sink replaces the table per trigger, so after AvailableNow replay the
    table equals the batch aggregate with no post-processing (unlike
    update mode's MAX-over-emissions reconstruction).  Scale note:
    complete mode re-emits O(|result|) per trigger — only viable when the
    aggregate itself is bounded (here |days| x |event types|), which is
    exactly when dashboards use it."""
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    out = (
        ev.groupBy(F.window("etime", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    return _run_to_table(out, "complete")


@register(
    "b26_incremental_matview",
    oracle="""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("sink", "streaming", "matview"),
)
def b26_incremental_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained aggregate table (materialized-view
    maintenance): each micro-batch computes its per-type partial
    aggregate and MERGEs it into a keyed state table via foreachBatch —
    the incremental-refresh pattern behind every streaming dashboard.
    Decimal partial sums make the merge order-free, so after AvailableNow
    replay the maintained table equals the batch aggregate exactly.

    Scale shape: per batch, the shuffle carries one row per event_type
    (the partial aggregate), and the MERGE touches |event_types| keys —
    maintenance cost is independent of history size."""
    import json as _json

    load_tables(spark, sf_dir)
    state_dir = scratch_dir("matview_")
    path = os.path.join(state_dir, "agg.json")

    def merge_batch(df: DataFrame, batch_id: int) -> None:
        partial = (
            df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec("value", 14, 4)).alias("tv"),
            )
            .collect()  # |event_types| rows — the partial aggregate IS tiny
        )
        cur: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                cur = _json.load(f)
        # replay idempotency: an additive merge double-counts if Spark
        # re-delivers a batch after a crash between the state write and
        # the checkpoint commit — record the last merged id and no-op on
        # re-delivery (same discipline as VersionedServingTable.merge)
        if cur.get("__last_batch") == batch_id:
            return
        for r in partial:
            k = r["event_type"]
            n0, tv0 = cur.get(k, (0, "0"))
            cur[k] = (n0 + r["n"], str((__import__("decimal").Decimal(tv0) + r["tv"])))
        cur["__last_batch"] = batch_id
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(cur, f)
        os.replace(tmp, path)

    ev = _events_stream(spark, sf_dir).select("event_type", "value")
    with _stream_partitions(spark):
        q = (
            ev.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", scratch_dir("ckpt_mv_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    with open(path) as f:
        final = _json.load(f)
    rows = [
        (k, int(v[0]), float(__import__("decimal").Decimal(v[1])))
        for k, v in sorted(final.items())
        if k != "__last_batch"
    ]
    return spark.createDataFrame(
        rows, "event_type string, n long, total_value double"
    ).orderBy("event_type")


@register(
    "b26_matview_time_travel",
    oracle="""
        SELECT 1 AS as_of, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE)
                   AS total_value
        FROM events WHERE ts < TIMESTAMP '2024-01-11'
        GROUP BY event_type
        UNION ALL
        SELECT 2 AS as_of, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE)
                   AS total_value
        FROM events WHERE ts < TIMESTAMP '2024-01-21'
        GROUP BY event_type
        UNION ALL
        SELECT 3 AS as_of, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE)
                   AS total_value
        FROM events
        GROUP BY event_type
    """,
    tags=("sink", "streaming", "matview"),
)
def b26_matview_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the maintained materialized view: the merge loop
    of b26_incremental_matview, but every micro-batch's post-merge state
    is RETAINED as an immutable snapshot (the versioned-table discipline
    of VersionedServingTable — old versions are never disturbed), and the
    query reads the view AS OF each of the three replay epochs.  Because
    the ordered chunk boundaries are fixed DATES, every snapshot has an
    exact batch oracle: "the view as of batch k" == "the aggregate over
    events before boundary k" — which is precisely the auditability
    time travel exists to provide (reproduce yesterday's dashboard,
    debug a regression between snapshots).  Scale shape: per batch the
    shuffle carries one row per event_type and snapshots are model-sized;
    retention cost is |snapshots| x |keys|, independent of history."""
    import decimal as _decimal
    import json as _json

    load_tables(spark, sf_dir)
    state_dir = scratch_dir("matview_tt_")
    path = os.path.join(state_dir, "agg.json")

    def merge_batch(df: DataFrame, batch_id: int) -> None:
        partial = (
            df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(dec("value", 14, 4)).alias("tv"),
            )
            .collect()  # |event_types| rows — model-sized
        )
        cur: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                cur = _json.load(f)
        if cur.get("__last_batch") == batch_id:
            return  # re-delivered batch: additive merge must no-op
        for r in partial:
            k = r["event_type"]
            n0, tv0 = cur.get(k, (0, "0"))
            tv = r["tv"] if r["tv"] is not None else _decimal.Decimal(0)
            cur[k] = (n0 + r["n"], str(_decimal.Decimal(tv0) + tv))
        cur["__last_batch"] = batch_id
        # snapshot FIRST, replay guard second: a crash between the two
        # re-delivers the batch, which re-derives the identical merge from
        # the un-advanced state and overwrites the snapshot byte-for-byte;
        # the reverse order would leave the re-delivery a guard no-op with
        # this batch's snapshot permanently missing.
        snap = os.path.join(state_dir, f"snap_{batch_id}.json")
        tmp = snap + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(cur, f)
        os.replace(tmp, snap)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(cur, f)
        os.replace(tmp, path)

    ev = _events_stream(spark, sf_dir).select("event_type", "value")
    with _stream_partitions(spark):
        q = (
            ev.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", scratch_dir("ckpt_mvtt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    rows = []
    for name in sorted(os.listdir(state_dir)):
        if not name.startswith("snap_"):
            continue
        batch_id = int(name[len("snap_"):-len(".json")])
        with open(os.path.join(state_dir, name)) as f:
            snap = _json.load(f)
        for k, v in snap.items():
            if k == "__last_batch":
                continue
            rows.append(
                (
                    batch_id + 1,
                    k,
                    int(v[0]),
                    float(_decimal.Decimal(v[1])),
                )
            )
    return spark.createDataFrame(
        rows, "as_of int, event_type string, n long, total_value double"
    )


# ---------------------------------------------------------------------------
# B24+ — streaming near-dup suppression against corpus history (round 4)
# ---------------------------------------------------------------------------

from .llm_ops import _simhash_sql_value as _sq_simhash_value

_ordered_chunk_cache: dict[tuple, str] = {}


def _write_ordered_chunks(
    sf_dir: str, table: str, id_col: str, n_chunks: int = 3
) -> str:
    """A table as ``n_chunks`` ordered id-range chunk files (replay
    machinery, same caveat as _write_chunks: at production scale the
    chunks already exist as arriving snapshots)."""
    key = (sf_dir, table, n_chunks)
    if key in _ordered_chunk_cache and os.path.isdir(_ordered_chunk_cache[key]):
        return _ordered_chunk_cache[key]
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/{table}.parquet")
    ids = tbl[id_col]
    lo = pc.min(ids).as_py()
    hi = pc.max(ids).as_py()
    if lo is None:  # zero-row source: one empty chunk keeps the replay
        # pipeline shape (schema'd file, one empty micro-batch) instead
        # of None-arithmetic below — the empty-feed case every
        # production stream eventually hits
        out_dir = scratch_dir(f"{table}_ordered_")
        path = os.path.join(out_dir, "c0.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000, 1_700_000_000))
        _ordered_chunk_cache[key] = out_dir
        return out_dir
    cuts = [lo - 1] + [
        lo + (i + 1) * (hi - lo) // n_chunks for i in range(n_chunks - 1)
    ] + [hi]
    out_dir = scratch_dir(f"{table}_ordered_")
    for i in range(n_chunks):
        m = pc.and_(pc.greater(ids, cuts[i]), pc.less_equal(ids, cuts[i + 1]))
        path = os.path.join(out_dir, f"c{i}.parquet")
        pq.write_table(tbl.filter(m).sort_by(id_col), path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    _ordered_chunk_cache[key] = out_dir
    return out_dir


def _simhash_band_keys(sig: DataFrame) -> DataFrame:
    """(doc_id, simhash, band, key) via the shared band layout in
    operators/dedup.py::simhash_band_entries."""
    from ..operators.dedup import simhash_band_entries

    return sig.select(
        "doc_id",
        "simhash",
        F.explode(simhash_band_entries(F.col("simhash"))).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")


@register(
    "b24_stream_neardup_history",
    oracle=f"""
        WITH h AS (
          SELECT doc_id,
                 list_transform(regexp_extract_all(COALESCE(text, ''), '\\S+'),
                                t -> ('0x'||substr(md5(t),1,15))::BIGINT) AS th
          FROM documents
        ),
        sh AS (SELECT doc_id, CAST({_sq_simhash_value()} AS BIGINT) AS simhash
               FROM h),
        -- pigeonhole banding (hamming <= 3 shares one of 4 8-bit bands)
        -- keeps the ORACLE sub-quadratic too: the unbanded NOT EXISTS is
        -- 1.25e9 bit_count pairs at sf1's 50k docs and stalls
        -- full-registry verification at scale
        bands AS (
          SELECT doc_id, simhash, t.j AS band,
                 (simhash >> (8 * t.j)) & 255 AS key
          FROM sh, range(0, 4) t(j)),
        sup AS (
          SELECT DISTINCT a.doc_id
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.key = b.key
                      AND b.doc_id < a.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
        SELECT a.doc_id, a.simhash FROM sh a
        WHERE NOT EXISTS (SELECT 1 FROM sup WHERE sup.doc_id = a.doc_id)
        ORDER BY doc_id
    """,
    tags=("streaming", "dedup"),
)
def b24_stream_neardup_history(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """Streaming NEAR-dup suppression against corpus history: documents
    arrive as ordered crawl-snapshot chunks; each micro-batch computes
    SimHash signatures, suppresses docs with a Hamming<=3 prior (in the
    accumulated signature store OR earlier in the same batch by doc_id),
    and appends ALL new signatures (kept and suppressed) to the store.

    The banded join makes each comparison bucket-local (pigeonhole: a
    Hamming<=3 pair always shares one of the 4 bands), so the streaming
    output is EXACTLY the batch rule "drop doc i iff exists j < i with
    hamming <= 3" regardless of how arrival chunks the stream — which is
    what the quadratic NOT EXISTS oracle checks.  At 100 TB the store is
    written partitioned by (band, key), a new snapshot probes only its
    own buckets, and the store grows by |new docs| signatures (16 bytes
    each), never re-reading corpus text.  foreachBatch writes land in a
    per-batchId directory via overwrite — idempotent under replay."""
    from ..operators.dedup import simhash_expr
    from ..operators.text import tokens_expr

    chunk_dir = _write_ordered_chunks(sf_dir, "documents", "doc_id", n_chunks)
    store = scratch_dir("simhash_store_")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        s = batch_df.sparkSession
        # expression-path SimHash: per-row, zero shuffle — the right
        # streaming shape (each micro-batch is small; no global explode)
        sig = batch_df.select(
            "doc_id", simhash_expr(tokens_expr(F.col("text"))).alias("simhash")
        ).persist()
        bands = _simhash_band_keys(sig)
        import glob as _glob

        # Enumerate ONLY prior-batch directories: on a crash-replay the
        # store already holds store/b{batch_id} from the failed attempt,
        # and overwriting a directory a lazy plan is also reading deletes
        # its part files mid-job.  Excluding the current batch's dir makes
        # `prior` genuinely prior AND keeps the overwrite target disjoint
        # from every read path.
        prior_dirs = [
            d
            for d in _glob.glob(os.path.join(store, "b*"))
            if os.path.basename(d) != f"b{batch_id}"
            and _glob.glob(os.path.join(d, "*.parquet"))
        ]
        dup_ids = None
        if prior_dirs:
            prior = _simhash_band_keys(
                s.read.parquet(*prior_dirs).select("doc_id", "simhash")
            ).select(
                F.col("doc_id").alias("p_id"),
                F.col("simhash").alias("p_sim"),
                "band",
                "key",
            )
            dup_ids = (
                bands.join(prior, ["band", "key"])
                # p_id < doc_id, not just a hamming check: ordered chunks
                # mean genuine priors always have smaller ids, and after a
                # crash-replay the store already holds THIS batch's own
                # signatures — without the guard every doc would match
                # itself (hamming 0) and the whole batch would be dropped.
                .filter(F.col("p_id") < F.col("doc_id"))
                .filter(
                    F.bit_count(
                        F.col("simhash").bitwiseXOR(F.col("p_sim"))
                    )
                    <= 3
                )
                .select("doc_id")
                .distinct()
            )
        intra = (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("b.doc_id") < F.col("a.doc_id")),
            )
            .filter(
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                )
                <= 3
            )
            .select(F.col("a.doc_id").alias("doc_id"))
            .distinct()
        )
        dup_ids = intra if dup_ids is None else dup_ids.union(intra).distinct()
        out = sig.join(dup_ids, "doc_id", "left_anti").withColumn(
            "kept", F.lit(True)
        ).unionByName(
            sig.join(dup_ids, "doc_id", "left_semi").withColumn(
                "kept", F.lit(False)
            )
        )
        out.write.mode("overwrite").parquet(
            os.path.join(store, f"b{batch_id}")
        )
        sig.unpersist()

    ckpt = scratch_dir("ckpt_nd_")
    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(os.path.join(store, "b*"))
        .filter(F.col("kept"))
        .select("doc_id", "simhash")
        .orderBy("doc_id")
    )


@register(
    "b28_stream_incremental_topk",
    oracle="""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embx embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
              FROM embx embeddings),
        scored AS (SELECT query_id, cand_id,
                          round(list_cosine_similarity(qv, cv), 6) AS cos
                   FROM q, c WHERE cand_id <> query_id),
        ranked AS (SELECT query_id, cand_id, cos,
                          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
                   FROM scored)
        SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank
    """,
    tags=("streaming", "similarity"),
)
def b28_stream_incremental_topk(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """Incremental top-k similarity maintenance: the corpus arrives as
    ordered chunks; each micro-batch scores the NEW chunk against the
    static query set and merges its per-query top-k with the maintained
    result set, re-ranking and truncating back to k.

    Top-k is a monotone merge (top-k over a union == top-k over the union
    of per-part top-k's), so the maintained state after the last chunk is
    EXACTLY the batch answer over the whole corpus — the oracle is the
    plain brute-force query.  Per batch the work is |queries| x |chunk|
    and the state is |queries| x k rows; the corpus is never rescanned —
    the incremental-view-maintenance shape for similarity serving."""
    from ..operators.similarity import brute_force_topk

    k = 5
    chunk_dir = _write_ordered_chunks(sf_dir, "embeddings", "vec_id", n_chunks)
    store = scratch_dir("topk_store_")
    emb_schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    # vector contract (see llm_ops._emb): NULL embeddings never enter a
    # similarity operator — applied to the query set here and per-chunk
    # inside process(), matching the oracle's IS NOT NULL filters.
    queries = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 10)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    stream = (
        spark.readStream.schema(emb_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        s = batch_df.sparkSession
        from pyspark.sql.window import Window as W

        chunk_topk = brute_force_topk(
            batch_df.filter(F.col("embedding").isNotNull())
            .select("vec_id", "embedding"),
            "vec_id",
            "embedding",
            queries,
            k,
        ).select("query_id", "cand_id", "cos")
        import glob as _glob

        # exclude this batch's own dir: a crash-replay would otherwise
        # lazily read store/b{batch_id} and then overwrite it mid-plan
        prior_dirs = [
            d
            for d in _glob.glob(os.path.join(store, "b*"))
            if os.path.basename(d) != f"b{batch_id}"
            and _glob.glob(os.path.join(d, "*.parquet"))
        ]
        merged = chunk_topk
        if prior_dirs:
            prior = s.read.parquet(*prior_dirs).select(
                "query_id", "cand_id", "cos"
            )
            # dropDuplicates: after a crash-replay the store already holds
            # this chunk's candidates; a plain union would rank the same
            # candidate twice and evict a legitimate k-th result.
            merged = merged.unionByName(prior).dropDuplicates(
                ["query_id", "cand_id"]
            )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("cand_id")
        )
        top = (
            merged.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
        )
        # per-batchId overwrite -> idempotent under replay.  Older batch
        # directories are kept, NOT deleted: if a failed attempt had
        # already removed them, its replay (which excludes b{batch_id}
        # from `prior_dirs`) would find no prior state and silently
        # restart the top-k from this chunk alone.  The live state is the
        # highest-numbered directory; stale ones cost k rows per query
        # per batch.
        top.write.mode("overwrite").parquet(os.path.join(store, f"b{batch_id}"))

    ckpt = scratch_dir("ckpt_tk_")
    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import glob as _glob

    final = max(
        _glob.glob(os.path.join(store, "b*")),
        key=lambda d: int(os.path.basename(d)[1:]),
    )
    return (
        spark.read.parquet(final)
        .select("query_id", "cand_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


@register(
    "b28_stream_ann_ingest",
    oracle="""
        WITH cents AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
          FROM embx embeddings WHERE vec_id < 16
        ),
        assigned AS (
          SELECT e.vec_id,
                 (SELECT c.centroid_id FROM cents c
                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                        c.cvec), 6) DESC,
                           c.centroid_id
                  LIMIT 1) AS cell
          FROM embx e
        )
        SELECT cell,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               MIN(vec_id) AS min_vec_id,
               MAX(vec_id) AS max_vec_id
        FROM assigned
        GROUP BY cell
        ORDER BY cell
    """,
    tags=("streaming", "similarity"),
)
def b28_stream_ann_ingest(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """Streaming ANN index maintenance: new embeddings arrive as ordered
    chunks and each micro-batch assigns them to their IVF cell against
    the FROZEN centroid model (a literal, exactly how a production
    vector index applies a trained quantizer at ingest), feeding a
    streaming per-cell aggregate — the live cell directory (vector
    count, id range) a router consults for probe planning.

    Cell assignment is stateless per record (centroids are plan
    literals), so the streaming state is just |cells| aggregate rows;
    the corpus is never rescanned.  Assignment determinism makes the
    settled directory EXACTLY the batch answer — the oracle recomputes
    it over the whole corpus in one pass.  Vector contract applies on
    both sides (NULL embeddings never reach the assignment)."""
    from ..operators import similarity

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )
    cents = similarity.fixed_centroids(corpus, "vec_id", "embedding")
    if not cents:
        # empty corpus: nothing ever streams; the settled directory is
        # the empty frame (ivf_cells_with would reject an empty MODEL
        # over a non-empty corpus, and isEmpty cannot probe a stream)
        return spark.createDataFrame(
            [],
            "cell long, n_vectors long, min_vec_id long, max_vec_id long",
        )
    chunk_dir = _write_ordered_chunks(sf_dir, "embeddings", "vec_id", n_chunks)
    emb_schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    stream = (
        spark.readStream.schema(emb_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
        .filter(F.col("embedding").isNotNull())
    )
    cells = similarity.ivf_cells_with(
        stream, "vec_id", "embedding", cents
    )
    agg = cells.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.min("vec_id").alias("min_vec_id"),
        F.max("vec_id").alias("max_vec_id"),
    )
    out = _run_to_table(agg, "complete")
    return out.select(
        F.col("cell").cast("long").alias("cell"),
        "n_vectors",
        "min_vec_id",
        "max_vec_id",
    ).orderBy("cell")


@register(
    "b21_stream_three_way_join",
    oracle="""
        SELECT v.user_id AS user_id,
               v.event_id AS view_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id
        FROM events v
        JOIN events c
          ON c.user_id = v.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
        JOIN events p
          ON p.user_id = v.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
    """,
    tags=("streaming", "join"),
)
def b21_stream_three_way_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-way stream-stream interval join — the multi-way stream-join
    shape (view -> click within 6 h -> purchase within 6 h of the click) chained as two stateful joins in one query (Spark 3.5+
    watermark propagation through stateful operators).

    Same exactness argument as b21_stream_interval_join, applied twice:
    inner interval joins emit eagerly and in-order replay guarantees no
    left row is evicted before its last possible match, so the chained
    streamed result equals the batch three-way join bit-for-bit.  State
    for BOTH joins is bounded by (delay + interval) x per-key rate, and
    all three inputs shuffle once on user_id — the second join reuses the
    first's key partitioning.
    """
    load_tables(spark, sf_dir)
    ev = _events_stream(spark, sf_dir)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("etime").alias("vtime"),
        )
        .withWatermark("vtime", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("etime").alias("ctime"),
        )
        .withWatermark("ctime", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("etime").alias("ptime"),
        )
        .withWatermark("ptime", "1 hour")
    )
    vc = views.join(
        clicks,
        F.expr(
            """
            user_id = c_user_id AND
            ctime >= vtime AND
            ctime <= vtime + INTERVAL 6 HOURS
            """
        ),
    ).select("user_id", "view_id", "click_id", "ctime")
    vcp = vc.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id AND
            ptime >= ctime AND
            ptime <= ctime + INTERVAL 6 HOURS
            """
        ),
    ).select("user_id", "view_id", "click_id", "purchase_id")
    return _run_to_table(vcp, "append")


@register(
    "b26_stream_cdc_apply",
    oracle="""
        WITH last AS (
          SELECT user_id, event_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, event_id AS last_event,
               CAST(value AS DOUBLE) AS value
        FROM last WHERE rn = 1 AND event_type <> 'purchase'
    """,
    tags=("sink", "streaming", "cdc"),
)
def b26_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply with DELETE tombstones (the Debezium-style
    changelog consumer): every event is an upsert for its user except
    'purchase', which is a delete tombstone; each micro-batch reduces to
    per-user last ops (one window, |users-in-batch| rows out) and MERGEs
    them into a DISTRIBUTED keyed state table — newest (ts, event_id)
    wins; tombstones are kept in state with an explicit ``is_delete``
    flag (never encoded as a NULL value, so a genuine NULL-valued upsert
    survives as a row with NULL value).  After AvailableNow replay the
    state table equals the batch keep-latest-minus-deleted rule exactly.

    Scale shape (the Delta-style copy-on-write MERGE): the state table
    is hash-partitioned into key buckets on disk; each batch (1) reduces
    to one row per active key (distributed window), (2) reads back ONLY
    the buckets the batch touches, (3) re-reduces batch+existing with
    the same newest-wins window, (4) rewrites just those buckets to a
    new version directory.  Per-key state NEVER reaches the driver — the
    only driver-side collect is the touched-bucket list (bounded by the
    bucket count) and a bucket→file manifest of the same size, the moral
    equivalent of a Delta transaction log entry.  Reference semantics
    preserved: newest-(ts,id)-wins with delete tombstones, the
    offset-integrity spirit of ``process/StreamStateHandler.java:53-102``.
    Plan-pinned: tests/test_scale_patterns.py (no per-key collect).
    """
    from ..streaming.keyed_state import BucketedKeyedState

    load_tables(spark, sf_dir)
    state = BucketedKeyedState(
        scratch_dir("cdc_apply_"),
        "user_id",
        "user_id long, last_event long, value double, "
        "tmicros long, is_delete boolean",
    )

    def merge_batch(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("tmicros").desc(), F.col("event_id").desc()
        )
        batch_last = (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("user_id").cast("long").alias("user_id"),
                F.col("event_id").cast("long").alias("last_event"),
                F.col("value").cast("double").alias("value"),
                F.col("tmicros").cast("long").alias("tmicros"),
                (F.col("event_type") == F.lit("purchase")).alias(
                    "is_delete"
                ),
            )
        )
        touched = state.touched_buckets(batch_last)
        if not touched:
            return
        merged = batch_last.unionByName(
            state.read_buckets(df.sparkSession, touched)
        )
        w2 = Window.partitionBy("user_id").orderBy(
            F.col("tmicros").desc(), F.col("last_event").desc()
        )
        out = (
            merged.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        state.write_buckets(out, batch_id, touched)

    ev = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros(F.col("etime")).alias("tmicros"),
    )
    with _stream_partitions(spark):
        q = (
            ev.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", scratch_dir("ckpt_cdc_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        state.read_all(spark)
        .filter(~F.col("is_delete"))
        .select("user_id", "last_event", "value")
        .orderBy("user_id")
    )


def _scd2_merge(state, closed_dir: str):
    """Per-micro-batch SCD2 interval stitch against a
    :class:`~..streaming.keyed_state.BucketedKeyedState` of open
    intervals.  Module-level so the crash-replay test can drive batches
    directly.

    Replay contract: the stitch is NOT idempotent — re-running a batch
    after the open-interval state already advanced would stitch against
    its own output and overwrite ``closed/b{batch_id}`` without the
    pre-batch open interval's closure, silently losing a history row.
    The state-manifest advance is the final step of the merge, so
    ``batch_id <= state.last_batch()`` detects re-delivery after
    checkpoint recovery and no-ops (the sibling guard to
    ``_admission_process``; a crash BEFORE the manifest advance replays
    against unchanged state and rewrites identical output)."""
    from pyspark.sql.window import Window

    def merge_batch(df: DataFrame, batch_id: int) -> None:
        sess = df.sparkSession
        if batch_id <= state.last_batch():
            return
        rows = df.filter(F.col("user_id") < 100).select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_type").alias("value"),
            F.col("tmicros").cast("long").alias("t"),
            F.col("event_id").cast("long").alias("eid"),
        )
        w = Window.partitionBy("user_id").orderBy("t", "eid")
        batch_chg = (
            rows.withColumn("prev", F.lag("value").over(w))
            .filter(F.col("prev").isNull() | (F.col("prev") != F.col("value")))
            .select("user_id", "value", "t", "eid")
        )
        touched = state.touched_buckets(batch_chg)
        if not touched:
            return
        existing = state.read_buckets(sess, touched)
        batch_keys = batch_chg.select("user_id").distinct()
        # open intervals of keys ACTIVE this batch join the stitch;
        # same-bucket bystanders pass through untouched
        active_state = existing.join(batch_keys, "user_id", "semi")
        passthrough = existing.join(batch_keys, "user_id", "anti")
        stitched = active_state.select(
            "user_id", "value",
            F.col("valid_from").alias("t"),
            F.col("valid_from_eid").alias("eid"),
        ).unionByName(batch_chg)
        # re-run the transition filter across the stitch: a batch's first
        # "change" that matches the open interval's value is no change
        w2 = Window.partitionBy("user_id").orderBy("t", "eid")
        effective = (
            stitched.withColumn("prev", F.lag("value").over(w2))
            .filter(F.col("prev").isNull() | (F.col("prev") != F.col("value")))
            .select("user_id", "value", "t", "eid")
        )
        nxt = F.lead("t").over(w2)
        intervals = effective.select(
            "user_id", "value", "t", "eid", nxt.alias("valid_to")
        )
        closed = intervals.filter(F.col("valid_to").isNotNull()).select(
            "user_id", "value",
            F.col("t").alias("valid_from"), "valid_to",
        )
        closed.write.mode("overwrite").parquet(
            os.path.join(closed_dir, f"b{batch_id}")
        )
        new_open = intervals.filter(F.col("valid_to").isNull()).select(
            "user_id", "value",
            F.col("t").alias("valid_from"),
            F.col("eid").alias("valid_from_eid"),
        )
        state.write_buckets(
            passthrough.unionByName(new_open), batch_id, touched
        )

    return merge_batch


@register(
    "b26_stream_scd2_history",
    oracle="""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS t
          FROM events WHERE user_id < 100),
        o AS (
          SELECT user_id, event_id, event_type, t,
                 LAG(event_type) OVER (PARTITION BY user_id
                      ORDER BY t, event_id) AS prev
          FROM e),
        chg AS (SELECT * FROM o
                WHERE prev IS NULL OR prev <> event_type),
        iv AS (
          SELECT user_id, event_type AS value, t AS valid_from,
                 LEAD(t) OVER (PARTITION BY user_id
                      ORDER BY t, event_id) AS valid_to
          FROM chg)
        SELECT user_id, value, valid_from, valid_to FROM iv
    """,
    tags=("sink", "streaming", "cdc", "scd2"),
)
def b26_stream_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 (slowly-changing-dimension type 2) history
    maintenance: the changelog consumer that keeps a FULL validity-
    interval history instead of last-op state.  Per micro-batch and per
    key: detect in-batch attribute transitions with one window, stitch
    them against the key's OPEN interval from the distributed bucketed
    state table (streaming/keyed_state.py — the same copy-on-write MERGE
    the CDC apply uses), append the intervals that CLOSED this batch to
    an append-only parquet log, and keep exactly one open interval per
    key as the new state.  After AvailableNow replay, closed + open
    intervals equal the batch SCD2 computation exactly.

    Scale shape: the per-batch shuffle carries transition rows only
    (bounded by batch size), the state table holds ONE row per key, and
    closed intervals stream out append-only — no history ever rewrites.
    Per-key state never reaches the driver (the touched-bucket list is
    the only collect).

    Assumes IN-ORDER event-time arrival per key (the replay's ordered
    chunks guarantee it): an event older than a key's open interval
    would require repairing already-closed history — a changelog source
    with late data needs a watermark-delayed stitch or periodic interval
    compaction on top of this operator, the caveat every append-only
    SCD2 maintainer carries."""
    from ..streaming.keyed_state import BucketedKeyedState

    load_tables(spark, sf_dir)
    root = scratch_dir("scd2_hist_")
    closed_dir = os.path.join(root, "closed")
    os.makedirs(closed_dir, exist_ok=True)
    iv_schema = (
        "user_id long, value string, valid_from long, "
        "valid_from_eid long"
    )
    state = BucketedKeyedState(
        os.path.join(root, "state"), "user_id", iv_schema
    )
    closed_schema = (
        "user_id long, value string, valid_from long, valid_to long"
    )
    merge_batch = _scd2_merge(state, closed_dir)

    ev = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("etime")).alias("tmicros"),
    )
    with _stream_partitions(spark):
        q = (
            ev.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", scratch_dir("ckpt_scd2_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    batch_dirs = [
        os.path.join(closed_dir, d) for d in sorted(os.listdir(closed_dir))
    ]
    sess = spark
    if batch_dirs:
        closed_all = sess.read.schema(closed_schema).parquet(*batch_dirs)
    else:
        closed_all = sess.createDataFrame([], closed_schema)
    open_iv = state.read_all(sess).select(
        "user_id", "value", "valid_from",
        F.lit(None).cast("long").alias("valid_to"),
    )
    return closed_all.unionByName(open_iv).orderBy(
        "user_id", "valid_from"
    )


class VersionedServingTable:
    """Keyed serving table maintained by distributed MERGE: every merge
    writes a FRESH ``v_<id>`` parquet directory and atomically repoints
    ``CURRENT``, so readers of the current version are never disturbed
    and a crash leaves either the old or the new version — never a torn
    table.  The version name records the last merged batch id, which
    makes ``merge`` idempotent under foreachBatch replay (a re-delivered
    batch id is a no-op — the already-merged discipline of the 2PC
    sink's ALREADY_EXISTS trim).  At 100 TB the rewrite is scoped to the
    partitions the MERGE touches (partition the version dirs by key
    range); the single-directory rewrite here is the small-key-space
    layout."""

    def __init__(self, spark: SparkSession, root: str, key: str):
        self.spark = spark
        self.root = root
        self.key = key
        self.pointer = os.path.join(root, "CURRENT")

    def _current(self) -> str:
        with open(self.pointer) as f:
            return f.read().strip()

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self._current())

    def write(self, df: DataFrame, version: str) -> None:
        path = os.path.join(self.root, f"v_{version}")
        df.write.mode("overwrite").parquet(path)
        tmp = self.pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(path)
        os.replace(tmp, self.pointer)

    def merge(self, batch_id: int, p: DataFrame) -> None:
        """Full-outer MERGE of a partial aggregate (columns: key, n, tv)
        into the current version; no-op when ``batch_id`` was already
        merged."""
        if os.path.basename(self._current()) == f"v_b{batch_id}":
            return
        cur = self.read()
        merged = (
            cur.alias("a")
            .join(p.alias("b"), self.key, "full")
            .select(
                self.key,
                (
                    F.coalesce(F.col("a.n"), F.lit(0))
                    + F.coalesce(F.col("b.n"), F.lit(0))
                ).alias("n"),
                (
                    F.coalesce(F.col("a.tv"), F.lit(0).cast("decimal(20,4)"))
                    + F.coalesce(F.col("b.tv"), F.lit(0).cast("decimal(20,4)"))
                )
                .cast("decimal(20,4)")
                .alias("tv"),
            )
        )
        self.write(merged, f"b{batch_id}")


@register(
    "b26_stream_backfill",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("connector", "streaming", "backfill"),
)
def b26_stream_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kappa-style BACKFILL + streaming catch-up with an exact seam: a
    batch job aggregates the historical chunks into a keyed serving
    table and records its id high-watermark; the streaming tail then
    replays the full chunk feed but admits only rows PAST the watermark,
    merging per-batch partial aggregates into the serving table with a
    distributed full-outer MERGE (versioned parquet + atomic pointer —
    no driver-side state, unlike b26_incremental_matview's tiny-JSON
    variant, so the key space can be millions of rows).  Decimal partial
    sums make every merge order-free, so backfill + tail equals the
    batch aggregate EXACTLY — the seam loses and duplicates nothing."""
    load_tables(spark, sf_dir)
    n_chunks = 4
    chunk_dir = _write_ordered_chunks(sf_dir, "events", "event_id", n_chunks)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    serving = VersionedServingTable(
        spark, scratch_dir("backfill_state_"), "event_type"
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 14, 4))
            .cast("decimal(20,4)")
            .alias("tv"),
        )

    # -- backfill: batch over the historical chunks (c0, c1) ---------------
    # (a zero-row source materializes a single empty chunk — take what
    # exists; the tail then replays the same feed)
    hist_paths = [
        p
        for p in (
            os.path.join(chunk_dir, "c0.parquet"),
            os.path.join(chunk_dir, "c1.parquet"),
        )
        if os.path.exists(p)
    ]
    history = spark.read.schema(schema).parquet(*hist_paths)
    serving.write(partial(history), "backfill")
    # the recorded handoff watermark — one scalar, the backfill's manifest
    wm = history.agg(F.max("event_id")).collect()[0][0]
    wm = -1 if wm is None else wm

    # -- streaming tail: full feed, seam-filtered, MERGE per batch ---------
    def merge_batch(df: DataFrame, batch_id: int) -> None:
        serving.merge(batch_id, partial(df.filter(F.col("event_id") > wm)))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )
    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", scratch_dir("ckpt_bf_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return serving.read().select(
        "event_type", "n", dbl(F.col("tv")).alias("total_value")
    ).orderBy("event_type")


@register(
    "b24_stream_decontaminate",
    oracle="""
        WITH t AS (SELECT doc_id, source,
                          regexp_extract_all(COALESCE(text, ''), '\\S+')
                              AS toks
                   FROM documents),
        g AS (SELECT doc_id, source,
                     CASE WHEN len(toks) >= 3
                          THEN list_transform(range(1, len(toks) - 1),
                               i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])
                          ELSE []::VARCHAR[] END AS grams
              FROM t),
        ex AS (SELECT DISTINCT doc_id, source, s
               FROM (SELECT doc_id, source, unnest(grams) AS s FROM g)),
        bench AS (SELECT DISTINCT s FROM ex
                  WHERE source IN ('src0', 'src1'))
        SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM ex e JOIN bench b ON e.s = b.s
        WHERE e.source NOT IN ('src0', 'src1')
        GROUP BY e.doc_id
    """,
    tags=("streaming", "decontamination"),
)
def b24_stream_decontaminate(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """INGEST-TIME decontamination: the benchmark gram set is computed
    once from the fixed eval sources and broadcast; documents then
    arrive as crawl-snapshot chunks and every micro-batch flags its own
    docs' shared-gram counts against the static set — contaminated
    documents are caught at ingest, before they ever reach a training
    mix.  Each doc streams exactly once and the benchmark side is fixed,
    so the union of per-batch results IS the batch answer
    (llm_decontaminate's asymmetric broadcast join, chunked over
    arrival).  At 100 TB the benchmark gram set is MBs (eval sets are
    small by definition) and the per-batch work is one broadcast-hash
    join over the new chunk only."""
    from ..operators.dedup import shingles_expr, tokens_expr

    chunk_dir = _write_ordered_chunks(sf_dir, "documents", "doc_id", n_chunks)
    out_dir = scratch_dir("decon_out_")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    is_bench = F.col("source").isin("src0", "src1")
    # the static benchmark gram set — computed ONCE, before the stream
    bench = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(is_bench)
        .select(F.explode(shingles_expr(tokens_expr(F.col("text")))).alias("s"))
        .distinct()
    )
    bench.persist().count()  # materialize once; every batch reuses it

    def process(batch_df, batch_id: int) -> None:
        flagged = (
            batch_df.filter(~is_bench)
            .select(
                "doc_id",
                F.explode(
                    shingles_expr(tokens_expr(F.col("text")))
                ).alias("s"),
            )
            .distinct()
            .join(F.broadcast(bench), "s")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
        # per-batchId dir + overwrite = replay-idempotent append
        flagged.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b{batch_id}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )
    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", scratch_dir("ckpt_decon_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    bench.unpersist()
    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(out_dir, "b*")))
    out = spark.read.parquet(*parts)
    return out.select("doc_id", F.col("n_shared").cast("long"))


def _admission_process(state, out_dir: str, budget: int):
    """Per-micro-batch quota-admission merge against a
    :class:`~..streaming.keyed_state.BucketedKeyedState` of per-source
    carried token totals.  Module-level (not a closure inside the query)
    so the crash-replay test can drive individual batches directly.

    Replay contract: the state-manifest advance is the FINAL step, so
    ``batch_id <= state.last_batch()`` means this batch already merged —
    re-delivery after checkpoint recovery no-ops (running totals are not
    idempotent under re-addition).  A crash between the output write and
    the manifest advance replays with unchanged carried totals and
    overwrites ``out_dir/b{batch_id}`` with identical rows.  No per-key
    row ever reaches the driver: carried totals join distributed, and
    the only collect is the bucket-id list (bounded by n_buckets)."""
    from pyspark.sql.window import Window

    from ..operators.text import token_count_expr

    def process(batch_df, batch_id: int) -> None:
        s = batch_df.sparkSession
        if batch_id <= state.last_batch():
            return
        base = batch_df.select(
            "doc_id", "source", token_count_expr(F.col("text")).alias("n_tokens")
        )
        totals = base.groupBy("source").agg(
            F.sum("n_tokens").cast("long").alias("t")
        )
        touched = state.touched_buckets(totals)
        prior = state.read_buckets(s, touched)
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cumulated = (
            base.withColumn(
                "in_batch_before",
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
            )
            .join(prior, "source", "left")
            .select(
                "doc_id",
                "source",
                "n_tokens",
                (
                    F.col("in_batch_before")
                    + F.coalesce(F.col("carried"), F.lit(0))
                ).cast("long").alias("cum_before"),
            )
        )
        admitted = cumulated.filter(F.col("cum_before") < budget)
        admitted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b{batch_id}")
        )
        # advance carried totals with the batch's FULL per-source sums
        # (the budget rule counts all prior arrivals, admitted or not);
        # prior rows of touched buckets whose source is absent from this
        # batch survive via the full outer join
        merged = (
            totals.join(prior, "source", "full")
            .select(
                "source",
                (
                    F.coalesce(F.col("carried"), F.lit(0))
                    + F.coalesce(F.col("t"), F.lit(0))
                ).cast("long").alias("carried"),
            )
        )
        state.write_buckets(merged, batch_id, touched)

    return process


@register(
    "b25_stream_budget_admission",
    oracle="""
        WITH base AS (
            SELECT doc_id, source,
                   CAST(len(regexp_extract_all(COALESCE(text, ''), '\\S+'))
                        AS BIGINT) AS n_tokens
            FROM documents),
        cum AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_before
            FROM base)
        SELECT doc_id, source, n_tokens, CAST(cum_before AS BIGINT) AS cum_before
        FROM cum WHERE cum_before < 800
    """,
    tags=("streaming", "sampling"),
)
def b25_stream_budget_admission(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """Streaming QUOTA ADMISSION: documents arrive as ordered crawl
    chunks and each source admits docs in ARRIVAL order until its
    800-token budget is consumed — the ingest-side quota enforcement
    twin of llm_mix_token_budget's batch mix construction (which orders
    by hash instead).  Per batch the admission decision is a window
    prefix-sum over the chunk plus each source's carried-over total; the
    carried totals live in a BucketedKeyedState parquet table (the same
    durable, bucket-merged pattern as the CDC/SCD2 state), so admission
    state survives driver failure and never sits on one machine's local
    disk; re-delivered batches are detected via the state manifest's
    last-written version and no-op.  The ordered replay makes the
    admitted set EXACTLY the batch arrival-order prefix-sum answer,
    which is what the oracle checks."""
    from ..streaming.keyed_state import BucketedKeyedState

    budget = 800
    chunk_dir = _write_ordered_chunks(sf_dir, "documents", "doc_id", n_chunks)
    out_dir = scratch_dir("admit_out_")
    state = BucketedKeyedState(
        scratch_dir("admit_state_"), "source", "source string, carried long"
    )
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    process = _admission_process(state, out_dir, budget)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )
    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", scratch_dir("ckpt_admit_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(out_dir, "b*")))
    return spark.read.parquet(*parts).select(
        "doc_id", "source", "n_tokens", "cum_before"
    )


# ---------------------------------------------------------------------------
# B26 — dead-letter routing around the at-least-once sink (round 7)
# ---------------------------------------------------------------------------


@register(
    "b26_stream_deadletter",
    oracle="""
        WITH c AS (
          SELECT event_id, user_id,
                 CASE WHEN event_id % 17 = 0 THEN '{"k":' ELSE props END AS p
          FROM events),
        r AS (
          SELECT event_id, user_id,
                 TRY_CAST(CASE WHEN p IS NOT NULL AND json_valid(p)
                               THEN json_extract_string(p, '$.k') END
                          AS BIGINT) AS kv
          FROM c)
        SELECT event_id, user_id, 'main' AS destination,
               kv AS k_value,
               CAST(NULL AS VARCHAR) AS reason
        FROM r WHERE kv IS NOT NULL
        UNION ALL
        SELECT event_id, user_id, 'dlq' AS destination,
               CAST(NULL AS BIGINT) AS k_value,
               'PARSE_ERROR' AS reason
        FROM r WHERE kv IS NULL
    """,
    tags=("sink", "errors"),
)
def b26_stream_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing: the streaming ingest path splits every
    micro-batch on a SERIALIZATION contract (payload must parse and
    carry an integral ``k``) — conforming rows append through the
    at-least-once default-stream sink, poison rows land in a DLQ table
    with a reason tag instead of failing the stream (the error-routing
    discipline of the reference's async writer, A16
    ``sink/async/AsyncBigQuerySinkWriter.java`` — a non-retryable
    serialization error must never poison-pill the pipeline).  The
    deterministic corruption (event_id % 17 truncates the JSON) is
    injected in-query so the oracle can derive the exact split; main
    UNION dlq equals the source row-for-row — nothing is lost, nothing
    lands twice.  DLQ writes are per-batch overwrite directories, so a
    replayed batch is idempotent; at 100 TB both destinations are plain
    appends with no cross-batch state."""
    from ..streaming.sinks import DefaultStreamSink

    load_tables(spark, sf_dir)
    backend_root = scratch_dir("fbq_dlq_")
    dlq_root = scratch_dir("dlq_table_")
    table = "proj.ds.events_main"
    ev = _events_stream(spark, sf_dir)
    corrupted = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 17 == 0, F.lit('{"k":'))
        .otherwise(F.col("props"))
        .alias("p"),
    )
    parsed = corrupted.withColumn(
        "k_value", F.from_json("p", "k BIGINT").getField("k")
    )
    sink = DefaultStreamSink(backend_root, table)

    def route(batch_df, batch_id: int) -> None:
        good = batch_df.filter(F.col("k_value").isNotNull()).select(
            "event_id", "user_id", "k_value"
        )
        bad = batch_df.filter(F.col("k_value").isNull()).select(
            "event_id", "user_id"
        )
        sink.write_batch(good, batch_id)
        bad.write.mode("overwrite").parquet(
            os.path.join(dlq_root, f"batch={batch_id}")
        )

    q = (
        parsed.writeStream.foreachBatch(route)
        .option("checkpointLocation", scratch_dir("ckpt_dlq_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from ..sources import bq_datasource as dsrc

    dsrc.register(spark)
    main = (
        spark.read.format(dsrc.SOURCE_NAME)
        .schema("event_id long, user_id long, k_value long")
        .option("root", backend_root)
        .option("table", table)
        .load()
        .select(
            "event_id",
            "user_id",
            F.lit("main").alias("destination"),
            "k_value",
            F.lit(None).cast("string").alias("reason"),
        )
    )
    batch_dirs = [
        os.path.join(dlq_root, d)
        for d in sorted(os.listdir(dlq_root))
        if d.startswith("batch=")
    ]
    dlq_schema = "event_id long, user_id long"
    if batch_dirs:
        dlq = spark.read.schema(dlq_schema).parquet(*batch_dirs)
    else:  # zero-batch replay: empty source produced no routed batches
        dlq = spark.createDataFrame([], dlq_schema)
    dlq = dlq.select(
        "event_id",
        "user_id",
        F.lit("dlq").alias("destination"),
        F.lit(None).cast("long").alias("k_value"),
        F.lit("PARSE_ERROR").alias("reason"),
    )
    return main.unionByName(dlq)


@register(
    "b18_stream_percentile",
    oracle="""
        WITH base AS (
          SELECT event_type AS g, CAST(value AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL),
        tot AS (SELECT g, COUNT(*) AS n FROM base GROUP BY g),
        hist AS (
          SELECT g, CAST(FLOOR(v / 25.0) AS BIGINT) AS bucket,
                 COUNT(*) AS cnt
          FROM base GROUP BY 1, 2),
        cum AS (
          SELECT g, bucket, cnt,
                 SUM(cnt) OVER (PARTITION BY g ORDER BY bucket) AS cum,
                 COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS cum_before
          FROM hist),
        qual AS (
          SELECT c.g, t.n, p.p, c.bucket, c.cnt, c.cum_before,
                 ROW_NUMBER() OVER (PARTITION BY c.g, p.p
                                    ORDER BY c.bucket) AS rn
          FROM cum c
          JOIN tot t ON c.g = t.g
          CROSS JOIN (VALUES (CAST(0.50 AS DOUBLE)), (CAST(0.90 AS DOUBLE)),
                              (CAST(0.99 AS DOUBLE))) AS p(p)
          WHERE CAST(c.cum AS DOUBLE) >= p.p * CAST(t.n AS DOUBLE))
        SELECT g AS event_type, CAST(n AS BIGINT) AS n, p,
               floor((bucket * 25.0
                     + 25.0 * (p * CAST(n AS DOUBLE)
                               - CAST(cum_before AS DOUBLE))
                       / CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5)
                   / 1000000.0 AS value_est
        FROM qual WHERE rn = 1
    """,
    tags=("sketch", "streaming"),
)
def b18_stream_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING percentiles — the monitoring staple (p50/p90/p99 of a
    metric, maintained while data arrives): each micro-batch folds its
    per-(group, bucket) equi-width histogram delta into durable
    :class:`BucketedKeyedState` counts (a replay-guarded non-idempotent
    merge — a re-delivered batch after checkpoint recovery must no-op,
    not double-count), and the quantile read interpolates over the MERGED
    histogram exactly as the batch twin (b18_percentile_histogram) does.
    The state is bounded by |groups| x |buckets| regardless of stream
    volume — this is why histogram sketches, not sorted values, are how
    percentiles are kept at 100 TB/day: the per-batch work is one
    map-side-combinable count plus a merge over touched hash-buckets of
    a KB-sized table, and the final read costs O(histogram), never
    O(data).  Oracle: the batch histogram over the same events —
    streaming accumulation must lose nothing and count nothing twice."""
    from pyspark.sql.window import Window

    from ..streaming.keyed_state import BucketedKeyedState
    from .relational import _PH_W

    load_tables(spark, sf_dir)
    state = BucketedKeyedState(
        scratch_dir("stream_pctl_"),
        key_col="k",
        # histogram bucket is named hb: the state's own hash-partition
        # column is called "bucket" and would clobber it on write
        schema="k string, g string, hb long, cnt long",
        n_buckets=8,
    )
    ev = _events_stream(spark, sf_dir)

    def merge(batch_df, batch_id: int) -> None:
        if batch_id <= state.last_batch():
            return  # re-delivered batch: counts must not double-apply
        delta = (
            batch_df.filter(F.col("value").isNotNull())
            .select(
                F.col("event_type").alias("g"),
                F.floor(F.col("value").cast("double") / F.lit(_PH_W))
                .cast("long")
                .alias("hb"),
            )
            .groupBy("g", "hb")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "k",
                F.concat_ws("|", F.col("g"), F.col("hb").cast("string")),
            )
            .select("k", "g", "hb", "cnt")
        )
        touched = state.touched_buckets(delta)
        if not touched:
            return
        merged = (
            state.read_buckets(spark, touched)
            .unionByName(delta)
            .groupBy("k", "g", "hb")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        state.write_buckets(merged, batch_id, touched)

    q = (
        ev.writeStream.foreachBatch(merge)
        .option("checkpointLocation", scratch_dir("ckpt_pctl_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    hist = state.read_all(spark).select(
        "g", F.col("hb").alias("bucket"), "cnt"
    )
    tot = hist.groupBy("g").agg(F.sum("cnt").cast("long").alias("n"))
    wc = Window.partitionBy("g").orderBy("bucket")
    cum = hist.select(
        "g",
        "bucket",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.coalesce(
            F.sum("cnt").over(
                wc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cum_before"),
    )
    ps = spark.createDataFrame([(0.50,), (0.90,), (0.99,)], "p double")
    qual = (
        cum.join(tot, "g")
        .crossJoin(F.broadcast(ps))
        .filter(
            F.col("cum").cast("double")
            >= F.col("p") * F.col("n").cast("double")
        )
    )
    wq = Window.partitionBy("g", "p").orderBy("bucket")
    est = F.col("bucket") * F.lit(_PH_W) + F.lit(_PH_W) * (
        F.col("p") * F.col("n").cast("double")
        - F.col("cum_before").cast("double")
    ) / F.col("cnt").cast("double")
    return (
        qual.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select(
            F.col("g").alias("event_type"),
            F.col("n"),
            "p",
            numeric.round6_expr(est).alias("value_est"),
        )
    )


@register(
    "b26_stream_schema_evolution",
    oracle="""
        SELECT event_id, user_id, value,
               CASE WHEN event_id % 2 = 1 THEN event_type END AS category
        FROM events
    """,
    tags=("sink", "schema"),
)
def b26_stream_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream additive schema evolution — A22's ``updateTable``
    (``schema/SchemaTools.java:87-100``) exercised where it actually
    happens in production: BETWEEN two deployments of a running ingest.
    Deployment 1 streams half the events into a 3-column catalog table;
    the schema then evolves via SchemaTools.update_table (ADD COLUMNS —
    the reference's additive patch, never a rewrite); deployment 2 resumes
    ingest writing the new ``category`` column.  The final table serves
    BOTH generations through the evolved schema — pre-evolution rows read
    NULL in the new column, exactly the BigQuery additive-evolution
    contract, with zero data rewritten (old parquet footers simply lack
    the column).  Scale shape: evolution is a catalog-metadata operation
    (O(1), no data pass); each deployment is a plain streaming append."""
    from pyspark.sql.types import StructType

    from ..schema.tools import SchemaTools

    load_tables(spark, sf_dir)
    tools = SchemaTools(spark)
    table = unique_name("evo_stream")
    loc = scratch_dir("evo_tbl_")
    gen1 = StructType.fromDDL("event_id BIGINT, user_id BIGINT, value DOUBLE")
    tools.create_table(table, gen1, location=loc)

    def run_phase(df, ckpt: str) -> None:
        def append(batch_df, batch_id: int) -> None:
            batch_df.write.mode("append").insertInto(table)

        q = (
            df.writeStream.foreachBatch(append)
            .option("checkpointLocation", scratch_dir(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ev = _events_stream(spark, sf_dir)
    run_phase(
        ev.filter(F.col("event_id") % 2 == 0).select(
            "event_id", "user_id", "value"
        ),
        "ckpt_evo1_",
    )
    # deployment boundary: additive evolution, metadata-only
    gen2 = StructType.fromDDL(
        "event_id BIGINT, user_id BIGINT, value DOUBLE, category STRING"
    )
    diff = tools.update_table(table, gen2)
    assert diff["added"] and not diff["dropped"]
    ev2 = _events_stream(spark, sf_dir)
    run_phase(
        ev2.filter(F.col("event_id") % 2 == 1).select(
            "event_id",
            "user_id",
            "value",
            F.col("event_type").alias("category"),
        ),
        "ckpt_evo2_",
    )
    return spark.table(table)


@register(
    "b26_stream_dlq_replay",
    oracle="""
        WITH c AS (
          SELECT event_id, user_id,
                 CASE WHEN event_id % 17 = 0 THEN '{"k":' ELSE props END AS p,
                 props AS orig
          FROM events),
        r AS (
          SELECT event_id, user_id,
                 TRY_CAST(CASE WHEN p IS NOT NULL AND json_valid(p)
                               THEN json_extract_string(p, '$.k') END
                          AS BIGINT) AS kv,
                 TRY_CAST(CASE WHEN orig IS NOT NULL AND json_valid(orig)
                               THEN json_extract_string(orig, '$.k') END
                          AS BIGINT) AS kv_orig
          FROM c)
        SELECT event_id, user_id, 'main' AS destination,
               kv AS k_value, CAST(NULL AS VARCHAR) AS reason
        FROM r WHERE kv IS NOT NULL
        UNION ALL
        SELECT event_id, user_id, 'main_replayed' AS destination,
               kv_orig AS k_value, CAST(NULL AS VARCHAR) AS reason
        FROM r WHERE kv IS NULL AND kv_orig IS NOT NULL
        UNION ALL
        SELECT event_id, user_id, 'dlq' AS destination,
               CAST(NULL AS BIGINT) AS k_value,
               'PARSE_ERROR' AS reason
        FROM r WHERE kv IS NULL AND kv_orig IS NULL
    """,
    tags=("sink", "errors"),
)
def b26_stream_dlq_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter REPLAY — the recovery half of b26_stream_deadletter's
    routing contract: after the streaming pass has quarantined poison rows,
    a batch backfill re-reads the DLQ, joins it back to the (now fixed)
    upstream for each row's original payload, re-parses, and merges the
    recoveries into the main table.  Rows whose original payload is genuinely
    unparseable stay dead-lettered — a replay must converge, not loop.
    The backfill writes through the EXACTLY-ONCE BufferedStreamSink under
    a replay-epoch batch id disjoint from every streaming micro-batch id,
    and the query deliberately runs the backfill TWICE — the second run
    must be a committed-batch no-op, so the oracle comparison itself
    proves backfill idempotence on every execution at every scale.
    Scale shape: the DLQ is small by construction (the error fraction), so
    the recovery join broadcasts the DLQ side against the source; the main
    table is never rewritten, only appended to."""
    from ..streaming.sinks import BufferedStreamSink, DefaultStreamSink

    t = load_tables(spark, sf_dir)
    backend_root = scratch_dir("fbq_dlqr_")
    dlq_root = scratch_dir("dlqr_table_")
    table = "proj.ds.events_main_replay"
    ev = _events_stream(spark, sf_dir)
    corrupted = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 17 == 0, F.lit('{"k":'))
        .otherwise(F.col("props"))
        .alias("p"),
    )
    parsed = corrupted.withColumn(
        "k_value", F.from_json("p", "k BIGINT").getField("k")
    )
    sink = DefaultStreamSink(backend_root, table)

    def route(batch_df, batch_id: int) -> None:
        good = batch_df.filter(F.col("k_value").isNotNull()).select(
            "event_id", "user_id", "k_value"
        )
        bad = batch_df.filter(F.col("k_value").isNull()).select(
            "event_id", "user_id"
        )
        sink.write_batch(good, batch_id)
        bad.write.mode("overwrite").parquet(
            os.path.join(dlq_root, f"batch={batch_id}")
        )

    q = (
        parsed.writeStream.foreachBatch(route)
        .option("checkpointLocation", scratch_dir("ckpt_dlqr_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # --- batch backfill: replay the DLQ against the fixed upstream ------
    batch_dirs = [
        os.path.join(dlq_root, d)
        for d in sorted(os.listdir(dlq_root))
        if d.startswith("batch=")
    ]
    dlq_schema = "event_id long, user_id long"
    if batch_dirs:
        dlq_first = spark.read.schema(dlq_schema).parquet(*batch_dirs)
    else:
        dlq_first = spark.createDataFrame([], dlq_schema)
    recovered = (
        t["events"]
        .select(
            "event_id", F.from_json("props", "k BIGINT")["k"].alias("k_value")
        )
        .join(F.broadcast(dlq_first), "event_id")
        .select("event_id", "user_id", "k_value")
    )
    # Disjoint replay-epoch batch id: can never collide with a streaming
    # micro-batch id; the 2PC commit log makes re-running it a no-op.
    _REPLAY_EPOCH = 1_000_000_000
    replay_sink = BufferedStreamSink(backend_root, table)
    good_recovered = recovered.filter(F.col("k_value").isNotNull())
    replay_sink.write_batch(good_recovered, _REPLAY_EPOCH)
    # deliberate second run: a retried backfill must not double-append —
    # the oracle's exact row counts verify this every time the query runs
    replay_sink.write_batch(good_recovered, _REPLAY_EPOCH)
    still_dead = recovered.filter(F.col("k_value").isNull()).select(
        "event_id", "user_id"
    )

    from ..sources import bq_datasource as dsrc

    dsrc.register(spark)
    main = (
        spark.read.format(dsrc.SOURCE_NAME)
        .schema("event_id long, user_id long, k_value long")
        .option("root", backend_root)
        .option("table", table)
        .load()
    )
    replayed_ids = dlq_first.select("event_id")
    first_pass = main.join(
        F.broadcast(replayed_ids), "event_id", "left_anti"
    ).select(
        "event_id",
        "user_id",
        F.lit("main").alias("destination"),
        "k_value",
        F.lit(None).cast("string").alias("reason"),
    )
    replayed = main.join(F.broadcast(replayed_ids), "event_id").select(
        "event_id",
        "user_id",
        F.lit("main_replayed").alias("destination"),
        "k_value",
        F.lit(None).cast("string").alias("reason"),
    )
    dead = still_dead.select(
        "event_id",
        "user_id",
        F.lit("dlq").alias("destination"),
        F.lit(None).cast("long").alias("k_value"),
        F.lit("PARSE_ERROR").alias("reason"),
    )
    return first_pass.unionByName(replayed).unionByName(dead)


# Shared URL-fixture CTEs from the batch family — module-level import is
# cycle-safe (llm_ops never imports this module and loads first in
# plans/__init__).
from .llm_ops import _SQL_URL_FIXTURE as _URLADM_FIX  # noqa: E402
from .llm_ops import _SQL_URL_SIDE as _URLADM_SIDE  # noqa: E402
from .llm_ops import _URLINC_ENC as _URLADM_ENC  # noqa: E402


def _url_admission_batch(
    spark, state, side, out_dir: str, batch_id: int, ttl: int | None = None
):
    """One micro-batch of URL admission: decide every fetch in ``side``
    against the standing index PLUS earlier same-batch fetches, write
    the replay-idempotent per-batch output, then record every arrival
    in the index (manifest advance LAST — the crash-replay contract).

    With ``ttl`` set (the b24_stream_url_admission_ttl variant), index
    entries expire after ``ttl`` crawl epochs: reads filter prior
    entries to ``seen_batch >= epoch - ttl`` (lazy expiry — a re-fetch
    of a URL whose every record expired is 'ingest_new' again, the
    re-crawl semantics a real frontier wants), and the touched-bucket
    rewrite drops rows already dead for the NEXT epoch (incremental
    compaction for free; untouched buckets compact via
    ``BucketedKeyedState.compact``).  Expiry is batch-SEQUENCE
    arithmetic, never wall clock, so replays are deterministic.

    Module-level, not a closure inside the query (the
    ``_admission_process`` precedent), so unit tests can drive the
    growing-index arm directly: the URL FIXTURE can never produce a
    new-matches-new decision (every derived fetch's base document is
    present in the pre-existing corpus at hamming 0, and ties break to
    the old smaller id), but a real frontier meets never-before-seen
    URLs fetched twice across chunks — exactly the arm
    tests/test_streaming_queries.py::test_url_admission_growing_index
    pins with synthetic fetches."""
    sid = batch_id + 1  # store batch 0 = the seed
    if sid <= state.last_batch():
        return  # replayed, already merged
    if ttl is not None:
        side = side.withColumn("seen_batch", F.lit(sid).cast("long"))
    side = side.persist()
    try:
        if side.isEmpty():
            return
        enc = F.lit(_URLADM_ENC).cast("long")
        touched = state.touched_buckets(side)
        prior = state.read_buckets(spark, touched)
        if ttl is not None:
            # lazy expiry on read: only entries seen within the TTL
            # window are admission candidates
            prior = prior.filter(F.col("seen_batch") >= sid - ttl)

        def cand_view(df):
            return df.select(
                "k",
                F.col("doc_id").alias("cand_id"),
                F.col("base_id").alias("cand_base"),
                F.col("simhash").alias("cand_sh"),
            )

        cands = cand_view(prior).unionByName(cand_view(side))
        matches = side.join(cands, "k").filter(
            (F.col("cand_base") < 0)
            | (F.col("cand_base") < F.col("base_id"))
        )
        best = matches.groupBy("doc_id").agg(
            F.min(
                F.bit_count(
                    F.col("simhash").bitwiseXOR(F.col("cand_sh"))
                ).cast("long")
                * enc
                + F.col("cand_id")
            ).alias("bk")
        )
        ham = F.expr(f"CAST(bk div {_URLADM_ENC} AS INT)")
        epoch_cols = (
            [F.lit(sid).cast("int").alias("epoch")] if ttl is not None else []
        )
        out = side.join(best, "doc_id", "left").select(
            "doc_id",
            "canon_host",
            "cpath",
            *epoch_cols,
            (F.col("bk") % _URLADM_ENC).cast("long").alias(
                "matched_doc_id"
            ),
            ham.alias("hamming"),
            F.when(F.col("bk").isNull(), F.lit("ingest_new"))
            .when(ham <= 3, F.lit("skip_duplicate"))
            .otherwise(F.lit("ingest_changed"))
            .alias("action"),
        )
        # per-batchId dir + overwrite = replay-idempotent output
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b{batch_id}")
        )
        # record EVERY arrival in the index; manifest advance LAST
        state.write_buckets(prior.unionByName(side), sid, touched)
    finally:
        side.unpersist()


@register(
    "b24_stream_url_admission",
    oracle="""
        WITH {FIX},
        {SIDE},
        news AS (SELECT side.*, doc_id % 1000000 AS base_id
                 FROM side WHERE doc_id >= 1000000),
        olds AS (SELECT * FROM side WHERE doc_id < 1000000),
        cands AS (
          SELECT doc_id, canon_host, cpath, simhash,
                 CAST(-1 AS BIGINT) AS base_id, 0 AS origin FROM olds
          UNION ALL
          SELECT doc_id, canon_host, cpath, simhash, base_id, 1 FROM news),
        best AS (
          SELECT n.doc_id,
                 MIN(CAST(bit_count(xor(n.simhash, c.simhash)) AS BIGINT)
                     * {ENC} + c.doc_id) AS k
          FROM news n JOIN cands c
            ON c.canon_host = n.canon_host AND c.cpath = n.cpath
           AND (c.origin = 0 OR c.base_id < n.base_id)
          GROUP BY n.doc_id)
        SELECT n.doc_id, n.canon_host, n.cpath,
               CAST(b.k % {ENC} AS BIGINT) AS matched_doc_id,
               CAST(b.k // {ENC} AS INTEGER) AS hamming,
               CASE WHEN b.k IS NULL THEN 'ingest_new'
                    WHEN b.k // {ENC} <= 3 THEN 'skip_duplicate'
                    ELSE 'ingest_changed' END AS action
        FROM news n LEFT JOIN best b ON n.doc_id = b.doc_id
    """.replace("{FIX}", _URLADM_FIX)
    .replace("{SIDE}", _URLADM_SIDE)
    .replace("{ENC}", str(_URLADM_ENC)),
    tags=("streaming", "dedup", "metadata"),
)
def b24_stream_url_admission(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """INGEST-TIME URL admission — the streaming twin of
    llm_dedup_url_incremental: crawl chunks arrive in crawl order and
    every micro-batch decides, for each arriving URL fetch, against a
    DURABLE per-URL index (``BucketedKeyedState`` keyed by the
    normalized (host, path) block):

      no seen version of this URL        -> 'ingest_new'
      best seen version hamming <= 3     -> 'skip_duplicate'
      best seen version hamming  > 3     -> 'ingest_changed'

    Unlike the batch operator (one static existing corpus), the index
    GROWS as the crawl streams: every arrival — admitted or skipped —
    is recorded (a real frontier remembers every fetch), so a later
    chunk's fetch of the same URL is matched against earlier NEW
    arrivals too, not just the pre-existing corpus.  Fetches of the
    same crawl position (the fixture's mirror/re-crawl pair of one base
    doc) do not see each other — simultaneous fetches in one wave.

    Settled-state contract: candidates(n) = existing corpus ∪ earlier
    new arrivals, which is chunk-count-INDEPENDENT because within-batch
    pairs are handled explicitly (same-batch self-join on the block key
    with the strict crawl-position order) — the union of per-batch
    decisions equals the batch oracle for ANY chunking.

    Scale shape: the standing index is hash-bucketed parquet; each
    micro-batch reads back ONLY the buckets its block keys touch
    (copy-on-write versioned rewrite, replay-guarded by the manifest's
    last-batch id — the StreamStateHandler keyed-state discipline,
    reference ``process/StreamStateHandler.java:53-102``); per-key
    populations are constant-size by the fixture's data-scaled bucket
    construction, and only (block key, 64-bit simhash, ids) ever cross
    a shuffle — never text."""
    return _run_url_admission(spark, sf_dir, n_chunks)


def _run_url_admission(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 3,
    ttl: int | None = None,
) -> DataFrame:
    """Shared runner of the URL-admission stream — the plain
    (grow-forever) and TTL-expiring keys differ only in the liveness
    filter, the ``seen_batch`` column, and the settle-time compaction,
    so they share one pipeline definition."""
    from ..cache import table_footer_count
    from ..operators import dedup
    from ..streaming.keyed_state import BucketedKeyedState
    from .llm_ops import (
        _url_bucket_count,
        _url_fixture,
        _url_parsed,
    )

    chunk_dir = _write_ordered_chunks(sf_dir, "documents", "doc_id", n_chunks)
    out_dir = scratch_dir("urladm_out_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    schema = docs.schema
    # fixture invariants computed from the FULL table, never per batch
    # (whole-table row count straight from the parquet footer — no scan)
    n_buckets = _url_bucket_count(table_footer_count(sf_dir, "documents"))

    def _side(docs_df: DataFrame, new_only: bool) -> DataFrame:
        fx = _url_fixture(dedup.spread(docs_df), n_buckets=n_buckets)
        fx = fx.filter(
            F.col("doc_id") >= 1_000_000
            if new_only
            else F.col("doc_id") < 1_000_000
        )
        # parse + content SimHash in ONE aggregation (host/path ride the
        # groupBy as carry keys) — same fusion as llm_ops._url_side, so
        # each micro-batch pays one tokenize pass and no join-back
        return dedup.simhash_df(
            _url_parsed(fx, with_text=True),
            "doc_id",
            "text",
            carry_cols=("canon_host", "cpath"),
        ).select(
            F.concat_ws("|", "canon_host", "cpath").alias("k"),
            "doc_id",
            "canon_host",
            "cpath",
            F.when(
                F.col("doc_id") >= 1_000_000, F.col("doc_id") % 1_000_000
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("base_id"),
            "simhash",
        )

    state_schema = (
        "k string, doc_id long, canon_host string, cpath string, "
        "base_id long, simhash long"
    )
    if ttl is not None:
        state_schema += ", seen_batch long"
    state = BucketedKeyedState(
        scratch_dir("urladm_state_"), "k", state_schema
    )
    # seed the index with the pre-existing corpus (batch 0 of the store;
    # crawl epoch 0 under TTL semantics).  Persisted for the seed write:
    # the side pipeline (fixture + parse + SimHash over the FULL corpus)
    # is otherwise evaluated three times — touched_buckets' distinct,
    # then twice more under write_buckets' repartition+write (measured
    # 7.1 s per evaluation at the sf10 decade).
    seeded = _side(docs, new_only=False)
    if ttl is not None:
        seeded = seeded.withColumn("seen_batch", F.lit(0).cast("long"))
    seeded = seeded.persist()
    try:
        state.write_buckets(
            seeded, 0, state.touched_buckets(seeded)
        )
    finally:
        seeded.unpersist()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        side = _side(batch_df, new_only=True)
        _url_admission_batch(spark, state, side, out_dir, batch_id, ttl=ttl)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )
    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", scratch_dir("ckpt_urladm_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if ttl is not None:
        # settle-time index compaction: reclaim every entry already dead
        # for the next crawl epoch, across ALL buckets (the touched-
        # bucket rewrites compact incrementally; this sweeps the rest).
        # Reads expire lazily, so this cannot change any decision — the
        # determinism test replays the whole pipeline and compares.
        state.compact(
            spark,
            f"seen_batch >= {n_chunks + 1 - ttl}",
            n_chunks + 1,
        )
    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(out_dir, "b*")))
    return spark.read.parquet(*parts)


_URLADM_TTL = 1  # crawl epochs an index entry stays live (the 7-day-TTL
# twin of process/StreamStateHandler.java:33, in batch-sequence units —
# deterministic under replay, unlike wall clock)


@register(
    "b24_stream_url_admission_ttl",
    oracle="""
        WITH {FIX},
        {SIDE},
        bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
                   FROM documents),
        news AS (SELECT side.*, doc_id % 1000000 AS base_id,
                        1 + CAST(doc_id % 1000000 >
                                 lo + (hi - lo) // 3 AS INT)
                          + CAST(doc_id % 1000000 >
                                 lo + 2 * (hi - lo) // 3 AS INT) AS epoch
                 FROM side, bounds WHERE doc_id >= 1000000),
        olds AS (SELECT side.*, CAST(-1 AS BIGINT) AS base_id, 0 AS epoch
                 FROM side WHERE doc_id < 1000000),
        cands AS (
          SELECT doc_id, canon_host, cpath, simhash, base_id, epoch
          FROM olds
          UNION ALL
          SELECT doc_id, canon_host, cpath, simhash, base_id, epoch
          FROM news),
        best AS (
          SELECT n.doc_id,
                 MIN(CAST(bit_count(xor(n.simhash, c.simhash)) AS BIGINT)
                     * {ENC} + c.doc_id) AS k
          FROM news n JOIN cands c
            ON c.canon_host = n.canon_host AND c.cpath = n.cpath
           AND ((c.epoch < n.epoch AND n.epoch - c.epoch <= {TTL})
                OR (c.epoch = n.epoch AND c.base_id < n.base_id))
          GROUP BY n.doc_id)
        SELECT n.doc_id, n.canon_host, n.cpath,
               CAST(n.epoch AS INTEGER) AS epoch,
               CAST(b.k % {ENC} AS BIGINT) AS matched_doc_id,
               CAST(b.k // {ENC} AS INTEGER) AS hamming,
               CASE WHEN b.k IS NULL THEN 'ingest_new'
                    WHEN b.k // {ENC} <= 3 THEN 'skip_duplicate'
                    ELSE 'ingest_changed' END AS action
        FROM news n LEFT JOIN best b ON n.doc_id = b.doc_id
    """.replace("{FIX}", _URLADM_FIX)
    .replace("{SIDE}", _URLADM_SIDE)
    .replace("{ENC}", str(_URLADM_ENC))
    .replace("{TTL}", str(_URLADM_TTL)),
    tags=("streaming", "dedup", "metadata"),
)
def b24_stream_url_admission_ttl(
    spark: SparkSession, sf_dir: str, n_chunks: int = 3
) -> DataFrame:
    """URL admission with index TTL/compaction (VERDICT r12 Next #6):
    b24_stream_url_admission where index entries EXPIRE after
    ``_URLADM_TTL`` crawl epochs — the index-level twin of the
    reference's 7-day keyed-state TTL
    (``process/StreamStateHandler.java:33``), measured in batch
    sequence (epoch = micro-batch position; seed corpus = epoch 0) so
    expiry is bit-deterministic under checkpoint replay.

    Semantics: a fetch is decided against entries seen within the last
    TTL epochs only — a URL whose every recorded fetch has expired is
    'ingest_new' again (re-crawl), and stale near-dup evidence stops
    suppressing admission.  The decision therefore DEPENDS on the
    chunking, so unlike the grow-forever key the oracle models the
    epoch assignment explicitly (id-range chunk cuts recomputed from
    MIN/MAX — the _write_ordered_chunks arithmetic).

    Expiry is lazy-on-read; space is reclaimed two ways: every touched-
    bucket rewrite drops rows dead for the next epoch, and one
    settle-time ``BucketedKeyedState.compact`` sweep rewrites the rest
    (the full-index pass a nightly maintenance job runs).  Neither can
    change a decision — tests replay the pipeline twice and compare
    bitwise."""
    return _run_url_admission(spark, sf_dir, n_chunks, ttl=_URLADM_TTL)
