"""Parquet source catalog for the driver-generated TESTDATA tables.

Columnar parquet scans are the engine's batch source: Catalyst pushes
filters and prunes columns down to the scan (visible as ``PushedFilters``
and ``ReadSchema`` in ``df.explain``), so every downstream query pays only
for the bytes it touches — the property that matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (they grow
# sublinearly or are fixed-size in TPC-H-style schemas).
BROADCAST_TABLES = frozenset({"region", "nation"})


# (applicationId, sf_dir) -> {table: DataFrame}.  Building the ten lazy
# DataFrames costs ~0.7 s per call (a parquet-footer schema job each) —
# pure fixed tax when a session runs many registry queries; the logical
# plans are immutable and session-scoped, so reuse is free.  Keyed by
# applicationId so a restarted session never sees stale plan objects.
_TABLE_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table as a lazy DataFrame keyed by name (cached
    per (session, directory) — see _TABLE_CACHE)."""
    tune_session(spark)
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _TABLE_CACHE.get(key)
    if cached is None:
        cached = {
            t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES
        }
        _TABLE_CACHE[key] = cached
    return dict(cached)


def ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """``col`` as integer MICROS since epoch, whatever the physical type.

    The driver testdata has shipped ``events.ts`` both as TIMESTAMP(NANOS)
    parquet (read as int64 under ``nanosAsLong``) and as TIMESTAMP(MICROS)
    (read as TIMESTAMP_NTZ).  Every plan that needs integer event-time
    arithmetic MUST go through this helper instead of touching the physical
    type — a raw ``ts div 1000`` crashes with DATATYPE_MISMATCH on the
    timestamp read, and ``unix_micros`` crashes on the long read.

    For int64-nanos, integer ``div`` keeps full precision (double division
    loses bits above 2^53) and truncation toward zero matches DuckDB's
    nanos->micros read of the same file.  For timestamp reads the session
    timezone is pinned UTC (``session.py``), so NTZ wall-clock == instant
    and ``unix_micros(cast(ts as timestamp))`` equals DuckDB ``epoch_us``.
    """
    if isinstance(df.schema[col].dataType, LongType):
        return F.expr(f"{col} div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def ts_event_time(df: DataFrame, col: str = "ts") -> Column:
    """``col`` as a watermark-legal TIMESTAMP, whatever the physical type.

    ``withWatermark`` rejects TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP
    _TYPE), so the NTZ read must be cast; with the session timezone pinned
    UTC the cast is a pure retag, not a wall-clock shift.
    """
    if isinstance(df.schema[col].dataType, LongType):
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    return F.col(col).cast("timestamp")


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register each table as a temp view (for the SQL entry points)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(prefix + name)
