"""Connector-path queries: data flows THROUGH the fakebigquery DataSource
(write then read back) before being aggregated, so the oracle checks the
whole connector round-trip — serialization, stream bookkeeping, visibility,
partitioned reads, and filter pushdown — not just the final aggregation.

JSON round-trips are exact for the column set used (int64, repr'd doubles,
strings), so the DuckDB oracle over the ORIGINAL parquet is bitwise-valid
for the post-roundtrip aggregate.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dbl, dec
from ..sources import bq_datasource as dsrc
from ..sources.tables import load_tables, ts_micros
from ..scratch import scratch_dir, unique_name
from .registry import register


def _fresh_root() -> str:
    return scratch_dir("fakebq_ds_")


_name_counter = itertools.count()


def _events_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with JSON-exact column types (ts as integer micros)."""
    t = load_tables(spark, sf_dir)
    return t["events"].select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        ts_micros(t["events"]).alias("mts"),
    )


@register(
    "b26_dsv2_roundtrip",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
        FROM events
        WHERE value > 50.0 AND event_type IN ('click', 'purchase')
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("connector", "sink", "source"),
)
def b26_dsv2_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch write -> partitioned read with pushed filters -> aggregate.

    The write is the at-least-once default-stream append; the read plans
    (stream, row-range) splits and evaluates the ``value > 50 AND
    event_type IN (...)`` restriction inside the partition reader (Spark's
    plan shows a bare BatchScan, no Filter node).  At 100 TB the same
    query shape fans out to thousands of read ranges."""
    dsrc.register(spark)
    root = _fresh_root()
    table = "proj/ds/events_rt"
    ev = _events_typed(spark, sf_dir)
    (
        ev.write.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", table)
        .mode("overwrite")
        .save()
    )
    back = (
        spark.read.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", table)
        .option("partitions", "8")
        .load()
    )
    return (
        back.filter(
            (F.col("value") > 50.0)
            & F.col("event_type").isin("click", "purchase")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.sum(dec("value", 14, 4))).alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "b26_dsv2_stream_exactly_once",
    oracle="""
        SELECT event_type, COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("connector", "sink", "streaming"),
)
def b26_dsv2_stream_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming write through the DataSource 2PC path: every
    micro-batch partition appends to a fresh BUFFERED stream at explicit
    offsets and the epoch commit flushes them (visibility atomic with the
    checkpoint — `sink/buffered/BigQuerySinkCommitter.java:23-50`).  The
    visible row set after AvailableNow completion equals the input exactly
    (no dupes, no loss), checked per event_type."""
    from .streaming_queries import _events_stream, _stream_partitions

    dsrc.register(spark)
    root = _fresh_root()
    table = "proj/ds/events_eo"
    stream_df = _events_stream(spark, sf_dir).drop("etime")
    typed = stream_df.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        ts_micros(stream_df).alias("mts"),
    )
    ckpt = os.path.join(root, "_ckpt")
    with _stream_partitions(spark):
        q = (
            typed.writeStream.format(dsrc.SOURCE_NAME)
            .option("root", root)
            .option("table", table)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    back = (
        spark.read.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", table)
        .load()
    )
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@register(
    "b26_dsv2_stream_read",
    oracle="""
        SELECT user_id % 16 AS user_bucket,
               COUNT(*) AS n,
               CAST(SUM(event_id) AS BIGINT) AS id_sum
        FROM events
        GROUP BY user_id % 16
        ORDER BY user_bucket
    """,
    tags=("connector", "source", "streaming"),
)
def b26_dsv2_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream OUT of the backend: ``readStream.format("fakebigquery")``.

    The source's offsets are per-write-stream visible row counts (the READ
    API cursor analogue); micro-batches cover the newly visible delta as
    range splits.  Here the table is loaded once, so the stream drains it
    in offset-bounded batches and the complete-mode aggregate over the
    memory sink must equal the batch aggregate exactly — exactly-once
    source semantics, the read-side mirror of `b26_dsv2_stream_exactly_once`.
    """
    from .streaming_queries import _stream_partitions

    dsrc.register(spark)
    root = _fresh_root()
    table = "proj/ds/events_sr"
    ev = _events_typed(spark, sf_dir)
    (
        ev.write.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", table)
        .mode("overwrite")
        .save()
    )
    stream = (
        spark.readStream.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", table)
        .option("stream_rows_per_partition", "25000")
        .load()
    )
    agg = (
        stream.groupBy((F.col("user_id") % 16).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("id_sum"),
        )
    )
    name = f"dsv2_stream_read_{os.getpid()}_{next(_name_counter)}"
    ckpt = os.path.join(root, "_ckpt_read")
    with _stream_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination()
    return spark.table(name).orderBy("user_bucket")


@register(
    "b26_dsv2_wildcard_read",
    oracle="""
        SELECT event_id, user_id, value, event_type AS suffix
        FROM events WHERE event_type IN ('click', 'view')
    """,
    tags=("connector",),
)
def b26_dsv2_wildcard_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard-table read with suffix pruning (BigQuery's `prefix*` +
    `_TABLE_SUFFIX` idiom): events shard into one table per event_type
    through the DSv2 batch writer, then ONE wildcard scan reads them
    back and an `isin` on the `_table_suffix` pseudo-column prunes
    whole tables at split planning — only click/view tables are ever
    scanned (tests pin the planned-split set; at 100 TB the other
    shards' read sessions are never opened).  The matched suffix
    re-derives the type column, so the oracle is the plain filtered
    source."""
    dsrc.register(spark)
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("event_id", "user_id", "value", "event_type")
    root = _fresh_root()
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    for et in types:
        (
            ev.filter(F.col("event_type") == et)
            .drop("event_type")
            .write.format(dsrc.SOURCE_NAME)
            .option("root", root)
            .option("table", f"proj.ds.wc_{et}")
            .mode("overwrite")
            .save()
        )
    if not types:  # empty source: nothing sharded, nothing to scan
        return spark.createDataFrame(
            [], "event_id long, user_id long, value double, suffix string"
        )
    return (
        spark.read.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", "proj.ds.wc_*")
        .load()
        .filter(F.col("_table_suffix").isin("click", "view"))
        .select(
            "event_id",
            "user_id",
            "value",
            F.col("_table_suffix").alias("suffix"),
        )
    )
