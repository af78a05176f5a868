"""Sink/stream metrics (reference A26, SURVEY.md §2).

The reference registers per-(table, stream) gauges — ``stream_offset``,
``batch_count``, ``batch_size_mb``, ``split_batch_count``,
``callback_timeouts`` — plus writer-level in-flight counters
(``sink/BigQuerySinkWriter.java:116-128``, ``metric/BigQueryStreamMetrics.java:3-55``).

Spark-idiomatic re-expression:

- **executor-side writer counters** -> SparkContext accumulators (the only
  executor->driver metric channel that survives task retries the way Flink
  gauges survive operator restarts);
- **row/byte gauges on the stream itself** -> ``DataFrame.observe`` columns,
  delivered per micro-batch through ``StreamingQueryProgress``;
- **per-batch snapshots** -> a ``StreamingQueryListener`` that keeps the
  observed metrics of every progress event.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SinkMetrics:
    """Accumulator-backed counters incremented by the sink writers.

    Mirrors ``BigQueryStreamMetrics`` / ``AsyncBigQueryStreamMetrics``:
    offsets become monotonic counters (Spark has no per-key gauge registry;
    per-stream offsets live in the FakeBigQuery stream metadata and are
    queryable there).
    """

    batch_count: object = None
    append_rows: object = None
    append_bytes: object = None
    split_batch_count: object = None
    retry_count: object = None
    callback_timeouts: object = None

    @classmethod
    def create(cls, spark: SparkSession) -> "SinkMetrics":
        sc = spark.sparkContext
        return cls(
            batch_count=sc.accumulator(0),
            append_rows=sc.accumulator(0),
            append_bytes=sc.accumulator(0),
            split_batch_count=sc.accumulator(0),
            retry_count=sc.accumulator(0),
            callback_timeouts=sc.accumulator(0),
        )

    def snapshot(self) -> dict[str, int]:
        return {
            "batch_count": self.batch_count.value,
            "append_rows": self.append_rows.value,
            "append_bytes": self.append_bytes.value,
            "split_batch_count": self.split_batch_count.value,
            "retry_count": self.retry_count.value,
            "callback_timeouts": self.callback_timeouts.value,
        }


def with_observed_sink_metrics(
    df: DataFrame, name: str = "sink_metrics"
) -> DataFrame:
    """Attach row/byte observations (the ``batch_size_mb`` analogue).

    Computed JVM-side per micro-batch and reported via
    ``StreamingQueryProgress.observedMetrics[name]`` — zero extra jobs.
    """
    size = F.length(F.to_json(F.struct(*df.columns)))
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.sum(size).alias("bytes"),
        F.max(size).alias("max_row_bytes"),
    )


class ObservedMetricsStore:
    """StreamingQueryListener capturing observed metrics per batch.

    Usage::

        store = ObservedMetricsStore.attach(spark)
        ... run query with with_observed_sink_metrics(df) ...
        store.batches  # [(batchId, {"rows": ..., "bytes": ...}), ...]
    """

    def __init__(self):
        self.batches: list[tuple[int, dict]] = []

    @classmethod
    def attach(cls, spark: SparkSession, name: str = "sink_metrics"):
        from pyspark.sql.streaming import StreamingQueryListener

        store = cls()

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                om = event.progress.observedMetrics
                if name in om:
                    row = om[name]
                    store.batches.append(
                        (event.progress.batchId, row.asDict())
                    )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        listener = _Listener()
        spark.streams.addListener(listener)
        store._listener = listener
        store._spark = spark
        return store

    def detach(self):
        self._spark.streams.removeListener(self._listener)

    def totals(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for _bid, m in self.batches:
            for k, v in m.items():
                if v is not None:
                    out[k] = out.get(k, 0) + v
        return out
