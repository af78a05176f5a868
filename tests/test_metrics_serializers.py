"""Metrics (A26) and serializer (A17–A19) coverage."""

from __future__ import annotations

import json
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_big_query_connector_spark.sources.fake_bigquery import (
    DEFAULT_STREAM,
    FakeBigQuery,
)
from flink_big_query_connector_spark.streaming import serializers
from flink_big_query_connector_spark.streaming.config import (
    BatchTriggerSettings,
    WriterSettings,
)
from flink_big_query_connector_spark.streaming.metrics import (
    ObservedMetricsStore,
    SinkMetrics,
    with_observed_sink_metrics,
)
from flink_big_query_connector_spark.streaming.sinks import (
    DefaultStreamSink,
    write_with_retry,
)


def test_sink_metrics_count_appends_and_rows(spark, tmp_path):
    metrics = SinkMetrics.create(spark)
    df = spark.range(100).withColumnRenamed("id", "value")
    sink = DefaultStreamSink(
        str(tmp_path / "bq"),
        "p.d.t",
        trigger=BatchTriggerSettings(max_count=30),
        metrics=metrics,
    )
    sink.write_batch(df.coalesce(1), 0)
    snap = metrics.snapshot()
    assert snap["append_rows"] == 100
    assert snap["batch_count"] == 4  # ceil(100/30)
    assert snap["retry_count"] == 0
    assert FakeBigQuery(str(tmp_path / "bq")).table_count("p.d.t") == 100


def test_sink_metrics_count_retries_and_splits(spark, bq):
    metrics = SinkMetrics.create(spark)
    bq.script_append_failures(["UNAVAILABLE", "UNAVAILABLE"], table="p.d.t")
    rows = [{"value": i} for i in range(10)]
    write_with_retry(
        bq, "p.d.t", DEFAULT_STREAM, rows, -1, WriterSettings(), metrics=metrics
    )
    assert metrics.snapshot()["retry_count"] == 2

    # oversized batch -> recursive halving counted
    big = [{"value": "x" * 6_000_000} for _ in range(2)]
    write_with_retry(
        bq, "p.d.t2", DEFAULT_STREAM, big, -1, WriterSettings(), metrics=metrics
    )
    assert metrics.snapshot()["split_batch_count"] >= 1


def test_observed_metrics_via_listener(spark, tmp_path):
    import time

    store = ObservedMetricsStore.attach(spark)
    try:
        src_dir = tmp_path / "src"
        src_dir.mkdir()
        spark.range(50).withColumnRenamed("id", "v").coalesce(1).write.parquet(
            str(src_dir / "f0")
        )
        schema = spark.read.parquet(str(src_dir / "f0")).schema
        stream = spark.readStream.schema(schema).parquet(str(src_dir / "f0"))
        observed = with_observed_sink_metrics(stream)
        q = (
            observed.writeStream.format("noop")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_m_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener delivery is async relative to query termination
        for _ in range(40):
            if store.totals().get("rows", 0) >= 50:
                break
            time.sleep(0.25)
        totals = store.totals()
        assert totals["rows"] == 50
        assert totals["bytes"] > 0
    finally:
        store.detach()


def test_json_serializer_roundtrip(spark):
    df = spark.range(3).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )
    out = df.select(serializers.json_rows(df).alias("payload")).collect()
    decoded = sorted(
        (json.loads(bytes(r.payload)) for r in out), key=lambda d: d["a"]
    )
    assert decoded == [{"a": 0, "b": 0}, {"a": 1, "b": 2}, {"a": 2, "b": 4}]


def test_json_size_matches_payload_length(spark):
    df = spark.range(5).select(F.col("id").alias("a"))
    rows = df.select(
        serializers.json_rows(df).alias("p"), serializers.json_size(df).alias("n")
    ).collect()
    assert all(len(bytes(r.p)) == r.n for r in rows)


def test_noop_serializer_requires_binary(spark):
    df = spark.range(1).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("raw")
    )
    assert df.select(serializers.noop_rows(df, "raw")).collect()
    not_bin = spark.range(1).select(F.col("id").alias("raw"))
    with pytest.raises(TypeError):
        serializers.noop_rows(not_bin, "raw")
