"""Batch trigger semantics vs a reference simulator (BatchTriggerTest port)."""

from pyspark.sql import functions as F

from flink_big_query_connector_spark.streaming.batching import (
    assign_batches_by_count,
    assign_batches_by_size,
    chunk_rows,
    json_size_of,
    row_size_col,
)
from flink_big_query_connector_spark.streaming.config import BatchTriggerSettings


def test_count_trigger_fires_at_exact_count():
    rows = [{"v": i} for i in range(10)]
    batches = list(chunk_rows(rows, BatchTriggerSettings(max_count=4, max_bytes=1 << 30)))
    assert [len(b) for b in batches] == [4, 4, 2]


def test_size_trigger_fires_when_crossing_bound():
    # Three ~400KB strings then a small row: the 1MB size trigger must fire
    # containing exactly the three large rows (BatchTriggerTest.java:79-95).
    big = [{"v": c * 400_000} for c in "abc"]
    small = [{"v": "tiny"}]
    batches = list(
        chunk_rows(big + small, BatchTriggerSettings(max_count=100, max_bytes=1_000_000))
    )
    assert [len(b) for b in batches] == [3, 1]
    assert batches[0] == big


def test_no_premature_release():
    rows = [{"v": i} for i in range(3)]
    batches = list(chunk_rows(rows, BatchTriggerSettings(max_count=100, max_bytes=1 << 30)))
    assert [len(b) for b in batches] == [3]  # only the final flush


def test_simulator_equivalence_random():
    import random

    rnd = random.Random(42)
    rows = [{"v": "x" * rnd.randint(1, 300)} for _ in range(500)]
    st = BatchTriggerSettings(max_count=17, max_bytes=2_000)

    # independent greedy simulator
    expected, cur, acc = [], [], 0
    for r in rows:
        cur.append(r)
        acc += json_size_of(r)
        if len(cur) >= st.max_count or acc >= st.max_bytes:
            expected.append(cur)
            cur, acc = [], 0
    if cur:
        expected.append(cur)

    assert list(chunk_rows(rows, st)) == expected


def test_dataframe_batch_assignment(spark):
    df = spark.range(100).select(
        (F.col("id") % 3).alias("key"), F.col("id").alias("seq")
    )
    out = assign_batches_by_count(df, "key", ["seq"], max_count=10)
    per = (
        out.groupBy("key", "batch_index")
        .count()
        .orderBy("key", "batch_index")
        .collect()
    )
    # 100 rows over 3 keys (34/33/33) -> batches of 10 with a remainder
    for r in per:
        assert r["count"] <= 10
    sized = assign_batches_by_size(
        df.withColumn("sz", row_size_col(df)), "key", ["seq"], 200, "sz"
    )
    assert sized.filter(F.col("batch_index") < 0).count() == 0
