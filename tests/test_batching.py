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


def test_timeout_batch_flush_per_record_timer_reset(spark, tmp_path):
    """A2 timer semantics (BatchTrigger.java:117-126,
    resetTimerOnNewRecord=true): a key that goes quiet flushes its partial
    batch by TIMEOUT; a key that keeps receiving rows fires by COUNT/SIZE;
    nothing flushes while data keeps the bounds unmet and the key active."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_big_query_connector_spark.streaming.batching import (
        timeout_batch_flush,
    )

    chunk_dir = str(tmp_path / "chunks")
    os.makedirs(chunk_dir)

    def write_chunk(i, rows):
        t = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "seqno": pa.array([r[1] for r in rows], pa.int64()),
                "sz": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        path = os.path.join(chunk_dir, f"c{i}.parquet")
        pq.write_table(t, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    # key 1: 3 rows in chunk 0 only -> quiet afterwards -> timeout flush
    # key 2: 5 rows in chunk 0 -> count fire; 2 more in chunk 1 -> pending
    # key 3: two 600-byte rows in chunk 0 -> size fire at 1200 >= 1000
    write_chunk(0, [(1, i, 10) for i in range(3)]
                 + [(2, i, 10) for i in range(5)]
                 + [(3, i, 600) for i in range(2)])
    write_chunk(1, [(2, i, 10) for i in range(5, 7)])

    stream = (
        spark.readStream.schema("k long, seqno long, sz long")
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )
    out = timeout_batch_flush(
        stream, "k", "seqno", max_count=5, timeout_ms=1,
        size_col="sz", max_bytes=1000,
    )
    name = "timeout_flush_test"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # AvailableNow cannot terminate while processing-time timers may still
    # fire, so run the continuous trigger and poll until the three
    # must-happen envelopes (count fire, size fire, quiet-key timeout
    # flush) are all present, then stop.
    import time

    def table():
        return {
            (r["k"], r["batch_seq"]): (r["n"], r["fired_by"])
            for r in spark.table(name).collect()
        }

    expected = {(2, 0), (3, 0), (1, 0)}
    deadline = time.time() + 120
    try:
        while time.time() < deadline and not expected <= set(table()):
            time.sleep(0.5)
    finally:
        q.stop()
    got = table()
    assert got[(2, 0)] == (5, "count")
    assert got[(3, 0)] == (2, "size")
    assert got[(1, 0)] == (3, "timeout")  # quiet key flushed by timer
    # key 2's chunk-1 remainder may ALSO timeout-flush once the stream goes
    # idle (that is correct trigger behavior); if it did, it must be the
    # 2-row timeout batch, never a count/size fire.
    if (2, 1) in got:
        assert got[(2, 1)] == (2, "timeout")


class _FakeGroupState:
    """Minimal GroupState stand-in for unit-testing the flush transition."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.updated = None
        self.timeout_duration = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.updated = v

    def setTimeoutDuration(self, ms):
        self.timeout_duration = ms


def test_timeout_flush_resets_stale_deadline_after_count_fire():
    """reset_timer_on_new_record=False (BatchTrigger.java reset=false arms
    the timer at each batch's FIRST element): when a count fire empties the
    pending batch mid-invocation, rows starting the next partial batch must
    arm a FRESH deadline, not inherit the flushed batch's stale one."""
    import time

    import pandas as pd

    from flink_big_query_connector_spark.streaming.batching import (
        make_timeout_flush_fn,
    )

    flush = make_timeout_flush_fn(
        "k", "seqno", max_count=5, timeout_ms=60_000,
        reset_timer_on_new_record=False,
    )
    now_ms = int(time.time() * 1000)
    stale = now_ms - 5_000  # armed long ago by the previous batch's head
    # 2 pending rows under a nearly-lapsed deadline; this invocation
    # delivers 5 more: rows 3..5 complete the count fire, rows 6..7 start
    # the next partial batch.
    state = _FakeGroupState(value=(0, 2, 0, stale))
    pdf = pd.DataFrame({"k": [1] * 5, "seqno": list(range(2, 7))})
    out = list(flush((1,), iter([pdf]), state))
    assert len(out) == 1 and out[0]["fired_by"].tolist() == ["count"]
    seq, pending, pending_bytes, deadline = state.updated
    assert (seq, pending) == (1, 2)
    # The fresh partial batch's deadline is re-armed from NOW, not stale.
    assert deadline >= now_ms + 60_000
    assert state.timeout_duration > 55_000


def test_timeout_flush_keeps_deadline_for_unflushed_partial():
    """reset=false with NO flush in the invocation: the original deadline
    must be preserved (re-armed with remaining time), not pushed out."""
    import time

    import pandas as pd

    from flink_big_query_connector_spark.streaming.batching import (
        make_timeout_flush_fn,
    )

    flush = make_timeout_flush_fn(
        "k", "seqno", max_count=100, timeout_ms=60_000,
        reset_timer_on_new_record=False,
    )
    now_ms = int(time.time() * 1000)
    armed = now_ms + 10_000
    state = _FakeGroupState(value=(0, 2, 0, armed))
    pdf = pd.DataFrame({"k": [1] * 3, "seqno": [2, 3, 4]})
    out = list(flush((1,), iter([pdf]), state))
    assert out == []
    seq, pending, _, deadline = state.updated
    assert (seq, pending) == (0, 5)
    assert deadline == armed  # unchanged: first pending record owns it
    assert state.timeout_duration <= 10_000
