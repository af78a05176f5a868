"""StreamStateHandler state machine (StreamHandlerTest port): creation,
offset advance, TTL expiry via scripted clock, recovery verification."""

from flink_big_query_connector_spark.streaming.stream_state import (
    StreamState,
    StreamStateHandler,
)


class MockClock:
    """Scripted clock (util/MockClock.java analogue)."""

    def __init__(self, times_ms):
        self.times = list(times_ms)
        self.i = 0

    def __call__(self):
        t = self.times[min(self.i, len(self.times) - 1)]
        self.i += 1
        return t


def test_offsets_advance_per_key(bq, tmp_path):
    h = StreamStateHandler(bq, str(tmp_path / "state"))
    s1, o1 = h.acquire("k1", "t", 2)
    s2, o2 = h.acquire("k1", "t", 3)
    assert s1 == s2
    assert (o1, o2) == (0, 2)
    assert h.peek("k1").offset == 5
    # independent key gets its own stream starting at 0
    s3, o3 = h.acquire("k2", "t", 4)
    assert s3 != s1 and o3 == 0


def test_acquire_idempotent_per_batch_id(bq, tmp_path):
    """A Spark task retry (failure or speculative duplicate) re-acquires
    with the same (key, batch_id) — it must get the SAME base offset, not
    advance again, so the offset-checked append trims instead of duping."""
    state_dir = str(tmp_path / "state")
    h1 = StreamStateHandler(bq, state_dir)
    s1, o1 = h1.acquire("k1", "t", 10, batch_id=0)
    assert o1 == 0

    # retry runs in a FRESH handler instance (new python worker)
    h2 = StreamStateHandler(bq, state_dir)
    s2, o2 = h2.acquire("k1", "t", 10, batch_id=0)
    assert (s2, o2) == (s1, 0)
    assert h2.peek("k1").offset == 10  # not double-advanced to 20

    # the next micro-batch advances normally
    s3, o3 = h2.acquire("k1", "t", 5, batch_id=1)
    assert (s3, o3) == (s1, 10)
    assert h2.peek("k1").offset == 15


def test_ttl_expiry_recreates_stream(bq, tmp_path):
    day = 86_400_000
    clock = MockClock([0, 20 * day])  # jump past the 7-day TTL
    h = StreamStateHandler(bq, str(tmp_path / "state"), ttl_days=7, clock=clock)
    s1, _ = h.acquire("k", "t", 2)
    s2, o2 = h.acquire("k", "t", 2)
    assert s2 != s1  # expired -> new stream
    assert o2 == 0


def test_recovery_reuses_live_stream(bq, tmp_path):
    state_dir = str(tmp_path / "state")
    h1 = StreamStateHandler(bq, state_dir)
    s1, _ = h1.acquire("k", "t", 3)
    # "restart": fresh handler, same durable state -> verify + reuse
    h2 = StreamStateHandler(bq, state_dir)
    s2, o2 = h2.acquire("k", "t", 2)
    assert s2 == s1
    assert o2 == 3


def test_recovery_recreates_on_not_found(bq, tmp_path):
    state_dir = str(tmp_path / "state")
    h1 = StreamStateHandler(bq, state_dir)
    h1.acquire("k", "t", 3)
    # hand-corrupt: point the durable state at a stream the backend lost
    st = h1.peek("k")
    h1._store("k", StreamState("t/streams/vanished", st.offset, st.last_update_ms))
    h2 = StreamStateHandler(bq, state_dir)
    s2, o2 = h2.acquire("k", "t", 1)
    assert s2 != "t/streams/vanished"
    assert o2 == 0


def test_recovery_recreates_on_finalized(bq, tmp_path):
    state_dir = str(tmp_path / "state")
    h1 = StreamStateHandler(bq, state_dir)
    s1, _ = h1.acquire("k", "t", 3)
    bq.finalize_stream("t", s1)
    h2 = StreamStateHandler(bq, state_dir)
    s2, o2 = h2.acquire("k", "t", 1)
    assert s2 != s1
    assert o2 == 0


def test_native_tws_gate_or_equivalence(spark, sf_dir, tmp_path):
    """The transformWithStateInPandas port (native state TTL = the
    reference's 7-day stream expiry) is gated on the worker protobuf
    stack: without it the constructor refuses loudly; with it the
    envelope stream must equal the applyInPandasWithState variant."""
    import pytest as _pytest

    from flink_big_query_connector_spark.streaming import stream_state as ss

    if not ss.tws_runtime_available():
        ev = spark.readStream.format("rate").load()
        with _pytest.raises(RuntimeError, match="protobuf"):
            ss.keyed_offset_assignment_native_tws(
                ev.selectExpr("value AS user_id", "value AS event_id"),
                "user_id",
                str(tmp_path / "bq"),
                "p.d.t",
            )
        return

    from flink_big_query_connector_spark.plans.streaming_queries import (
        _events_stream,
        _run_to_table,
    )

    ev = _events_stream(spark, sf_dir).select("event_id", "user_id")
    native = ss.run_native_tws_to_table(
        ss.keyed_offset_assignment_native_tws(
            ev, "user_id", str(tmp_path / "bq_native"), "p.d.t"
        ),
        "append",
    )
    ev2 = _events_stream(spark, sf_dir).select("event_id", "user_id")
    classic = _run_to_table(
        ss.keyed_offset_assignment_tws(
            ev2, "user_id", str(tmp_path / "bq_classic"), "p.d.t"
        ),
        "append",
    )
    assert sorted(map(tuple, native.collect())) == sorted(
        map(tuple, classic.collect())
    )


def test_native_tws_ttl_evicts_idle_key(spark, sf_dir, tmp_path):
    """Native-path TTL contract (reference: 7-day stream expiry,
    process/StreamStateHandler.java:33): an idle key's (stream, offset)
    ValueState entry is evicted by the state store after ttl_ms of
    processing time, so the key's NEXT record opens a FRESH stream at
    base offset 0 instead of continuing the old one.  Gated on the
    worker protobuf stack — skips where transformWithStateInPandas
    cannot run, executes wherever it can (TTL requires
    timeMode='ProcessingTime'; with timeMode='None' the registration
    itself raises, which this test would catch immediately)."""
    import time

    import pytest as _pytest

    from flink_big_query_connector_spark.streaming import stream_state as ss

    if not ss.tws_runtime_available():
        _pytest.skip("google.protobuf absent: native TWS runner cannot run")

    import os

    from flink_big_query_connector_spark.plans.streaming_queries import (
        _run_to_table,
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "src")
    os.makedirs(src)
    # flat files: the file stream source lists src/*, not nested dirs
    pq.write_table(
        pa.table({"user_id": [7], "event_id": [1]}), f"{src}/c0.parquet"
    )

    def run_once():
        ev = (
            spark.readStream.schema("user_id long, event_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return ss.run_native_tws_to_table(
            ss.keyed_offset_assignment_native_tws(
                ev, "user_id", str(tmp_path / "bq"), "p.d.t", ttl_ms=500
            ),
            "append",
            checkpoint=str(tmp_path / "ckpt"),
        )

    first = {(r["user_id"], r["base_offset"], r["n"]) for r in run_once().collect()}
    assert first == {(7, 0, 1)}
    time.sleep(1.5)  # > ttl_ms of processing time while the key is idle
    pq.write_table(
        pa.table({"user_id": [7], "event_id": [2]}), f"{src}/c1.parquet"
    )
    second = {(r["user_id"], r["base_offset"], r["n"]) for r in run_once().collect()}
    # evicted entry -> fresh stream -> base offset restarts at 0
    assert (7, 0, 1) in second


def _make_events_frame(spark, tmp_path, name):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_big_query_connector_spark.streaming import stream_state as ss

    src = str(tmp_path / f"src_{name}")
    os.makedirs(src)
    pq.write_table(
        pa.table({"user_id": [7, 7, 9], "event_id": [1, 2, 3]}),
        f"{src}/c0.parquet",
    )
    ev = (
        spark.readStream.schema("user_id long, event_id long")
        .parquet(src)
    )
    return ss.keyed_offset_assignment_native_tws(
        ev, "user_id", str(tmp_path / f"bq_{name}"), "p.d.t"
    )


def test_native_tws_worker_crash_retries_once(spark, tmp_path, monkeypatch):
    """A TWS Python-runner death (the one observed driver-round red row:
    'TransformWithStateInPySpark driver worker exited unexpectedly') is
    a transient environment event: the runner must retry exactly once
    from a fresh checkpoint and still return the correct table."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flink_big_query_connector_spark.streaming import stream_state as ss

    if not ss.tws_runtime_available():
        _pytest.skip("google.protobuf absent: native TWS runner cannot run")

    frame = _make_events_frame(spark, tmp_path, "retry")
    calls = []
    real = ss._run_tws_attempt

    def flaky(df, mode, checkpoint, timeout_s, extra_conf=None):
        calls.append((checkpoint, extra_conf))
        if len(calls) == 1:
            raise StreamingQueryException(
                desc=(
                    "TransformWithStateInPySpark driver worker exited "
                    "unexpectedly (crashed)"
                ),
                stackTrace="",
            )
        return real(df, mode, checkpoint, timeout_s, extra_conf=extra_conf)

    monkeypatch.setattr(ss, "_run_tws_attempt", flaky)
    out = ss.run_native_tws_to_table(frame, "append")
    got = {(r["user_id"], r["base_offset"], r["n"]) for r in out.collect()}
    assert got == {(7, 0, 2), (9, 0, 1)}
    # two attempts, both run-owned (fresh) checkpoints; the retry is
    # structurally different — memory-bounded RocksDB
    assert calls == [(None, None), (None, ss._BOUNDED_ROCKSDB_CONF)]


def test_native_tws_non_crash_error_does_not_retry(spark, tmp_path, monkeypatch):
    """Only worker-death signatures are retried: a semantic streaming
    failure surfaces immediately after ONE attempt."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flink_big_query_connector_spark.streaming import stream_state as ss

    if not ss.tws_runtime_available():
        _pytest.skip("google.protobuf absent: native TWS runner cannot run")

    frame = _make_events_frame(spark, tmp_path, "noretry")
    calls = []

    def broken(df, mode, checkpoint, timeout_s, extra_conf=None):
        calls.append(checkpoint)
        raise StreamingQueryException(
            desc="[STATE_STORE_KEY_SCHEMA_NOT_COMPATIBLE] bad plan",
            stackTrace="",
        )

    monkeypatch.setattr(ss, "_run_tws_attempt", broken)
    with _pytest.raises(StreamingQueryException, match="NOT_COMPATIBLE"):
        ss.run_native_tws_to_table(frame, "append")
    assert len(calls) == 1


def test_native_tws_second_crash_surfaces(spark, tmp_path, monkeypatch):
    """Two consecutive worker crashes: TwsWorkerCrashError carrying both
    crash messages is raised (one retry, never a loop) — the typed
    error is what lets the query layer degrade loudly to the
    applyInPandasWithState twin."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flink_big_query_connector_spark.streaming import stream_state as ss

    if not ss.tws_runtime_available():
        _pytest.skip("google.protobuf absent: native TWS runner cannot run")

    frame = _make_events_frame(spark, tmp_path, "twice")
    calls = []

    def always_crash(df, mode, checkpoint, timeout_s, extra_conf=None):
        calls.append(checkpoint)
        raise StreamingQueryException(
            desc="Python worker exited unexpectedly (crashed)",
            stackTrace="",
        )

    monkeypatch.setattr(ss, "_run_tws_attempt", always_crash)
    with _pytest.raises(ss.TwsWorkerCrashError, match="BOTH attempts") as ei:
        ss.run_native_tws_to_table(frame, "append")
    assert len(calls) == 2
    # both crash messages are in the evidence list
    assert sum("crashed" in e for e in ei.value.crash_evidence) == 2


def test_native_tws_caller_checkpoint_crash_never_auto_retries(
    spark, tmp_path, monkeypatch
):
    """With a CALLER-MANAGED checkpoint a crash must surface after ONE
    attempt: the crashed attempt may already have committed batches
    into its own out_dir, so a same-checkpoint auto-retry into a fresh
    out_dir would return only post-restart batches — silent partial
    results.  The caller's restart-from-checkpoint is the recovery
    path (exactly what the TTL test's run_once() does)."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from flink_big_query_connector_spark.streaming import stream_state as ss

    if not ss.tws_runtime_available():
        _pytest.skip("google.protobuf absent: native TWS runner cannot run")

    frame = _make_events_frame(spark, tmp_path, "callerckpt")
    calls = []

    def crash(df, mode, checkpoint, timeout_s, extra_conf=None):
        calls.append(checkpoint)
        raise StreamingQueryException(
            desc=(
                "TransformWithStateInPySpark driver worker exited "
                "unexpectedly (crashed)"
            ),
            stackTrace="",
        )

    monkeypatch.setattr(ss, "_run_tws_attempt", crash)
    ckpt = str(tmp_path / "caller_ckpt")
    with _pytest.raises(ss.TwsWorkerCrashError, match="caller-managed"):
        ss.run_native_tws_to_table(frame, "append", checkpoint=ckpt)
    assert calls == [ckpt]


def test_tws_crash_classifier_is_narrow():
    """Only Spark's dead-worker wording is classified as a crash; a
    deterministic failure that merely MENTIONS workers or crashes must
    surface immediately (no burned retry, no muddied root cause)."""
    from flink_big_query_connector_spark.streaming.stream_state import (
        _is_tws_worker_crash,
    )

    assert _is_tws_worker_crash(RuntimeError(
        "TransformWithStateInPySpark driver worker exited unexpectedly "
        "(crashed)"
    ))
    assert _is_tws_worker_crash(RuntimeError(
        "Python worker exited unexpectedly (crashed)"
    ))
    assert not _is_tws_worker_crash(RuntimeError(
        "column 'worker crashed' not found"
    ))
    assert not _is_tws_worker_crash(RuntimeError(
        "UDF failed while parsing 'Python worker exited' marker"
    ))


def test_rocksdb_provider_conf_is_scoped_and_restored(spark):
    """The RocksDB stateStore.providerClass conf is held only for the
    query-start window and the session's previous value (set or unset)
    is restored — no session-wide leak into later streaming queries."""
    from flink_big_query_connector_spark.streaming.stream_state import (
        _PROVIDER_KEY,
        _ROCKSDB_PROVIDER,
        _rocksdb_state_provider,
    )

    # case 1: conf previously unset -> unset again afterwards
    prev = spark.conf.get(_PROVIDER_KEY, None)
    if prev is not None:
        spark.conf.unset(_PROVIDER_KEY)
    try:
        with _rocksdb_state_provider(spark):
            assert spark.conf.get(_PROVIDER_KEY) == _ROCKSDB_PROVIDER
        assert spark.conf.get(_PROVIDER_KEY, None) is None

        # case 2: caller had an explicit provider -> restored verbatim
        sentinel = "com.example.SentinelProvider"
        spark.conf.set(_PROVIDER_KEY, sentinel)
        with _rocksdb_state_provider(spark):
            assert spark.conf.get(_PROVIDER_KEY) == _ROCKSDB_PROVIDER
        assert spark.conf.get(_PROVIDER_KEY) == sentinel
        spark.conf.unset(_PROVIDER_KEY)
    finally:
        if prev is not None:
            spark.conf.set(_PROVIDER_KEY, prev)


def test_faulthandler_dumps_are_collected_and_attached(tmp_path, monkeypatch):
    """A worker stack dump written into the faulthandler dir after the
    attempt started is collected (non-empty, mtime-filtered) and lands
    in the crash evidence; empty files (healthy workers / SIGKILL) are
    skipped — their absence under crash wording is the OOM diagnostic."""
    import time as _time

    from flink_big_query_connector_spark.streaming import stream_state as ss

    monkeypatch.setattr(ss, "_FH_DIR", str(tmp_path))
    t0 = _time.time() - 1
    (tmp_path / "fh_111.log").write_text("")  # healthy worker: empty
    (tmp_path / "fh_222.log").write_text(
        "Fatal Python error: Segmentation fault\nStack: ..."
    )
    stale = tmp_path / "fh_333.log"
    stale.write_text("old crash from a previous attempt")
    import os as _os

    _os.utime(stale, (t0 - 100, t0 - 100))

    dumps = ss._read_faulthandler_dumps(t0)
    assert len(dumps) == 1
    assert "fh_222.log" in dumps[0]
    assert "Segmentation fault" in dumps[0]


def test_scoped_sql_conf_sets_and_restores_multiple_keys(spark):
    """The attempt-2 bounded-RocksDB confs are scoped exactly like the
    provider: every key restored to its previous set/unset state."""
    from flink_big_query_connector_spark.streaming.stream_state import (
        _scoped_sql_conf,
    )

    k1 = "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"
    k2 = "spark.sql.shuffle.partitions"  # has a session value already
    prev2 = spark.conf.get(k2)
    with _scoped_sql_conf(spark, {k1: "256", k2: "7"}):
        assert spark.conf.get(k1) == "256"
        assert spark.conf.get(k2) == "7"
    assert spark.conf.get(k2) == prev2
    assert spark.conf.get(k1, None) in (None, "500")  # unset or default
