"""Keyed write-stream state with TTL and recovery verification.

Port of the reference's exactly-once preprocessor
(``process/StreamStateHandler.java:53-145`` and
``process/StreamState.java:5-49``): per key, resolve the current BUFFERED
write stream + next row offset, creating a new stream when the state is
missing, expired (7-day TTL), or the stream was finalized/deleted behind
our back (checkpoint-recovery case).

State is directory-backed (one JSON file per key under ``state_dir``) —
the durable-keyed-state analogue; in a full Structured Streaming topology
the same logic runs inside ``transformWithStateInPandas`` with the state
store holding (stream, offset, last_update).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from ..sources.fake_bigquery import FakeBigQuery, _locked
from .errors import StreamFinalizedError, StreamNotFoundError

DEFAULT_TTL_DAYS = 7  # reference: StreamStateHandler.java:33


@dataclass
class StreamState:
    name: str
    offset: int
    last_update_ms: int
    # idempotent-replay bookkeeping: the batch id that last advanced the
    # offset and the base it was handed.  A task retry (failure or
    # speculative duplicate) re-acquires with the SAME batch id and gets
    # the same base back instead of double-advancing.
    last_batch_id: int | None = None
    last_base: int = 0

    def expired(self, ttl_days: int, now_ms: int) -> bool:
        return now_ms - self.last_update_ms >= ttl_days * 86_400_000

    def update(self, batch_size: int, now_ms: int) -> "StreamState":
        return StreamState(
            self.name, self.offset + batch_size, now_ms,
            self.last_batch_id, self.last_base,
        )


class StreamStateHandler:
    """Resolve (stream, offset) per key; NOT_EXISTS / NOT_CACHED / EXPIRED /
    CACHED state machine with recovery verification."""

    def __init__(
        self,
        client: FakeBigQuery,
        state_dir: str,
        ttl_days: int = DEFAULT_TTL_DAYS,
        clock=None,
    ):
        self.client = client
        self.state_dir = state_dir
        self.ttl_days = ttl_days
        self.clock = clock or (lambda: int(time.time() * 1000))
        os.makedirs(state_dir, exist_ok=True)
        # keys seen since process start; a durable state file for a key NOT
        # in this set means "restored from checkpoint" -> verify the stream
        # still exists server-side (reference :71-94).
        self._cached: set[str] = set()

    def _path(self, key: str) -> str:
        safe = key.replace("/", "__")
        return os.path.join(self.state_dir, f"{safe}.json")

    def _load(self, key: str) -> StreamState | None:
        try:
            with open(self._path(key)) as f:
                d = json.load(f)
            return StreamState(
                d["name"], d["offset"], d["last_update_ms"],
                d.get("last_batch_id"), d.get("last_base", 0),
            )
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _store(self, key: str, st: StreamState) -> None:
        tmp = self._path(key) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"name": st.name, "offset": st.offset,
                 "last_update_ms": st.last_update_ms,
                 "last_batch_id": st.last_batch_id,
                 "last_base": st.last_base},
                f,
            )
        os.replace(tmp, self._path(key))

    def acquire(
        self, key: str, table: str, batch_size: int,
        batch_id: int | None = None,
    ) -> tuple[str, int]:
        """Resolve the write stream + append offset for a batch of
        ``batch_size`` rows keyed by ``key``; advances the stored offset.

        Pass the micro-batch's ``batch_id`` to make acquisition idempotent
        under Spark task retry/speculation: a re-execution for the same
        (key, batch_id) returns the SAME base offset instead of advancing
        again (the subsequent offset-checked append then trims any rows the
        first attempt already stored, so replays produce no duplicates).
        """
        with _locked(self._path(key) + ".lock"):
            now = self.clock()
            st = self._load(key)
            if st is None:  # NOT_EXISTS
                st = self._create(table, now)
            elif st.expired(self.ttl_days, now):  # EXPIRED
                st = self._create(table, now)
            elif key not in self._cached:  # NOT_CACHED -> verify on recovery
                st = self._verify_or_recreate(st, table, now)
            # Task-retry replay (checked AFTER verify: a retried task runs
            # in a fresh handler, so the key is never in _cached there):
            # same (key, batch_id) -> hand back the prior base; the offset
            # is recomputed from it because the retried batch is the same
            # deterministic row set.
            if batch_id is not None and st.last_batch_id == batch_id:
                base = st.last_base
            else:
                base = st.offset
            self._store(
                key,
                StreamState(st.name, base + batch_size, now, batch_id, base),
            )
            self._cached.add(key)
            return st.name, base

    def _create(self, table: str, now_ms: int) -> StreamState:
        name = self.client.create_write_stream(table, "BUFFERED")
        return StreamState(name, 0, now_ms)

    def _verify_or_recreate(
        self, st: StreamState, table: str, now_ms: int
    ) -> StreamState:
        """After recovery: getWriteStream; recreate on NOT_FOUND or
        finalized; any other failure propagates (fails the job), as in the
        reference (:85-93)."""
        try:
            info = self.client.get_write_stream(table, st.name)
        except StreamNotFoundError:
            return self._create(table, now_ms)
        if info.finalized:
            return self._create(table, now_ms)
        return st

    def peek(self, key: str) -> StreamState | None:
        return self._load(key)


__all__ = [
    "StreamState",
    "StreamStateHandler",
    "StreamFinalizedError",
    "DEFAULT_TTL_DAYS",
]


# -- idiomatic Structured Streaming variant (state-store keyed operator) ----


def keyed_offset_assignment_tws(
    stream_df,
    key_col: str,
    backend_root: str,
    table: str,
):
    """A4 as a native stateful streaming operator: per-key write-stream +
    offset state in the Spark state store (the mapping SURVEY §2 prescribes
    for ``StreamStateHandler``).

    GroupState holds (stream_name, next_offset); on each micro-batch the
    key's rows are appended to the key's BUFFERED stream at the stored
    offset and one envelope row (key, base_offset, n) is emitted — the
    ``Rows(data, offset, stream, table)`` analogue.  Checkpointed state
    replaces the directory-backed handler; stream creation happens lazily
    inside the keyed operator, as in the reference.

    Implementation note: uses ``applyInPandasWithState`` — Spark 4's newer
    ``transformWithStateInPandas`` runner needs the python protobuf stack,
    which this environment lacks; the state semantics are identical for a
    single ValueState.  The native-TTL TWS port (the reference's 7-day
    stream expiry, ``process/StreamStateHandler.java:33``, as a state-store
    TTL instead of hand-rolled deadline checks) is
    :func:`keyed_offset_assignment_native_tws`, import-gated on protobuf.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..session import ensure_package_on_executors

    ensure_package_on_executors(stream_df.sparkSession)

    def assign(key, pdfs, state):
        from ..sources.fake_bigquery import FakeBigQuery
        from ..streaming.config import WriterSettings
        from ..streaming.sinks import write_with_retry

        client = FakeBigQuery(backend_root)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            stream, base = state.get[0], int(state.get[1])
        else:
            stream, base = client.create_write_stream(table, "BUFFERED"), 0
        payload = batch.sort_values("event_id").to_dict("records")
        # Replay-safe append: after a crash with rows durable in the backend
        # but state not yet checkpointed, the state-store offset lags the
        # stream's real end; write_with_retry absorbs the resulting
        # ALREADY_EXISTS by trimming the already-stored prefix (reference
        # StreamStateHandler recovery + BigQueryBufferedSinkWriter.java
        # :118-148), instead of permanently failing the query.
        write_with_retry(
            client, table, stream, payload, base, WriterSettings()
        )
        state.update((stream, base + len(payload)))
        yield pd.DataFrame(
            {key_col: [key[0]], "base_offset": [base], "n": [len(payload)]}
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        assign,
        f"{key_col} long, base_offset long, n long",
        "name string, next_offset long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


STREAM_TTL_MS = 7 * 24 * 3600 * 1000  # reference StreamStateHandler.java:33


def tws_runtime_available() -> bool:
    """Spark 4's ``transformWithStateInPandas`` Python runner serializes
    state through the google.protobuf runtime in the worker; without it
    the query fails at the first state access.  Gate, don't crash.

    ``compat.enable_bundled_protobuf`` may satisfy the dependency from a
    publicly-installed pure-Python bundle; ``session.get_spark`` wires it
    before the JVM starts so workers inherit the path, and this probe
    re-checks through the same shim for sessions built elsewhere."""
    from ..compat import enable_bundled_protobuf

    return enable_bundled_protobuf()


def keyed_offset_assignment_native_tws(
    stream_df,
    key_col: str,
    backend_root: str,
    table: str,
    ttl_ms: int = STREAM_TTL_MS,
):
    """A4 on the ``transformWithStateInPandas`` API with NATIVE state TTL.

    The reference expires idle per-key write streams after 7 days
    (``process/StreamStateHandler.java:33``); the TWS ValueState TTL maps
    that 1:1 — an idle key's (stream, offset) entry is evicted by the
    state store itself, and the next record for the key lazily recreates
    a fresh stream, exactly the recovery path ``_verify_or_recreate``
    implements for the directory-backed handler.  Semantics otherwise
    identical to :func:`keyed_offset_assignment_tws` (gapless per-key
    offsets, ALREADY_EXISTS trim on replay).

    Requires the python protobuf stack in the workers
    (:func:`tws_runtime_available`); callers fall back to the
    ``applyInPandasWithState`` variant when absent.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from ..session import ensure_package_on_executors

    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf in the "
            "Python workers; use keyed_offset_assignment_tws instead"
        )
    ensure_package_on_executors(stream_df.sparkSession)
    # The RocksDB state-store provider this plan needs (TWS column
    # families; see _rocksdb_state_provider) is set — and RESTORED —
    # by run_native_tws_to_table around query start, not here: a
    # session-wide set at plan-BUILD time would leak into every later
    # unrelated streaming query in the session.

    fh_dir = _faulthandler_dir()

    class OffsetAssigner(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # Fatal-signal stack capture IN the worker process: when an
            # external driver owns the session, the static
            # spark.python.worker.faulthandler.enabled conf is out of
            # reach, so the processor installs its own handler.  A
            # SIGSEGV/SIGBUS/SIGABRT dumps here and
            # run_native_tws_to_table attaches it to the crash report;
            # SIGKILL (OOM killer) leaves the file empty — itself a
            # diagnostic (see TwsWorkerCrashError).
            import faulthandler

            try:
                self._fh_file = open(
                    os.path.join(fh_dir, f"fh_{os.getpid()}.log"), "a"
                )
                faulthandler.enable(file=self._fh_file)
            except OSError:
                self._fh_file = None
            self._state = handle.getValueState(
                "stream_offset",
                "name string, next_offset long",
                ttlDurationMs=ttl_ms,
            )

        def handleInputRows(self, key, rows, timer_values):
            from ..sources.fake_bigquery import FakeBigQuery
            from ..streaming.config import WriterSettings
            from ..streaming.sinks import write_with_retry

            client = FakeBigQuery(backend_root)
            batch = pd.concat(list(rows), ignore_index=True)
            cur = self._state.get()
            if cur is not None:
                stream, base = cur[0], int(cur[1])
            else:  # first record for the key, or TTL-evicted entry
                stream = client.create_write_stream(table, "BUFFERED")
                base = 0
            payload = batch.sort_values("event_id").to_dict("records")
            write_with_retry(
                client, table, stream, payload, base, WriterSettings()
            )
            self._state.update((stream, base + len(payload)))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "base_offset": [base],
                    "n": [len(payload)],
                }
            )

        def close(self) -> None:
            # disable BEFORE closing: a fatal signal after close must
            # not dump into a closed fd
            import faulthandler

            if getattr(self, "_fh_file", None) is not None:
                try:
                    faulthandler.disable()
                    self._fh_file.close()
                except Exception:
                    pass

    # Spark only honors state TTL under processing-time mode: with
    # timeMode="None" the ValueState registration with ttlDurationMs
    # raises at first use, so the advertised 7-day expiry never ran.
    return stream_df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=OffsetAssigner(),
        outputStructType=f"{key_col} long, base_offset long, n long",
        outputMode="append",
        timeMode="ProcessingTime",
    )


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


class _scoped_sql_conf:
    """Set runtime SQL confs for the duration of a query start and
    RESTORE each key's previous value (set or unset) on exit — no
    session-wide leak into later unrelated queries.  Streaming
    state-store confs are read once at query START, so holding them for
    the runner's start-to-stop lifetime is sufficient."""

    def __init__(self, spark, conf: dict):
        self._spark = spark
        self._conf = conf

    def __enter__(self):
        self._prev = {
            k: self._spark.conf.get(k, None) for k in self._conf
        }
        for k, v in self._conf.items():
            self._spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, prev in self._prev.items():
            if prev is None:
                try:
                    self._spark.conf.unset(k)
                except Exception:
                    pass
            else:
                self._spark.conf.set(k, prev)
        return False


class _rocksdb_state_provider(_scoped_sql_conf):
    """Scope the RocksDB state-store provider around a query start.

    TWS state (value states + the TTL secondary index) lives in multiple
    column families, which the default HDFS-backed provider rejects;
    RocksDB is also the store you'd run at 100 TB (memory-bounded,
    changelog checkpointing)."""

    def __init__(self, spark):
        super().__init__(spark, {_PROVIDER_KEY: _ROCKSDB_PROVIDER})


def _is_tws_worker_crash(exc: BaseException) -> bool:
    """True when a streaming failure is the TWS Python runner dying
    (state-server/daemon death under memory or fork pressure), not a
    query-semantics error.  Matched narrowly on Spark's own dead-worker
    wording — ``... worker exited unexpectedly (crashed)`` — which
    covers both observed forms (``Python worker exited unexpectedly``
    and ``TransformWithStateInPySpark driver worker exited
    unexpectedly``) while NOT matching a deterministic plan/UDF error
    whose message merely mentions workers or crashes (those must
    surface immediately, not burn a retry)."""
    return "worker exited unexpectedly" in str(exc)


class TwsWorkerCrashError(RuntimeError):
    """Raised when the native TWS runner's Python worker died and the
    run could not (or must not) transparently recover:

    - with a CALLER-MANAGED checkpoint, after the FIRST crash — an
      in-place auto-retry would reuse the checkpoint but write to a
      fresh output dir, silently dropping the batches the crashed
      attempt already committed (partial results); the caller's own
      restart-from-checkpoint is the correct recovery path, so the
      crash is surfaced to it;
    - with a RUN-OWNED checkpoint, after BOTH attempts (the second on a
      memory-bounded RocksDB) crashed.

    Carries every crash message plus any faulthandler stack dumps the
    dying workers managed to write (``crash_evidence``) so the failure
    names its killer; an EMPTY dump set under crash wording means the
    worker died without Python-signal handling running — i.e. SIGKILL,
    almost always the host OOM killer."""

    def __init__(self, message: str, crash_evidence: list[str]):
        super().__init__(message)
        self.crash_evidence = crash_evidence


_FH_DIR: str | None = None


def _faulthandler_dir() -> str:
    """Per-process directory where native-TWS workers dump faulthandler
    stacks on fatal signals (wired inside the stateful processor's
    ``init``, which runs IN the worker — the only hook this library
    controls when the session, and hence the static
    ``spark.python.worker.faulthandler.enabled`` conf, is owned by an
    external driver)."""
    global _FH_DIR
    if _FH_DIR is None:
        from ..scratch import scratch_dir

        _FH_DIR = scratch_dir("tws_faulthandler_")
    return _FH_DIR


def _read_faulthandler_dumps(since: float) -> list[str]:
    """Non-empty worker stack dumps written at/after ``since`` (epoch
    seconds) — the evidence a crashed attempt leaves behind."""
    import glob

    out: list[str] = []
    if _FH_DIR is None:
        return out
    for path in sorted(glob.glob(os.path.join(_FH_DIR, "fh_*.log"))):
        try:
            if os.path.getmtime(path) < since or not os.path.getsize(path):
                continue
            with open(path, "r", errors="replace") as f:
                out.append(f"{os.path.basename(path)}:\n{f.read()}")
        except OSError:
            continue
    return out


# Attempt-2 conf: cap RocksDB native memory (block cache + memtables
# shared across all state-store instances in the executor) — the most
# likely killer of a Python/JNI worker in a loaded host session is
# native memory, so the retry is structurally different, not a replay
# of the same configuration.  Runtime-settable; scoped+restored like
# the provider itself.
_BOUNDED_ROCKSDB_CONF = {
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "256",
    "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB": "16",
}


def run_native_tws_to_table(
    df,
    mode: str = "append",
    checkpoint: str | None = None,
    timeout_s: float = 180.0,
):
    """Run a ``timeMode='ProcessingTime'`` TWS streaming frame over a
    FILE-REPLAY source to completion into a memory table.

    ``trigger(availableNow=True)`` never terminates for these plans:
    processing-time TTL keeps the operator's timer queue non-empty, so
    the micro-batch engine schedules empty wake-up batches forever
    (observed: 250+ epochs on a one-file source).  Drain detection is
    instead explicit: under a replay source every batch consumes input
    until the listing is exhausted, so the first COMMITTED progress
    entry with ``numInputRows == 0`` proves the source is drained (a
    zero-row batch 0 means the source was empty to begin with) — stop
    there and return the settled table.

    The sink is ``foreachBatch`` into a per-CALL parquet directory (the
    memory sink cannot recover from a checkpoint): restarting from the
    same ``checkpoint`` replays only batches committed after the
    restart into the new call's directory, so each call returns exactly
    the rows ITS run produced — what the restart/TTL tests diff.

    The TWS Python runner daemon can die under host fork/memory
    pressure (observed driver-round failures r8/r9:
    ``TransformWithStateInPySpark driver worker exited unexpectedly``)
    — a transient environment event, not a plan error.  Crash handling
    is three-layered:

    1. Workers dump faulthandler stacks into :func:`_faulthandler_dir`
       (enabled inside the processor's ``init`` — the only hook
       available when an external driver owns the session and its
       static faulthandler conf); a crash's dumps are attached to the
       log/raise so the failure names its killer.  NO dump + crash
       wording = the worker died without signal handling = SIGKILL,
       i.e. the host OOM killer.
    2. When the run OWNS its checkpoint (``checkpoint=None``) a crash
       is retried ONCE from a fresh checkpoint and output dir, on a
       STRUCTURALLY DIFFERENT configuration — RocksDB with bounded
       native memory (:data:`_BOUNDED_ROCKSDB_CONF`) — so the retry
       isn't a coin-flip replay of the same failure mode.
    3. With a CALLER-MANAGED checkpoint there is NO auto-retry: the
       crashed attempt may already have committed batches into its own
       out_dir, and a same-checkpoint retry into a fresh out_dir would
       return only post-restart batches — silent partial results.  The
       crash surfaces as :class:`TwsWorkerCrashError`; the caller's own
       restart-from-checkpoint (a new call) is the recovery path.

    A second run-owned crash raises :class:`TwsWorkerCrashError` with
    both crash messages and all captured worker stacks; callers with a
    semantically equivalent non-native plan (the
    ``applyInPandasWithState`` twin) may catch it and degrade loudly."""
    import logging

    from pyspark.errors import StreamingQueryException

    log = logging.getLogger(__name__)
    t0 = time.time()
    try:
        # each attempt gets a fresh out_dir: a crashed attempt may have
        # committed batches into its own directory already
        return _run_tws_attempt(df, mode, checkpoint, timeout_s)
    except StreamingQueryException as exc:
        if not _is_tws_worker_crash(exc):
            raise
        dumps = _read_faulthandler_dumps(t0)
        evidence = "\n".join(dumps) if dumps else (
            "no faulthandler dump -> worker died without Python signal "
            "handling (SIGKILL, likely host OOM killer)"
        )
        if checkpoint is not None:
            raise TwsWorkerCrashError(
                "native TWS worker crashed under a caller-managed "
                "checkpoint; not auto-retrying (batches the crashed "
                "attempt committed live in its own output dir and a "
                "same-checkpoint retry would silently drop them). "
                f"Restart from the checkpoint to recover.\nCrash: {exc}\n"
                f"Worker evidence: {evidence}",
                [str(exc), *dumps],
            ) from exc
        log.warning(
            "native TWS runner worker crashed on first attempt; retrying "
            "once from a fresh checkpoint with memory-bounded RocksDB "
            "(%s). Worker evidence:\n%s\nCrash:\n%s",
            _BOUNDED_ROCKSDB_CONF,
            evidence,
            exc,
        )
        t1 = time.time()
        try:
            return _run_tws_attempt(
                df, mode, checkpoint, timeout_s,
                extra_conf=_BOUNDED_ROCKSDB_CONF,
            )
        except StreamingQueryException as exc2:
            if not _is_tws_worker_crash(exc2):
                raise
            dumps2 = _read_faulthandler_dumps(t1)
            evidence2 = "\n".join(dumps2) if dumps2 else (
                "no faulthandler dump -> SIGKILL (likely host OOM killer)"
            )
            raise TwsWorkerCrashError(
                "native TWS worker crashed on BOTH attempts (second on "
                "memory-bounded RocksDB); giving up on the native "
                f"runner.\nFirst crash: {exc}\nFirst evidence: "
                f"{evidence}\nSecond crash: {exc2}\nSecond evidence: "
                f"{evidence2}",
                [str(exc), *dumps, str(exc2), *dumps2],
            ) from exc2


def _run_tws_attempt(
    df,
    mode: str,
    checkpoint: str | None,
    timeout_s: float,
    extra_conf: dict | None = None,
):
    """One start-to-drain execution (see run_native_tws_to_table).
    ``extra_conf`` is scoped+restored around query start exactly like
    the provider conf (all state-store confs are read at START)."""
    from ..scratch import scratch_dir

    out_dir = scratch_dir("tws_out_")
    ckpt = checkpoint or scratch_dir("ckpt_tws_")

    def sink(batch_df, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    conf = {_PROVIDER_KEY: _ROCKSDB_PROVIDER, **(extra_conf or {})}
    with _scoped_sql_conf(df.sparkSession, conf):
        q = (
            df.writeStream.foreachBatch(sink)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def _drained(progresses: list[dict]) -> bool:
        # ONE zero-input batch is not drained: restarting from a
        # checkpoint whose final empty wake-up batch never committed
        # REPLAYS that empty batch before planning the new files (and a
        # pending TTL timer fires an empty batch at start either way).
        # The file source can't report availability (latestOffset is
        # unset), so require TWO CONSECUTIVE empty batches at the SAME
        # end offsets: every batch plan re-lists the source, so a repeat
        # empty at an unmoved offset proves the listing is exhausted.
        by_id: dict[int, dict] = {p["batchId"]: p for p in progresses}
        ids = sorted(by_id)
        for a, b in zip(ids, ids[1:]):
            if b != a + 1:
                continue
            pa_, pb = by_id[a], by_id[b]
            if pa_["numInputRows"] != 0 or pb["numInputRows"] != 0:
                continue
            if [s.get("endOffset") for s in pa_.get("sources", [])] == [
                s.get("endOffset") for s in pb.get("sources", [])
            ]:
                return True
        return False

    try:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if q.exception() is not None:
                raise q.exception()
            if _drained(q.recentProgress or []):
                break
            time.sleep(0.2)
        else:
            raise TimeoutError(
                f"native TWS query did not drain in {timeout_s}s"
            )
    finally:
        q.stop()
    q.awaitTermination()
    # explicit schema: a drained-empty run leaves no parquet files
    return df.sparkSession.read.schema(df.schema).parquet(out_dir)
