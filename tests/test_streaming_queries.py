"""Streaming-query registry entries (B21–B26): replay machinery + semantics.

The full DuckDB-oracle comparison runs in tools/check_correctness.py; these
tests cover the replay chunker's determinism and the cheapest end-to-end
streaming paths at sf0.001 so the suite stays fast.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from flink_big_query_connector_spark.plans import streaming_queries as sq

SF_DIR = "/root/testdata/sf0.001"


def test_ordered_chunks_partition_events():
    import pyarrow.parquet as pq

    d = sq._write_chunks(SF_DIR, "ordered")
    files = sorted(os.listdir(d))
    assert len(files) == len(sq.CHUNK_BOUNDS) + 1
    total = sum(pq.read_metadata(os.path.join(d, f)).num_rows for f in files)
    assert total == pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    # arrival order = mtime order = name order
    mtimes = [os.path.getmtime(os.path.join(d, f)) for f in files]
    assert mtimes == sorted(mtimes)


def test_late_chunks_withhold_late_rows():
    import pyarrow.parquet as pq

    d = sq._write_chunks(SF_DIR, "late")
    files = sorted(os.listdir(d))
    assert len(files) == 3
    first = pq.read_table(os.path.join(d, files[0]))
    ts = first["ts"].cast("int64").to_pylist()
    ids = first["event_id"].to_pylist()
    assert all(t < sq.LATE_SPLIT_NS for t in ts)
    assert all(i % sq.LATE_MOD != 0 for i in ids)


def test_stream_dedup_equals_batch_distinct(spark):
    got = {
        (r.user_id, r.event_type)
        for r in sq.b24_stream_dedup(spark, SF_DIR).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"SELECT DISTINCT user_id, event_type "
            f"FROM '{SF_DIR}/events.parquet'"
        ).fetchall()
    }
    assert got == want


def test_tumbling_window_emits_closed_windows_only(spark):
    rows = sq.b21_stream_tumbling_window(spark, SF_DIR).collect()
    assert rows
    con = duckdb.connect()
    (max_ts,) = con.execute(
        f"SELECT MAX(ts) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()
    # append mode: every emitted window closed before the final watermark
    import datetime

    wm = max_ts - datetime.timedelta(hours=1)
    assert all(r.window_end <= wm for r in rows)
    # and window bounds are 6h-aligned
    assert all(
        r.window_start.minute == 0 and r.window_start.hour % 6 == 0
        for r in rows
    )


def test_late_rows_actually_dropped(spark):
    """The b23 scenario must exercise the drop path, not vacuously pass."""
    import tempfile

    from pyspark.sql import functions as F

    ev = sq._events_stream(spark, SF_DIR, scheme="late")
    out = (
        ev.withWatermark("etime", "1 hour")
        .groupBy(F.window("etime", "6 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_late_drop")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_t23_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped > 0


def test_ts_helpers_adapt_to_both_physical_types(spark, tmp_path):
    """The driver testdata has shipped events.ts as int64 nanos AND as
    timestamp[us]; both helpers must yield identical micros / event-time
    for the same instant under either physical type (the round-2 breakage
    was exactly a half-adapted dtype flip)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_big_query_connector_spark.sources.tables import (
        ts_event_time,
        ts_micros,
    )

    micros = [1_704_067_200_000_000, 1_706_745_599_999_999]
    p_long = str(tmp_path / "long")
    p_us = str(tmp_path / "us")
    pq.write_table(
        pa.table({"ts": pa.array([m * 1000 for m in micros], pa.int64())}), 
        p_long + ".parquet",
    )
    pq.write_table(
        pa.table({"ts": pa.array(micros, pa.timestamp("us"))}),
        p_us + ".parquet",
    )
    out = {}
    for name, path in (("long", p_long), ("us", p_us)):
        df = spark.read.parquet(path + ".parquet")
        got = df.select(
            ts_micros(df).alias("m"),
            ts_event_time(df).cast("long").alias("et_secs"),
        ).orderBy("m").collect()
        out[name] = [(r["m"], r["et_secs"]) for r in got]
    assert out["long"] == out["us"]
    assert [m for m, _ in out["long"]] == micros


def test_neardup_history_is_chunking_independent(spark, sf_dir):
    """The streaming near-dup suppressor must produce the batch rule's
    exact output no matter how arrival chunks the corpus (pigeonhole
    banding + ordered doc_id ranges): 1 chunk (everything intra-batch)
    and 4 chunks (history-store path exercised) must agree."""
    from flink_big_query_connector_spark.plans.streaming_queries import (
        b24_stream_neardup_history,
    )

    one = {
        (r.doc_id, r.simhash)
        for r in b24_stream_neardup_history(spark, sf_dir, n_chunks=1).collect()
    }
    four = {
        (r.doc_id, r.simhash)
        for r in b24_stream_neardup_history(spark, sf_dir, n_chunks=4).collect()
    }
    assert one == four and len(one) > 0


def test_bucketed_keyed_state_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch id after a crash between the
    bucket write and the checkpoint commit) must leave the state table
    exactly as the first attempt did: version dirs are keyed by batch id
    and the manifest advance is atomic."""
    from pyspark.sql import functions as F

    from flink_big_query_connector_spark.streaming.keyed_state import (
        BucketedKeyedState,
    )

    state = BucketedKeyedState(
        str(tmp_path / "ks"), "k", "k long, v long", n_buckets=4
    )
    b0 = spark.createDataFrame([(1, 10), (2, 20), (9, 90)], "k long, v long")

    def merge(df, batch_id):
        touched = state.touched_buckets(df)
        merged = df.unionByName(
            state.read_buckets(spark, touched)
        ).groupBy("k").agg(F.max("v").alias("v"))
        state.write_buckets(merged, batch_id, touched)
        return touched

    merge(b0, 0)
    snap1 = sorted(map(tuple, state.read_all(spark).collect()))
    merge(b0, 0)  # replay of the SAME batch
    snap2 = sorted(map(tuple, state.read_all(spark).collect()))
    assert snap1 == snap2 == [(1, 10), (2, 20), (9, 90)]

    # a later batch updates one key and adds another; bystanders persist
    b1 = spark.createDataFrame([(2, 25), (7, 70)], "k long, v long")
    merge(b1, 1)
    assert sorted(map(tuple, state.read_all(spark).collect())) == [
        (1, 10), (2, 25), (7, 70), (9, 90),
    ]


def test_versioned_serving_table_merge_is_replay_idempotent(spark, tmp_path):
    """foreachBatch exactly-once: re-delivering an already-merged batch
    id (the crash-between-state-write-and-checkpoint-commit replay) is a
    no-op, while a new batch id applies once — so backfill + tail can
    never double-count."""
    from pyspark.sql import functions as F

    from flink_big_query_connector_spark.plans.streaming_queries import (
        VersionedServingTable,
    )

    t = VersionedServingTable(spark, str(tmp_path / "serve"), "event_type")
    (tmp_path / "serve").mkdir()

    def frame(rows):
        df = spark.createDataFrame(rows, "event_type string, n long, tv string")
        return df.withColumn("tv", F.col("tv").cast("decimal(20,4)"))

    t.write(frame([("click", 10, "5.0")]), "backfill")
    p = frame([("click", 2, "1.5"), ("view", 1, "0.5")])
    t.merge(0, p)
    t.merge(0, p)  # replay of the same batch id — must be a no-op
    got = {r["event_type"]: (r["n"], str(r["tv"])) for r in t.read().collect()}
    assert got == {"click": (12, "6.5000"), "view": (1, "0.5000")}
    t.merge(1, p)  # a NEW batch id applies once
    got = {r["event_type"]: (r["n"], str(r["tv"])) for r in t.read().collect()}
    assert got == {"click": (14, "8.0000"), "view": (2, "1.0000")}


def test_budget_admission_replay_and_restart(spark, tmp_path):
    """Crash-replay contract of the quota-admission merge: re-delivering
    an already-merged batch id must not re-add carried totals (running
    sums are not idempotent), and a fresh `process` closure built over
    the SAME durable state (a driver restart) must continue from the
    carried totals rather than from zero."""
    from pyspark.sql import functions as F

    from flink_big_query_connector_spark.plans.streaming_queries import (
        _admission_process,
    )
    from flink_big_query_connector_spark.streaming.keyed_state import (
        BucketedKeyedState,
    )

    def docs(rows):
        return spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )

    state = BucketedKeyedState(
        str(tmp_path / "st"), "source", "source string, carried long"
    )
    out = str(tmp_path / "out")
    process = _admission_process(state, out, budget=5)

    # batch 0: src a spends 3 of its 5-token budget
    b0 = docs([(1, "a", "w w w"), (2, "b", "x x x x")])
    process(b0, 0)
    carried = {r["source"]: r["carried"] for r in state.read_all(spark).collect()}
    assert carried == {"a": 3, "b": 4}
    process(b0, 0)  # replay after crash-before-checkpoint-commit: no-op
    carried = {r["source"]: r["carried"] for r in state.read_all(spark).collect()}
    assert carried == {"a": 3, "b": 4}

    # driver restart: NEW closure over the same durable state
    process2 = _admission_process(state, out, budget=5)
    b1 = docs([(3, "a", "w w w"), (4, "b", "x")])
    process2(b1, 1)
    admitted = {
        (r["doc_id"], r["cum_before"])
        for r in spark.read.parquet(f"{out}/b1").collect()
    }
    # a carried 3 -> doc 3 admitted at cum_before=3; b carried 4 -> doc 4
    # admitted at cum_before=4 (both still under the 5-token budget)
    assert admitted == {(3, 3), (4, 4)}
    carried = {r["source"]: r["carried"] for r in state.read_all(spark).collect()}
    assert carried == {"a": 6, "b": 5}

    # batch 2: both sources exhausted -> zero admissions
    b2 = docs([(5, "a", "w"), (6, "b", "x")])
    process2(b2, 2)
    assert spark.read.schema(
        "doc_id long, source string, n_tokens long, cum_before long"
    ).parquet(f"{out}/b2").count() == 0
    carried = {r["source"]: r["carried"] for r in state.read_all(spark).collect()}
    assert carried == {"a": 7, "b": 6}


def test_keyed_state_drained_bucket_drops_manifest_entry(spark, tmp_path):
    """A touched bucket whose merged output is EMPTY gets its manifest
    entry deleted (partitionBy writes no empty dirs) — a stale entry
    would make the next read fail with PATH_NOT_FOUND."""
    from flink_big_query_connector_spark.streaming.keyed_state import (
        BucketedKeyedState,
    )

    state = BucketedKeyedState(
        str(tmp_path / "ks"), "k", "k long, v long", n_buckets=4
    )
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    t0 = state.touched_buckets(b0)
    state.write_buckets(b0, 0, t0)
    assert state.last_batch() == 0

    # batch 1 deletes every row of key 1's bucket: rewrite those buckets
    # with zero surviving rows
    only_k1 = state.read_all(spark).filter("k = 1")
    t1 = state.touched_buckets(only_k1)
    survivors = state.read_buckets(spark, t1).filter("k != 1")
    state.write_buckets(survivors, 1, t1)
    # read_all must NOT raise and key 1 must be gone, key 2 intact
    rows = sorted(map(tuple, state.read_all(spark).collect()))
    assert rows == [(2, 20)]
    # the drain batch advanced the EXPLICIT __last_batch manifest field
    # even though its only bucket entry was deleted — inferring from
    # surviving bucket paths would report 0 here and let a re-delivered
    # copy of batch 1 through the replay guard
    assert state.last_batch() == 1


def test_scd2_merge_replay_does_not_lose_closures(spark, tmp_path):
    """Re-delivering an already-merged SCD2 micro-batch (crash between
    the state-manifest advance and the checkpoint commit) must be a
    no-op: an unguarded re-run stitches against the ALREADY-advanced
    open interval and overwrites closed/b{id} without the pre-batch
    interval's closure — silently losing a history row."""
    import os

    from flink_big_query_connector_spark.plans.streaming_queries import (
        _scd2_merge,
    )
    from flink_big_query_connector_spark.streaming.keyed_state import (
        BucketedKeyedState,
    )

    state = BucketedKeyedState(
        str(tmp_path / "st"), "user_id",
        "user_id long, value string, valid_from long, valid_from_eid long",
    )
    closed_dir = str(tmp_path / "closed")
    os.makedirs(closed_dir)
    merge = _scd2_merge(state, closed_dir)

    def events(rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, tmicros long, event_id long"
        )

    # batch 0 opens (u1, 'a'); batch 1 transitions to 'b', closing it
    merge(events([(1, "a", 100, 1)]), 0)
    merge(events([(1, "b", 200, 2)]), 1)

    def closed_rows():
        return sorted(
            map(tuple, spark.read.schema(
                "user_id long, value string, valid_from long, valid_to long"
            ).parquet(f"{closed_dir}/b*").collect())
        )

    expect = [(1, "a", 100, 200)]
    assert closed_rows() == expect
    # replay batch 1: without the guard the stitch sees open=('b',200),
    # treats the batch row as no-change, and rewrites b1 EMPTY
    merge(events([(1, "b", 200, 2)]), 1)
    assert closed_rows() == expect
    opens = [(r["user_id"], r["value"], r["valid_from"])
             for r in state.read_all(spark).collect()]
    assert opens == [(1, "b", 200)]

    # a genuinely new batch still applies
    merge(events([(1, "c", 300, 3)]), 2)
    assert closed_rows() == [(1, "a", 100, 200), (1, "b", 200, 300)]


def test_dlq_router_ledger_contract():
    """Pins the b23 side-output watermark ledger (VERDICT r7 task 5 /
    ADVICE r7): (a) two-batch lag — the filter watermark for batch N is
    max event time through batch N-2 minus the delay; (b) re-delivery of
    a batch_id (task retry) is a pure overwrite, leaving every later
    lookup unchanged; (c) an empty batch carries the prior max forward."""
    delay = 3_600 * sq._US
    cum: dict[int, int | None] = {}

    sq._ledger_record(cum, 0, 100 * sq._US)
    sq._ledger_record(cum, 1, 50 * sq._US)   # regression: max carries
    sq._ledger_record(cum, 2, None)          # empty batch
    sq._ledger_record(cum, 3, 200 * sq._US)

    # two-batch lag: batch 0/1 have no watermark; batch 3 sees batch 1's
    # cumulative max (still 100s — batch 1's own max was lower)
    assert sq._ledger_watermark(cum, 0, delay) is None
    assert sq._ledger_watermark(cum, 1, delay) is None
    assert sq._ledger_watermark(cum, 2, delay) == 100 * sq._US - delay
    assert sq._ledger_watermark(cum, 3, delay) == 100 * sq._US - delay
    assert sq._ledger_watermark(cum, 4, delay) == 100 * sq._US - delay
    assert sq._ledger_watermark(cum, 5, delay) == 200 * sq._US - delay

    # re-delivery (same batch_id, same data) changes nothing downstream
    before = dict(cum)
    sq._ledger_record(cum, 1, 50 * sq._US)
    assert cum == before
    assert sq._ledger_watermark(cum, 3, delay) == 100 * sq._US - delay


def test_url_admission_is_chunking_independent(spark, sf_dir):
    """b24_stream_url_admission's settled decisions must equal the
    chunk-count-independent contract (candidates = existing corpus ∪
    strictly-earlier crawl positions) for ANY chunking: 1 chunk (all
    within-batch) vs 5 chunks (the growing bucketed index path) — and
    each new fetch decides exactly once."""
    from flink_big_query_connector_spark.plans.streaming_queries import (
        b24_stream_url_admission,
    )

    def settle(n):
        rows = b24_stream_url_admission(spark, sf_dir, n_chunks=n).collect()
        return {
            r.doc_id: (r.matched_doc_id, r.hamming, r.action) for r in rows
        }, len(rows)

    one, n_one = settle(1)
    five, n_five = settle(5)
    assert one == five and len(one) > 0
    assert n_one == len(one) and n_five == len(five)  # one decision/fetch
    # NOTE: on the URL fixture every decision matches an OLD version
    # (each fetch's base doc is present in the corpus at hamming 0 and
    # ties break to the smaller old id) — the growing-index arm is
    # unreachable here BY CONSTRUCTION, so it is pinned separately with
    # synthetic fetches in test_url_admission_growing_index.
    assert all(
        m is None or m < 1_000_000 for m, _, _ in one.values()
    )


def test_url_admission_growing_index(spark, tmp_path):
    """The frontier scenario the fixture cannot produce: a
    never-before-seen URL fetched in two waves.  Wave 1 must admit
    ('ingest_new'); wave 2's identical fetch must match WAVE 1's
    arrival (a new, >=1e6 id — the growing index) and skip; a changed
    re-fetch must land 'ingest_changed' against the closer version."""
    import os

    from flink_big_query_connector_spark.plans.streaming_queries import (
        _url_admission_batch,
    )
    from flink_big_query_connector_spark.streaming.keyed_state import (
        BucketedKeyedState,
    )

    schema = (
        "k string, doc_id long, canon_host string, cpath string, "
        "base_id long, simhash long"
    )
    state = BucketedKeyedState(str(tmp_path / "state"), "k", schema)
    out_dir = str(tmp_path / "out")

    def side(rows):
        return spark.createDataFrame(rows, schema)

    def read_out(batch_id):
        return {
            r.doc_id: (r.matched_doc_id, r.hamming, r.action)
            for r in spark.read.parquet(
                os.path.join(out_dir, f"b{batch_id}")
            ).collect()
        }

    K = "h.example.com|en/p7"
    # wave 1: brand-new URL, one fetch (crawl position 1)
    _url_admission_batch(
        spark, state,
        side([(K, 1_000_001, "h.example.com", "en/p7", 1, 0b1010)]),
        out_dir, 0,
    )
    assert read_out(0) == {1_000_001: (None, None, "ingest_new")}
    # wave 2: same URL again (identical content) + a changed re-fetch
    _url_admission_batch(
        spark, state,
        side([
            (K, 1_000_024, "h.example.com", "en/p7", 24, 0b1010),
            (K, 2_000_047, "h.example.com", "en/p7", 47, 0b1010 ^ 0xFF),
        ]),
        out_dir, 1,
    )
    got = read_out(1)
    # identical re-fetch: matched to wave-1's NEW arrival, skipped
    assert got[1_000_024] == (1_000_001, 0, "skip_duplicate")
    # changed content (hamming 8 > 3): same-URL match, ingest anyway;
    # best match is the EARLIEST equal-distance version (min id)
    assert got[2_000_047] == (1_000_001, 8, "ingest_changed")
    # replayed batch is a no-op on the index (manifest guard)
    last = state.last_batch()
    _url_admission_batch(
        spark, state,
        side([(K, 1_000_099, "h.example.com", "en/p7", 99, 0b1010)]),
        out_dir, 1,
    )
    assert state.last_batch() == last


def test_url_admission_ttl_replay_deterministic(spark):
    """Replaying the whole TTL-admission pipeline (fresh state/output/
    checkpoint dirs each run — the registry call allocates its own) must
    reproduce every decision bitwise: expiry is batch-sequence
    arithmetic, never wall clock.  Also proves expiry actually bites —
    an epoch >= 2 fetch re-ingests after its seed evidence expired."""
    from flink_big_query_connector_spark.plans.streaming_queries import (
        b24_stream_url_admission_ttl,
    )

    def run():
        return sorted(
            tuple(r)
            for r in b24_stream_url_admission_ttl(spark, SF_DIR).collect()
        )

    one, two = run(), run()
    assert one == two
    epochs = {r[3] for r in one}
    assert epochs == {1, 2, 3}
    # seed evidence (epoch 0) is expired for every epoch >= 2 fetch with
    # TTL=1: any such fetch whose only candidate was the seed re-ingests
    assert any(r[3] >= 2 and r[6] == "ingest_new" for r in one)


def test_keyed_state_compact_drops_only_dead_rows(spark, tmp_path):
    """BucketedKeyedState.compact rewrites every live bucket under the
    keep-predicate: surviving rows identical, dead rows gone, manifest
    batch advanced, fully-dead buckets dropped from the manifest."""
    from flink_big_query_connector_spark.streaming.keyed_state import (
        BucketedKeyedState,
    )

    schema = "k string, v long, seen_batch long"
    state = BucketedKeyedState(str(tmp_path / "st"), "k", schema, n_buckets=4)
    rows = [(f"k{i}", i, i % 3) for i in range(24)]
    df = spark.createDataFrame(rows, schema)
    state.write_buckets(df, 1, state.touched_buckets(df))
    state.compact(spark, "seen_batch >= 2", 2)
    got = sorted(tuple(r) for r in state.read_all(spark).collect())
    assert got == sorted(t for t in rows if t[2] >= 2)
    assert state.last_batch() == 2
