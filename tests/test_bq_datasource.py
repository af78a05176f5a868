"""The fakebigquery Python DataSource: batch/streaming writes, partitioned
reads, filter pushdown, and 2PC visibility semantics.

Mirrors the reference's sink contract tests (`BigQueryDefaultSinkTest.java`,
`BigQueryBufferedSinkTest.java`) on Spark's native connector surface.
"""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_big_query_connector_spark.sources import bq_datasource as dsrc
from flink_big_query_connector_spark.sources.fake_bigquery import FakeBigQuery


SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "bq")


@pytest.fixture(autouse=True)
def _register(spark):
    dsrc.register(spark)


def _sample_df(spark, n=100):
    return spark.createDataFrame(
        [Row(id=i, name=f"name_{i % 7}", score=float(i) / 2) for i in range(n)],
        SCHEMA,
    )


def _write(df, root, table, mode="overwrite"):
    df.write.format(dsrc.SOURCE_NAME).option("root", root).option(
        "table", table
    ).mode(mode).save()


def _read(spark, root, table, **opts):
    r = spark.read.format(dsrc.SOURCE_NAME).option("root", root).option(
        "table", table
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_batch_roundtrip(spark, root):
    df = _sample_df(spark)
    _write(df, root, "p/d/t")
    back = _read(spark, root, "p/d/t")
    assert back.schema == SCHEMA
    assert sorted(back.collect()) == sorted(df.collect())


def test_append_mode_accumulates(spark, root):
    df = _sample_df(spark, 10)
    _write(df, root, "p/d/t")
    _write(df, root, "p/d/t", mode="append")
    assert _read(spark, root, "p/d/t").count() == 20


def test_overwrite_replaces(spark, root):
    _write(_sample_df(spark, 50), root, "p/d/t")
    _write(_sample_df(spark, 10), root, "p/d/t", mode="overwrite")
    assert _read(spark, root, "p/d/t").count() == 10


def test_read_partition_planning(spark, root):
    """Reads split into (stream, row-range) splits honoring `partitions`."""
    _write(_sample_df(spark, 1000).repartition(1), root, "p/d/t")
    back = _read(spark, root, "p/d/t", partitions=6)
    assert back.rdd.getNumPartitions() >= 6
    assert back.count() == 1000


def test_filter_pushdown_results(spark, root):
    df = _sample_df(spark, 200)
    _write(df, root, "p/d/t")
    back = _read(spark, root, "p/d/t")
    got = back.filter(
        (F.col("score") > 10.0) & F.col("name").isin("name_1", "name_2")
    )
    want = df.filter(
        (F.col("score") > 10.0) & F.col("name").isin("name_1", "name_2")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_filter_pushdown_reaches_reader(spark, root):
    """Supported predicates vanish from the Spark plan (evaluated reader-side,
    the row-restriction analogue of the Storage READ API)."""
    _write(_sample_df(spark, 50), root, "p/d/t")
    back = _read(spark, root, "p/d/t").filter(F.col("id") > 25)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" not in plan or "GreaterThan" in plan
    assert back.count() == 24


def test_chunked_appends_bounded(spark, root):
    """Writer chunks by count: 100 rows at batch_rows=30 -> >=4 appends."""
    df = _sample_df(spark, 100).repartition(1)
    (
        df.write.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", "p/d/t")
        .option("batch_rows", "30")
        .mode("overwrite")
        .save()
    )
    assert _read(spark, root, "p/d/t").count() == 100


def test_streaming_write_exactly_once_visibility(spark, root, tmp_path):
    """AvailableNow stream through the 2PC writer: all rows visible after
    the epoch commit, none before via only_visible=true on orphans."""
    src_dir = str(tmp_path / "src")
    _sample_df(spark, 60).coalesce(2).write.parquet(src_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        stream.writeStream.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", "p/d/st")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _read(spark, root, "p/d/st").count() == 60


def test_streaming_write_restart_no_duplicates(spark, root, tmp_path):
    """Kill the 2PC streaming write mid-run and restart from the same
    checkpoint: the visible row set equals the input exactly — replayed
    epochs re-write into fresh buffered streams, orphans stay unflushed,
    and committed batches are not re-committed."""
    src_dir = str(tmp_path / "src")
    df = _sample_df(spark, 90)
    # three files -> three micro-batches with maxFilesPerTrigger=1
    for i in range(3):
        df.filter((F.col("id") % 3) == i).coalesce(1).write.parquet(
            f"{src_dir}/part{i}"
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir + "/part*")
    )
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            stream.writeStream.format(dsrc.SOURCE_NAME)
            .option("root", root)
            .option("table", "p/d/rst")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    # wait for at least one committed batch, then kill mid-stream
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q.recentProgress):
            break
        time.sleep(0.2)
    q.stop()
    q2 = (
        stream.writeStream.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", "p/d/rst")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    back = _read(spark, root, "p/d/rst")
    assert back.count() == 90
    assert back.select("id").distinct().count() == 90


def test_unflushed_buffered_rows_invisible(spark, root):
    """Rows appended to a buffered stream without FlushRows stay invisible
    to the reader (the crash-before-commit case)."""
    _write(_sample_df(spark, 20), root, "p/d/t")
    bq = FakeBigQuery(root)
    s = bq.create_write_stream("p/d/t", "BUFFERED")
    bq.append("p/d/t", s, [{"id": 999, "name": "orphan", "score": 0.0}], offset=0)
    assert _read(spark, root, "p/d/t").count() == 20
    assert _read(spark, root, "p/d/t", only_visible="false").count() == 21


def test_schema_persisted_and_loaded(spark, root):
    _write(_sample_df(spark, 5), root, "p/d/t")
    back = spark.read.format(dsrc.SOURCE_NAME).option("root", root).option(
        "table", "p/d/t"
    ).load()
    assert [f.name for f in back.schema.fields] == ["id", "name", "score"]


def test_write_retries_transient_failures(spark, root):
    """The connector write path runs the A12 retry machine: scripted
    UNAVAILABLE failures are absorbed and every row lands exactly once
    per attempted append."""
    bq = FakeBigQuery(root)
    bq.script_append_failures(["UNAVAILABLE", "UNAVAILABLE"])
    _write(_sample_df(spark, 40).repartition(1), root, "p/d/t")
    assert _read(spark, root, "p/d/t").count() == 40


def test_write_splits_oversized_batch(spark, root):
    """A scripted 'MessageSize is too large' makes the writer split the
    chunk recursively (A14) — no rows lost, no duplicates."""
    bq = FakeBigQuery(root)
    bq.script_append_failures(
        ["INVALID_ARGUMENT"], message="MessageSize is too large"
    )
    _write(_sample_df(spark, 50).repartition(1), root, "p/d/t")
    assert _read(spark, root, "p/d/t").count() == 50


def test_append_with_new_column_evolves_schema(spark, root):
    """Additive schema evolution on append (the SchemaTools.updateTable
    add-only diff): a later write with an extra column widens the table;
    earlier rows read back NULL for it; a narrower later write never drops
    columns."""
    _write(_sample_df(spark, 10), root, "p/d/t")
    wider = _sample_df(spark, 5).withColumn("extra", F.col("id") * 2)
    _write(wider, root, "p/d/t", mode="append")
    back = _read(spark, root, "p/d/t")
    assert [f.name for f in back.schema.fields] == ["id", "name", "score", "extra"]
    assert back.count() == 15
    assert back.filter(F.col("extra").isNull()).count() == 10
    assert back.filter(F.col("extra") == F.col("id") * 2).count() == 5
    narrower = _sample_df(spark, 3).select("id")
    _write(narrower, root, "p/d/t", mode="append")
    back2 = _read(spark, root, "p/d/t")
    assert [f.name for f in back2.schema.fields] == ["id", "name", "score", "extra"]
    assert back2.count() == 18
    assert back2.filter(F.col("name").isNull()).count() == 3


def test_stream_read_rate_limited(spark, root, tmp_path):
    """max_rows_per_trigger bounds each micro-batch's admitted rows (the
    maxOffsetsPerTrigger analogue): a 100-row backlog drains in >= 4
    batches of <= 30 rows, with nothing lost or duplicated."""
    _write(_sample_df(spark, 100), root, "p/d/t")
    stream = (
        spark.readStream.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", "p/d/t")
        .option("max_rows_per_trigger", "30")
        .load()
    )
    name = "dsv2_rate_limited_test"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 100
        batch_rows = [
            p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(batch_rows) >= 4
        assert max(batch_rows) <= 30
    finally:
        q.stop()


def test_two_throttled_readers_each_see_full_table(spark, root, tmp_path):
    """Concurrent throttled queries over one table must not split the
    stream: the admission cursor is scoped per query via cursor_id."""
    _write(_sample_df(spark, 60), root, "p/d/shared")

    def run(qid: str) -> int:
        stream = (
            spark.readStream.format(dsrc.SOURCE_NAME)
            .option("root", root)
            .option("table", "p/d/shared")
            .option("max_rows_per_trigger", "25")
            .option("cursor_id", qid)
            .load()
        )
        name = f"dsv2_cursor_{qid}"
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{qid}"))
            .start()
        )
        try:
            q.processAllAvailable()
            return spark.table(name).count()
        finally:
            q.stop()

    # sequential start, but both cursors live in the same backend dir —
    # a shared cursor would leave reader B seeing 0 new rows
    assert run("qa") == 60
    assert run("qb") == 60


def test_typed_roundtrip_arrow_fast_path(spark, root):
    """date/timestamp/decimal/array columns survive the C++ JSON parse +
    Arrow cast read path bit-exactly."""
    from datetime import date, datetime
    from decimal import Decimal
    from pyspark.sql.types import ArrayType, DateType, DecimalType, TimestampType

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("d", DateType()),
            StructField("ts", TimestampType()),
            StructField("dec", DecimalType(14, 4)),
            StructField("arr", ArrayType(DoubleType())),
        ]
    )
    rows = [
        Row(
            id=i,
            d=date(2024, 1, 1 + i % 28),
            ts=datetime(2024, 1, 1, 12, 30, i % 60, 123456),
            dec=Decimal(f"{i}.{i % 10}001"),
            arr=[float(i), i / 3.0, None],
        )
        for i in range(50)
    ] + [Row(id=999, d=None, ts=None, dec=None, arr=None)]
    df = spark.createDataFrame(rows, schema)
    _write(df, root, "p/d/typed")
    back = _read(spark, root, "p/d/typed")
    assert back.schema == schema
    assert sorted(back.collect()) == sorted(df.collect())
    # pushed date comparison evaluated arrow-side
    got = back.filter(F.col("d") >= date(2024, 1, 15)).count()
    want = df.filter(F.col("d") >= date(2024, 1, 15)).count()
    assert got == want > 0


def test_missing_table_raises(spark, root):
    with pytest.raises(Exception, match="no schema"):
        _read(spark, root, "p/d/absent").count()


def test_stream_read_incremental(spark, root, tmp_path):
    """readStream over the backend: each micro-batch covers the newly
    VISIBLE delta per write stream; appends made while the query runs are
    picked up by later triggers, and unflushed buffered rows never appear."""
    _write(_sample_df(spark, 30), root, "p/d/t")
    stream = (
        spark.readStream.format(dsrc.SOURCE_NAME)
        .option("root", root)
        .option("table", "p/d/t")
        .option("stream_rows_per_partition", "10")
        .load()
    )
    name = "dsv2_stream_read_test"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 30
        bq = FakeBigQuery(root)
        from flink_big_query_connector_spark.sources.fake_bigquery import (
            default_stream_name,
        )
        bq.append(
            "p/d/t",
            default_stream_name("p/d/t"),
            [{"id": 100 + i, "name": "late", "score": 1.0} for i in range(5)],
            offset=-1,
        )
        # buffered-but-unflushed rows must NOT enter any epoch
        s = bq.create_write_stream("p/d/t", "BUFFERED")
        bq.append("p/d/t", s, [{"id": 999, "name": "orphan", "score": 0.0}], offset=0)
        q.processAllAvailable()
        assert spark.table(name).count() == 35
        # flushing makes them visible to the NEXT trigger
        bq.flush_rows("p/d/t", s, 0)
        q.processAllAvailable()
        assert spark.table(name).count() == 36
    finally:
        q.stop()


# -- server-side field list (selected_fields analogue) ------------------------


def test_fields_option_narrows_schema_and_order(spark, root):
    """``fields=`` is the Storage READ API ``selected_fields`` analogue:
    the catalog schema narrows before the reader exists, in the requested
    order, so unlisted columns never cross the Arrow boundary.  (Python
    DSv2 has no pruneColumns hook — a post-load .select() cannot do
    this; the column-width contract is documented on the DataSource.)"""
    _write(_sample_df(spark), root, "p/d/t")
    back = _read(spark, root, "p/d/t", fields="score,id")
    assert [f.name for f in back.schema.fields] == ["score", "id"]
    assert back.schema["id"].dataType == LongType()
    assert back.schema["score"].dataType == DoubleType()
    got = {r["id"]: r["score"] for r in back.collect()}
    assert got == {i: float(i) / 2 for i in range(100)}


def test_fields_option_composes_with_filter_pushdown(spark, root):
    _write(_sample_df(spark), root, "p/d/t")
    back = _read(spark, root, "p/d/t", fields="id").filter("id < 10")
    assert sorted(r["id"] for r in back.collect()) == list(range(10))


def test_fields_option_unknown_column_raises(spark, root):
    _write(_sample_df(spark), root, "p/d/t")
    with pytest.raises(Exception, match="unknown columns"):
        _read(spark, root, "p/d/t", fields="id,nope").collect()


def test_explicit_narrow_schema_prunes_equivalently(spark, root):
    """The second server-side pruning path: an explicit narrow schema is
    the reader schema, so the Arrow parse materializes only its fields
    (unexpected_field_behavior='ignore')."""
    _write(_sample_df(spark), root, "p/d/t")
    back = (
        spark.read.format(dsrc.SOURCE_NAME)
        .schema("name string")
        .option("root", root)
        .option("table", "p/d/t")
        .load()
    )
    assert back.columns == ["name"]
    assert set(r["name"] for r in back.collect()) == {
        f"name_{i}" for i in range(7)
    }


# -- wildcard tables (_TABLE_SUFFIX analogue) ---------------------------------


def _write_sharded(spark, root):
    for sfx in ("a", "b", "c"):
        df = spark.createDataFrame(
            [Row(id=i, name=f"{sfx}{i}") for i in range(10)],
            "id long, name string",
        )
        _write(df, root, f"p/d/ev_{sfx}")


def test_wildcard_read_unions_tables_with_suffix(spark, root):
    _write_sharded(spark, root)
    back = _read(spark, root, "p/d/ev_*")
    assert back.columns == ["id", "name", "_table_suffix"]
    rows = back.collect()
    assert len(rows) == 30
    assert {r["_table_suffix"] for r in rows} == {"a", "b", "c"}
    # row-level integrity: name encodes its own shard
    assert all(r["name"].startswith(r["_table_suffix"]) for r in rows)


def test_wildcard_suffix_filter_prunes_tables_at_planning(spark, root):
    """The wildcard's scale payoff: a supported comparison on the
    pseudo-column removes whole tables from the split plan, not just
    rows from the scan."""
    from pyspark.sql.datasource import EqualTo

    _write_sharded(spark, root)
    # end to end
    got = _read(spark, root, "p/d/ev_*").filter("_table_suffix = 'b'")
    assert sorted(r["name"] for r in got.collect()) == [
        f"b{i}" for i in range(10)
    ]
    # split planning: only ev_b's streams are planned
    schema = dsrc.FakeBigQueryDataSource(
        {"root": root, "table": "p/d/ev_*"}
    ).schema()
    reader = dsrc.FakeBigQueryReader(
        schema, {"root": root, "table": "p/d/ev_*"}
    )
    leftover = reader.pushFilters([EqualTo(("_table_suffix",), "b")])
    assert list(leftover) == []
    tables = {p.table for p in reader.partitions()}
    assert tables == {"p/d/ev_b"}


def test_wildcard_mismatched_schemas_raise(spark, root):
    _write_sharded(spark, root)
    _write(
        spark.createDataFrame([Row(other=1.5)], "other double"),
        root,
        "p/d/ev_zzz",
    )
    with pytest.raises(Exception, match="mismatched"):
        _read(spark, root, "p/d/ev_*").collect()


def test_wildcard_fields_option_composes(spark, root):
    _write_sharded(spark, root)
    back = _read(spark, root, "p/d/ev_*", fields="_table_suffix,id")
    assert back.columns == ["_table_suffix", "id"]
    assert len(back.collect()) == 30
    only_sfx = _read(spark, root, "p/d/ev_*", fields="_table_suffix")
    assert sorted(r[0] for r in only_sfx.collect()) == ["a"] * 10 + [
        "b"
    ] * 10 + ["c"] * 10


def test_wildcard_write_rejected(spark, root):
    df = spark.createDataFrame([Row(id=1)], "id long")
    with pytest.raises(Exception, match="wildcard"):
        _write(df, root, "p/d/ev_*")
