"""The initial shuffle-partition default is a scale contract: 8x cores
under AQE coalescing (BASELINE.md partition-sizing experiment), with
explicit args and SPARK_GRAFT_SHUFFLE_PARTITIONS still winning."""

from flink_big_query_connector_spark.session import (
    default_shuffle_partitions,
)


def test_default_is_eight_times_cores():
    assert default_shuffle_partitions(32) == 256
    assert default_shuffle_partitions("8") == 64
    assert default_shuffle_partitions(1) == 8


def test_non_numeric_cpu_spec_falls_back():
    assert default_shuffle_partitions("*") == 256
    assert default_shuffle_partitions(None) == 256


def test_plan_count_memoizes_per_session_dir_label(spark):
    """cache.plan_count runs the count job once per (session, sf_dir,
    label) — the data-scaled-literal idiom pays one scan per session."""
    from flink_big_query_connector_spark import cache as c

    class CountingDF:
        def __init__(self, spark, n):
            self.sparkSession = spark
            self.n = n
            self.calls = 0

        def count(self):
            self.calls += 1
            return self.n

    a = CountingDF(spark, 42)
    assert c.plan_count(a, "/x", "t1") == 42
    assert c.plan_count(a, "/x", "t1") == 42
    assert a.calls == 1  # memoized
    b = CountingDF(spark, 7)
    assert c.plan_count(b, "/x", "t2") == 7  # different label -> new job
    assert c.plan_count(b, "/y", "t2") == 7  # different dir -> new job
    assert b.calls == 2


def test_table_footer_count_matches_spark_count(spark):
    """cache.table_footer_count reads the whole-table row count from the
    parquet footer — it must equal the full Spark scan count exactly,
    for single-file tables and for directory-of-parts tables."""
    from flink_big_query_connector_spark import cache as c

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for table in ("documents", "embeddings", "orders"):
            spark_n = spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
            assert c.table_footer_count(sf_dir, table) == spark_n

    # directory-of-parts form (production layout): split one table into
    # a directory of parquet files and count through the same API
    import os
    import tempfile

    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    with tempfile.TemporaryDirectory() as d:
        ddir = os.path.join(d, "documents.parquet")
        os.makedirs(ddir)
        half = tbl.num_rows // 2
        pq.write_table(tbl.slice(0, half), os.path.join(ddir, "p0.parquet"))
        pq.write_table(tbl.slice(half), os.path.join(ddir, "p1.parquet"))
        assert c.table_footer_count(d, "documents") == tbl.num_rows
