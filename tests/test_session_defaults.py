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
