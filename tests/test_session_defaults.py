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
