"""Skew-aware aggregation patterns for hot keys.

AQE's skew-join splitting handles joins; for aggregation the two
load-bearing patterns at 100 TB are:

- **two-phase exact distinct**: ``COUNT(DISTINCT x)`` on a low-cardinality
  group key makes every distinct (key, x) pair shuffle to one reducer per
  key.  Pre-aggregating on (key, x) first spreads the dedup over all
  partitions (map-side combine), and the second phase counts tiny rows.

- **salted aggregation**: for algebraic aggregates over pathological keys,
  aggregate on (key, salt) first, then merge partials per key.  With
  Catalyst's built-in partial aggregation this is usually redundant — it
  exists for aggregates whose partial state is large (collect_set et al.)
  where the per-reducer state, not the row stream, is the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def two_phase_count_distinct(
    df: DataFrame, key_col: str, distinct_col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per key, skew-spread.

    Phase 1 shuffles on (key, x) — uniform even when ``key`` is hot;
    phase 2 shuffles one row per distinct pair.
    """
    return (
        df.select(key_col, distinct_col)
        .groupBy(key_col, distinct_col)
        .agg(F.lit(1))
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )


def salted_agg(
    df: DataFrame,
    key_col: str,
    agg_exprs: dict[str, tuple[Column, Column]],
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-stage aggregation over a salted key.

    ``agg_exprs`` maps output name -> (partial_expr, merge_expr) where
    ``partial_expr`` aggregates raw rows and ``merge_expr`` merges the
    per-salt partials (referencing the partial's column name).
    """
    salt = (F.spark_partition_id() % F.lit(buckets)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in agg_exprs.items()])
    )
    return partial.groupBy(key_col).agg(
        *[merge.alias(name) for name, (_, merge) in agg_exprs.items()]
    )
