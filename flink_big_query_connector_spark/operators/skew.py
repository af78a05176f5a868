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


def block_size_profile(df: DataFrame, block_cols: list[str]) -> DataFrame:
    """log2 histogram of per-block row counts — the b04_skew_profile
    shape applied to a blocked join's block key.  The cheap pre-flight
    that decides whether :func:`capped_blocked_join` needs a lower cap
    (or a longer blocking prefix) before the quadratic verify runs."""
    counts = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy(
        (F.length(F.bin("c")) - 1).cast("long").alias("bucket_log2")
    ).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").alias("max_block_rows"),
    )


def capped_blocked_join(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    right_hash_cols: list[str] | None = None,
    cap: int = 10_000,
) -> DataFrame:
    """Inner equi-join on ``block_cols`` with a per-block SIZE CAP: any
    block whose right side exceeds ``cap`` rows is salted into
    ceil(n/cap) deterministic slices — right rows hash into a slice,
    left rows replicate across the block's slices — so one adversarial
    hot block (a degenerate blocking key) can no longer pin a whole
    quadratic verify onto a single task.  The pair set is EXACTLY the
    plain blocked join's (every left row still meets every right row of
    its block); only the task granularity changes: per-task pair count
    is bounded by |left_b| x cap instead of |left_b| x |right_b|.

    No driver-side collect anywhere: block sizes are a tiny one-row-per-
    block aggregate joined back on the block key (co-partitioned with
    the main join, broadcast by AQE when small).  Blocks at or under the
    cap get exactly one slice — zero replication, the plain join.

    Caller contract: non-block column names must be disjoint between the
    two sides; ``right_hash_cols`` (default: all right columns) feeds
    the deterministic slice hash."""
    sizes = right.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("_bn"))
    sizes = sizes.select(
        *block_cols,
        F.greatest(
            F.lit(1), F.ceil(F.col("_bn") / F.lit(cap))
        ).cast("int").alias("_slices"),
    )
    hash_cols = right_hash_cols or [
        c for c in right.columns if c not in block_cols
    ]
    # A right side carrying ONLY the block columns would derive an empty
    # hash list, and zero-arg xxhash64 fails at plan time with an opaque
    # analyzer error.  Fall back to hashing the block columns: every row
    # of a hot block then lands in slice pmod(h, s) — legal (the pair set
    # is slice-invariant) though it no longer spreads that block's rows.
    if not hash_cols:
        hash_cols = list(block_cols)
    r = right.join(sizes, block_cols).withColumn(
        "_slice",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in hash_cols]), F.col("_slices")
        ).cast("int"),
    ).drop("_slices")
    sliced_left = left.join(sizes, block_cols).withColumn(
        "_slice",
        F.explode(
            F.sequence(F.lit(0), (F.col("_slices") - 1).cast("int"))
        ),
    ).drop("_slices")
    return sliced_left.join(r, [*block_cols, "_slice"]).drop("_slice")
