"""Distributed frequency sketches (count-min) over keyed streams.

The reference engine family's sketch surface (approx distinct/quantiles)
is covered by Spark built-ins in B18; this module adds the COUNT-MIN
sketch — the bounded-memory heavy-hitters primitive a 100 TB token/entity
frequency pass uses when exact per-key counts don't fit anywhere.

Everything is deterministic (md5-derived pairwise hashes, integer
arithmetic only), so the full build + estimate pipeline has an exact
DuckDB twin and the overestimate property (est >= true count, w.h.p.
close) is oracle-checkable bit-for-bit.

Scale shape: the build is explode -> groupBy(depth, bucket) COUNT with
map-side partial aggregation — the shuffle carries at most depth x width
cells per partition regardless of input size; the sketch itself is a
depth x width integer matrix (KB-sized), collected once as the model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import P, hash60_expr

CMS_DEPTH = 4
CMS_WIDTH = 256

# deterministic pairwise-hash coefficients (fixed, engine-portable)
CMS_SEEDS: list[tuple[int, int]] = [
    (131, 737), (193, 389), (241, 541), (379, 113),
][:CMS_DEPTH]


def cms_bucket_expr(col: Column, depth: int) -> Column:
    """Row ``depth``'s bucket: ((a*(H60(k) mod P)+b) mod P) mod W.

    The mod-P reduction BEFORE the multiply keeps a*h inside 63 bits
    (a < 2^10, h < 2^31) — the same overflow discipline the minhash
    permutations use."""
    a, b = CMS_SEEDS[depth]
    h = hash60_expr(col) % F.lit(P)
    return ((F.lit(a) * h + F.lit(b)) % F.lit(P)) % F.lit(CMS_WIDTH)


def sql_cms_bucket(expr: str, depth: int) -> str:
    """DuckDB twin of :func:`cms_bucket_expr`."""
    a, b = CMS_SEEDS[depth]
    h = f"(('0x'||substr(md5({expr}),1,15))::BIGINT % {P})"
    return f"((({a} * {h} + {b}) % {P}) % {CMS_WIDTH})"


def _coords_from_h(h):
    """All CMS_DEPTH (depth, bucket) coordinates from ONE reduced hash —
    md5 runs once per key occurrence, the per-depth transforms are two
    integer ops each."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("depth"),
                    (
                        (
                            (F.lit(CMS_SEEDS[d][0]) * h
                             + F.lit(CMS_SEEDS[d][1]))
                            % F.lit(P)
                        )
                        % F.lit(CMS_WIDTH)
                    ).alias("bucket"),
                )
                for d in range(CMS_DEPTH)
            ]
        )
    ).alias("c")


def cms_build(keyed_df: DataFrame, key_col: str) -> DataFrame:
    """Build the sketch: (depth, bucket, n) cells.

    One explode of each key into its ``CMS_DEPTH`` bucket coordinates,
    then a single hash aggregation — partial combine bounds the shuffle
    at depth x width rows per map partition.  The md5 is projected ONCE
    per key occurrence (the per-depth buckets are linear transforms of
    the same reduced hash, identical to cms_bucket_expr's values)."""
    hashed = keyed_df.select(
        (hash60_expr(F.col(key_col)) % F.lit(P)).alias("_h")
    )
    return (
        hashed.select(_coords_from_h(F.col("_h")))
        .select("c.depth", "c.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    keyed_df: DataFrame, key_col: str, cms_df: DataFrame
) -> DataFrame:
    """Point-estimate every distinct key: min over depths of its cell.

    The sketch side is depth x width rows — broadcast; the key side
    joins each of its depth coordinates and takes the min.  Missing
    cells count 0 (keys the sketch never saw)."""
    keys = keyed_df.select(F.col(key_col).alias("key")).distinct()
    coords = keys.select(
        "key", (hash60_expr(F.col("key")) % F.lit(P)).alias("_h")
    ).select(
        "key", _coords_from_h(F.col("_h"))
    ).select("key", "c.depth", "c.bucket")
    return (
        coords.join(F.broadcast(cms_df), ["depth", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_est"))
    )
