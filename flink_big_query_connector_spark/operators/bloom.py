"""Distributed Bloom-filter semi-join pruning.

Spark's own runtime bloom-filter injection (``InjectRuntimeFilter``)
fires when the application side scans >10 GB — exactly the 100 TB
fact-to-filtered-dim join this operator targets — but the expressions it
uses (``bloom_filter_agg`` / ``might_contain``) are not registered for
user code, and at test scale the size thresholds never trip.  This
module builds the SAME shape from public Catalyst primitives:

- **build**: each dim key explodes into K bit positions (seeded
  xxhash64 — see bloom_position_exprs for why not md5); positions pack
  into 64-bit words via a ``bit_or`` hash aggregate — the shuffle is
  bounded by BLOOM_WORDS rows per partition REGARDLESS of dim size, and
  the collected word array is a 32 KB model literal (the collect IS the
  model, like IVF centroids / PQ codebooks).
- **probe**: K bit tests against the word-array literal, pure JVM
  expressions inside whole-stage codegen; false positives only ever
  UNDER-prune, so the exact join that follows keeps results identical
  to the unpruned plan — the oracle is simply the plain join.

Reference-spirit: the sink's batching principle (bound state, stream
the rest) applied to join pruning; SURVEY §2 B4's skew/scale join row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import spread

BLOOM_M = 1 << 18          # filter size in bits (32 KB packed)
BLOOM_WORDS = BLOOM_M // 64
BLOOM_K = 5                # bit positions per key


def bloom_position_exprs(key: Column) -> list[Column]:
    """The K bit positions of ``key``: pmod(xxhash64(i, key), M).

    xxhash64, not the engine-portable md5 chain the sketch oracles use:
    bloom positions never reach a result (the exact join behind the
    filter is hash-agnostic), so the only requirements are determinism
    and speed — the JVM-native hash is ~10x cheaper per row than
    md5+conv, which dominates a 600k-row probe.  The seed rides as a
    leading literal column, one independent hash per position."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(BLOOM_M))
        for i in range(BLOOM_K)
    ]


def bloom_build(df: DataFrame, key: Column) -> list[int]:
    """Distributed build -> dense ``BLOOM_WORDS``-long word array.

    One explode (K rows per key) and one hash aggregate whose partial
    combine caps the shuffle at BLOOM_WORDS rows per map partition; the
    driver collect is <= BLOOM_WORDS rows however large the dim side is.
    NULL keys are dropped — an equi-join never matches them anyway."""
    rows = (
        spread(df.filter(key.isNotNull()))
        .select(F.explode(F.array(*bloom_position_exprs(key))).alias("p"))
        .select(
            F.floor(F.col("p") / 64).cast("int").alias("w"),
            F.pmod(F.col("p"), F.lit(64)).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(1L, b))").alias("word"))
        .collect()
    )
    words = [0] * BLOOM_WORDS
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_prune(df: DataFrame, key: Column, words: list[int]) -> DataFrame:
    """Keep only rows whose ``key`` MIGHT be in the filter.

    Stays inside whole-stage codegen: the K bit positions are flat
    integer columns, and
    the K tests are an unrolled AND of scalar expressions (a
    higher-order ``forall`` here runs interpreted, ~2x slower on a wide
    scan).  The word array is one constant-folded array literal —
    ``element_at`` against it is a codegen'd global load, not a per-row
    array build.  Rows with NULL keys are dropped (explicit isNotNull —
    xxhash64 treats NULL as a no-op and returns the seed hash, which
    would otherwise give NULL keys valid bit positions that can pass the
    filter), same as the equi-join they pre-filter.  Output columns ==
    input columns."""
    cols = df.columns
    arr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    pos_cols = {
        f"_bf_p{i}": p for i, p in enumerate(bloom_position_exprs(key))
    }
    cond = " AND ".join(
        f"(element_at(_bf_words, cast(_bf_p{i} div 64 as int) + 1)"
        f" & shiftleft(1L, cast(_bf_p{i} % 64 as int))) != 0"
        for i in range(BLOOM_K)
    )
    return (
        spread(df.filter(key.isNotNull()))
        .withColumns(pos_cols)
        .withColumn("_bf_words", F.expr(arr_sql))
        .filter(F.expr(cond))
        .select(*cols)
    )
