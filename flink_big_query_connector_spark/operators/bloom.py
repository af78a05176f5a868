"""Distributed Bloom-filter semi-join pruning.

Spark's own runtime bloom-filter injection (``InjectRuntimeFilter``)
fires when the application side scans >10 GB — exactly the 100 TB
fact-to-filtered-dim join this operator targets — but the expressions it
uses (``bloom_filter_agg`` / ``might_contain``) are not registered for
user code, and at test scale the size thresholds never trip.  This
module builds the SAME shape from public Catalyst primitives:

- **build**: each dim key explodes into K bit positions (md5-derived
  affine hashes, the minhash/CMS overflow discipline); positions pack
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

from .hashing import P, hash60_expr

BLOOM_M = 1 << 18          # filter size in bits (32 KB packed)
BLOOM_WORDS = BLOOM_M // 64
BLOOM_K = 5                # bit positions per key

# deterministic affine-hash coefficients, same family as CMS/minhash
BLOOM_SEEDS: list[tuple[int, int]] = [
    (269, 104_729), (271, 94_907), (277, 87_719),
    (281, 80_147), (283, 75_979),
][:BLOOM_K]


def bloom_position_exprs(key: Column) -> list[Column]:
    """The K bit positions of ``key``: ((a_i*(H60(k) mod P)+b_i) mod P)
    mod M.  md5 is computed once; the per-seed transforms are two
    integer ops each (a_i < 2^10 keeps a_i*h inside 63 bits)."""
    h = hash60_expr(key) % F.lit(P)
    return [
        ((F.lit(a) * h + F.lit(b)) % F.lit(P)) % F.lit(BLOOM_M)
        for a, b in BLOOM_SEEDS
    ]


def bloom_build(df: DataFrame, key: Column) -> list[int]:
    """Distributed build -> dense ``BLOOM_WORDS``-long word array.

    One explode (K rows per key) and one hash aggregate whose partial
    combine caps the shuffle at BLOOM_WORDS rows per map partition; the
    driver collect is <= BLOOM_WORDS rows however large the dim side is.
    NULL keys are dropped — an equi-join never matches them anyway."""
    rows = (
        df.filter(key.isNotNull())
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

    The word array rides along as ONE array<long> literal column (a
    Catalyst ``Literal`` — constant, not rebuilt per row); the K tests
    are codegen'd integer ops.  Rows with NULL keys are dropped, same
    as the equi-join they pre-filter.  Output columns == input columns."""
    cols = df.columns
    return (
        df.withColumn("_bf_words", F.lit(words))
        .withColumn("_bf_pos", F.array(*bloom_position_exprs(key)))
        .filter(
            F.expr(
                "forall(_bf_pos, p -> (element_at(_bf_words, "
                "cast(p div 64 as int) + 1) "
                "& shiftleft(1L, cast(p % 64 as int))) != 0)"
            )
        )
        .select(*cols)
    )
