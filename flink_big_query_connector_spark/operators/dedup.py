"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (100 TB):

- **Exact** dedup is a hash groupBy — one shuffle on the content hash, with
  map-side partial aggregation.
- **MinHash+LSH**: signatures are per-row expressions (no shuffle); the
  candidate join shuffles only (doc_id, band_key) pairs — 4 small rows per
  document — and the quadratic Jaccard verification runs only inside LSH
  buckets, never across the whole corpus.
- **SimHash**: banded on 8-bit sub-keys; by pigeonhole a Hamming-<=3 pair
  always shares at least one of the 4 bands, so the banded join is EXACT
  (same result set as the quadratic join) at a fraction of the cost.
- **Embedding near-dup** ships a blocked pair join for correctness testing;
  the scale path is the LSH-bucketed variant in ``similarity.py``.

All signature arithmetic is engine-portable (see ``hashing.py``), so the
DuckDB oracle reproduces identical signatures, bands and pair sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_expr
from .hashing import (
    MINHASH_SEEDS,
    N_BANDS,
    SIMHASH_BITS,
    band_key_expr,
    hash60_expr,
    minhash_value_expr,
)
from .text import tokens_expr

SHINGLE_K = 3  # word 3-grams


# -- shingling ---------------------------------------------------------------


def shingles_expr(toks: Column) -> Column:
    """Word 3-gram shingles (space-joined); empty array for short docs.

    The ``when`` guard matters: Spark's ``sequence(1, n)`` with n < 1
    produces a *descending* sequence instead of an empty one.
    """
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(1), n - F.lit(SHINGLE_K - 1)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + F.lit(1)),
            F.element_at(toks, i + F.lit(2)),
        ),
    )
    return F.when(n >= SHINGLE_K, make).otherwise(F.array().cast("array<string>"))


def with_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("shingles", shingles_expr(tokens_expr(F.col(text_col))))


# -- exact dedup -------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Keep the lowest id per identical content; report group size.

    GroupBy on a 60-bit content hash: the shuffle carries (hash, id) pairs,
    not document bodies.
    """
    return (
        df.select(
            F.col(id_col), hash60_expr(F.col(content_col)).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# -- MinHash + LSH -----------------------------------------------------------


def with_minhash_signature(df: DataFrame, shingle_col: str = "shingles") -> DataFrame:
    """Add mh0..mh15 columns (NULL for shingle-less docs, filtered out)."""
    sh = F.col(shingle_col)
    cols = {
        f"mh{i}": minhash_value_expr(sh, a, b)
        for i, (a, b) in enumerate(MINHASH_SEEDS)
    }
    return df.withColumns(cols).filter(F.size(sh) > 0)


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str) -> DataFrame:
    """Distinct (a, b) candidate pairs sharing at least one LSH band."""
    mh = [F.col(f"mh{i}") for i in range(len(MINHASH_SEEDS))]
    bands = sig_df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"), band_key_expr(mh, j).alias("key")
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.key") == F.col(f"b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def exact_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str = "shingles",
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs with set-Jaccard >= threshold over distinct shingles.

    With ``candidates`` (from LSH) the verification join is restricted to
    bucket-mates; without, it is the full explode-join (oracle / small
    scale only).
    """
    exploded = (
        df.select(F.col(id_col), F.explode(F.col(shingle_col)).alias("s"))
        .distinct()
    )
    counts = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn(
            "jaccard",
            F.col("i").cast("double")
            / (F.col("na") + F.col("nb") - F.col("i")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", threshold: float = 0.8
) -> DataFrame:
    """Full pipeline: shingle -> minhash -> LSH bands -> bucket join ->
    exact Jaccard verification.  The only quadratic work happens inside
    buckets."""
    sig = with_minhash_signature(with_shingles(df, text_col))
    cands = lsh_candidate_pairs(sig, id_col)
    return exact_jaccard_pairs(sig, id_col, "shingles", threshold, cands)


# -- SimHash -----------------------------------------------------------------


def _bit_vote(th: Column, j: int) -> Column:
    """Sum of +-1 votes for bit j across the token-hash array."""

    def step(acc: Column, h: Column) -> Column:
        bit = F.shiftright(h, j).bitwiseAND(F.lit(1))
        return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

    return F.aggregate(th, F.lit(0).cast("long"), step)


def simhash_expr(toks: Column) -> Column:
    """32-bit SimHash over token hashes (bit j set iff the sum of +-1 votes
    from each token's bit j is positive)."""
    th = F.transform(toks, lambda t: hash60_expr(t))
    value = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        vote = _bit_vote(th, j)
        value = value + F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return value


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Hamming-<=3 pairs via exact 4-band LSH (8-bit bands; pigeonhole
    guarantees no misses, so this equals the quadratic join)."""
    sh = df.select(
        F.col(id_col), simhash_expr(tokens_expr(F.col(text_col))).alias("simhash")
    )
    bands = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * j)
                        .bitwiseAND(F.lit(255))
                        .alias("key"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# -- embedding near-dup ------------------------------------------------------


def embedding_neardup_pairs(
    emb_df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Cosine >= threshold pairs (blocked quadratic join; correctness
    baseline — the LSH-bucketed path lives in similarity.py)."""
    a = emb_df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = emb_df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(cosine_similarity_expr(F.col("va"), F.col("vb")), 6),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
