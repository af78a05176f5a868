"""Portable hashing primitives shared by the dedup/text operators.

Everything here is computable **identically** in Spark (Catalyst
expressions, JVM-side) and in ANSI-ish SQL (the DuckDB oracle):

- ``H(s)``: first 15 hex chars of md5 as a 60-bit integer -> mod P.
  Verified bit-identical across engines (Spark ``conv(substr(md5(x),1,15),
  16,10)`` == DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT``).
- MinHash permutations ``(A_i * h + B_i) mod P`` with P = 2^31 - 1 —
  products stay under 2^62, so no 64-bit overflow in either engine.

The fixed seeds make every signature deterministic: the same document
always lands in the same LSH bucket on any cluster size, which is what
makes the banding join reproducible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)

# 16 fixed (a, b) permutation seeds (odd multipliers, arbitrary offsets).
MINHASH_SEEDS: list[tuple[int, int]] = [
    (1610612741, 402653189), (805306457, 201326611), (402653189, 1610612741),
    (201326611, 805306457), (100663319, 50331653), (50331653, 100663319),
    (25165843, 12582917), (12582917, 25165843), (6291469, 3145739),
    (3145739, 6291469), (1572869, 786433), (786433, 1572869),
    (393241, 196613), (196613, 393241), (98317, 49157), (49157, 98317),
]

N_BANDS = 4
BAND_ROWS = 4  # 16 = 4 bands x 4 rows

SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8-bit bands; hamming<=3 cannot miss all 4 (pigeonhole)


# -- Spark expressions -------------------------------------------------------


def hash60_expr(col: Column) -> Column:
    """60-bit integer from md5 (portable across engines)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash_mod_p_expr(col: Column) -> Column:
    return hash60_expr(col) % F.lit(P)


def minhash_value_expr(shingles: Column, a: int, b: int) -> Column:
    """min over shingles of (a*H(s)+b) mod P."""
    return F.array_min(
        F.transform(
            shingles,
            lambda s: (F.lit(a) * hash_mod_p_expr(s) + F.lit(b)) % F.lit(P),
        )
    )


def band_key_expr(minhashes: list[Column], band: int) -> Column:
    """Chained 31x combine of one band's rows (fits in 46 bits)."""
    key = minhashes[band * BAND_ROWS]
    for i in range(1, BAND_ROWS):
        key = key * F.lit(31) + minhashes[band * BAND_ROWS + i]
    return key


# -- SQL fragments (DuckDB oracle) ------------------------------------------


def sql_hash60(expr: str) -> str:
    """DuckDB twin of :func:`hash60_expr` — the ONE definition of the
    cross-engine 60-bit md5 identity (every oracle derives from it)."""
    return f"('0x'||substr(md5({expr}),1,15))::BIGINT"


def sql_hash_mod_p(expr: str) -> str:
    return f"({sql_hash60(expr)} % {P})"


def sql_minhash_value(shingles_expr: str, a: int, b: int) -> str:
    return (
        f"list_min(list_transform({shingles_expr}, "
        f"s -> ({a} * {sql_hash_mod_p('s')} + {b}) % {P}))"
    )


def sql_band_key(mh_cols: list[str], band: int) -> str:
    key = mh_cols[band * BAND_ROWS]
    for i in range(1, BAND_ROWS):
        key = f"({key} * 31 + {mh_cols[band * BAND_ROWS + i]})"
    return key
