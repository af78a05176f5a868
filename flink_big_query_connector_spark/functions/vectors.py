"""Vector math over ``array<float>`` embedding columns — JVM-side.

All expressions stay inside Catalyst (``zip_with`` / ``aggregate`` fold
sequentially left-to-right within a row), so results are deterministic and
whole-stage-codegen friendly: no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two numeric arrays (as double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two arrays, computed left-to-right in double."""
    return dot_product_expr(a, b) / (norm_expr(a) * norm_expr(b))
