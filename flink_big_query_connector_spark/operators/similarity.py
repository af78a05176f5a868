"""Similarity search over embedding columns.

- :func:`brute_force_topk` — exact cosine top-k: the correctness baseline.
  The query side is broadcast (queries are always the small side), so the
  corpus never shuffles; per-partition the ranking is a window top-k.

- :func:`rp_lsh_bucketed_topk` — the 100 TB path: random-hyperplane LSH
  buckets the corpus by sign signature; each query probes only its own
  bucket (plus Hamming-1 neighbors), turning O(|Q| x |C|) into
  O(|Q| x bucket).  Approximate by construction -> rows-only check.

Both keep all arithmetic in Catalyst expressions (sequential fold dot
products — deterministic and bitwise-reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..cache import scoped_persist
from ..functions.vectors import cosine_similarity_expr
from .dedup import spread

# Fixed random-hyperplane projections: NUM_PLANES x (index stride) pseudo
# weights derived from a hash — deterministic, no stored model needed.
NUM_PLANES = 8


def brute_force_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors (cosine, rounded to 6dp for cross-engine rank
    stability; ties broken by candidate id)."""
    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = spread(emb_df).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cos", F.round(cosine_similarity_expr(F.col("qv"), F.col("cv")), 6)
        )
    )
    # Project vectors away BEFORE the ranking shuffle: the window exchange
    # then carries (query_id, cand_id, cos) only, not the embeddings.
    scored = scored.select("query_id", "cand_id", "cos")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


MAX_DIM = 128  # plane-weight table size; vectors may be any dim <= this


def _plane_weights(plane: int, dim: int = MAX_DIM) -> list[float]:
    """+-1 weight for (plane, dim i) from md5 — engine-portable constants.

    md5 (not Spark's Murmur3 ``F.hash``) so the identical weight table can
    be inlined in a DuckDB oracle; the weights are literals in the plan
    either way, so the hash never runs per row.
    """
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"rp:{plane}:{i}".encode()).hexdigest()[:2], 16) & 1
        else -1.0
        for i in range(dim)
    ]


def _plane_projection(vec, plane: int):
    """Signed projection onto a pseudo-random +-1 hyperplane: the weight
    table ships as a plan literal (sliced to the vector's dim), and each
    term x_i * (+-1) is IEEE-exact, so only summation order contributes
    rounding — negligible against typical |projection|."""
    w = F.slice(
        F.array(*[F.lit(x) for x in _plane_weights(plane)]), 1, F.size(vec)
    )
    return F.aggregate(
        F.zip_with(vec, w, lambda x, wi: x.cast("double") * wi),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def rp_signature_expr(vec):
    """NUM_PLANES-bit sign signature."""
    sig = F.lit(0).cast("long")
    for p in range(NUM_PLANES):
        sig = sig + F.when(
            _plane_projection(vec, p) > 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sig


def sql_rp_bucket(vec_expr: str, dim: int) -> str:
    """DuckDB twin of :func:`rp_signature_expr` for a ``dim``-wide DOUBLE[]
    expression — same md5-derived weight table, inlined as list literals."""
    terms = []
    for p in range(NUM_PLANES):
        w = _plane_weights(p, dim)
        arr = "[" + ",".join("1.0" if x > 0 else "-1.0" for x in w) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({vec_expr}, {arr}) > 0 "
            f"THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return "(" + " + ".join(terms) + ")"


def rp_lsh_bucketed_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ANN top-k: equi-join corpus and queries on the hyperplane-sign
    bucket, rank within bucket.  Shuffles only (bucket, id, vec) once."""
    c = spread(emb_df).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        rp_signature_expr(F.col(vec_col)).alias("bucket"),
    )
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        rp_signature_expr(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cos", F.round(cosine_similarity_expr(F.col("qv"), F.col("cv")), 6)
        )
    )
    # Project vectors away BEFORE the ranking shuffle: the window exchange
    # then carries (query_id, cand_id, cos) only, not the embeddings.
    scored = scored.select("query_id", "cand_id", "cos")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


N_CENTROIDS = 16


def ivf_cells(emb_df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Assign every vector to its nearest of N_CENTROIDS fixed centroids.

    Centroids are the first N_CENTROIDS vectors by id — deterministic, no
    trained model to ship; a real deployment swaps in k-means centroids
    without changing the plan shape.  The assignment is a broadcast
    cross-join (corpus never shuffles) + max_by argmax; cosine is rounded
    to 6dp so the argmax is reproducible across engines, ties break to the
    lower centroid id.
    """
    cents = sorted(
        (r[0], list(r[1]))
        for r in emb_df.filter(F.col(id_col) < N_CENTROIDS)
        .select(id_col, vec_col)
        .collect()
    )
    # Centroids inline as literals (the "model" is 16 x dim floats — ships
    # in the plan itself, no join): per row, one struct-array argmax picks
    # (max cos, then min id) without any shuffle or aggregation.
    v = F.col(vec_col)
    pairs = F.array(
        *[
            F.struct(
                F.round(
                    cosine_similarity_expr(
                        v, F.array(*[F.lit(float(x)) for x in cvec])
                    ),
                    6,
                ).alias("c"),
                F.lit(-cid).alias("nid"),
            )
            for cid, cvec in cents
        ]
    )
    best = F.array_max(pairs)
    return spread(emb_df).select(
        F.col(id_col),
        v.alias("v"),
        (-best["nid"]).cast("long").alias("cell"),
    )


def ivf_probe_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int = 10,
) -> DataFrame:
    """IVF top-k: queries probe only their own centroid cell.

    At 100 TB the corpus is written partitioned by ``cell``; a probe then
    reads one partition per query (partition pruning), and the ranking
    shuffle carries (query_id, cand_id, cos) triples only.  Approximate at
    cell boundaries by construction (like any single-probe IVF).
    """
    # Two consumers (candidate side + probe side); released per query by
    # the harness via cache.release_caches.
    cells = scoped_persist(ivf_cells(emb_df, id_col, vec_col))
    c = cells.select(
        F.col(id_col).alias("cand_id"), F.col("v").alias("cv"), "cell"
    )
    q = cells.join(
        query_df.select(id_col), id_col, "left_semi"
    ).select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"), "cell")
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cos", F.round(cosine_similarity_expr(F.col("qv"), F.col("cv")), 6)
        )
        .select("query_id", "cand_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def kmeans_centroids(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = N_CENTROIDS,
    max_iter: int = 5,
    seed: int = 7,
) -> list[tuple[int, list]]:
    """Train IVF centroids with distributed Lloyd iterations (MLlib
    KMeans): the Spark-first realization of the "swap in k-means
    centroids" upgrade path documented on :func:`ivf_cells`.

    MLlib runs each iteration as a distributed aggregation (assignment is
    map-side against broadcast centroids; the update is a per-cluster
    partial-sum treeAggregate), so training scales with executors.  The
    returned model is k x dim floats — exactly the literal-inline shape
    :func:`ivf_cells_with` ships in the plan.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb_df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, maxIter=max_iter, seed=seed).fit(feats)
    return [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]


def ivf_cells_with(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list]],
) -> DataFrame:
    """:func:`ivf_cells` with an explicit (trained) centroid set."""
    v = F.col(vec_col)
    pairs = F.array(
        *[
            F.struct(
                F.round(
                    cosine_similarity_expr(
                        v, F.array(*[F.lit(float(x)) for x in cvec])
                    ),
                    6,
                ).alias("c"),
                F.lit(-cid).alias("nid"),
            )
            for cid, cvec in centroids
        ]
    )
    best = F.array_max(pairs)
    return spread(emb_df).select(
        F.col(id_col),
        v.alias("v"),
        (-best["nid"]).cast("long").alias("cell"),
    )
