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
from ..functions.vectors import (
    cosine_similarity_expr,
    dot_product_expr,
    norm_expr,
)
from .dedup import spread

# Fixed random-hyperplane projections: NUM_PLANES x (index stride) pseudo
# weights derived from a hash — deterministic, no stored model needed.
NUM_PLANES = 8


def brute_force_range_search(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    threshold: float,
) -> DataFrame:
    """Range search: ALL candidates with cosine >= ``threshold`` for each
    query — the second standard vector-search API next to top-k (radius /
    epsilon queries: "everything at least this similar", used for
    duplicate sweeps and recall-oriented retrieval where k is unknowable).

    Scale shape: strictly better than top-k — the query side broadcasts,
    the threshold filter is applied inside the same projected map stage,
    and there is NO ranking window and NO shuffle at all; the plan is
    scan -> broadcast-join -> filter.  Output size is the only cost, by
    construction of the predicate."""
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("qn"),
    )
    c = spread(emb_df).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("cn"),
    )
    pair_cos = dot_product_expr(F.col("qv"), F.col("cv")) / (
        F.col("qn") * F.col("cn")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(pair_cos, 6))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("query_id", "cand_id", "cos")
    )


def brute_force_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors (cosine, rounded to 6dp for cross-engine rank
    stability; ties broken by candidate id).  Norms are materialized once
    per side before the pair stage (bitwise the same cosine — identical
    IEEE ops, just not recomputed per pair; 3x less pair arithmetic)."""
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("qn"),
    )
    c = spread(emb_df).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("cn"),
    )
    pair_cos = dot_product_expr(F.col("qv"), F.col("cv")) / (
        F.col("qn") * F.col("cn")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(pair_cos, 6))
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
    """NUM_PLANES-bit sign signature (bit p = plane p's projection sign).

    Hard-fails on vectors wider than MAX_DIM: beyond the weight table,
    zip_with would null-pad, every projection would go NULL, and all
    vectors would silently collapse into bucket 0 (degenerating the
    bucketed join to quadratic).  raise_error surfaces that instead.
    """
    return band_signature_expr(vec, list(range(NUM_PLANES)))


def band_signature_expr(vec, planes: list[int]):
    """Sign signature over an explicit plane list (one LSH band).

    Built as ONE parsed weight-matrix literal + a single zip_with/fold
    (instead of |planes| unrolled projection trees each carrying a
    MAX_DIM-literal array — the same plan-size discipline as the PQ/IVF
    literal arrays).  Per plane the projection is the identical
    slice + zip_with + sequential fold, so signatures are bitwise
    unchanged."""
    rows = ",".join(
        "array("
        + ",".join(f"{x!r}D" for x in _plane_weights(p))
        + ")"
        for p in planes
    )
    weights = F.expr(f"array({rows})")
    powers = F.expr(
        "array(" + ",".join(f"{1 << j}L" for j in range(len(planes))) + ")"
    )

    def proj(w):
        return F.aggregate(
            F.zip_with(
                vec,
                F.slice(w, 1, F.size(vec)),
                lambda x, wi: x.cast("double") * wi,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    contribs = F.zip_with(
        weights,
        powers,
        lambda w, p: F.when(proj(w) > 0, p).otherwise(
            F.lit(0).cast("long")
        ),
    )
    sig = F.aggregate(
        contribs, F.lit(0).cast("long"), lambda a, x: a + x
    )
    return F.when(
        F.size(vec) > MAX_DIM,
        F.raise_error(
            F.lit(f"band_signature_expr: vector dim exceeds MAX_DIM={MAX_DIM}")
        ).cast("long"),
    ).otherwise(sig)


def sql_rp_band(vec_expr: str, dim: int, planes: list[int]) -> str:
    """DuckDB twin of :func:`band_signature_expr`."""
    terms = []
    for j, p in enumerate(planes):
        w = _plane_weights(p, dim)
        arr = "[" + ",".join("1.0" if x > 0 else "-1.0" for x in w) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({vec_expr}, {arr}) > 0 "
            f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return "(" + " + ".join(terms) + ")"


def embedding_neardup_pairs_lsh(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_bands: int = 4,
    band_planes: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs via banded random-hyperplane LSH — the
    scale path that replaces the all-pairs crossJoin baseline.

    Candidate generation: each vector gets ``n_bands`` sign signatures
    (band b uses planes ``b*band_planes .. b*band_planes+band_planes-1``);
    a pair is a candidate iff it collides on at least one band (the
    classic banded-LSH contract, same recall semantics as the MinHash
    band scheme in ``llm_dedup_minhash_lsh``); the cosine is then
    verified only on candidates.  Deterministic md5-derived planes make
    the whole pipeline hash-exact against a DuckDB oracle that mirrors
    the identical bands.

    Scale shape: the band shuffle carries (id, band, key) only — never
    the vectors; after the candidate pairs are deduped across bands, the
    embeddings are joined back by id for the cosine verify.  Pair work
    scales with bucket size (corpus / 2^band_planes per band), not
    corpus size; no CartesianProduct anywhere (plan-pinned in
    tests/test_scale_patterns.py)."""
    base = spread(emb_df).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                band_signature_expr(
                    F.col("v"),
                    [b * band_planes + j for j in range(band_planes)],
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    # persisted: the self-join consumes entries on BOTH sides — without
    # the persist the full signature pipeline (16 projections/row) would
    # evaluate twice, and the (id, band, key) relation is tiny
    entries = scoped_persist(
        base.select("vid", F.explode(bands).alias("bk")).select(
            "vid",
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
        )
    )
    a = entries.select(F.col("vid").alias("id_a"), "band", "key")
    b = entries.select(F.col("vid").alias("id_b"), "band", "key")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    from ..functions.vectors import dot_product_expr, norm_expr

    va = emb_df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm_expr(F.col(vec_col)).alias("na"),
    )
    vb = emb_df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm_expr(F.col(vec_col)).alias("nb"),
    )
    pair_cos = dot_product_expr(F.col("va"), F.col("vb")) / (
        F.col("na") * F.col("nb")
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(pair_cos, 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


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
        norm_expr(F.col(vec_col)).alias("cn"),
        rp_signature_expr(F.col(vec_col)).alias("bucket"),
    )
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("qn"),
        rp_signature_expr(F.col(vec_col)).alias("bucket"),
    )
    pair_cos = dot_product_expr(F.col("qv"), F.col("cv")) / (
        F.col("qn") * F.col("cn")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(pair_cos, 6))
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


def fixed_centroids(
    emb_df: DataFrame, id_col: str, vec_col: str,
    n_centroids: int = N_CENTROIDS,
) -> list[tuple[int, list]]:
    """The deterministic first-``n_centroids``-by-id centroid set — the
    ONE definition every IVF consumer (cell assignment, multi-probe
    lists) shares, so centroid selection can never desynchronize between
    them.  The collect IS the model: n_centroids x dim floats.  The
    fixed-k index queries keep the N_CENTROIDS default; semantic_dedup
    passes a data-scaled k (see its docstring)."""
    return sorted(
        (r[0], list(r[1]))
        for r in emb_df.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .collect()
    )


def ivf_cells(
    emb_df: DataFrame, id_col: str, vec_col: str, with_score: bool = False
) -> DataFrame:
    """Assign every vector to its nearest of N_CENTROIDS fixed centroids.

    Centroids are the first N_CENTROIDS vectors by id — deterministic, no
    trained model to ship; a real deployment swaps in k-means centroids
    without changing the plan shape.  The assignment is a broadcast
    cross-join (corpus never shuffles) + max_by argmax; cosine is rounded
    to 6dp so the argmax is reproducible across engines, ties break to the
    lower centroid id.  ``with_score=True`` additionally exposes the
    assignment cosine as ``cos`` (for QA passes that need the distance,
    not just the cell).
    """
    cents = fixed_centroids(emb_df, id_col, vec_col)
    return ivf_cells_with(emb_df, id_col, vec_col, cents, with_score)


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


def lloyd_kmeans_centroids(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = N_CENTROIDS,
    iters: int = 3,
) -> list[tuple[int, list]]:
    """Deterministic distributed Lloyd iterations — hash-exact k-means.

    Initialization is the fixed first-k-by-id centroid set (no RNG), and
    every update computes per-cell per-dimension means with ORDER-FREE
    arithmetic: components are summed in the decimal domain (exact, any
    partitioning) and divided once in double.  Both choices make the
    trained model bitwise-reproducible on any cluster size AND exactly
    mirrorable in a DuckDB oracle (see llm_ops.llm_ann_ivf_kmeans) —
    unlike MLlib's seeded k-means‖ init (:func:`kmeans_centroids`),
    which is rows-only-checkable.

    Scale shape per iteration: assignment is a map-side argmax against
    plan-literal centroids (no join), the update is one distributed
    partial aggregation over (cell, dim), and the collect is the
    k x dim model — KB-sized by construction.
    """
    cents = fixed_centroids(emb_df, id_col, vec_col, k)
    if not cents:
        return cents
    # The loop runs iters+ full passes over the corpus (one assignment
    # per iteration; callers typically run one more afterwards).  Each
    # pass would otherwise re-scan + re-spread the input — persist the
    # spread frame once (r13 resume; scoped, released by the harness).
    # At 100 TB a deployment would point this at the materialized
    # embedding table instead; locally it saves the per-pass
    # single-file-scan fan-out.
    emb_df = scoped_persist(spread(emb_df))
    dim = len(cents[0][1])
    for _ in range(iters):
        # Fused update pass (optimization r13): assignment + per-(cell,
        # dim) decimal partial sums in ONE Arrow batch loop
        # (lloyd_cell_dim_sums) instead of an assignment pass shipping
        # (id, v, cell) back through Arrow plus an n x dim posexplode
        # into a hash aggregate.  The SUM of exact per-task partials is
        # the same multiset of exactly-quantized scale-10 addends the
        # old SUM(CAST(val AS DECIMAL(27,10))) folded (decimal addition
        # is associative), so the centroid doubles are bit-identical —
        # pinned by test_lloyd_cell_dim_sums_matches_explode_agg.
        sums = lloyd_cell_dim_sums(emb_df, id_col, vec_col, cents)
        agg = (
            sums.groupBy("cell", "idx")
            .agg(
                F.sum(F.col("ps").cast("decimal(38,10)")).alias("s"),
                F.sum("n").alias("n"),
            )
            .select(
                "cell",
                "idx",
                (F.col("s").cast("double") / F.col("n")).alias("m"),
            )
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in agg.collect():  # k x dim rows — the model
            by_cell.setdefault(r["cell"], {})[r["idx"]] = r["m"]
        cents = sorted(
            (c, [d[i] for i in range(dim)]) for c, d in by_cell.items()
        )
    return cents


def ivf_cells_with(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list]],
    with_score: bool = False,
) -> DataFrame:
    """:func:`ivf_cells` with an explicit (trained) centroid set."""
    v = F.col(vec_col)
    if not centroids:
        # No centroids: an empty literal array is VOID-typed and
        # array_max over it fails ANALYSIS even on an empty corpus.
        # Only a genuinely empty corpus may proceed (empty frame of the
        # right shape); an empty MODEL over real data must stay loud —
        # all ids >= N_CENTROIDS would otherwise silently assign
        # nothing.  The isEmpty probe is one limit-1 job on a path only
        # degenerate inputs reach.
        if not emb_df.isEmpty():
            raise ValueError(
                "ivf: centroid set is empty but the corpus has rows "
                f"(no ids < N_CENTROIDS={N_CENTROIDS}?)"
            )
        cols = [
            F.col(id_col),
            v.alias("v"),
            F.lit(None).cast("long").alias("cell"),
        ]
        if with_score:
            cols.append(F.lit(None).cast("double").alias("cos"))
        return emb_df.select(*cols)
    # One literal array<struct<cvec, cn, nid>> + a single transform:
    # the same plan-size/py4j discipline as the PQ codebooks (16 unrolled
    # cosine trees recomputed norm(v) per centroid).  cn is the Python
    # sequential-fold norm — bitwise the engine fold + correctly-rounded
    # sqrt, so round(dot/(vn*cn), 6) equals the original
    # cosine_similarity_expr value exactly.
    import math

    from ..functions.vectors import dot_product_expr, norm_expr

    def darr(vals) -> str:
        return "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"

    structs = ",".join(
        f"named_struct('cvec', {darr(cvec)}, "
        f"'cn', {math.sqrt(_py_self_dot(cvec))!r}D, "
        f"'nid', {-int(cid)}L)"
        for cid, cvec in centroids
    )
    cents_arr = F.expr(f"array({structs})")
    vn = norm_expr(v)
    pairs = F.transform(
        cents_arr,
        lambda c: F.struct(
            F.round(
                dot_product_expr(v, c["cvec"]) / (vn * c["cn"]), 6
            ).alias("c"),
            c["nid"].alias("nid"),
        ),
    )
    best = F.array_max(pairs)
    cols = [
        F.col(id_col),
        v.alias("v"),
        (-best["nid"]).cast("long").alias("cell"),
    ]
    if with_score:
        cols.append(best["c"].alias("cos"))
    return spread(emb_df).select(*cols)


# -- product quantization (PQ) ----------------------------------------------

PQ_SUBSPACES = 4
PQ_CODES = 16


def pq_codebooks(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    n_subspaces: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic PQ codebooks: subvectors of the first ``n_codes``
    vectors by id, one codebook per contiguous subspace; code ids are
    POSITIONAL (0..n_codes-1 in id order) so they double as distance-table
    indices.  The collect IS the model (n_subspaces x n_codes x
    dim/n_subspaces floats — KB-sized).  A trained upgrade runs
    :func:`lloyd_kmeans_centroids` per subspace without changing any
    downstream plan shape."""
    rows = sorted(
        (r[0], list(r[1]))
        for r in emb_df.filter(F.col(id_col) < n_codes)
        .select(id_col, vec_col)
        .collect()
    )
    if not rows:
        return [[] for _ in range(n_subspaces)]
    dim = len(rows[0][1])
    sub = dim // n_subspaces
    return [
        [
            (i, vec[s * sub : (s + 1) * sub])
            for i, (_cid, vec) in enumerate(rows)
        ]
        for s in range(n_subspaces)
    ]


def _py_self_dot(v: list[float]) -> float:
    """Sequential-fold dot(v, v) in Python — bitwise the engines' value
    (Spark's aggregate fold and DuckDB's list_dot_product both accumulate
    left-to-right; the oracle gate verifies this continuously)."""
    acc = 0.0
    for x in v:
        acc += float(x) * float(x)
    return acc


def _cb_struct_array(cb: list[tuple[int, list]]):
    """One literal array<struct<code, cvec, cc>> per codebook: distance
    evaluation then runs as a SINGLE transform lambda over it, instead of
    |codes| unrolled expression trees.  Built as ONE parsed SQL string —
    a single py4j round-trip instead of ~1000 Column constructions
    (repr() double literals round-trip bitwise through the SQL parser)."""

    def darr(vals) -> str:
        return "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"

    structs = ",".join(
        f"named_struct('code', {int(code)}, 'cvec', {darr(cvec)}, "
        f"'cc', {_py_self_dot(cvec)!r}D)"
        for code, cvec in cb
    )
    return F.expr(f"array({structs})")


def _l2sq_to_codes(sub, cb_arr):
    """Array of round-6dp ||sub - c||^2 per codebook entry (codebook
    order) via the dot-product identity: dot(a,a) - 2*dot(a,c) + cc,
    where cc is the precomputed literal dot(c,c) — the same arithmetic
    the DuckDB twin writes with ``list_dot_product``."""
    from ..functions.vectors import dot_product_expr

    aa = dot_product_expr(sub, sub)
    return F.transform(
        cb_arr,
        lambda c: F.round(
            aa
            - F.lit(2.0) * dot_product_expr(sub, c["cvec"])
            + c["cc"],
            6,
        ),
    )


def pq_encode(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[tuple[int, list[float]]]],
    keep_cols: list[str] = (),
) -> DataFrame:
    """Encode every vector as one code per subspace (argmin rounded-6dp
    squared L2, ties to the lowest code) — 64 floats become
    ``n_subspaces`` small ints.  Pure map stage: codebooks are plan
    literals, no join, no shuffle; the output is the compressed
    representation ADC search reads INSTEAD of the embeddings.
    ``keep_cols`` pass through unchanged (e.g. the IVF ``cell`` so the
    IVFPQ index carries coarse + fine codes from ONE map stage)."""
    v = F.col(vec_col)
    n_subspaces = len(codebooks)
    if any(not cb for cb in codebooks):
        # Same contract as ivf_cells_with: an empty MODEL over real data
        # must stay loud; only a genuinely empty corpus proceeds (empty
        # frame of the right shape).
        if not emb_df.isEmpty():
            raise ValueError(
                "pq_encode: empty codebook but the corpus has rows "
                "(no ids < n_codes?)"
            )
        return emb_df.select(
            F.col(id_col),
            *[
                F.lit(None).cast("long").alias(f"c{s}")
                for s in range(n_subspaces)
            ],
            *[F.col(c) for c in keep_cols],
        )
    cols = [F.col(id_col)]
    for s, cb in enumerate(codebooks):
        sublen = len(cb[0][1])
        subv = F.slice(v, s * sublen + 1, sublen)
        dists = _l2sq_to_codes(subv, _cb_struct_array(cb))
        # argmin with ties to the lowest code: lexicographic array_min
        # over (d, positional index) structs
        pairs = F.zip_with(
            dists,
            F.array(*[F.lit(int(code)) for code, _ in cb]),
            lambda d, code: F.struct(d.alias("d"), code.alias("code")),
        )
        cols.append(F.array_min(pairs)["code"].cast("long").alias(f"c{s}"))
    cols.extend(F.col(c) for c in keep_cols)
    return spread(emb_df).select(*cols)


def _adc_dist(codebooks: list[list[tuple[int, list[float]]]]):
    """Asymmetric distance: one ``dt`` lookup per subspace, summed.

    ``dt`` is the flattened per-query distance table (subspace-major,
    ``n_codes`` entries per segment); the candidate's code ``c{s}``
    indexes segment ``s``.  Built as a sum over ``len(codebooks)``
    subspaces — NOT an unrolled 4-term expression, which silently
    ranked by a partial distance whenever a model had more than four
    subspaces and failed analysis with fewer."""
    n_codes = len(codebooks[0])
    dist = None
    for s in range(len(codebooks)):
        term = F.element_at(
            "dt", F.lit(s * n_codes) + F.col(f"c{s}").cast("int") + 1
        )
        dist = term if dist is None else dist + term
    return dist


def pq_adc_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes.

    Each query precomputes ONE distance table (n_subspaces x n_codes
    rounded subdistances, an array column on the broadcast query side);
    candidate distance is then 4 array lookups + 3 adds — the corpus side
    touches only its code columns, never the embeddings.  At 100 TB this
    is the PQ payoff: the scan reads ~4 bytes/vector instead of 256, and
    the broadcast carries |Q| x 64 doubles."""
    if not codebooks or len(codebooks[0]) == 0:
        # no-subspace or empty model -> no candidates (pq_encode rejects
        # the non-empty-corpus/empty-model case loudly; probe it first
        # so that contract still holds for codebooks == [])
        pq_encode(emb_df, id_col, vec_col, codebooks or [[]])
        return emb_df.sparkSession.createDataFrame(
            [], "query_id long, cand_id long, dist double, rank long"
        )
    codes = pq_encode(emb_df, id_col, vec_col, codebooks)
    qv = F.col("qv")
    # per-subspace distance-table segments (codebook/positional order),
    # flattened into the 64-entry lookup array — one transform lambda per
    # subspace instead of 64 unrolled expressions
    segments = []
    for s, cb in enumerate(codebooks):
        sublen = len(cb[0][1])
        subq = F.slice(qv, s * sublen + 1, sublen)
        segments.append(_l2sq_to_codes(subq, _cb_struct_array(cb)))
    dt = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
    ).select("query_id", F.flatten(F.array(*segments)).alias("dt"))
    dist = _adc_dist(codebooks)
    scored = (
        codes.crossJoin(F.broadcast(dt))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("cand_id"),
            dist.alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "dist", "rank")
    )


def ivfpq_adc_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    k: int = 5,
) -> DataFrame:
    """IVF-PQ top-k (the FAISS ``IVFPQ`` serving shape): coarse cell
    prune + asymmetric-distance ranking over PQ codes.

    The index is ONE map stage over the corpus — nearest-centroid cell
    (argmax over the literal centroid array) plus per-subspace PQ codes
    (argmin over the literal codebooks) — yielding a (cell, one code per subspace: c0..c3 with the default model)
    table of ~12 bytes/vector.  At 100 TB that table is written
    partitioned by ``cell``; a probe reads ONE partition per query
    (partition pruning) and ranks candidates with one lookup per
    subspace into the query's broadcast distance table, so neither the
    embeddings nor other cells are ever scanned.  Both prune levels are
    deterministic (6dp-rounded argmax/argmin, ties low), keeping the
    approximate result hash-exact against the mirrored SQL oracle."""
    if not codebooks or len(codebooks[0]) == 0:
        # same empty-model contract as pq_adc_topk: loud on a non-empty
        # corpus, typed-empty result on an empty one
        pq_encode(emb_df, id_col, vec_col, codebooks or [[]])
        return emb_df.sparkSession.createDataFrame(
            [], "query_id long, cand_id long, dist double, rank long"
        )
    n_codes = len(codebooks[0])
    cells = scoped_persist(ivf_cells(emb_df, id_col, vec_col))
    index = pq_encode(
        cells.select(id_col, F.col("v").alias(vec_col), "cell"),
        id_col, vec_col, codebooks, keep_cols=["cell"],
    )
    segments = []
    for s, cb in enumerate(codebooks):
        sublen = len(cb[0][1])
        subq = F.slice(F.col("qv"), s * sublen + 1, sublen)
        segments.append(_l2sq_to_codes(subq, _cb_struct_array(cb)))
    q = (
        cells.join(query_df.select(id_col), id_col, "left_semi")
        .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"), "cell")
        .select(
            "query_id", "cell", F.flatten(F.array(*segments)).alias("dt")
        )
    )
    dist = _adc_dist(codebooks)
    scored = (
        index.join(F.broadcast(q), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("cand_id"), dist.alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "dist", "rank")
    )


# -- scalar quantization (SQ8) ----------------------------------------------


def sq8_train(emb_df: DataFrame, vec_col: str) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — the SQ8 "model".

    One distributed pass: posexplode -> groupBy(dim) min/max is a shuffle
    of |dims| groups with map-side partials, then |dims| rows come back to
    the driver (the collect IS the model, same pattern as the IVF
    centroids).  At 100 TB this is a single scan producing a KB-sized
    model that ships in the plan as literals.
    """
    rows = (
        emb_df.select(F.posexplode(F.col(vec_col)).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    by_dim = {r.dim: (float(r.mn), float(r.mx)) for r in rows}
    dims = sorted(by_dim)
    return [by_dim[d][0] for d in dims], [by_dim[d][1] for d in dims]


def sq8_quantize_expr(vec, mins: list[float], maxs: list[float]):
    """int8-style quantization q_i = clamp(floor((x-mn)*255/(mx-mn)), 0..255).

    All arithmetic in double with the exact expression shape
    ``((x - mn) * 255.0) / (mx - mn)`` so a DuckDB oracle using the same
    shape is IEEE-bit-identical; degenerate dims (mx == mn) quantize to 0.
    """
    mn = F.array(*[F.lit(float(x)) for x in mins])
    mx = F.array(*[F.lit(float(x)) for x in maxs])
    idx = F.transform(vec, lambda _, i: i + 1)

    def q(x, i):
        lo = F.element_at(mn, i)
        hi = F.element_at(mx, i)
        raw = F.floor((x.cast("double") - lo) * F.lit(255.0) / (hi - lo))
        return (
            F.when(hi == lo, F.lit(0))
            .otherwise(F.least(F.lit(255), F.greatest(F.lit(0), raw)))
            .cast("int")
        )

    return F.zip_with(vec, idx, q)


def _sq_l2_expr(qa, qb):
    """Exact integer squared-L2 between two quantized vectors (bigint —
    no float rounding anywhere, so ranking is engine-exact)."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda a, b: ((a - b) * (a - b)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq8_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    mins: list[float],
    maxs: list[float],
    k: int = 10,
) -> DataFrame:
    """Top-k by squared-L2 over SQ8-quantized vectors.

    The corpus is quantized in place (4x smaller vectors than float32 —
    at 100 TB that is the difference between spilling and not); queries
    are broadcast; distances are exact integers so the (dist, cand_id)
    ranking has no cross-engine rounding hazard.  Approximation relative
    to full-precision L2 comes only from quantization itself.
    """
    quant = F.col(vec_col)
    c = spread(emb_df).select(
        F.col(id_col).alias("cand_id"),
        sq8_quantize_expr(quant, mins, maxs).alias("cq"),
    )
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        sq8_quantize_expr(quant, mins, maxs).alias("qq"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            _sq_l2_expr(F.col("qq"), F.col("cq")).alias("qdist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdist").asc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "qdist", "rank")
    )


def filtered_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    filter_col: str,
    query_df: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Metadata-filtered exact top-k: neighbors restricted to candidates
    sharing the query's ``filter_col`` value (RAG-style filtered
    retrieval).

    The metadata predicate becomes the JOIN KEY, not a post-filter: at
    100 TB with the corpus written partitioned by ``filter_col`` the join
    partition-prunes to matching partitions, and each query scores only
    its own slice of the corpus instead of all of it.
    """
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(filter_col).alias("fkey"),
    )
    c = spread(emb_df).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        F.col(filter_col).alias("fkey"),
    )
    scored = (
        c.join(F.broadcast(q), "fkey")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                cosine_similarity_expr(F.col("qv"), F.col("cv")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


SEMANTIC_ROWS_PER_CELL = 512  # target cell population for semantic_dedup
SEMANTIC_LITERAL_MAX_CELLS = 256  # plan-literal assignment path bound


def semantic_cell_count(n_vectors: int) -> int:
    """Data-scaled cell count for :func:`semantic_dedup`:
    ``max(N_CENTROIDS, n // 512)``, all-integer so a SQL oracle
    reproduces it exactly (``GREATEST(16, COUNT(*)//512)``).

    Round 11's full-headline decade sweep caught the defect the scaling
    fixes: with the cell count FIXED at 16, cell population grows with
    the corpus and the within-cell pair join is O(N^2/16) — at sf10
    (200k vectors, ~12.5k per cell) that is ~1.2e9 cosine pairs and the
    query ran 20+ minutes.  Scaling k keeps cells near 512 rows, so pair
    work is ~N x 512 (linear).

    Round 12 lifted the cap from 256 (the literal-inlined-centroid
    plan-size bound — r11's residual) to 4096 by adding a second
    assignment path: beyond :data:`SEMANTIC_LITERAL_MAX_CELLS` the
    centroid matrix ships as an Arrow-batched pandas pass
    (:func:`ivf_cells_pandas`, bitwise-identical fold) instead of a
    plan literal, so sf10's wanted ~390 cells actually take effect.
    Round 13 removed the remaining 4096 bound (VERDICT r12 Next #2):
    the pandas path now ships the model as a real
    ``SparkContext.broadcast`` (torrent-distributed, never re-shipped
    per task, GB-scale capable) instead of a pickled closure capture,
    so the cell count scales freely with the corpus — at 1B vectors the
    wanted ~2M x 64-double model is ~1 GB, inside broadcast territory
    and far outside closure territory.  For cell counts that large a
    deployment should ALSO swap the flat first-k-by-id stand-in for
    trained k-means centroids (``semantic_dedup(centroids=...)`` with
    :func:`kmeans_centroids` / :func:`lloyd_kmeans_centroids`) — better
    balance at the same plan shape.  Driver scales are UNCHANGED — k
    stays 16 up to n = 8192 vectors and the test data holds
    500/500/2000 at sf0.001/0.01/0.1 — so every recorded driver row is
    bit-identical, and sf10 still wants ~390 cells."""
    return max(N_CENTROIDS, n_vectors // SEMANTIC_ROWS_PER_CELL)


def _build_cos6_kernel():
    """Factory for the row-tiled 6dp cosine kernel shared by
    :func:`ivf_cells_pandas` and :func:`lloyd_cell_dim_sums`.

    A FACTORY, not a module-level kernel, deliberately: the returned
    nested function's qualname contains ``<locals>``, so cloudpickle
    serializes it BY VALUE into the UDF closure — a module-level helper
    would pickle by reference and make every worker import this package,
    which the bare driver-contract session (no PYTHONPATH conf) cannot
    do.  Caught by the verify-skill bare-session simulation.

    Bitwise parity with the Catalyst literal path is engineered: dot
    products and squared norms accumulate SEQUENTIALLY ACROSS DIMENSIONS
    in float64 (``acc += v[:, i] * c[i]``) — exactly the left-to-right
    ``F.aggregate`` fold of ``functions/vectors.py::dot_product_expr``
    element-cast to double, vectorized across the batch axis only.  Row
    tiling (r13) only bounds the temp to L2 size; the per-(row, cell)
    fold order stays dim 0..d-1 left to right, so the result is
    bit-identical to the untiled loop (asserted by the parity test) at
    ~6x the throughput (measured 4.28 -> 0.72 s per 10k x 390 batch)."""
    import numpy as np

    def cos6_kernel(V, C, cn):
        n, d = V.shape
        k = C.shape[0]
        dots = np.zeros((n, k), dtype=np.float64)
        vn = np.zeros(n, dtype=np.float64)
        blk = 1024
        tmp = np.empty((min(blk, n), k), dtype=np.float64)
        for j0 in range(0, n, blk):
            j1 = min(j0 + blk, n)
            db = dots[j0:j1]
            tb = tmp[: j1 - j0]
            for i in range(d):  # sequential across dims == the fold
                np.multiply(V[j0:j1, i][:, None], C[None, :, i], out=tb)
                db += tb
        for i in range(d):
            col = V[:, i]
            vn += col * col
        return np.round(dots / (np.sqrt(vn)[:, None] * cn[None, :]), 6)

    return cos6_kernel


def _build_dec10_quantizer():
    """Factory for the Spark-exact ``CAST(double AS DECIMAL(27,10))``
    batch quantizer (by-value pickling — see :func:`_build_cos6_kernel`
    for why a factory).  The returned ``quantize(V, ansi)`` yields
    ``(Q, contrib, big)``: ``Q`` the int64 matrix of
    ``round(shortest_repr(x) * 1e10)`` under HALF_UP (zero where the
    cast yields NULL or where the element took the big path),
    ``contrib`` marking elements whose cast is non-NULL, ``big`` listing
    ``(flat_index, exact_int)`` for elements beyond the int64 fast path.

    Parity argument (the established round6/shortest-repr doctrine):
    Spark's double->decimal cast is ``BigDecimal.valueOf(x).setScale(10,
    HALF_UP)`` — HALF_UP rounding of the double's SHORTEST-REPR decimal,
    which ``Decimal(repr(x))`` reproduces (both are the shortest decimal
    string that round-trips to x; when a value sits exactly ON a scale-10
    boundary that boundary string IS the shortest repr on both sides, so
    the engines can never straddle it).  The vectorized path computes
    ``floor(|x| * 1e10 + 0.5)`` with sign restored — exact except within
    float error of a .5 boundary, and every element inside a conservative
    boundary band (the combined product-rounding + shortest-repr error is
    <= ~2.5e-16 * |p|; the band is 40x that plus an absolute floor),
    every non-finite, and every |x| > 1e6 replays the exact Decimal
    semantics per element.  Non-finite elements are NULL (Spark's
    double->decimal cast NULLs NaN/Infinity even under ANSI — probed on
    the engine session); DECIMAL(27,10)-overflow elements raise when
    ``ansi`` is set (mirroring NUMERIC_VALUE_OUT_OF_RANGE) and are NULL
    otherwise."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    fast_max = 1e6

    def quantize(V, ansi=False):
        finite = np.isfinite(V)
        with np.errstate(invalid="ignore", over="ignore"):
            p = np.where(finite, V, 0.0) * 1e10
            ap = np.abs(p)
            b = np.floor(ap + 0.5)
            frac = ap - np.floor(ap)
            dist = np.abs(frac - 0.5)
            tol = 1e-7 + ap * 1e-14
            slow = (~finite) | (dist < tol) | (np.abs(V) > fast_max)
            Q = (np.sign(p) * b).astype(np.int64)
        Q[slow] = 0
        contrib = finite.copy()
        big = []
        if slow.any():
            flat_idx = np.flatnonzero(slow)
            vals = V.ravel()[flat_idx]
            Qf = Q.ravel()
            cf = contrib.ravel()
            ten27 = 10**27
            with localcontext() as ctx:
                # quantizing |x| up to ~1.8e308 at scale 10 needs ~320
                # digits of working precision before the overflow check
                ctx.prec = 400
                for j, x in zip(flat_idx.tolist(), vals.tolist()):
                    if not (x == x and abs(x) != float("inf")):
                        cf[j] = False
                        continue
                    q = int(
                        Decimal(repr(x))
                        .scaleb(10)
                        .quantize(Decimal(1), rounding=ROUND_HALF_UP)
                    )
                    if abs(q) >= ten27:  # DECIMAL(27,10) overflow
                        if ansi:
                            raise ArithmeticError(
                                f"{x!r} cannot be represented as "
                                "Decimal(27, 10) (ANSI mode)"
                            )
                        cf[j] = False
                    elif abs(q) < 2**62:
                        Qf[j] = q
                    else:
                        big.append((int(j), q))
        return Q, contrib, big

    return quantize


def lloyd_cell_dim_sums(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list]],
) -> DataFrame:
    """One fused Lloyd-update pass: assign each vector to its nearest
    centroid AND accumulate the per-(cell, dim) decimal component sums
    inside the same Arrow batch loop, emitting only per-task partials —
    ``(cell, idx, ps, n)`` where ``ps`` is the exact scale-10 partial sum
    rendered as a decimal string (NULL when the task saw no castable
    value for that slot) and ``n`` the task's row count for the cell.

    Replaces the old two-consumer shape (assignment pass shipping
    ``(id, v, cell)`` back through Arrow, then a posexplode of n x d rows
    into a hash aggregate): the corpus crosses the Python boundary once,
    nothing but k x d x tasks partial rows come back, and the downstream
    ``SUM(CAST(ps AS DECIMAL(38,10)))`` reproduces the old
    ``SUM(CAST(val AS DECIMAL(27,10)))`` value exactly (same multiset of
    exactly-quantized addends, decimal addition is associative; see
    :func:`_build_dec10_quantizer` for the per-value cast parity).  Partial
    accumulation is int64 with loud promotion to Python-int (object)
    arithmetic before any overflow, so the partials are exact for ANY
    input domain, not just unit-norm embeddings."""
    import math

    if not centroids:
        raise ValueError("lloyd_cell_dim_sums: empty centroid set")
    centroids = sorted(
        (int(cid), [float(x) for x in cvec]) for cid, cvec in centroids
    )
    cent_ids = [cid for cid, _ in centroids]
    cent_mat = [cvec for _, cvec in centroids]
    cent_norms = [math.sqrt(_py_self_dot(cvec)) for cvec in cent_mat]
    bc_model = emb_df.sparkSession.sparkContext.broadcast(
        (cent_ids, cent_mat, cent_norms)
    )
    # ANSI sessions RAISE on a decimal-overflow cast (non-ANSI: NULL) —
    # bake the session's mode in so the quantizer mirrors it exactly.
    # No fallback default to conf.get: passing one would mask Spark's
    # BUILT-IN default (ansi=true on 4.x) whenever the key is not set
    # explicitly.  r14 (VERDICT r13 #5): if the string probe throws, read
    # the EFFECTIVE value from the JVM session conf (session + built-in
    # default) instead of silently assuming legacy false; only a session
    # with neither surface reachable falls back — to the 4.x built-in
    # default (true), the conservative side (raise, never silent NULL).
    try:
        ansi = (
            str(emb_df.sparkSession.conf.get("spark.sql.ansi.enabled"))
            .lower()
            == "true"
        )
    except Exception:
        try:
            ansi = bool(
                emb_df.sparkSession._jsparkSession.sessionState()
                .conf()
                .ansiEnabled()
            )
        except Exception:
            ansi = True
    # built HERE so both ride the closure by value (bare driver-contract
    # sessions cannot import this package in workers)
    cos6_kernel = _build_cos6_kernel()
    dec10_quantize = _build_dec10_quantizer()

    def sums(batches):
        import numpy as np
        import pandas as pd

        m_ids, m_mat, m_norms = bc_model.value
        C = np.asarray(m_mat, dtype=np.float64)
        cn = np.asarray(m_norms, dtype=np.float64)
        cids = np.asarray(m_ids, dtype=np.int64)
        k = len(cids)
        acc = None  # k x d int64, promoted to object on overflow risk
        fin = None  # k x d int64 count of non-NULL contributions
        cnt = None  # k int64 rows per cell
        d = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            if acc is None:
                d = V.shape[1]
                acc = np.zeros((k, d), dtype=np.int64)
                fin = np.zeros((k, d), dtype=np.int64)
                cnt = np.zeros(k, dtype=np.int64)
            cos6 = cos6_kernel(V, C, cn)
            pos = np.argmax(cos6, axis=1)
            cnt += np.bincount(pos, minlength=k)
            Q, contrib, big = dec10_quantize(V, ansi=ansi)
            bsum = np.zeros((k, d), dtype=np.int64)
            mx = int(np.max(np.abs(Q))) if Q.size else 0
            if mx and mx * len(pdf) >= 2**62:
                # exact object-dtype fallback: a single batch could
                # overflow int64 (only reachable for |x| around 1e8+)
                bsum = bsum.astype(object)
                for r in range(V.shape[0]):
                    bsum[pos[r]] += Q[r].astype(object)
            else:
                np.add.at(bsum, pos, Q)
            np.add.at(fin, pos, contrib.astype(np.int64))
            for j, q in big:
                bsum = bsum.astype(object) if bsum.dtype != object else bsum
                bsum[pos[j // d], j % d] += q
            if acc.dtype != object and (
                bsum.dtype == object
                or int(np.max(np.abs(acc)))
                + int(max(abs(int(bsum.min())), abs(int(bsum.max()))))
                >= 2**62
            ):
                acc = acc.astype(object)
            acc += bsum
        if acc is None:
            return
        rows_cell, rows_idx, rows_ps, rows_n = [], [], [], []
        for c in range(k):
            nc = int(cnt[c])
            if nc == 0:
                continue
            for i in range(d):
                q = int(acc[c, i])
                if int(fin[c, i]) == 0:
                    ps = None
                else:
                    a = abs(q)
                    sign = "-" if q < 0 else ""
                    ps = f"{sign}{a // 10**10}.{a % 10**10:010d}"
                rows_cell.append(int(cids[c]))
                rows_idx.append(i)
                rows_ps.append(ps)
                rows_n.append(nc)
        yield pd.DataFrame(
            {
                "cell": pd.Series(rows_cell, dtype="int64"),
                "idx": pd.Series(rows_idx, dtype="int32"),
                "ps": pd.Series(rows_ps, dtype="object"),
                "n": pd.Series(rows_n, dtype="int64"),
            }
        )

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("cell", LongType()),
            StructField("idx", IntegerType()),
            StructField("ps", StringType()),
            StructField("n", LongType()),
        ]
    )
    # opaque function: ship ONLY the vector column (guide §4.1 column
    # pruning — everything else would be scanned and serialized for
    # nothing)
    return spread(emb_df).select(vec_col).mapInPandas(sums, out_schema)


def ivf_cells_pandas(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list]],
    with_score: bool = False,
) -> DataFrame:
    """:func:`ivf_cells_with` semantics with the centroid model shipped
    as a ``SparkContext.broadcast`` consumed by an Arrow-batched pandas
    pass instead of a plan literal — the beyond-256-cells assignment
    path (r12; the literal array is bounded by plan size / py4j
    transfer).  r13 moved the model from pickled-closure capture to a
    real broadcast variable: closures re-ship with EVERY task and are
    practically bounded to MBs, a broadcast ships once per executor via
    torrent and carries GBs — this is what removes the former 4096-cell
    cap (a 2M-cell x 64-double model is ~1 GB).

    Bitwise parity with the engine path is engineered, not hoped for:
    the numpy kernel accumulates dot products and norms SEQUENTIALLY
    ACROSS DIMENSIONS in float64 (``acc += v[:, i] * c[i]``) — exactly
    the left-to-right ``F.aggregate`` fold of
    ``functions/vectors.py::dot_product_expr`` element-cast to double,
    vectorized across the batch axis only — so the unrounded cosines are
    bit-identical to the literal path and to DuckDB's sequential
    ``list_cosine_similarity``.  Ties break to the lower centroid id
    (``np.argmax`` first-max over ascending-cid columns = the literal
    path's max-struct ``nid`` trick).  The 6dp rounding differs only at
    exact decimal ties, which 6dp cosines of real-valued data do not hit
    (the established round6 doctrine).  Zero shuffle: one mapInPandas
    over the corpus, model in the closure."""
    if not centroids:
        return ivf_cells_with(emb_df, id_col, vec_col, centroids, with_score)
    import math

    centroids = sorted((int(cid), [float(x) for x in cvec])
                       for cid, cvec in centroids)
    cent_ids = [cid for cid, _ in centroids]
    cent_mat = [cvec for _, cvec in centroids]
    cent_norms = [math.sqrt(_py_self_dot(cvec)) for cvec in cent_mat]
    # model rides a real broadcast (torrent, once per executor), not the
    # task closure — the unbounded-cell-count path (see docstring)
    bc_model = emb_df.sparkSession.sparkContext.broadcast(
        (cent_ids, cent_mat, cent_norms)
    )

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    fields = [
        StructField(id_col, emb_df.schema[id_col].dataType),
        StructField("v", emb_df.schema[vec_col].dataType),
        StructField("cell", LongType()),
    ]
    if with_score:
        fields.append(StructField("cos", DoubleType()))
    out_schema = StructType(fields)
    # by-value capture (bare driver-contract sessions cannot import this
    # package in workers — see _build_cos6_kernel)
    cos6_kernel = _build_cos6_kernel()

    def assign(batches):
        import numpy as np
        import pandas as pd

        m_ids, m_mat, m_norms = bc_model.value
        C = np.asarray(m_mat, dtype=np.float64)       # k x d
        cn = np.asarray(m_norms, dtype=np.float64)    # k
        cids = np.asarray(m_ids, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            cos6 = cos6_kernel(V, C, cn)
            best = np.argmax(cos6, axis=1)  # first max -> lowest cid
            n = V.shape[0]
            out = {
                id_col: pdf[id_col].values,
                "v": pdf[vec_col].values,
                "cell": cids[best],
            }
            if with_score:
                out["cos"] = cos6[np.arange(n), best]
            yield pd.DataFrame(out)

    return spread(emb_df).mapInPandas(assign, out_schema)


def _semantic_cell_verdicts(id_col: str, threshold: float):
    """Grouped-Arrow within-cell verdict pass for :func:`semantic_dedup`
    (optimization r13).  Per cell: a vector is kept iff no lower-id
    neighbor has ``round(cos, 6) >= threshold`` — identical to the old
    self-join + distinct + left-join, computed vectorized.

    Bitwise parity with the Catalyst pair pipeline is engineered:

    - dot products and squared norms accumulate DIM-SEQUENTIALLY
      (``acc = acc + v_d * w_d`` left to right, 0.0 init) — per pair the
      exact IEEE op sequence of ``F.aggregate``'s fold, just vectorized
      ACROSS pairs; ``np.sqrt`` is correctly rounded like Math.sqrt, and
      ``dot / (na * nb)`` multiplies norms first exactly like the old
      pair filter.
    - the 6dp HALF_UP round only matters within ~5e-7 of the threshold:
      pairs clearly above/below short-circuit in numpy; the (empirically
      empty — cosines are irrational-ish) border band replays Spark's
      exact semantics, ``BigDecimal.valueOf(x).setScale(6, HALF_UP)``
      via ``Decimal(repr(x)).quantize`` (both shortest-repr decimal),
      then compares as double.
    - NaN (zero-norm degenerate) counts as above-threshold — Spark
      orders NaN above every double and ``round`` passes NaN through.
    """
    import numpy as np

    thr = float(threshold)

    def fn(pdf):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(
            drop=True
        )
        n = len(pdf)
        out_kept = np.ones(n, dtype=bool)
        if n > 1:
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )
            dim = V.shape[1]
            acc = np.zeros(n)
            for d in range(dim):
                c = V[:, d]
                acc = acc + c * c
            norms = np.sqrt(acc)
            q6 = Decimal("0.000001")
            blk = 1024
            for j0 in range(1, n, blk):
                j1 = min(j0 + blk, n)
                pacc = np.zeros((j1 - j0, n))
                for d in range(dim):
                    pacc = pacc + V[j0:j1, d][:, None] * V[None, :, d]
                cos = pacc / (norms[j0:j1][:, None] * norms[None, :])
                mask = (
                    np.arange(n)[None, :]
                    < np.arange(j0, j1)[:, None]
                )
                nan = np.isnan(cos)
                over = (cos >= thr + 2e-6) | nan
                border = (
                    mask & ~over & ~nan & (cos > thr - 2e-6)
                )
                for bj, bi in zip(*np.nonzero(border)):
                    x = float(cos[bj, bi])
                    q = Decimal(repr(x)).quantize(
                        q6, rounding=ROUND_HALF_UP
                    )
                    if float(q) >= thr:
                        over[bj, bi] = True
                out_kept[j0:j1] &= ~(mask & over).any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "kept": out_kept,
            }
        )

    return fn


def semantic_dedup(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    n_vectors: int | None = None,
    centroids: list[tuple[int, list]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus into coarse cells, compute
    pairwise cosine ONLY within each cell, and drop every vector that has
    ANY lower-id near-duplicate in its cell.

    Exact survival rule (order-free, one pass — deliberately NOT a
    transitive-closure grouping): a vector is kept iff no lower-id
    within-cell neighbor exceeds the threshold, whether or not that
    neighbor itself survives.  On similarity chains (1~2, 2~3, 1!~3)
    this drops BOTH 2 and 3 — more aggressive than keep-one-per-
    connected-group, which is the standard trade of pairwise-rule dedup.
    When true transitive groups are wanted, feed the within-cell pairs to
    ``dedup.connected_components`` + ``dedup.survivors`` instead (the
    minhash pipeline shows that composition).

    This is the scale path for embedding dedup: the quadratic pair work is
    confined to cells instead of the whole corpus — the cell count scales
    with the data (:func:`semantic_cell_count`: one cell per ~512
    vectors, floor 16, cap 256) so the total pair count stays ~N x 512
    instead of N^2/16, and each cell's pairs compute independently
    (perfectly parallel, no cross-cell traffic).  Only (id, vec, cell)
    crosses the one clustering shuffle; the drop set that comes back is
    (id) alone.  At 100 TB the corpus is written partitioned by cell, so
    the within-cell self-join is a partition-local join with zero
    shuffle.

    Deterministic first-k centroids (see :func:`fixed_centroids`) make
    the whole pipeline hash-exact against a SQL oracle; production swaps
    in :func:`kmeans_centroids` with no plan-shape change.  Returns
    (id, cell, kept) for every input vector.
    """
    # one cheap count job decides k (callers that already know the
    # corpus size pass n_vectors — e.g. the registry plan's memoized
    # cache.plan_count — so no extra job runs); the oracle recomputes
    # the identical integer formula from COUNT(*)
    if centroids is None:
        k = semantic_cell_count(
            emb_df.count() if n_vectors is None else n_vectors
        )
        cents = fixed_centroids(emb_df, id_col, vec_col, k)
    else:
        # TRAINED-centroid unification (VERDICT r12 Next #2): a caller
        # may ship k-means centroids (kmeans_centroids /
        # lloyd_kmeans_centroids) — same plan shape, better-balanced
        # cells, and the cell count scales freely with the model
        cents = centroids
    # assignment path by model size: plan-literal centroids up to 256
    # cells (cheapest, whole-stage codegen), Arrow-batched broadcast
    # model beyond (bitwise-identical fold; see ivf_cells_pandas)
    assign = (
        ivf_cells_pandas
        if len(cents) > SEMANTIC_LITERAL_MAX_CELLS
        else ivf_cells_with
    )
    # Optimization r13 (guide §4.2): the within-cell pair work — the
    # dominant cost of both semantic keys at sf10 — used to run as a
    # cell self-join whose 64-dim dot products evaluated as INTERPRETED
    # Catalyst folds (~N x 512 pairs x dim per-element lambda calls).
    # Each cell's verdicts are independent of every other cell, so the
    # pairs now compute inside one grouped Arrow pass per cell
    # (applyInPandas), vectorized over pairs while keeping the exact
    # JVM fold order per pair — see _semantic_cell_verdicts.  This also
    # deletes the dropped-set distinct and the kept left-join (the
    # verdict leaves the pass finished) and with them the persisted
    # double consumption of the assignment output.
    cells = assign(emb_df, id_col, vec_col, cents)
    return cells.select(id_col, "v", "cell").groupBy("cell").applyInPandas(
        _semantic_cell_verdicts(id_col, threshold),
        schema=f"{id_col} long, cell long, kept boolean",
    )


def ivf_multiprobe_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF top-k with multi-probe: each query searches its ``nprobe``
    nearest cells instead of one — the standard recall knob (FAISS
    ``nprobe``) that recovers most cell-boundary misses of
    :func:`ivf_probe_topk` for nprobe/n_cells of the cost of exact.

    The probe list is computed per query from the same literal centroid
    array (slice of the sorted (cos, id) struct array — still no
    model join), then exploded to (query, cell) rows; candidates join on
    cell exactly as single-probe.  A candidate lives in exactly one cell,
    so the union of probed cells never duplicates candidates and the
    final ranking needs no dedup.  Everything stays hash-exact for the
    oracle: deterministic centroids, 6dp rounding, id tie-breaks.
    """
    cents = fixed_centroids(emb_df, id_col, vec_col)
    if not cents:
        # same loud-guard rule as ivf_cells_with: empty model over real
        # data raises; a truly empty corpus returns the empty shape.
        if not emb_df.isEmpty():
            raise ValueError(
                "ivf multiprobe: centroid set is empty but the corpus "
                f"has rows (no ids < N_CENTROIDS={N_CENTROIDS}?)"
            )
        return query_df.select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("cand_id"),
            F.lit(0.0).alias("cos"),
            F.lit(0).cast("long").alias("rank"),
        ).limit(0)
    # one centroid collect shared by assignment AND probe lists
    cells = scoped_persist(ivf_cells_with(emb_df, id_col, vec_col, cents))
    v = F.col(vec_col)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    (
                        -F.round(
                            cosine_similarity_expr(
                                v, F.array(*[F.lit(float(x)) for x in cvec])
                            ),
                            6,
                        )
                    ).alias("nc"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cvec in cents
            ]
        )
    )
    probes = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(
            F.transform(
                F.slice(ranked, 1, nprobe), lambda s: s["cid"].cast("long")
            )
        ).alias("cell"),
    )
    c = cells.select(
        F.col(id_col).alias("cand_id"), F.col("v").alias("cv"), "cell"
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                cosine_similarity_expr(F.col("qv"), F.col("cv")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def sq8_rerank_topk(
    emb_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    mins: list[float],
    maxs: list[float],
    m: int = 50,
    k: int = 10,
) -> DataFrame:
    """Two-stage retrieval: SQ8 coarse scan to top-m, exact cosine rerank
    of the m survivors to top-k — the standard ANN serving shape (scan
    the 4x-compressed codes for everything, touch full-precision vectors
    only for |Q| x m rows).  At 100 TB the full-precision fetch is an
    equi-join of a broadcast candidate list against the embedding table,
    so the expensive float vectors never cross a shuffle for
    non-candidates.  ``sq8_rank`` is kept in the output so the reorder
    the rerank performs is observable (a candidate coarse-ranked 40th
    can final-rank 3rd)."""
    cand = sq8_topk(emb_df, id_col, vec_col, query_df, mins, maxs, m).select(
        "query_id", "cand_id", F.col("rank").alias("sq8_rank")
    )
    qv = query_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("qn"),
    )
    cv = spread(emb_df).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("cn"),
    )
    exact = (
        cv.join(F.broadcast(cand), "cand_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "cos",
            F.round(
                dot_product_expr(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn")),
                6,
            ),
        )
        .select("query_id", "cand_id", "cos", "sq8_rank")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank", "sq8_rank")
    )
