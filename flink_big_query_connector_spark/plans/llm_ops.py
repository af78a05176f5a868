"""LLM-data-pipeline operator queries (SURVEY.md §2 B27–B30).

Every deterministic operator gets a full DuckDB oracle that reproduces the
same hash/signature arithmetic (see ``operators/hashing.py`` — md5-derived
integers, identical in both engines).  Only the intrinsically approximate
RP-LSH ANN variant and the mapInPandas feature extractor are rows-only.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import plan_count
from ..functions import numeric
from ..functions.numeric import dbl, dec
from ..operators import dedup, multimodal, similarity, text
from ..operators.hashing import (
    MINHASH_SEEDS,
    N_BANDS,
    P,
    SIMHASH_BITS,
    sql_band_key,
    sql_minhash_value,
)
from ..sources.tables import load_tables, ts_event_time
from .registry import register

# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

_SQL_TOKS = "regexp_extract_all(COALESCE(text, ''), '\\S+')"
_SQL_H60 = "('0x'||substr(md5({x}),1,15))::BIGINT"

# testdata embedding dimensionality — a DATA constant like the chunk-date
# boundaries in streaming_queries.py: the Spark side adapts via
# F.size(vec), but DuckDB list comprehensions need the literal width.  If
# the testdata generator changes dim, this single constant follows.
_EMB_DIM = 64

_SQL_DOCS = f"SELECT doc_id, {_SQL_TOKS} AS toks FROM documents"

def _emb(t) -> DataFrame:
    """The embeddings table under the engine's VECTOR CONTRACT: a NULL
    embedding (the failed-embed-job row every production corpus
    contains) never enters a similarity operator — dropped identically
    on both engines (every oracle filters `embedding IS NOT NULL`;
    DuckDB's list_cosine_similarity hard-errors on NULL vectors, so the
    contract is also what makes the oracles well-defined on dirty data;
    exercised by the NULL-injection sweep in tests/test_robustness.py)."""
    return t["embeddings"].filter(F.col("embedding").isNotNull())


_SQL_SHINGLES = f"""
    SELECT doc_id,
           CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])
                ELSE []::VARCHAR[] END AS shingles
    FROM ({_SQL_DOCS})
"""

# exploded DISTINCT shingles + per-doc counts + pair intersections
_SQL_JACCARD_CTES = f"""
    docs AS ({_SQL_SHINGLES}),
    nonempty AS (SELECT * FROM docs WHERE len(shingles) > 0),
    ex AS (SELECT DISTINCT doc_id, s
           FROM (SELECT doc_id, unnest(shingles) AS s FROM nonempty)),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    jac AS (SELECT id_a, id_b,
                   CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
            FROM inter
            JOIN cnt ca ON ca.doc_id = id_a
            JOIN cnt cb ON cb.doc_id = id_b)
"""


# ---------------------------------------------------------------------------
# B27 — dedup family
# ---------------------------------------------------------------------------


@register(
    "llm_dedup_exact",
    oracle=f"""
        SELECT {_SQL_H60.format(x='text')} AS content_hash,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    tags=("dedup",),
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a 60-bit content hash."""
    t = load_tables(spark, sf_dir)
    return dedup.exact_dedup(t["documents"], "doc_id", "text")


@register(
    "llm_dedup_ngram_jaccard",
    oracle=f"""
        WITH {_SQL_JACCARD_CTES}
        SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.8
    """,
    tags=("dedup",),
)
def llm_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3gram set-Jaccard pairs >= 0.8 (explode + equi-join)."""
    t = load_tables(spark, sf_dir)
    tok = dedup.with_token_boundary(t["documents"], "doc_id")
    # no size filter needed: explode() of an empty shingle array emits
    # nothing, which is exactly the oracle's `nonempty` semantics
    docs = tok.select(
        "doc_id", dedup.shingles_expr(F.col("toks")).alias("shingles")
    )
    return dedup.exact_jaccard_pairs(docs, "doc_id", "shingles", 0.8)


def _minhash_cand_ctes() -> str:
    """sig/bands/cand CTE text (MinHash signatures -> LSH band keys ->
    distinct candidate pairs), shared by the near-dup oracle and the
    candidate-recall evaluation oracle.  Assumes the `nonempty` CTE from
    ``_SQL_JACCARD_CTES`` precedes it."""
    mh_exprs = ",\n           ".join(
        f"{sql_minhash_value('shingles', a, b)} AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_SEEDS)
    )
    mh_cols = [f"mh{i}" for i in range(len(MINHASH_SEEDS))]
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {j} AS band, {sql_band_key(mh_cols, j)} AS key FROM sig"
        for j in range(N_BANDS)
    )
    return f"""sig AS (SELECT doc_id, shingles,
           {mh_exprs}
           FROM nonempty),
        bands AS (
        {band_selects}
        ),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM bands a
                 JOIN bands b ON a.band = b.band AND a.key = b.key
                              AND a.doc_id < b.doc_id)"""


def _minhash_oracle() -> str:
    return f"""
        WITH {_SQL_JACCARD_CTES},
        {_minhash_cand_ctes()}
        SELECT j.id_a, j.id_b, j.jaccard
        FROM jac j JOIN cand c ON c.id_a = j.id_a AND c.id_b = j.id_b
        WHERE j.jaccard >= 0.8
    """


@register("llm_dedup_minhash_lsh", oracle=_minhash_oracle(), tags=("dedup",))
def llm_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) -> LSH(4 bands x 4 rows) -> bucket join -> exact-Jaccard
    verification.  The oracle replicates the identical signature pipeline,
    so even LSH misses (probabilistic) agree across engines."""
    t = load_tables(spark, sf_dir)
    return dedup.minhash_neardup_pairs(t["documents"], "doc_id", "text", 0.8)


def _simhash_sql_value() -> str:
    bits = []
    for j in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform(th, x -> "
            f"CASE WHEN (x >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        bits.append(f"CASE WHEN {vote} > 0 THEN CAST({1 << j} AS BIGINT) "
                    f"ELSE 0 END")
    return " + ".join(bits)


@register(
    "llm_dedup_simhash",
    oracle=f"""
        WITH h AS (
          SELECT doc_id,
                 list_transform({_SQL_TOKS}, t -> {_SQL_H60.format(x='t')}) AS th
          FROM documents
        )
        SELECT doc_id, CAST({_simhash_sql_value()} AS BIGINT) AS simhash
        FROM h
    """,
    tags=("dedup",),
)
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (bit-exact across engines; explode +
    single-pass vote aggregation, one md5 per token)."""
    t = load_tables(spark, sf_dir)
    return dedup.simhash_df(t["documents"], "doc_id")


@register(
    "llm_dedup_simhash_pairs",
    oracle=f"""
        WITH h AS (
          SELECT doc_id,
                 list_transform({_SQL_TOKS}, t -> {_SQL_H60.format(x='t')}) AS th
          FROM documents
        ),
        sh AS (SELECT doc_id, CAST({_simhash_sql_value()} AS BIGINT) AS simhash
               FROM h),
        -- pigeonhole banding (hamming <= 3 shares one of 4 8-bit bands):
        -- the oracle itself must stay sub-quadratic or full-registry
        -- verification at sf1+ stalls on this one key (an unbanded
        -- a.doc_id < b.doc_id join is 1.25e9 bit_count pairs at 50k docs)
        bands AS (
          SELECT doc_id, simhash, t.j AS band,
                 (simhash >> (8 * t.j)) & 255 AS key
          FROM sh, range(0, 4) t(j)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sa,
                          b.doc_id AS id_b, b.simhash AS sb
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.key = b.key
                      AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
    tags=("dedup",),
)
def llm_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming<=3 SimHash pairs via exact 4-band LSH join; the quadratic
    oracle is guaranteed-equal by pigeonhole (3 bit errors cannot touch
    all 4 bands)."""
    t = load_tables(spark, sf_dir)
    return dedup.simhash_pairs(t["documents"], "doc_id", "text", 3).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


_NEARDUP_BANDS = 4
_NEARDUP_BAND_PLANES = 4


def _sql_neardup_bands() -> str:
    """UNION ALL of the per-band (vec_id, band, key) signature relations —
    the DuckDB mirror of similarity.embedding_neardup_pairs_lsh's
    candidate generation."""
    parts = []
    for b in range(_NEARDUP_BANDS):
        planes = [
            b * _NEARDUP_BAND_PLANES + j
            for j in range(_NEARDUP_BAND_PLANES)
        ]
        key = similarity.sql_rp_band("embedding::DOUBLE[]", _EMB_DIM, planes)
        parts.append(
            f"SELECT vec_id, {b} AS band, {key} AS key FROM embx embeddings"
        )
    return " UNION ALL ".join(parts)


@register(
    "llm_dedup_embedding",
    oracle=f"""
        WITH bands AS ({_sql_neardup_bands()}),
        pairs AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key
          WHERE a.vec_id < b.vec_id
        )
        SELECT p.id_a, p.id_b,
               round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                            eb.embedding::DOUBLE[]), 6) AS cos
        FROM pairs p
        JOIN embeddings ea ON ea.vec_id = p.id_a
        JOIN embeddings eb ON eb.vec_id = p.id_b
        WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                           eb.embedding::DOUBLE[]), 6) >= 0.4
    """,
    tags=("dedup",),
)
def llm_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup pairs (>= 0.4, rounded 6dp) via banded
    RP-LSH candidate generation — pair work scales with LSH bucket size,
    never O(corpus^2); the all-pairs crossJoin variant survives only as a
    test oracle helper (operators/dedup.py::embedding_neardup_pairs).
    The oracle mirrors the deterministic bands, so the banded recall
    contract is hash-exact, exactly like llm_dedup_minhash_lsh."""
    t = load_tables(spark, sf_dir)
    return similarity.embedding_neardup_pairs_lsh(
        _emb(t),
        "vec_id",
        "embedding",
        0.4,
        n_bands=_NEARDUP_BANDS,
        band_planes=_NEARDUP_BAND_PLANES,
    )


@register(
    "llm_dedup_semantic",
    oracle="""
        WITH kc AS (
          -- semantic_cell_count twin: one cell per ~512 vectors,
          -- floor 16, UNCAPPED (all-integer; k = 16 at driver scales;
          -- the cell count scales freely since r13 — the model ships
          -- as a SparkContext.broadcast consumed by the Arrow pass,
          -- operators/similarity.py::ivf_cells_pandas)
          SELECT GREATEST(16, COUNT(*) // 512) AS k
          FROM embx
        ),
        cents AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
          FROM embx embeddings, kc WHERE vec_id < kc.k
        ),
        assigned AS (
          SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                 (SELECT c.centroid_id FROM cents c
                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                        c.cvec), 6) DESC,
                           c.centroid_id
                  LIMIT 1) AS cell
          FROM embx e
        ),
        dropped AS (
          SELECT DISTINCT b.vec_id
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
        )
        SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
        FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """,
    tags=("dedup", "similarity"),
)
def llm_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: semantic dedup with the quadratic cosine work confined to
    IVF cells — cluster, pairwise-within-cell, drop any vector with a
    lower-id near-dup neighbor (pairwise rule, not transitive closure;
    see operators/similarity.py::semantic_dedup), i.e. keep the lowest-id
    representative of each near-dup group.  The embedding-crossJoin
    baseline (``llm_dedup_embedding``) goes O(N^2) over the corpus; this
    is the production path where pair work scales with cell size, not
    corpus size.  Deterministic centroids make it hash-exact vs the
    oracle."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    return similarity.semantic_dedup(
        emb,
        "vec_id",
        "embedding",
        0.4,
        n_vectors=plan_count(emb, sf_dir, "embeddings_nonnull"),
    )



# ---------------------------------------------------------------------------
# B28 — similarity search
# ---------------------------------------------------------------------------


@register(
    "llm_ann_topk",
    oracle="""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embx embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
              FROM embx embeddings),
        scored AS (SELECT query_id, cand_id,
                          round(list_cosine_similarity(qv, cv), 6) AS cos
                   FROM q, c WHERE cand_id <> query_id),
        ranked AS (SELECT query_id, cand_id, cos,
                          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
                   FROM scored)
        SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 10
    """,
    tags=("similarity",),
)
def llm_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 20 query vectors (broadcast
    queries; corpus never shuffles)."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    return similarity.brute_force_topk(
        emb, "vec_id", "embedding", emb.filter(F.col("vec_id") < 20), 10
    )


@register(
    "llm_ann_ivf_build_report",
    oracle="""
        WITH cents AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
          FROM embx embeddings WHERE vec_id < 16),
        assigned AS (
          SELECT e.vec_id,
                 (SELECT c.centroid_id FROM cents c
                  ORDER BY round(list_cosine_similarity(
                               e.embedding::DOUBLE[], c.cvec), 6) DESC,
                           c.centroid_id
                  LIMIT 1) AS cell
          FROM embx e),
        sizes AS (SELECT cell, COUNT(*) AS n FROM assigned GROUP BY cell),
        tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_cells,
                       MAX(n) AS max_n FROM sizes)
        SELECT s.cell, s.n,
               floor(CAST(s.n AS DOUBLE) / CAST(t.total AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 AS frac,
               floor(CAST(t.max_n AS DOUBLE)
                     / (CAST(t.total AS DOUBLE) / CAST(t.n_cells AS DOUBLE))
                     * 1000000.0 + 0.5) / 1000000.0 AS imbalance,
               CAST(16 - t.n_cells AS BIGINT) AS empty_cells
        FROM sizes s CROSS JOIN tot t
    """,
    tags=("similarity", "audit"),
)
def llm_ann_ivf_build_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-build acceptance report: per-cell population, each
    cell's share, the imbalance factor (max cell / mean cell — the number
    that predicts worst-case probe latency, since a probe reads whole
    cells), and the empty-cell count (wasted centroids).  This is the
    capacity-planning readout a team checks BEFORE shipping an index —
    a skewed build means re-training centroids, not tuning probes.
    Scale shape: assignment is the broadcast-centroid map pass; the
    report aggregates 16 rows, and the totals ride along as a broadcast
    1-row cross join — no driver collect."""
    from ..cache import scoped_persist

    t = load_tables(spark, sf_dir)
    # sizes feeds both the totals aggregate and the final join — persist
    # the 16-row result so the corpus assignment pass runs once
    sizes = scoped_persist(
        similarity.ivf_cells(_emb(t), "vec_id", "embedding")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = sizes.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_cells"),
        F.max("n").alias("max_n"),
    )
    td = F.col("total").cast("double")
    return sizes.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n",
        numeric.round6_expr(F.col("n").cast("double") / td).alias(
            "frac"
        ),
        numeric.round6_expr(
            F.col("max_n").cast("double")
            / (td / F.col("n_cells").cast("double"))
        ).alias("imbalance"),
        (F.lit(similarity.N_CENTROIDS) - F.col("n_cells"))
        .cast("long")
        .alias("empty_cells"),
    )


@register(
    "llm_embedding_outliers",
    oracle="""
        WITH cents AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
          FROM embx embeddings WHERE vec_id < 16),
        assigned AS (
          SELECT e.vec_id,
                 (SELECT c.centroid_id FROM cents c
                  ORDER BY round(list_cosine_similarity(
                               e.embedding::DOUBLE[], c.cvec), 6) DESC,
                           c.centroid_id
                  LIMIT 1) AS cell,
                 (SELECT MAX(round(list_cosine_similarity(
                                e.embedding::DOUBLE[], c.cvec), 6))
                  FROM cents c) AS cos
          FROM embx e),
        m AS (
          SELECT cell, COUNT(*) AS n,
                 SUM(CAST(cos AS DECIMAL(10,6))) AS s,
                 SUM(CAST(cos AS DECIMAL(10,6))
                     * CAST(cos AS DECIMAL(10,6))) AS ss
          FROM assigned GROUP BY cell),
        stats AS (
          SELECT cell, n,
                 CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                 CASE WHEN n > 1 THEN
                   sqrt((CAST(ss AS DOUBLE)
                         - CAST(n AS DOUBLE)
                           * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                        / (CAST(n AS DOUBLE) - 1))
                 END AS std
          FROM m)
        SELECT a.vec_id, a.cell, a.cos,
               ROUND((a.cos - st.mean) / st.std, 6) AS z
        FROM assigned a JOIN stats st USING (cell)
        WHERE st.std IS NOT NULL AND st.std > 0
          AND abs((a.cos - st.mean) / st.std) > 2
    """,
    tags=("similarity", "quality"),
)
def llm_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA: flag vectors whose cosine to their own IVF centroid
    is more than 2 sigma from their CELL's mean — the mis-embedded /
    out-of-distribution screen a pipeline runs before vectors reach the
    index (a global threshold can't work because cells have different
    tightness; per-cell z-scores adapt).  The moments are exact decimal
    sums of the 6dp-rounded assignment cosines (order-free), converted to
    double once per CELL, so the z cut is bitwise reproducible.  Scale
    shape: assignment is the broadcast-centroid map pass, the per-cell
    moments are one 16-row aggregate, and the flagging join broadcasts
    those 16 rows back — the corpus never shuffles."""
    from pyspark.sql.types import DecimalType

    from ..cache import scoped_persist

    t = load_tables(spark, sf_dir)
    # assigned feeds the per-cell moments AND the flagging join — persist
    # so the 16-way unrolled cosine transform runs over the corpus once
    assigned = scoped_persist(
        similarity.ivf_cells(
            _emb(t), "vec_id", "embedding", with_score=True
        ).select("vec_id", "cell", "cos")
    )
    cd = F.col("cos").cast(DecimalType(10, 6))
    m = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cd).alias("s"),
        F.sum(cd * cd).alias("ss"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    std = F.when(
        F.col("n") > 1,
        F.sqrt((F.col("ss").cast("double") - nd * mean * mean) / (nd - 1)),
    )
    stats = m.select("cell", mean.alias("mean"), std.alias("std"))
    z = (F.col("cos") - F.col("mean")) / F.col("std")
    return (
        assigned.join(F.broadcast(stats), "cell")
        .filter(
            F.col("std").isNotNull() & (F.col("std") > 0) & (F.abs(z) > 2)
        )
        .select("vec_id", "cell", "cos", F.round(z, 6).alias("z"))
    )


@register(
    "llm_ann_range_search",
    oracle="""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embx embeddings WHERE vec_id < 10),
        c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
              FROM embx embeddings)
        SELECT query_id, cand_id,
               round(list_cosine_similarity(qv, cv), 6) AS cos
        FROM q, c
        WHERE cand_id <> query_id
          AND round(list_cosine_similarity(qv, cv), 6) >= 0.25
    """,
    tags=("similarity",),
)
def llm_ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine RANGE search (radius query): every candidate with cosine
    >= 0.25 of each of 10 query vectors — the duplicate-sweep API where k
    is unknowable in advance.  Unlike top-k there is no ranking window and
    therefore NO shuffle anywhere: broadcast queries, one corpus pass,
    predicate applied map-side.  Threshold 0.25 sits at ~p99 of the pair
    cosine distribution, so output stays selective at every scale."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    return similarity.brute_force_range_search(
        emb, "vec_id", "embedding", emb.filter(F.col("vec_id") < 10), 0.25
    )


@register(
    "llm_ann_lsh_bucketed",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                          {similarity.sql_rp_bucket('embedding::DOUBLE[]', _EMB_DIM)}
                              AS bucket
                   FROM embx embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv, bucket
              FROM e WHERE vec_id < 20),
        c AS (SELECT vec_id AS cand_id, v AS cv, bucket FROM e),
        scored AS (SELECT query_id, cand_id,
                          round(list_cosine_similarity(qv, cv), 6) AS cos
                   FROM c JOIN q USING (bucket)
                   WHERE cand_id <> query_id),
        ranked AS (SELECT query_id, cand_id, cos,
                          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
                   FROM scored)
        SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 10
        ORDER BY query_id, rank
    """,
    tags=("similarity",),
)
def llm_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH-bucketed ANN (the 100 TB path).  The sign
    buckets are md5-derived +-1 hyperplane projections, so the full
    bucket-join + rank pipeline now has a hash-exact DuckDB oracle (the
    approximation is deterministic, not random)."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    return similarity.rp_lsh_bucketed_topk(
        emb, "vec_id", "embedding", emb.filter(F.col("vec_id") < 20), 10
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# B29 — text analysis
# ---------------------------------------------------------------------------


@register(
    "llm_text_stats",
    oracle=f"""
        WITH d AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents)
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars_calc,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CASE WHEN len(toks) > 0
               THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE)
               ELSE 0.0 END AS avg_token_len,
          CAST(len(regexp_extract_all(COALESCE(text, ''), '[.,;:!?]')) AS BIGINT) AS punct_count,
          CASE WHEN len(toks) > 0
               THEN CAST({text.sql_stopword_hits('toks', text.LANG_STOPWORDS[0][1])}
                    AS DOUBLE) / CAST(len(toks) AS DOUBLE)
               ELSE 0.0 END AS stopword_ratio
        FROM d
    """,
    tags=("text",),
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length/token/punct/stopword)."""
    t = load_tables(spark, sf_dir)
    return text.quality_features(t["documents"]).select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "avg_token_len",
        "punct_count",
        "stopword_ratio",
    )


@register(
    "llm_text_langid",
    oracle=f"""
        WITH d AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents)
        SELECT doc_id, lang AS labeled_lang,
               {text.sql_lang_id('toks')} AS predicted_lang
        FROM d
    """,
    tags=("text",),
)
def llm_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-argmax language ID (n-gram heuristic, engine-portable)."""
    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.col("text"))
    return t["documents"].select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        text.lang_id_expr(toks).alias("predicted_lang"),
    )


@register(
    "llm_text_fingerprint",
    oracle=f"""
        WITH d AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
        SELECT doc_id, {text.sql_fingerprint('toks')} AS fingerprint
        FROM d
    """,
    tags=("text",),
)
def llm_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling document fingerprint (mod 2^31-1)."""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        text.fingerprint_expr(text.tokens_expr(F.col("text"))).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# B30 — multimodal columns
# ---------------------------------------------------------------------------


@register(
    "llm_multimodal_meta",
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS byte_size,
               sha256(text) AS payload_sha256
        FROM documents
    """,
    tags=("multimodal",),
)
def llm_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata (size + sha256) computed JVM-side."""
    t = load_tables(spark, sf_dir)
    with_payload = multimodal.attach_binary_payload(t["documents"], "text")
    return with_payload.select(
        "doc_id",
        F.col("payload_meta.byte_size").alias("byte_size"),
        F.col("payload_meta.sha256").alias("payload_sha256"),
    )


@register(
    "llm_multimodal_features",
    oracle="""
        SELECT doc_id,
               ('0x'||substr(sha256(COALESCE(text,'')),1,8))::BIGINT
                   / 4294967295.0 AS f0,
               ('0x'||substr(sha256(COALESCE(text,'')),9,8))::BIGINT
                   / 4294967295.0 AS f1,
               ('0x'||substr(sha256(COALESCE(text,'')),17,8))::BIGINT
                   / 4294967295.0 AS f2,
               ('0x'||substr(sha256(COALESCE(text,'')),25,8))::BIGINT
                   / 4294967295.0 AS f3,
               CAST(octet_length(encode(COALESCE(text,''))) AS BIGINT)
                   AS n_bytes
        FROM documents
        ORDER BY doc_id
    """,
    tags=("multimodal",),
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (deterministic sha256-derived stand-in for the codec stage).  The
    feature vector is flattened to scalar columns f0..f3 for the harness
    (array cells break pandas canonicalizers — see b17), which also lets
    the sha256 arithmetic be checked hash-exact in SQL: feature i is
    digest bytes [4i, 4i+4) over the UTF-8 payload, divided by 2^32-1."""
    t = load_tables(spark, sf_dir)
    with_payload = multimodal.attach_binary_payload(t["documents"], "text")
    feat = multimodal.fake_feature_extract(with_payload, "doc_id")
    return feat.select(
        "doc_id",
        *[F.col("feature")[i].alias(f"f{i}") for i in range(4)],
        "n_bytes",
    ).orderBy("doc_id")


@register(
    "llm_text_token_counts",
    oracle=f"""
        SELECT doc_id,
               CAST(len({text.sql_tokens('text')}) AS BIGINT) AS ws_tokens,
               {text.sql_bpe_token_count('text')} AS bpe_tokens
        FROM documents
    """,
    tags=("text",),
)
def llm_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counts per document (the standard
    pair of corpus cost estimators)."""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        text.token_count_expr(F.col("text")).alias("ws_tokens"),
        text.bpe_token_count_expr(F.col("text")).alias("bpe_tokens"),
    )


@register(
    "llm_multimodal_frame_sample",
    oracle="""
        SELECT d.doc_id,
               CAST(t.i AS BIGINT) AS frame_idx,
               hex(encode(substring(d.text, CAST(t.i * 128 + 1 AS BIGINT),
                                    64)))
                 AS frame_hex
        FROM documents d,
             UNNEST(range(0, CAST(ceil(length(d.text) / 128.0) AS BIGINT)))
               AS t(i)
    """,
    tags=("multimodal",),
)
def llm_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads via row-expanding mapInPandas
    (64-byte frame every 128 bytes); byte-sliced deterministically so the
    oracle checks the full decode-sample plumbing.  The operator's raw
    ``frame`` BLOB is surfaced as uppercase hex (identical in Spark and
    DuckDB): BLOB cells are unhashable in pandas-based result
    canonicalizers (r9 driver red), so the registry contract is that
    every query output column is a scalar canonicalizable type."""
    t = load_tables(spark, sf_dir)
    with_payload = multimodal.attach_binary_payload(t["documents"], "text")
    return multimodal.frame_sample(with_payload, "doc_id").select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


def _ivf_oracle() -> str:
    return """
        WITH cents AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
          FROM embx embeddings WHERE vec_id < 16
        ),
        assigned AS (
          SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                 (SELECT c.centroid_id FROM cents c
                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                        c.cvec), 6) DESC,
                           c.centroid_id
                  LIMIT 1) AS cell
          FROM embx e
        ),
        q AS (SELECT vec_id AS query_id, v AS qv, cell
              FROM assigned WHERE vec_id < 20),
        scored AS (
          SELECT q.query_id, a.vec_id AS cand_id,
                 round(list_cosine_similarity(q.qv, a.v), 6) AS cos
          FROM q JOIN assigned a ON a.cell = q.cell AND a.vec_id <> q.query_id
        ),
        ranked AS (
          SELECT query_id, cand_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
          FROM scored
        )
        SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 10
    """


@register("llm_ann_ivf_probe", oracle=_ivf_oracle(), tags=("similarity",))
def llm_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: 16 fixed centroids, single-probe within the query's
    cell (the partition-pruned 100 TB layout); deterministic assignment so
    the DuckDB oracle reproduces the identical cells and ranking."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    return similarity.ivf_probe_topk(
        emb, "vec_id", "embedding", emb.filter(F.col("vec_id") < 20), 10
    )


@register(
    "llm_ann_ivf_multiprobe",
    oracle="""
        WITH cents AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
          FROM embx embeddings WHERE vec_id < 16
        ),
        assigned AS (
          SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                 (SELECT c.centroid_id FROM cents c
                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                        c.cvec), 6) DESC,
                           c.centroid_id
                  LIMIT 1) AS cell
          FROM embx e
        ),
        probes AS (
          SELECT q.vec_id AS query_id, q.embedding::DOUBLE[] AS qv,
                 c.centroid_id AS cell
          FROM embx q, cents c
          WHERE q.vec_id < 20
          QUALIFY ROW_NUMBER() OVER (
              PARTITION BY q.vec_id
              ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                    c.cvec), 6) DESC,
                       c.centroid_id) <= 2
        ),
        scored AS (
          SELECT p.query_id, a.vec_id AS cand_id,
                 round(list_cosine_similarity(p.qv, a.v), 6) AS cos
          FROM probes p JOIN assigned a
            ON a.cell = p.cell AND a.vec_id <> p.query_id
        ),
        ranked AS (
          SELECT query_id, cand_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
          FROM scored
        )
        SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 10
    """,
    tags=("similarity",),
)
def llm_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2 (the FAISS recall knob): each query searches
    its two nearest cells, recovering most single-probe cell-boundary
    misses at 2/16 of the exact cost.  Probe lists come from the literal
    centroid array per row — no model join; candidates join on cell as in
    single-probe and never duplicate (a candidate lives in one cell)."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    return similarity.ivf_multiprobe_topk(
        emb, "vec_id", "embedding", emb.filter(F.col("vec_id") < 20), 10, 2
    )


# ---------------------------------------------------------------------------
# B20 — Python UDF surface (scalar / grouped-agg / grouped-map / UDTF)
# ---------------------------------------------------------------------------


@register(
    "llm_udf_scalar_pandas",
    oracle="""
        SELECT doc_id,
               CAST(list_sum(list_transform(split(text, ''),
                    ch -> ord(ch))) AS BIGINT) AS ascii_sum
        FROM documents
    """,
    tags=("udf",),
)
def llm_udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (B20): per-doc code-point sum,
    exact integer arithmetic either side."""
    from ..functions.udfs import ascii_sum_udf

    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id", ascii_sum_udf(F.col("text")).alias("ascii_sum")
    )


@register(
    "llm_udf_grouped_agg",
    oracle=f"""
        SELECT lang,
               CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS total_tokens
        FROM documents GROUP BY lang
    """,
    tags=("udf",),
)
def llm_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (B20): exact per-language token total;
    Spark applies it per group with map-side Arrow batching."""
    from ..functions.udfs import token_sum_agg_udf
    from ..operators.text import token_count_expr

    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select("lang", token_count_expr(F.col("text")).alias("n"))
        .groupBy("lang")
        .agg(token_sum_agg_udf("n").alias("total_tokens"))
    )


@register(
    "llm_udf_grouped_map",
    oracle="""
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY length(text), doc_id) AS BIGINT) AS rank_in_group
        FROM documents
    """,
    tags=("udf",),
)
def llm_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (B20): per-language rank by document
    length, whole group as one pandas frame."""
    from ..functions.udfs import rank_in_group

    t = load_tables(spark, sf_dir)
    docs = t["documents"].withColumn("n_chars_o", F.length("text"))
    return rank_in_group(docs, "lang", "n_chars_o", "doc_id")


@register(
    "llm_udtf_sentences",
    oracle="""
        WITH s AS (
          SELECT doc_id, trim(part) AS sentence,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
          FROM (SELECT doc_id, UNNEST(string_split(text, '.')) AS part,
                       generate_subscripts(string_split(text, '.'), 1) AS pos
                FROM documents)
          WHERE trim(part) <> ''
        )
        SELECT doc_id, CAST(rn - 1 AS BIGINT) AS sentence_idx, sentence
        FROM s
    """,
    tags=("udf",),
)
def llm_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (B20, Spark 4): one document row lateral-joins into its
    ordered non-empty sentences."""
    from pyspark.sql.functions import udtf

    from ..functions.udfs import SentenceSplitUDTF

    load_tables(spark, sf_dir)
    split_udtf = udtf(
        SentenceSplitUDTF,
        returnType="doc_id bigint, sentence_idx bigint, sentence string",
    )
    spark.udtf.register("sentence_split", split_udtf)
    register_views_for_udtf(spark, sf_dir)
    return spark.sql(
        "SELECT s.doc_id, s.sentence_idx, s.sentence "
        "FROM documents d, LATERAL sentence_split(d.doc_id, d.text) s"
    )


def register_views_for_udtf(spark: SparkSession, sf_dir: str) -> None:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)


@register(
    "b10_two_phase_count_distinct",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
        FROM events GROUP BY event_type
    """,
    tags=("aggregate", "skew"),
)
def b10_two_phase_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-spread exact distinct count: COUNT(DISTINCT user_id) over a
    low-cardinality hot key via two-phase (key, x) pre-aggregation — the
    100 TB shape where the single-reducer-per-key plan falls over."""
    from ..operators.skew import two_phase_count_distinct

    t = load_tables(spark, sf_dir)
    return two_phase_count_distinct(t["events"], "event_type", "user_id")


@register(
    "b08_salted_agg",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type
    """,
    tags=("aggregate", "skew"),
)
def b08_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation over a hot key: partials per
    (key, salt), exact decimal merge per key.  Result is identical to the
    direct groupBy (decimal sums are order-independent)."""
    from ..functions.numeric import dbl, dec
    from ..operators.skew import salted_agg

    t = load_tables(spark, sf_dir)
    out = salted_agg(
        t["events"],
        "event_type",
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "sum_value_d": (F.sum(dec(F.col("value"))), F.sum("sum_value_d")),
        },
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        dbl(F.col("sum_value_d")).alias("sum_value"),
    )


def _cluster_oracle() -> str:
    # MATERIALIZED is load-bearing at scale: edges is referenced many
    # times (degree/iteration/closure terms) and DuckDB inlines plain
    # CTEs per reference — re-evaluating the whole shingle/MinHash pair
    # pipeline each time; at sf1 that spilled >76 GB of temp disk for a
    # 272-pair graph.  Materializing runs the pipeline exactly once.
    return f"""
        WITH RECURSIVE pairs AS MATERIALIZED (
          SELECT id_a, id_b FROM ({_minhash_oracle()})
        ),
        edges AS MATERIALIZED (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(u, v) AS (
          SELECT u, u FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        )
        SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u
    """


def _incremental_oracle() -> str:
    """Asymmetric (new snapshot vs existing corpus) MinHash-LSH dedup:
    existing = even doc ids, new = odd; candidates from cross-side band
    collisions only, verified with exact shingle-set Jaccard."""
    mh_exprs = ",\n           ".join(
        f"{sql_minhash_value('shingles', a, b)} AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_SEEDS)
    )
    mh_cols = [f"mh{i}" for i in range(len(MINHASH_SEEDS))]
    band_selects = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id, {j} AS band, {sql_band_key(mh_cols, j)} AS key FROM sig"
        for j in range(N_BANDS)
    )
    return f"""
        WITH {_SQL_JACCARD_CTES},
        sig AS (SELECT doc_id, shingles,
           {mh_exprs}
           FROM nonempty),
        bands AS (
        {band_selects}
        ),
        cand AS (SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS old_id
                 FROM bands a
                 JOIN bands b ON a.band = b.band AND a.key = b.key
                 WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
        inter2 AS (SELECT b.doc_id AS new_id, a.doc_id AS old_id,
                          COUNT(*) AS i
                   FROM ex a JOIN ex b ON a.s = b.s
                   WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
                   GROUP BY 1, 2),
        ver AS (SELECT c.new_id, c.old_id,
                       CAST(i.i AS DOUBLE)
                           / CAST(cb.n + ca.n - i.i AS DOUBLE) AS jaccard
                FROM cand c
                JOIN inter2 i ON i.new_id = c.new_id
                             AND i.old_id = c.old_id
                JOIN cnt ca ON ca.doc_id = c.old_id
                JOIN cnt cb ON cb.doc_id = c.new_id),
        hits AS (SELECT * FROM ver WHERE jaccard >= 0.8),
        best AS (SELECT new_id, old_id, jaccard FROM (
                   SELECT new_id, old_id, jaccard,
                          ROW_NUMBER() OVER (PARTITION BY new_id
                               ORDER BY jaccard DESC, old_id) AS rn
                   FROM hits) s WHERE rn = 1)
        SELECT d.doc_id, b.old_id AS dup_of, b.jaccard,
               (b.old_id IS NOT NULL) AS is_dup
        FROM documents d LEFT JOIN best b ON b.new_id = d.doc_id
        WHERE d.doc_id % 2 = 1
    """


@register(
    "llm_dedup_incremental",
    oracle=_incremental_oracle(),
    tags=("dedup", "incremental"),
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW snapshot against the EXISTING corpus —
    the don't-re-ingest pass a recurring crawl refresh runs before
    appending (existing = even doc ids, new = odd, standing in for the
    two snapshot versions).  Candidates come from asymmetric cross-side
    LSH band collisions only; each new doc reports its best existing
    match or survives.  See operators/dedup.py::incremental_neardup_flags
    for the scale notes (band shuffle carries keys only; candidate-bound
    verify)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    return dedup.incremental_neardup_flags(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        "doc_id",
        "text",
        0.8,
    )


@register("llm_dedup_cluster", oracle=_cluster_oracle(), tags=("dedup",))
def llm_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the MinHash-LSH pair
    graph (iterative min-label propagation) — the 'apply' step that turns
    pairwise matches into keep/drop groups; cluster_id = min doc_id in the
    component, matching a recursive-CTE oracle."""
    t = load_tables(spark, sf_dir)
    pairs = dedup.minhash_neardup_pairs(t["documents"], "doc_id", "text", 0.8)
    return dedup.connected_components(pairs)


@register(
    "llm_text_quality_filter",
    oracle=f"""
        WITH d AS (SELECT doc_id, lang, text, {_SQL_TOKS} AS toks
                   FROM documents)
        SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens
        FROM d
        WHERE len(toks) BETWEEN 20 AND 2000
          AND length(text) / len(toks) <= 12
          AND len(regexp_extract_all(COALESCE(text, ''), '[.,;:!?]')) * 4 <= len(toks)
    """,
    tags=("text",),
)
def llm_text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed quality gate (the Gopher-rules shape): token-count range,
    mean-token-length bound, punctuation-ratio bound — pure pushed-down
    Catalyst predicates over the feature expressions."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(
            "doc_id",
            "lang",
            F.length("text").alias("_nc"),
            text.doc_profile_pandas_expr(F.col("text")).alias("p"),
        )
        .select(
            "doc_id",
            "lang",
            "_nc",
            F.col("p.n_tokens").alias("n_tokens"),
            F.col("p.punct_count").alias("_np"),
        )
        .filter(
            F.col("n_tokens").between(20, 2000)
            & (F.col("_nc") / F.col("n_tokens") <= 12)
            & (F.col("_np") * 4 <= F.col("n_tokens"))
        )
        .select("doc_id", "lang", "n_tokens")
    )


@register(
    "llm_quality_classifier",
    oracle=f"""
        WITH d AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
        scored AS (
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                 {text.sql_classifier_score("toks")} AS logit_sum
          FROM d
        )
        SELECT doc_id, n_tokens, logit_sum,
               CASE WHEN n_tokens > 0
                    THEN {numeric.sql_round6_ratio("logit_sum",
                                                   "1000 * n_tokens")}
                    ELSE 0.0 END AS score,
               (logit_sum > 0) AS keep
        FROM scored
    """,
    tags=("text", "classifier"),
)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped quality classifier: feature-hash every token into
    CLASSIFIER_DIM buckets, score the doc with a literal integer weight
    vector (the "model" ships in the plan — no join, no Python UDF), keep
    docs with positive logit.  The integer logit sum is exact in both
    engines; only the final mean-per-token division is float — rounded
    with the tie-safe floor form (numeric.round6_ratio_expr), because
    an integer/integer ratio can land EXACTLY on a 6dp boundary (seed
    202 produced -10211/80000 = -0.1276375, which F.round and DuckDB
    round() split on).  At 100 TB this is a zero-shuffle map stage —
    exactly how model-based quality filtering (DCLM/fastText) runs over
    a corpus."""
    t = load_tables(spark, sf_dir)
    # n_tokens + logit off the shared Arrow profile (r13) — the md5
    # bucket hash runs once per unique token per worker instead of an
    # interpreted fold per occurrence
    p = t["documents"].select(
        "doc_id", text.doc_profile_pandas_expr(F.col("text")).alias("p")
    )
    n_tok = F.col("p.n_tokens")
    logit = F.col("p.logit_sum")
    return p.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        logit.alias("logit_sum"),
        F.when(
            n_tok > 0,
            numeric.round6_ratio_expr(logit, F.lit(1000) * n_tok),
        )
        .otherwise(F.lit(0.0))
        .alias("score"),
        (logit > 0).alias("keep"),
    )


def _sql_cms_oracle() -> str:
    from ..operators.sketches import CMS_DEPTH, sql_cms_bucket

    build = "\n    UNION ALL\n    ".join(
        f"SELECT {d} AS depth, {sql_cms_bucket('key', d)} AS bucket FROM toks"
        for d in range(CMS_DEPTH)
    )
    coords = "\n    UNION ALL\n    ".join(
        f"SELECT key, {d} AS depth, {sql_cms_bucket('key', d)} AS bucket "
        f"FROM exact"
        for d in range(CMS_DEPTH)
    )
    return f"""
        WITH toks AS (
          SELECT unnest({_SQL_TOKS}) AS key FROM documents),
        exact AS (SELECT key, COUNT(*) AS exact_n FROM toks GROUP BY key),
        total AS (SELECT COUNT(*) AS t FROM toks),
        cms AS (SELECT depth, bucket, COUNT(*) AS n FROM (
          {build}
        ) b GROUP BY depth, bucket),
        coords AS (
          {coords}
        ),
        est AS (SELECT key, MIN(COALESCE(c.n, 0)) AS cms_est
                FROM coords LEFT JOIN cms c USING (depth, bucket)
                GROUP BY key)
        SELECT e.key AS token, CAST(e.exact_n AS BIGINT) AS exact_n,
               CAST(s.cms_est AS BIGINT) AS cms_est,
               (s.cms_est >= e.exact_n) AS no_underestimate
        FROM exact e JOIN est s USING (key), total
        WHERE e.exact_n * 500 >= total.t
    """


@register(
    "llm_heavy_hitters_cms",
    oracle=_sql_cms_oracle(),
    tags=("text", "sketch"),
)
def llm_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the token stream: build a
    4 x 256 integer sketch in ONE bounded-shuffle aggregation (map-side
    combine caps the exchange at depth x width cells per partition),
    then point-estimate every token whose EXACT count clears the
    heavy-hitter bar (>= 1/500 of the stream) and prove the sketch's
    no-underestimate guarantee per token.  Deterministic md5-derived
    pairwise hashes make the whole sketch hash-exact against the oracle
    — the bounded-memory shape exact counting can't offer at 100 TB.
    See operators/sketches.py."""
    from ..operators import sketches

    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        F.explode(text.tokens_expr(F.col("text"))).alias("key")
    )
    exact = toks.groupBy("key").agg(F.count(F.lit(1)).alias("exact_n"))
    total = toks.agg(F.count(F.lit(1)).alias("t"))
    cms = sketches.cms_build(toks, "key")
    est = sketches.cms_estimate(toks, "key", cms)
    return (
        exact.join(est, "key")
        .crossJoin(F.broadcast(total))
        .filter(F.col("exact_n") * 500 >= F.col("t"))
        .select(
            F.col("key").alias("token"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") >= F.col("exact_n")).alias(
                "no_underestimate"
            ),
        )
    )


def _phash_media(docs: DataFrame) -> DataFrame:
    """Derive the (doc_id, text) media fixture for the pHash dedup query:
    the base corpus plus, for every 97th doc, an exact copy (+1_000_000)
    and a same-length single-char edit (+2_000_000).  Shared by the
    registry query and the pigeonhole test so brute-force and banded
    paths hash the exact same payload set; the oracle SQL in
    :func:`_sql_phash_pairs` mirrors this derivation verbatim."""
    base = docs.select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    sample = base.filter(F.col("doc_id") % 97 == 3)
    copies = sample.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    edits = sample.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(
            F.expr("substring(text, 1, greatest(length(text) - 1, 0))"),
            F.lit("#"),
        ).alias("text"),
    )
    return base.unionByName(copies).unionByName(edits)


def _sql_phash_pairs() -> str:
    from ..operators.multimodal import PHASH_BANDS, PHASH_BITS

    bits, bands = PHASH_BITS, PHASH_BANDS
    width = bits // bands
    return f"""
        WITH media AS (
          SELECT doc_id, COALESCE(text, '') AS text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, COALESCE(text, '')
          FROM documents WHERE doc_id % 97 = 3
          UNION ALL
          SELECT doc_id + 2000000,
                 substr(COALESCE(text, ''), 1,
                        greatest(length(COALESCE(text, '')) - 1, 0)) || '#'
          FROM documents WHERE doc_id % 97 = 3),
        raw AS (
          SELECT doc_id, base64(encode(text)) AS b
          FROM media),
        codes AS (
          SELECT doc_id, length(b) AS n,
                 list_transform(range(0, {bits}),
                     j -> ascii(substr(b, ((j * length(b)) // {bits}) + 1,
                                       1))) AS cl
          FROM raw),
        ph AS (
          SELECT doc_id,
                 CASE WHEN n = 0 THEN 0 ELSE CAST(list_sum(
                     list_transform(range(0, {bits}),
                         j -> CASE WHEN cl[j + 1] >= mean
                              THEN (CAST(1 AS BIGINT) << j)
                              ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
                 END AS phash
          FROM (SELECT doc_id, n, cl,
                       list_sum(cl) / {bits}.0 AS mean FROM codes) x),
        bands AS (
          SELECT doc_id, phash, t.j AS band,
                 (phash >> ({width} * t.j)) & {2 ** width - 1} AS key
          FROM ph, range(0, {bands}) t(j)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, a.phash AS pa,
                          b.doc_id AS id_b, b.phash AS pb
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.key = b.key
                      AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(pa, pb)) <= 6
    """


@register(
    "llm_multimodal_phash_dedup",
    oracle=_sql_phash_pairs(),
    tags=("multimodal", "dedup"),
)
def llm_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup for MEDIA payloads: the pHash stand-in
    (operators/multimodal.py::fake_phash — Arrow-batched mapInPandas, the
    real DCT hash swaps only the inner function) produces a 60-bit hash
    per payload; pairs within Hamming distance 6 are found EXACTLY via
    10-band pigeonhole blocking (any pair with hamming <= 9 shares at
    least one unchanged 6-bit band), the same guarantee design as the
    simhash text path.  Only (id, phash, band, key) rows shuffle — media
    bytes stay in the hash stage.  This is image/video dedup's shape:
    hash once per asset, join on bands, never compare pixels pairwise.

    The raw corpus has NO duplicate texts at any verification scale, so a
    plain run would certify an empty-vs-empty comparison.  The media
    fixture is therefore DERIVED in-query on both engines: every 97th doc
    contributes an exact copy (Hamming 0 — guaranteed pairs) and a
    same-length single-char edit (the evenly spaced sampler keeps every
    other position, so Hamming stays small), making the banded pair set
    provably non-empty at sf0.001/0.01/0.1."""
    from ..operators.multimodal import PHASH_BANDS, PHASH_BITS

    width = PHASH_BITS // PHASH_BANDS
    t = load_tables(spark, sf_dir)
    payload = multimodal.attach_binary_payload(
        _phash_media(t["documents"]), "text"
    )
    ph = multimodal.fake_phash(payload, "doc_id")
    entries = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright(F.col("phash"), width * j)
                        .bitwiseAND(F.lit(2 ** width - 1))
                        .alias("key"),
                    )
                    for j in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "phash", "bk.band", "bk.key")
    a = entries.select(
        F.col("doc_id").alias("id_a"),
        F.col("phash").alias("pa"),
        "band",
        "key",
    )
    b = entries.select(
        F.col("doc_id").alias("id_b"),
        F.col("phash").alias("pb"),
        "band",
        "key",
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "pa", "id_b", "pb")
        .distinct()
        .filter(ham <= 6)
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
    )


@register(
    "llm_sample_stratified",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE ({_SQL_H60.format(x="'salt1:' || CAST(doc_id AS VARCHAR)")}) % 100
              < CASE lang WHEN 'en' THEN 50 ELSE 80 END
    """,
    tags=("sampling",),
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction:
    per-language rates via a salted content-independent hash of the doc id
    — reproducible on any cluster size, no RNG state to coordinate, and
    re-running on grown data keeps previously-sampled ids stable."""
    from ..operators.hashing import hash60_expr

    t = load_tables(spark, sf_dir)
    bucket = hash60_expr(
        F.concat(F.lit("salt1:"), F.col("doc_id").cast("string"))
    ) % F.lit(100)
    rate = F.when(F.col("lang") == "en", F.lit(50)).otherwise(F.lit(80))
    return (
        t["documents"].filter(bucket < rate).select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# B27+ — benchmark decontamination (asymmetric n-gram containment)
# ---------------------------------------------------------------------------

_SQL_DECON_CTES = f"""
    toks AS (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, source,
           CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])
                ELSE []::VARCHAR[] END AS shingles
           FROM toks),
    ex AS (SELECT DISTINCT doc_id, source, s
           FROM (SELECT doc_id, source, unnest(shingles) AS s FROM sh)),
    bench AS (SELECT DISTINCT s FROM ex WHERE source IN ('src0', 'src1'))
"""


@register(
    "llm_decontaminate",
    oracle=f"""
        WITH {_SQL_DECON_CTES}
        SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM ex e JOIN bench b ON e.s = b.s
        WHERE e.source NOT IN ('src0', 'src1')
        GROUP BY e.doc_id
        ORDER BY n_shared DESC, e.doc_id
    """,
    tags=("dedup", "decontamination"),
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination: flag corpus documents sharing any
    word-3gram with a benchmark/eval set (here: sources src0+src1),
    reporting the distinct shared-gram count per document.

    Unlike pairwise near-dup dedup this is ASYMMETRIC: the benchmark side
    is tiny and fixed, so its distinct gram set broadcasts and the corpus
    side never shuffles — at 100 TB the scan streams once through a
    broadcast-hash semi join, no pair explosion.  (The canonical
    decontamination recipe — e.g. GPT-3 appendix C — uses 8-13-gram
    collision against eval sets; gram size is a constant here.)

    Optimization r13 (guide §2.4, remove shuffles outright): the family's
    old global ``(doc_id, source, s).distinct()`` exchange — measured as
    the dominant sf10 cost of every decontamination key — is replaced by
    per-document gram dedup inside the Arrow shingle pass
    (``distinct=True``).  doc_id is unique per documents row (generator
    invariant), so within-array dedup produces exactly the distinct
    (doc, gram) pairs with ZERO shuffle; the only exchanges left are the
    tiny bench-gram distinct and the map-combinable per-doc match count."""
    t = load_tables(spark, sf_dir)
    is_bench = F.col("source").isin("src0", "src1")
    d = dedup.spread(t["documents"])
    bench = (
        d.filter(is_bench)
        .select(
            F.explode(
                dedup.shingles_pandas_expr(F.col("text"), distinct=True)
            ).alias("s")
        )
        .distinct()
    )
    corpus = d.filter(~is_bench).select(
        "doc_id",
        F.explode(
            dedup.shingles_pandas_expr(F.col("text"), distinct=True)
        ).alias("s"),
    )
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy(F.col("n_shared").desc(), "doc_id")
    )


@register(
    "llm_text_repetition",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
          WHERE len({_SQL_TOKS}) > 0
        ),
        words AS (SELECT doc_id, unnest(toks) AS w FROM d),
        wc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w),
        ws AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_distinct, MAX(c) AS top_word_c
          FROM wc GROUP BY doc_id
        ),
        bgl AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1])) AS bg
          FROM d WHERE len(toks) >= 2
        ),
        bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgl GROUP BY doc_id, bg),
        bs AS (
          SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram_c
          FROM bc GROUP BY doc_id
        )
        SELECT ws.doc_id, ws.n_tokens,
               CAST(ws.n_distinct AS DOUBLE) / ws.n_tokens AS distinct_ratio,
               CAST(ws.top_word_c AS DOUBLE) / ws.n_tokens AS top_word_frac,
               CASE WHEN bs.n_bigrams IS NULL OR bs.n_bigrams = 0 THEN 0.0
                    ELSE CAST(bs.top_bigram_c AS DOUBLE) / bs.n_bigrams
               END AS top_bigram_frac
        FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
    """,
    tags=("text",),
)
def llm_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate features (distinct ratio, top-word and
    top-2-gram fractions) — the duplicate-content signals corpus quality
    filters gate on."""
    t = load_tables(spark, sf_dir)
    return text.repetition_features(t["documents"])


@register(
    "llm_text_pii_scrub",
    oracle=f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM({text.sql_pii_hits('c_name')}) AS BIGINT)
                   AS total_redactions,
               MIN({text.sql_pii_scrub('c_name')}) AS sample_scrubbed
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    tags=("text", "pii"),
)
def llm_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails + long digit runs) as a pure regexp pipeline,
    summarized per market segment.  The scrub itself is row-local
    (codegen'd regexp_replace, no shuffle); the aggregate exists so the
    oracle checks both the redacted text and the hit counts."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    return (
        c.select(
            "c_mktsegment",
            text.pii_hits_expr(F.col("c_name")).alias("hits"),
            text.pii_scrub_expr(F.col("c_name")).alias("scrubbed"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("hits").cast("long").alias("total_redactions"),
            F.min("scrubbed").alias("sample_scrubbed"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "llm_doc_chunking",
    oracle=text.sql_chunk_documents(chunk_tokens=64, overlap=16),
    tags=("text", "chunking"),
)
def llm_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 64-token chunks with 16-token overlap.
    Row-local (scan -> project -> generate, zero shuffles); output size is
    the only cost, exactly as a 100 TB chunking pass should behave."""
    t = load_tables(spark, sf_dir)
    return text.chunk_documents(t["documents"], chunk_tokens=64, overlap=16)


@register(
    "llm_pack_sequences",
    oracle="""
        WITH d AS (
          SELECT doc_id, source,
                 LEAST(len(regexp_extract_all(COALESCE(text, ''),
                                              '\\S+')), 2048) AS n_tokens
          FROM documents
        )
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(FLOOR(
                 (SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tokens) / 2048.0) AS BIGINT) AS seq_index
        FROM d
    """,
    tags=("text", "packing"),
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-striped packing of documents into 2048-token training
    sequences per source stream — running-sum bucketing, one shuffle on
    the stream key, fully parallel.  Sequences may exceed the budget by
    up to one clamped document at stride boundaries; the strict variant
    is llm_pack_nextfit."""
    t = load_tables(spark, sf_dir)
    return text.pack_sequences(t["documents"], budget_tokens=2048)


@register(
    "llm_pack_nextfit",
    oracle=f"""
        WITH RECURSIVE d AS (
          SELECT doc_id, source,
                 CAST(LEAST(len({_SQL_TOKS}), 2048) AS BIGINT) AS n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                     AS rn
          FROM documents
        ),
        pack AS (
          SELECT source, rn, doc_id, n_tokens,
                 CAST(0 AS BIGINT) AS seq_index, n_tokens AS fill
          FROM d WHERE rn = 1
          UNION ALL
          SELECT nxt.source, nxt.rn, nxt.doc_id, nxt.n_tokens,
                 CASE WHEN p.fill + nxt.n_tokens > 2048
                      THEN p.seq_index + 1 ELSE p.seq_index END,
                 CASE WHEN p.fill + nxt.n_tokens > 2048
                      THEN nxt.n_tokens ELSE p.fill + nxt.n_tokens END
          FROM pack p JOIN d nxt
            ON nxt.source = p.source AND nxt.rn = p.rn + 1
        )
        SELECT doc_id, source, n_tokens, seq_index
        FROM pack
        ORDER BY source, doc_id
    """,
    tags=("text", "packing"),
)
def llm_pack_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE next-fit packing (hard <= 2048-token guarantee per sequence):
    sequential Arrow pass per source via applyInPandas — see
    operators/text.pack_sequences_nextfit for the scale contract.  The
    oracle replays the same fold as a DuckDB recursive CTE (one
    iteration per row rank within each source)."""
    t = load_tables(spark, sf_dir)
    return (
        text.pack_sequences_nextfit(t["documents"], budget_tokens=2048)
        .orderBy("source", "doc_id")
    )


_KMEANS_ITERS = 3


def _sql_kmeans_ctes(iters: int, scaled_k: bool = False) -> str:
    """CTE chain mirroring the deterministic Lloyd loop of
    similarity.lloyd_kmeans_centroids: first-k-by-id init (k = 16
    fixed, or the data-scaled semantic_cell_count formula when
    ``scaled_k``), per-iteration argmax assignment (rounded-6dp cosine,
    lowest cell wins ties) and decimal-domain per-dimension means —
    bitwise the same model.  Ends at ``af`` = (vec_id, v, cell) final
    assignment (MATERIALIZED: the semantic-dedup consumer references it
    three times — the r10 CTE-reinlining lesson)."""
    if scaled_k:
        init = [
            "kc AS (SELECT GREATEST(16, COUNT(*) // 512) AS k FROM e)",
            "c0 AS (SELECT vec_id AS cell, v AS cvec FROM e, kc "
            "WHERE vec_id < kc.k)",
        ]
    else:
        init = [
            "c0 AS (SELECT vec_id AS cell, v AS cvec FROM e "
            "WHERE vec_id < 16)",
        ]
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embx embeddings)",
        *init,
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""a{i} AS (
          SELECT vec_id, v, cell FROM (
            SELECT e.vec_id, e.v, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY round(list_cosine_similarity(e.v, c.cvec),
                                       6) DESC, c.cell) AS rn
            FROM e CROSS JOIN c{i - 1} c) s WHERE rn = 1)"""
        )
        ctes.append(
            f"""u{i} AS (
          SELECT cell, t.i AS idx,
                 CAST(SUM(CAST(v[t.i] AS DECIMAL(27,10))) AS DOUBLE)
                     / COUNT(*) AS m
          FROM a{i}, range(1, {_EMB_DIM + 1}) t(i)
          GROUP BY cell, t.i)"""
        )
        ctes.append(
            f"c{i} AS (SELECT cell, list(m ORDER BY idx) AS cvec "
            f"FROM u{i} GROUP BY cell)"
        )
    ctes.append(
        f"""af AS MATERIALIZED (
          SELECT vec_id, v, cell FROM (
            SELECT e.vec_id, e.v, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY round(list_cosine_similarity(e.v, c.cvec),
                                       6) DESC, c.cell) AS rn
            FROM e CROSS JOIN c{iters} c) s WHERE rn = 1)"""
    )
    return ",\n".join(ctes)


def _sql_kmeans_oracle(iters: int = _KMEANS_ITERS) -> str:
    """Per-cell population of the Lloyd-trained IVF (llm_ann_ivf_kmeans
    oracle — see :func:`_sql_kmeans_ctes`)."""
    return (
        "WITH " + _sql_kmeans_ctes(iters) + "\n"
        "SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors "
        "FROM af GROUP BY cell ORDER BY cell"
    )


@register(
    "llm_ann_ivf_kmeans",
    oracle=_sql_kmeans_oracle(),
    tags=("similarity", "iterative"),
)
def llm_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED centroids: deterministic distributed Lloyd
    iterations (first-16-by-id init, decimal-exact means — see
    operators/similarity.py::lloyd_kmeans_centroids) produce the coarse
    quantizer, then every vector is assigned by the same literal-inline
    argmax as the fixed-centroid IVF.  The whole training loop is
    mirrored in the DuckDB oracle, making the trained model HASH-EXACT —
    no rows-only carve-out; the MLlib-seeded variant remains available as
    similarity.kmeans_centroids for deployments that prefer k-means‖
    init over reproducibility."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    cents = similarity.lloyd_kmeans_centroids(
        emb, "vec_id", "embedding", iters=_KMEANS_ITERS
    )
    cells = similarity.ivf_cells_with(emb, "vec_id", "embedding", cents)
    return (
        cells.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cell")
    )


_SEMTRAIN_ITERS = 2  # Lloyd iterations for the trained semantic-dedup
# quantizer (2 suffices for a coarse partitioner; each extra iteration
# doubles the oracle's unrolled cross-join work)


@register(
    "llm_dedup_semantic_trained",
    oracle=(
        "WITH {CTES},\n"
        """        dropped AS (
          SELECT DISTINCT b.vec_id
          FROM af a JOIN af b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4)
        SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
        FROM af a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """
    ).replace("{CTES}", _sql_kmeans_ctes(_SEMTRAIN_ITERS, scaled_k=True)),
    tags=("dedup", "similarity", "iterative", "training"),
)
def llm_dedup_semantic_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup with TRAINED centroids — the full unification VERDICT
    r12 Next #2 pointed at, as a HASH-EXACT registry key: the
    deterministic distributed Lloyd loop (llm_ann_ivf_kmeans's
    machinery) trains a DATA-SCALED quantizer (k = semantic_cell_count,
    uncapped since r13), and semantic_dedup consumes the trained model
    through its ``centroids=`` hook — better-balanced cells than the
    first-k-by-id stand-in at exactly the same plan shape, the upgrade
    path a production SemDeDup deployment takes.

    Exactness: the whole pipeline — init, per-iteration decimal-domain
    means, final assignment, within-cell pairwise drop — is mirrored in
    one unrolled DuckDB oracle (no rows-only carve-out).  Scale shape:
    training is _SEMTRAIN_ITERS bounded passes (assignment map-side
    against the broadcast model, update one (cell, dim) partial
    aggregation, collect = the k x dim model); dedup pair work is
    within-cell only, ~N x 512 by the scaled cell count; beyond the
    256-literal bound both training and dedup assignments ride the
    Arrow broadcast path (bitwise-identical fold)."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    k = similarity.semantic_cell_count(
        plan_count(emb, sf_dir, "embeddings_nonnull")
    )
    cents = similarity.lloyd_kmeans_centroids(
        emb, "vec_id", "embedding", k=k, iters=_SEMTRAIN_ITERS
    )
    return similarity.semantic_dedup(
        emb, "vec_id", "embedding", 0.4, centroids=cents
    )


@register(
    "llm_corpus_audit",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE text IS NULL) AS n_null_text,
               COUNT(*) FILTER (WHERE text IS NOT NULL
                                AND trim(text) = '') AS n_blank_text,
               COUNT(*) - COUNT(DISTINCT doc_id) AS n_dupe_ids,
               COUNT(*) FILTER (WHERE lang NOT IN ('en','es','de','fr'))
                   AS n_unexpected_lang,
               COUNT(*) FILTER (WHERE n_chars != length(text))
                   AS n_bad_char_counts,
               CAST(MIN(length(text)) AS BIGINT) AS min_len,
               CAST(MAX(length(text)) AS BIGINT) AS max_len
        FROM documents
    """,
    tags=("text", "quality"),
)
def llm_corpus_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style corpus audit in ONE aggregation pass: null /
    blank text, duplicate ids, unexpected language codes, metadata drift
    (stored n_chars vs actual), and length bounds.  Conditional aggregates
    partial-combine map-side, so the audit costs one scan regardless of
    corpus size — the pre-flight check every training-data refresh runs."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("text").isNull(), 1)).alias("n_null_text"),
        F.count(
            F.when(
                F.col("text").isNotNull() & (F.trim("text") == ""), 1
            )
        ).alias("n_blank_text"),
        (F.count(F.lit(1)) - F.count_distinct("doc_id")).alias("n_dupe_ids"),
        F.count(
            F.when(~F.col("lang").isin("en", "es", "de", "fr"), 1)
        ).alias("n_unexpected_lang"),
        F.count(
            F.when(F.col("n_chars") != F.length("text"), 1)
        ).alias("n_bad_char_counts"),
        F.min(F.length("text")).cast("long").alias("min_len"),
        F.max(F.length("text")).cast("long").alias("max_len"),
    )


@register(
    "llm_dedup_survivors",
    oracle=f"""
        WITH comps AS ({_cluster_oracle()}),
        toks AS (
          SELECT doc_id, len({_SQL_TOKS}) AS n_tokens FROM documents
        ),
        labeled AS (
          SELECT t.doc_id, COALESCE(c.cluster_id, t.doc_id) AS cluster_id,
                 t.n_tokens
          FROM toks t LEFT JOIN comps c ON t.doc_id = c.doc_id
        ),
        ranked AS (
          SELECT doc_id, cluster_id, n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY cluster_id
                     ORDER BY n_tokens DESC, doc_id) AS rn
          FROM labeled
        )
        SELECT doc_id, cluster_id, CAST(n_tokens AS BIGINT) AS n_tokens
        FROM ranked WHERE rn = 1
        ORDER BY cluster_id
    """,
    tags=("dedup",),
)
def llm_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup SELECTION: near-dup pairs -> connected components
    -> keep ONE canonical document per cluster (longest by token count,
    ties to the lower id); unclustered docs survive as their own cluster.
    This is the step that actually shrinks the corpus — detect, cluster,
    then select.  One extra shuffle on cluster_id over the clustering
    cost; the survivor window carries (doc_id, cluster_id, n_tokens)
    triples only, never text."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    pairs = dedup.minhash_neardup_pairs(t["documents"], "doc_id", "text", 0.8)
    comps = dedup.connected_components(pairs)
    toks = t["documents"].select(
        "doc_id", text.token_count_expr(F.col("text")).alias("n_tokens")
    )
    labeled = (
        toks.join(comps, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id")
    )
    return (
        labeled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_id", F.col("n_tokens").cast("long").alias("n_tokens"))
        .orderBy("cluster_id")
    )


_TS_DAYS = 31  # events span 2024-01-01 .. 2024-01-31
# Hard cap on the broadcast query side of b28_timeseries_similarity —
# far above the 5 query users the predicate selects at every test scale
# (so it never drops rows there), but small enough that the broadcast
# stays KB-sized even if the query predicate is ever loosened.
_TS_MAX_QUERIES = 64


@register(
    "b28_timeseries_similarity",
    oracle=f"""
        WITH days AS (SELECT unnest(generate_series(0, {_TS_DAYS - 1})) AS d),
        daily AS (
          SELECT user_id,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
                 CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS v
          FROM events GROUP BY 1, 2
        ),
        dense AS (
          SELECT u.user_id, dy.d, COALESCE(da.v, 0.0) AS v
          FROM (SELECT DISTINCT user_id FROM events) u
          CROSS JOIN days dy
          LEFT JOIN daily da ON da.user_id = u.user_id AND da.d = dy.d
        ),
        vec AS (
          SELECT user_id, list(v ORDER BY d) AS arr FROM dense GROUP BY user_id
        ),
        stat AS (
          SELECT user_id, arr, list_sum(arr) / {_TS_DAYS}.0 AS mu FROM vec
        ),
        norm AS (
          SELECT user_id,
                 list_transform(arr, x -> (x - mu) /
                   sqrt(list_sum(list_transform(arr,
                        y -> (y - mu) * (y - mu))) / {_TS_DAYS}.0)) AS z
          FROM stat
        ),
        scored AS (
          SELECT q.user_id AS query_user, c.user_id AS cand_user,
                 ROUND(sqrt(list_sum(list_transform(
                     generate_series(1, {_TS_DAYS}),
                     i -> (q.z[i] - c.z[i]) * (q.z[i] - c.z[i])))), 6) AS dist
          FROM norm q JOIN norm c ON q.user_id < 5 AND c.user_id != q.user_id
        )
        SELECT query_user, cand_user, dist,
               CAST(rnk AS BIGINT) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_user
                      ORDER BY dist, cand_user) AS rnk
          FROM scored
        ) WHERE rnk <= 5
        ORDER BY query_user, rank
    """,
    tags=("similarity", "timeseries"),
)
def b28_timeseries_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (z-normalized euclidean over per-user
    daily activity vectors; cf. the streaming time-series similarity line
    of work, EDBT 2019): build each user's dense 31-day value series, z-
    normalize, broadcast the query users, rank candidates per query.

    Scale shape: the series build is one shuffle on user_id carrying
    (user, day, decimal-sum) triples; vectors are |days| doubles per user;
    the query side is broadcast so the candidate corpus never reshuffles;
    the ranking exchange carries (query, cand, dist) only.  All arithmetic
    is sequential same-order folds in both engines, so the oracle matches
    bitwise before the 6dp round."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    day = F.datediff(
        ts_event_time(ev).cast("date"), F.lit("2024-01-01").cast("date")
    )
    daily = (
        ev.select("user_id", day.alias("d"), "value")
        .groupBy("user_id", "d")
        .agg(dbl(F.sum(dec("value", 14, 4))).alias("v"))
    )
    vec = daily.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("d", "v"))).alias("m")
    ).select(
        "user_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(_TS_DAYS - 1)),
            lambda d: F.coalesce(F.element_at("m", d), F.lit(0.0)),
        ).alias("arr"),
    )
    zero = F.lit(0.0)
    mu = F.aggregate("arr", zero, lambda a, x: a + x) / F.lit(float(_TS_DAYS))
    stat = vec.select("user_id", "arr", mu.alias("mu"))
    var = F.aggregate(
        "arr", zero, lambda a, y: a + (y - F.col("mu")) * (y - F.col("mu"))
    ) / F.lit(float(_TS_DAYS))
    norm = stat.select(
        "user_id",
        F.transform(
            "arr", lambda x: (x - F.col("mu")) / F.sqrt(var)
        ).alias("z"),
    )
    # BROADCAST CONTRACT (mirrors operators/similarity.py's exact-ANN
    # bound): the query side must stay driver/executor-memory sized —
    # the crossJoin below is a BroadcastNestedLoopJoin whose cost is
    # |corpus| x |queries|.  The predicate keeps it tiny here, but the
    # limit makes the bound STRUCTURAL rather than an assumption about
    # the predicate's selectivity: at most _TS_MAX_QUERIES z-vectors
    # (~31 doubles each) are ever broadcast, whatever the filter says.
    q = F.broadcast(
        norm.filter(F.col("user_id") < 5)
        .limit(_TS_MAX_QUERIES)
        .select(F.col("user_id").alias("query_user"), F.col("z").alias("qz"))
    )
    c = norm.select(F.col("user_id").alias("cand_user"), F.col("z").alias("cz"))
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with("qz", "cz", lambda x, y: (x - y) * (x - y)),
                zero,
                lambda a, x: a + x,
            )
        ),
        6,
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("cand_user") != F.col("query_user"))
        .select("query_user", "cand_user", dist.alias("dist"))
    )
    w = Window.partitionBy("query_user").orderBy("dist", "cand_user")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_user", "cand_user", "dist", "rank")
        .orderBy("query_user", "rank")
    )


@register(
    "llm_multimodal_resize",
    oracle="""
        SELECT doc_id,
               substring(hex(repeat(encode(text),
                   CAST(CEIL(32.0 / octet_length(encode(text))) AS INT))),
                   1, 64) AS resized_hex,
               4 AS out_w, 8 AS out_h,
               CAST(32 AS BIGINT) AS out_bytes,
               sha256(text) AS src_sha256
        FROM documents
        WHERE length(text) > 0
        ORDER BY doc_id
    """,
    tags=("multimodal",),
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-stage plumbing with an EXACT oracle: the deterministic
    stand-in transform (repeat/truncate to target byte count + source
    sha256) is byte-reproducible in SQL, so unlike the feature extractor
    this mapInPandas stage gets a full hash check — schema, Arrow
    batching, and row alignment all verified.  The oracle operates on
    UTF-8 bytes (encode/octet_length, truncation directly in the hex
    domain), matching the operator for non-ASCII text where char count
    != byte count.  The operator's raw ``resized`` BLOB is surfaced as
    uppercase hex (identical in Spark and DuckDB) because BLOB cells are
    unhashable in pandas-based canonicalizers (r9 driver red)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].filter(F.length("text") > 0)
    with_payload = multimodal.attach_binary_payload(docs, "text", "image/png")
    return (
        multimodal.fake_resize(with_payload, "doc_id", 4, 8)
        .select(
            "doc_id",
            F.hex("resized").alias("resized_hex"),
            "out_w",
            "out_h",
            "out_bytes",
            "src_sha256",
        )
        .orderBy("doc_id")
    )


@register(
    "llm_text_tfidf",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
          WHERE len({_SQL_TOKS}) > 0
        ),
        n_docs AS (SELECT COUNT(*) AS n FROM d),
        tf AS (
          SELECT doc_id, unnest(toks) AS term FROM d
        ),
        tfc AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term
        ),
        df AS (
          SELECT term, COUNT(*) AS df FROM tfc GROUP BY term
        ),
        scored AS (
          SELECT t.doc_id, t.term,
                 ROUND(t.tf * ln(CAST(n.n AS DOUBLE) / d2.df), 9) AS tfidf
          FROM tfc t JOIN df d2 ON t.term = d2.term CROSS JOIN n_docs n
        )
        SELECT doc_id, term, tfidf, CAST(rnk AS BIGINT) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY tfidf DESC, term) AS rnk
          FROM scored
        ) WHERE rnk <= 3
        ORDER BY doc_id, rank
    """,
    tags=("text", "tfidf"),
)
def llm_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: term frequency via explode +
    groupBy (map-side combinable), document frequency as a second
    aggregate over the SAME (doc, term) relation, idf joined back
    broadcast (|vocabulary| rows).  |corpus| comes from a broadcast
    1-row aggregate cross-joined in — no driver-side count(), so the
    whole thing is ONE Spark job.  The shuffles carry (doc, term, count)
    triples — corpus-linear; ln() is IEEE-identical in both engines so
    the oracle matches bitwise before the 9dp round."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.col("text"))
    base = (
        t["documents"]
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
    )
    # |corpus| as a 1-row broadcast relation, not a driver .count() —
    # same double arithmetic, one job instead of two passes with a
    # driver sync between them.
    n_docs_df = base.agg(F.count(F.lit(1)).alias("n_docs"))
    tfc = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tfc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tfc.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(
                    F.col("n_docs").cast("double")
                    / F.col("df").cast("double")
                ),
                9,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    )


@register(
    "llm_text_bigram_lm",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
          WHERE len({_SQL_TOKS}) >= 2
        ),
        bg AS (
          SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                        i -> [toks[i], toks[i + 1]])) AS pair
          FROM d
        ),
        counts AS (
          SELECT pair[1] AS w1, pair[2] AS w2, COUNT(*) AS n
          FROM bg GROUP BY 1, 2
        ),
        tot AS (SELECT w1, SUM(n) AS total FROM counts GROUP BY w1)
        SELECT c.w1, c.w2,
               floor(CAST(c.n AS DOUBLE) / CAST(tot.total AS DOUBLE)
                     * 1000000000.0 + 0.5) / 1000000000.0 AS p,
               CAST(rnk AS BIGINT) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY w1
                      ORDER BY n DESC, w2) AS rnk
          FROM counts
        ) c JOIN tot ON c.w1 = tot.w1
        WHERE rnk <= 3
        ORDER BY c.w1, rank
    """,
    tags=("text", "lm"),
)
def llm_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model statistics: P(w2|w1) for the top-3
    continuations of every token.  Transition counts explode to
    (w1, w2) pairs with map-side combine; the conditional normalizer is
    a second aggregate over the SAME pair relation — two corpus-linear
    shuffles, nothing quadratic.  This is the n-gram-LM table a
    perplexity-based quality filter scores against."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.col("text"))
    base = (
        t["documents"].select(toks.alias("toks")).filter(F.size("toks") >= 2)
    )
    pairs = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i + 1).alias("w1"),
                    F.element_at(F.col("toks"), i + 2).alias("w2"),
                ),
            )
        ).alias("pair")
    ).select("pair.w1", "pair.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("w1").agg(F.sum("n").alias("total"))
    w = Window.partitionBy("w1").orderBy(F.col("n").desc(), "w2")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .join(F.broadcast(tot), "w1")
        .select(
            "w1",
            "w2",
            numeric.roundf_expr(
                F.col("n").cast("double") / F.col("total").cast("double"),
                9,
            ).alias("p"),
            "rank",
        )
        .orderBy("w1", "rank")
    )


@register(
    "llm_text_inverted_index",
    oracle=f"""
        WITH d AS (
          SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
        ),
        post AS (
          SELECT DISTINCT unnest(toks) AS term, doc_id FROM d
        )
        SELECT term,
               CAST(COUNT(*) AS BIGINT) AS df,
               array_to_string(list(doc_id ORDER BY doc_id), ',')
                   AS postings
        FROM post
        GROUP BY term
        HAVING COUNT(*) >= 100
        ORDER BY term
    """,
    tags=("text", "index"),
)
def llm_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction (term -> sorted posting list) for the
    common-term slice (df >= 100): distinct (term, doc) postings shuffle
    once on term; posting lists build with collect_list + array_sort so
    the result is partition-order-independent.  At 100 TB the HAVING
    keeps hot terms' lists bounded for the oracle; real indexes shard
    postings by (term, block).  The posting list is surfaced as a
    comma-joined string: LIST cells (numpy arrays after collect) are
    unhashable in pandas-based canonicalizers (r9 driver red), so the
    registry contract is scalar output columns only."""
    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.col("text"))
    post = (
        t["documents"]
        .select("doc_id", F.explode(toks).alias("term"))
        .distinct()
    )
    return (
        post.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_sort(F.collect_list("doc_id")).alias("postings"),
        )
        .filter(F.col("df") >= 100)
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.array_join(F.col("postings").cast("array<string>"), ",").alias(
                "postings"
            ),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# B28+ — quantized & filtered similarity search (round 4)
# ---------------------------------------------------------------------------

_SQL_SQ8_CTES = f"""
    stats AS (
        SELECT dim, MIN(x) AS mn, MAX(x) AS mx
        FROM (SELECT unnest(embedding::DOUBLE[]) AS x,
                     generate_subscripts(embedding, 1) AS dim
              FROM embx embeddings)
        GROUP BY dim),
    model AS (
        SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs
        FROM stats),
    quant AS (
        SELECT vec_id,
               list_transform(range(1, {_EMB_DIM + 1}), i ->
                   CASE WHEN mxs[i] = mns[i] THEN 0
                        ELSE CAST(least(255, greatest(0,
                             floor((embedding[i]::DOUBLE - mns[i]) * 255.0
                                   / (mxs[i] - mns[i])))) AS INT) END) AS qv
        FROM embx embeddings, model)
"""


@register(
    "llm_ann_sq8",
    oracle=f"""
        WITH {_SQL_SQ8_CTES},
        q AS (SELECT vec_id AS query_id, qv AS qq FROM quant WHERE vec_id < 20),
        c AS (SELECT vec_id AS cand_id, qv AS cq FROM quant),
        scored AS (SELECT query_id, cand_id,
                          CAST(list_sum(list_transform(range(1, {_EMB_DIM + 1}), i ->
                               CAST((qq[i] - cq[i]) * (qq[i] - cq[i])
                                    AS BIGINT))) AS BIGINT) AS qdist
                   FROM q, c WHERE cand_id <> query_id),
        ranked AS (SELECT query_id, cand_id, qdist,
                          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY qdist ASC, cand_id) AS BIGINT) AS rank
                   FROM scored)
        SELECT query_id, cand_id, qdist, rank FROM ranked WHERE rank <= 10
    """,
    tags=("similarity",),
)
def llm_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized top-k: per-dim (min,max) trained in one
    distributed pass (the 64-row collect IS the model, inlined as plan
    literals), vectors quantized to 0..255 ints (4x memory cut vs
    float32), ranking on exact integer squared-L2 — no float rounding in
    the ranking, so the DuckDB oracle is hash-exact."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    mins, maxs = similarity.sq8_train(emb, "embedding")
    return similarity.sq8_topk(
        emb, "vec_id", "embedding",
        emb.filter(F.col("vec_id") < 20), mins, maxs, 10,
    )


_PQ_SUB = 4
_PQ_CODES = 16
_PQ_SUBLEN = _EMB_DIM // _PQ_SUB


def _sql_pq_ctes() -> str:
    """Shared PQ oracle CTEs: positional-code codebooks per subspace,
    rounded-6dp squared-L2 (the dot-product identity, bitwise the Spark
    fold arithmetic), argmin codes per vector."""
    parts = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embx embeddings)",
        f"cb AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v "
        f"FROM e WHERE vec_id < {_PQ_CODES})",
    ]
    for s in range(_PQ_SUB):
        lo, hi = s * _PQ_SUBLEN + 1, (s + 1) * _PQ_SUBLEN
        parts.append(
            f"cb{s} AS (SELECT code, v[{lo}:{hi}] AS c FROM cb)"
        )
        parts.append(
            f"""d{s} AS (
              SELECT e.vec_id, cb.code,
                     round(list_dot_product(e.v[{lo}:{hi}], e.v[{lo}:{hi}])
                           - 2.0 * list_dot_product(e.v[{lo}:{hi}], cb.c)
                           + list_dot_product(cb.c, cb.c), 6) AS d
              FROM e CROSS JOIN cb{s} cb)"""
        )
        parts.append(
            f"""b{s} AS (
              SELECT vec_id, code FROM (
                SELECT vec_id, code,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d, code) AS rn
                FROM d{s}) s WHERE rn = 1)"""
        )
    joins = " ".join(
        f"JOIN b{s} ON b{s}.vec_id = e.vec_id" for s in range(_PQ_SUB)
    )
    sel = ", ".join(f"b{s}.code AS c{s}" for s in range(_PQ_SUB))
    parts.append(
        f"codes AS (SELECT e.vec_id, {sel} FROM e {joins})"
    )
    return ",\n".join(parts)


@register(
    "llm_ann_pq_encode",
    oracle=f"""
        WITH {_sql_pq_ctes()}
        SELECT vec_id, {", ".join(
            f"CAST(c{s} AS BIGINT) AS c{s}" for s in range(_PQ_SUB)
        )}
        FROM codes
    """,
    tags=("similarity", "compression"),
)
def llm_ann_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: 64 floats -> 4 codebook ids (argmin
    rounded squared-L2 per contiguous subspace, deterministic first-16
    codebooks).  Pure map stage — codebooks ship as plan literals; at
    100 TB the encoded table is the 64x-smaller artifact every ADC query
    scans instead of the embeddings.  Trained-codebook upgrade =
    lloyd_kmeans_centroids per subspace, same plan shape."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    cbs = similarity.pq_codebooks(
        emb, "vec_id", "embedding", _PQ_SUB, _PQ_CODES
    )
    return similarity.pq_encode(emb, "vec_id", "embedding", cbs)


@register(
    "llm_ann_pq_adc",
    oracle=f"""
        WITH {_sql_pq_ctes()},
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        {",".join(
            f'''dt{s} AS (
              SELECT q.query_id, cb.code,
                     round(list_dot_product(
                               q.qv[{s * _PQ_SUBLEN + 1}:{(s + 1) * _PQ_SUBLEN}],
                               q.qv[{s * _PQ_SUBLEN + 1}:{(s + 1) * _PQ_SUBLEN}])
                           - 2.0 * list_dot_product(
                               q.qv[{s * _PQ_SUBLEN + 1}:{(s + 1) * _PQ_SUBLEN}],
                               cb.c)
                           + list_dot_product(cb.c, cb.c), 6) AS d
              FROM q CROSS JOIN cb{s} cb)'''
            for s in range(_PQ_SUB)
        )},
        scored AS (
          SELECT dt0.query_id, c.vec_id AS cand_id,
                 dt0.d + dt1.d + dt2.d + dt3.d AS dist
          FROM codes c
          JOIN dt0 ON dt0.code = c.c0
          JOIN dt1 ON dt1.code = c.c1 AND dt1.query_id = dt0.query_id
          JOIN dt2 ON dt2.code = c.c2 AND dt2.query_id = dt0.query_id
          JOIN dt3 ON dt3.code = c.c3 AND dt3.query_id = dt0.query_id
          WHERE c.vec_id <> dt0.query_id),
        ranked AS (
          SELECT query_id, cand_id, dist,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY dist ASC, cand_id) AS BIGINT) AS rank
          FROM scored)
        SELECT query_id, cand_id, dist, rank FROM ranked WHERE rank <= 5
    """,
    tags=("similarity", "compression"),
)
def llm_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k: each query precomputes one
    64-entry distance table (broadcast array column); candidate distance
    is 4 table lookups + 3 adds over the CODE columns — the corpus scan
    never touches the embeddings.  Deterministic codebooks + the
    dot-product identity make the approximate ranking hash-exact against
    the mirrored oracle."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    cbs = similarity.pq_codebooks(
        emb, "vec_id", "embedding", _PQ_SUB, _PQ_CODES
    )
    return similarity.pq_adc_topk(
        emb, "vec_id", "embedding",
        emb.filter(F.col("vec_id") < 10), cbs, 5,
    )


@register(
    "llm_ann_ivfpq",
    oracle=f"""
        WITH {_sql_pq_ctes()},
        cents2 AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
          FROM embx embeddings WHERE vec_id < 16
        ),
        assigned AS (
          SELECT x.vec_id,
                 (SELECT c.centroid_id FROM cents2 c
                  ORDER BY round(list_cosine_similarity(x.v, c.cvec), 6)
                               DESC,
                           c.centroid_id
                  LIMIT 1) AS cell
          FROM e x
        ),
        q AS (SELECT a.vec_id AS query_id, e.v AS qv, a.cell
              FROM assigned a JOIN e ON e.vec_id = a.vec_id
              WHERE a.vec_id < 10),
        {",".join(
            f'''dt{s} AS (
              SELECT q.query_id, cb.code,
                     round(list_dot_product(
                               q.qv[{s * _PQ_SUBLEN + 1}:{(s + 1) * _PQ_SUBLEN}],
                               q.qv[{s * _PQ_SUBLEN + 1}:{(s + 1) * _PQ_SUBLEN}])
                           - 2.0 * list_dot_product(
                               q.qv[{s * _PQ_SUBLEN + 1}:{(s + 1) * _PQ_SUBLEN}],
                               cb.c)
                           + list_dot_product(cb.c, cb.c), 6) AS d
              FROM q CROSS JOIN cb{s} cb)'''
            for s in range(_PQ_SUB)
        )},
        scored AS (
          SELECT q.query_id, c.vec_id AS cand_id,
                 dt0.d + dt1.d + dt2.d + dt3.d AS dist
          FROM codes c
          JOIN assigned a ON a.vec_id = c.vec_id
          JOIN q ON q.cell = a.cell
          JOIN dt0 ON dt0.code = c.c0 AND dt0.query_id = q.query_id
          JOIN dt1 ON dt1.code = c.c1 AND dt1.query_id = q.query_id
          JOIN dt2 ON dt2.code = c.c2 AND dt2.query_id = q.query_id
          JOIN dt3 ON dt3.code = c.c3 AND dt3.query_id = q.query_id
          WHERE c.vec_id <> q.query_id),
        ranked AS (
          SELECT query_id, cand_id, dist,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY dist ASC, cand_id) AS BIGINT) AS rank
          FROM scored)
        SELECT query_id, cand_id, dist, rank FROM ranked WHERE rank <= 5
    """,
    tags=("similarity", "compression"),
)
def llm_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ retrieval (operators/similarity.py::ivfpq_adc_topk — the
    FAISS IVFPQ serving shape): the coarse quantizer prunes each probe
    to ONE cell (1/16 of the corpus), then PQ asymmetric distance ranks
    the survivors with 4 lookups per candidate into the query's
    broadcast distance table.  The index — (cell, one code per subspace), ~12
    bytes/vector from one map stage — is all a probe scans at 100 TB
    (cell-partitioned layout + code columns; embeddings untouched).
    Deterministic two-level pruning keeps even this doubly-approximate
    ranking hash-exact against the mirrored oracle."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    cbs = similarity.pq_codebooks(
        emb, "vec_id", "embedding", _PQ_SUB, _PQ_CODES
    )
    return similarity.ivfpq_adc_topk(
        emb, "vec_id", "embedding",
        emb.filter(F.col("vec_id") < 10), cbs, 5,
    )


@register(
    "llm_ann_filtered",
    oracle="""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
                   FROM embx embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv, label FROM e
              WHERE vec_id < 20),
        c AS (SELECT vec_id AS cand_id, v AS cv, label FROM e),
        scored AS (SELECT query_id, cand_id,
                          round(list_cosine_similarity(qv, cv), 6) AS cos
                   FROM c JOIN q USING (label)
                   WHERE cand_id <> query_id),
        ranked AS (SELECT query_id, cand_id, cos,
                          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
                   FROM scored)
        SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= 5
    """,
    tags=("similarity",),
)
def llm_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered retrieval: top-5 same-label neighbors.  The label
    predicate is the join key (not a post-filter), so a label-partitioned
    corpus layout partition-prunes each probe at scale."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    return similarity.filtered_topk(
        emb, "vec_id", "embedding", "label",
        emb.filter(F.col("vec_id") < 20), 5,
    )


# ---------------------------------------------------------------------------
# B27+ — span-level dedup & token-budget mixing (round 4)
# ---------------------------------------------------------------------------

_SPAN_K = 8
_SQL_SPANS = f"""
    toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    sp AS (SELECT doc_id,
           CASE WHEN len(toks) >= {_SPAN_K}
                THEN list_transform(range(1, len(toks) - {_SPAN_K - 2}),
                     i -> {"||' '||".join(f"toks[i+{j}]" if j else "toks[i]" for j in range(_SPAN_K))})
                ELSE []::VARCHAR[] END AS spans
           FROM toks),
    ex AS (SELECT DISTINCT doc_id, {_SQL_H60.format(x='s')} AS h
           FROM (SELECT doc_id, unnest(spans) AS s FROM sp)),
    cnt AS (SELECT h, COUNT(*) AS n_docs FROM ex GROUP BY h),
    per AS (SELECT e.doc_id, COUNT(*) AS n_spans,
                   SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS n_dup
            FROM ex e JOIN cnt USING (h) GROUP BY 1)
"""


@register(
    "llm_dedup_spans",
    oracle=f"""
        WITH {_SQL_SPANS}
        SELECT d.doc_id,
               CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
               CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_spans,
               round(CASE WHEN COALESCE(n_spans, 0) > 0
                          THEN CAST(n_dup AS DOUBLE) / CAST(n_spans AS DOUBLE)
                          ELSE 0.0 END, 6) AS dup_frac
        FROM documents d LEFT JOIN per USING (doc_id)
    """,
    tags=("dedup",),
)
def llm_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style span dedup signal: per-doc fraction of word
    8-gram spans shared with at least one other document.  Distinct
    (doc, span-hash60) pairs shuffle once (8 bytes/span), then one join
    back for the rollup — no suffix array, no quadratic work."""
    t = load_tables(spark, sf_dir)
    return dedup.duplicated_span_stats(t["documents"], "doc_id", "text", _SPAN_K)


@register(
    "llm_dedup_span_removal",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
        sp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                      {_SQL_H60.format(x=("||' '||".join(
                          f"toks[i+{j}]" if j else "toks[i]"
                          for j in range(_SPAN_K))))} AS h
               FROM (SELECT doc_id, toks,
                            unnest(range(1, len(toks) - {_SPAN_K - 2})) AS i
                     FROM toks)),
        dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM sp)
                GROUP BY h HAVING COUNT(*) >= 2),
        cov AS (SELECT DISTINCT doc_id, tpos
                FROM (SELECT s.doc_id,
                             unnest(range(s.pos, s.pos + {_SPAN_K})) AS tpos
                      FROM sp s JOIN dup d USING (h))),
        ncov AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id),
        tp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, toks[i] AS tok
               FROM (SELECT doc_id, toks,
                            unnest(range(1, len(toks) + 1)) AS i
                     FROM toks)),
        kept AS (SELECT t.doc_id, t.p, t.tok FROM tp t
                 WHERE NOT EXISTS (SELECT 1 FROM cov c
                                   WHERE c.doc_id = t.doc_id
                                     AND c.tpos = t.p)),
        clean AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
                  FROM kept GROUP BY doc_id)
        SELECT tk.doc_id,
               CAST(len(tk.toks) AS BIGINT) AS n_tokens,
               CAST(COALESCE(n.n_removed, 0) AS BIGINT) AS n_removed,
               COALESCE(c.clean_text, '') AS clean_text
        FROM toks tk
        LEFT JOIN ncov n USING (doc_id)
        LEFT JOIN clean c USING (doc_id)
    """,
    tags=("dedup",),
)
def llm_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style span REMOVAL rewrite: documents come back with
    every token covered by a cross-document duplicated word 8-gram
    deleted (clean_text), plus removal counts.  Hashes and positions are
    all that shuffle; the rewrite is a per-row token-array filter against
    a small covered-position array — see
    operators/dedup.py::remove_duplicated_spans for the scale notes."""
    t = load_tables(spark, sf_dir)
    return dedup.remove_duplicated_spans(t["documents"], "doc_id", "text", _SPAN_K)


_MIX_BUDGET = 800


@register(
    "llm_mix_token_budget",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, source,
                   CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
                   {_SQL_H60.format(x="'mix1:' || CAST(doc_id AS VARCHAR)")}
                       AS ord_key
            FROM documents),
        cum AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY ord_key, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_before
            FROM base)
        SELECT doc_id, source, n_tokens, CAST(cum_before AS BIGINT) AS cum_before
        FROM cum WHERE cum_before < {_MIX_BUDGET}
    """,
    tags=("sampling",),
)
def llm_mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: greedily keep hash-ordered docs per
    source until an 800-token budget.  Runs as a two-level distributed
    prefix-sum (bucketized by the order key's top bits) so no task ever
    holds a whole domain — the oracle's single-window formulation is the
    semantic twin (see operators/sampling.py)."""
    from ..operators.sampling import mix_to_token_budget

    t = load_tables(spark, sf_dir)
    return mix_to_token_budget(
        t["documents"], "doc_id", "text", "source", _MIX_BUDGET
    )


@register(
    "llm_quality_percentile",
    oracle=f"""
        WITH d AS (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents),
        scored AS (
            SELECT doc_id, source,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   floor((CASE WHEN len(toks) > 0
                         THEN CAST(len(list_distinct(toks)) AS DOUBLE)
                              / CAST(len(toks) AS DOUBLE)
                         ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0
                       AS distinct_ratio
            FROM d),
        ranked AS (
            SELECT *, PERCENT_RANK() OVER (PARTITION BY source
                       ORDER BY distinct_ratio, doc_id) AS pr
            FROM scored)
        SELECT doc_id, source, n_tokens, distinct_ratio
        FROM ranked WHERE pr >= 0.7
    """,
    tags=("text", "sampling"),
)
def llm_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCLM-style per-domain percentile cut: keep each source's top 30%
    by lexical-diversity score (distinct-token ratio).  Rank-based (not
    interpolated percentile), so the cut is hash-exact cross-engine.  At
    100 TB the window becomes a per-domain threshold computed from a
    score histogram and broadcast back — the filter semantics stay
    identical; this formulation is the exact-rank twin."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.col("text"))
    scored = t["documents"].select(
        "doc_id",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        numeric.round6_expr(
            F.when(
                F.size(toks) > 0,
                F.size(F.array_distinct(toks)).cast("double")
                / F.size(toks).cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("distinct_ratio"),
    )
    w = Window.partitionBy("source").orderBy("distinct_ratio", "doc_id")
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.7)
        .select("doc_id", "source", "n_tokens", "distinct_ratio")
    )


@register(
    "llm_split_leakage_safe",
    oracle=f"""
        WITH comps AS ({_cluster_oracle()}),
        labeled AS (
            SELECT d.doc_id,
                   COALESCE(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comps c ON d.doc_id = c.doc_id)
        SELECT doc_id, cluster_id,
               CASE WHEN ({_SQL_H60.format(
                   x="'split1:' || CAST(cluster_id AS VARCHAR)")}) % 100 < 90
                    THEN 'train' ELSE 'val' END AS split
        FROM labeled
    """,
    tags=("dedup", "sampling"),
)
def llm_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: near-dup CLUSTERS (MinHash-LSH pairs
    -> connected components) are the unit of assignment, so two near-dup
    documents can never straddle the split boundary.  The split decision
    is a salted hash of the cluster representative — deterministic,
    cluster-count independent, stable under corpus growth."""
    from ..operators.hashing import hash60_expr

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    pairs = dedup.minhash_neardup_pairs(docs, "doc_id", "text", 0.8)
    comps = dedup.connected_components(pairs)
    labeled = (
        docs.select("doc_id")
        .join(comps, "doc_id", "left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
        )
    )
    bucket = hash60_expr(
        F.concat(F.lit("split1:"), F.col("cluster_id").cast("string"))
    ) % F.lit(100)
    return labeled.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 90, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


_VOCAB_K = 30


@register(
    "llm_vocab_coverage",
    oracle=f"""
        WITH tok AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term
                     FROM documents),
        freq AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
        vocab AS (SELECT term FROM (
            SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rn
            FROM freq) WHERE rn <= {_VOCAB_K}),
        per AS (SELECT t.doc_id,
                       COUNT(*) AS n_tokens,
                       SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
                FROM tok t LEFT JOIN vocab v ON t.term = v.term
                GROUP BY t.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(n_oov, 0) AS BIGINT) AS n_oov,
               floor((CASE WHEN COALESCE(n_tokens, 0) > 0
                          THEN CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                          ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0
                   AS oov_rate
        FROM documents d LEFT JOIN per USING (doc_id)
    """,
    tags=("text",),
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the corpus top-30 term
    vocabulary (deterministic ties: count desc, term asc), then per-doc
    out-of-vocabulary token rate.  The vocabulary is a top-k over a
    map-side-combined term aggregate — KB-sized however big the corpus —
    and broadcasts into the per-doc join; the token explode shuffles
    (doc_id, term) pairs once for the aggregate and keeps the per-doc
    rollup local to the explode.  The top-k itself is orderBy+limit —
    Spark plans that as TakeOrderedAndProject (per-partition partial
    top-k, merge on the driver), never a single-partition global window."""
    from ..cache import scoped_persist

    t = load_tables(spark, sf_dir)
    # two consumers (vocab aggregate + per-doc rollup): persist the explode
    # so the corpus is tokenized once
    tok = scoped_persist(
        t["documents"].select(
            "doc_id", F.explode(text.tokens_expr(F.col("text"))).alias("term")
        )
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        freq.orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(_VOCAB_K)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    per = (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
        )
    )
    return (
        t["documents"]
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
            numeric.round6_expr(
                F.when(
                    F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                    F.col("n_oov").cast("double")
                    / F.col("n_tokens").cast("double"),
                ).otherwise(F.lit(0.0))
            ).alias("oov_rate"),
        )
    )


# per-source epoch weights for the upsampling mix: fractional parts are
# resolved per doc by a salted hash, so expected token share matches the
# weight exactly and the realization is deterministic
_EPOCH_WEIGHTS = {"src0": 2.5, "src1": 0.5}
_EPOCH_DEFAULT = 1.0


def _epoch_copies_sql() -> str:
    frac_bucket = _SQL_H60.format(x="'ep1:' || CAST(doc_id AS VARCHAR)") + " % 100"
    cases_floor = " ".join(
        f"WHEN '{s}' THEN {int(w)}" for s, w in _EPOCH_WEIGHTS.items()
    )
    cases_frac = " ".join(
        f"WHEN '{s}' THEN {int(round((w - int(w)) * 100))}"
        for s, w in _EPOCH_WEIGHTS.items()
    )
    return f"""
        (CASE source {cases_floor} ELSE {int(_EPOCH_DEFAULT)} END
         + CASE WHEN ({frac_bucket}) <
                (CASE source {cases_frac} ELSE
                 {int(round((_EPOCH_DEFAULT - int(_EPOCH_DEFAULT)) * 100))} END)
                THEN 1 ELSE 0 END)
    """


@register(
    "llm_mix_epochs",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, source,
                   {_epoch_copies_sql()} AS n_copies
            FROM documents)
        SELECT doc_id, source, CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS epoch
        FROM base WHERE n_copies > 0
    """,
    tags=("sampling",),
)
def llm_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain upsampling by fractional epoch weights (src0 x2.5, src1
    x0.5, rest x1): every doc materializes floor(w) copies plus one more
    when its salted hash lands under the fractional part — deterministic,
    exactly matching the weight in expectation, no RNG state.  The
    explode is generate-side (no shuffle); downstream packing/shuffling
    treats (doc_id, epoch) as the working key."""
    from ..operators.hashing import hash60_expr

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    floor_w = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(int(w)))
            for s, w in _EPOCH_WEIGHTS.items()
        ],
        F.lit(int(_EPOCH_DEFAULT)),
    )
    frac_pct = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(int(round((w - int(w)) * 100))))
            for s, w in _EPOCH_WEIGHTS.items()
        ],
        F.lit(int(round((_EPOCH_DEFAULT - int(_EPOCH_DEFAULT)) * 100))),
    )
    bucket = hash60_expr(
        F.concat(F.lit("ep1:"), F.col("doc_id").cast("string"))
    ) % F.lit(100)
    n_copies = floor_w + F.when(bucket < frac_pct, F.lit(1)).otherwise(F.lit(0))
    return (
        docs.select("doc_id", "source", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies").cast("long"))).alias("epoch"),
        )
    )


_SQL_BIGRAM_CTES = f"""
    dtoks AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    dbg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> [toks[i], toks[i + 1]])) AS pair
      FROM dtoks WHERE len(toks) >= 2),
    dpairs AS (SELECT doc_id, pair[1] AS w1, pair[2] AS w2 FROM dbg),
    bcounts AS (SELECT w1, w2, COUNT(*) AS n FROM dpairs GROUP BY 1, 2),
    btot AS (SELECT w1, SUM(n) AS total FROM bcounts GROUP BY w1)
"""


@register(
    "llm_text_zipf_audit",
    oracle=f"""
        WITH tok AS (
          SELECT lang, unnest({_SQL_TOKS}) AS tok FROM documents),
        vocab AS (
          SELECT lang, tok, COUNT(*) AS freq FROM tok GROUP BY lang, tok),
        ranked AS (
          SELECT lang, tok, freq,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY freq DESC, tok) AS rnk
          FROM vocab),
        xy AS (
          SELECT lang,
                 CAST(ROUND(ln(CAST(rnk AS DOUBLE)), 9)
                      AS DECIMAL(12,9)) AS x,
                 CAST(ROUND(ln(CAST(freq AS DOUBLE)), 9)
                      AS DECIMAL(12,9)) AS y
          FROM ranked),
        m AS (
          SELECT lang, COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy,
                 SUM(x * y) AS sxy
          FROM xy GROUP BY lang),
        d AS (
          SELECT lang, n, CAST(n AS DOUBLE) AS nd,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                 CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
                 CAST(sxy AS DOUBLE) AS sxyd
          FROM m)
        SELECT lang, CAST(n AS BIGINT) AS n_vocab,
               CASE WHEN n > 2 AND nd * sxxd - sxd * sxd > 0 THEN
                 floor((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
                       * 1000000.0 + 0.5) / 1000000.0
               END AS zipf_slope,
               CASE WHEN n > 2 AND nd * sxxd - sxd * sxd > 0 THEN
                 floor((syd - (nd * sxyd - sxd * syd)
                        / (nd * sxxd - sxd * sxd) * sxd) / nd
                       * 1000000.0 + 0.5) / 1000000.0
               END AS intercept,
               CASE WHEN n > 2 AND nd * sxxd - sxd * sxd > 0
                         AND nd * syyd - syd * syd > 0 THEN
                 floor((nd * sxyd - sxd * syd)
                       / sqrt((nd * sxxd - sxd * sxd)
                              * (nd * syyd - syd * syd))
                       * 1000000.0 + 0.5) / 1000000.0
               END AS corr
        FROM d
    """,
    tags=("text", "audit"),
)
def llm_text_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency audit per language: OLS of ln(freq) on
    ln(rank) over the vocabulary — natural language sits near slope -1,
    so a corpus whose slope drifts far from it (template spam flattens
    the head; OCR noise fattens the tail) fails the linguistic sanity
    screen before training.  Exactness: ln values round to 9dp decimals
    and the five OLS moments sum in the decimal domain (the
    b16_group_regression recipe); degenerate languages (n<=2 or zero
    variance) yield NULL in both engines.  Scale shape: the rank window
    runs over the per-language VOCABULARY (already count-compressed
    map-side), never over raw tokens — the same histogram-first
    discipline as the percentile family."""
    from pyspark.sql.types import DecimalType
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.col("text"))
    vocab = (
        t["documents"]
        .select("lang", F.explode(toks).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), "tok")
    ranked = vocab.withColumn("rnk", F.row_number().over(w))
    dec9 = DecimalType(12, 9)
    xy = ranked.select(
        "lang",
        F.round(F.log(F.col("rnk").cast("double")), 9).cast(dec9).alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 9).cast(dec9).alias("y"),
    )
    m = xy.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    varx = nd * sxxd - sxd * sxd
    vary = nd * syyd - syd * syd
    ok = (F.col("n") > 2) & (varx > 0)
    slope = (nd * sxyd - sxd * syd) / varx
    return m.select(
        "lang",
        F.col("n").cast("long").alias("n_vocab"),
        F.when(ok, numeric.round6_expr(slope)).alias("zipf_slope"),
        F.when(
            ok, numeric.round6_expr((syd - slope * sxd) / nd)
        ).alias("intercept"),
        F.when(
            ok & (vary > 0),
            numeric.round6_expr(
                (nd * sxyd - sxd * syd) / F.sqrt(varx * vary)
            ),
        ).alias("corr"),
    )


def _doc_bigrams(df: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) adjacent-token pairs of every document with >= 2
    tokens — the shared front end of the bigram-LM family (logprob /
    ccnet buckets / heldout scoring), kept in ONE place so the token
    index arithmetic can never drift between them."""
    toks = text.tokens_expr(F.col("text"))
    base = (
        df.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    )
    return base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("toks"), i + 1).alias("w1"),
                    F.element_at(F.col("toks"), i + 2).alias("w2"),
                ),
            )
        ).alias("pair"),
    ).select("doc_id", "pair.w1", "pair.w2")


def _bigram_lm_per_doc(docs: DataFrame) -> DataFrame:
    """Per-doc (doc_id, n_bigrams, sum_lp) under the SELF-scored corpus
    bigram LM — the accepted cross-engine exactness recipe (per-bigram
    ln rounds to 9dp, sums in the decimal domain, converts to double
    once), shared by llm_text_logprob and llm_text_ccnet_buckets."""
    from pyspark.sql.types import DecimalType

    dpairs = _doc_bigrams(docs)
    counts = dpairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("w1").agg(F.sum("n").alias("total"))
    lp = F.round(
        F.log(F.col("n").cast("double") / F.col("total").cast("double")), 9
    ).cast(DecimalType(20, 9))
    return (
        dpairs.join(counts, ["w1", "w2"])
        .join(tot, "w1")
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp").cast("double").alias("sum_lp"),
        )
    )


@register(
    "llm_text_logprob",
    oracle=f"""
        WITH {_SQL_BIGRAM_CTES},
        scored AS (
          SELECT p.doc_id,
                 CAST(ROUND(ln(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)),
                            9) AS DECIMAL(20,9)) AS lp
          FROM dpairs p
          JOIN bcounts c ON p.w1 = c.w1 AND p.w2 = c.w2
          JOIN btot t ON p.w1 = t.w1),
        per AS (
          SELECT doc_id, COUNT(*) AS n_bigrams,
                 CAST(SUM(lp) AS DOUBLE) AS sum_lp
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
               {numeric.sql_round6("COALESCE(sum_lp, 0.0)")}
                   AS sum_logprob,
               {numeric.sql_round6(
                   "CASE WHEN COALESCE(n_bigrams, 0) > 0 "
                   "THEN sum_lp / n_bigrams ELSE 0.0 END")}
                   AS avg_logprob
        FROM documents d LEFT JOIN per USING (doc_id)
    """,
    tags=("text", "lm"),
)
def llm_text_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: each document's mean bigram
    log-probability under the CORPUS bigram LM (self-scored, so every
    bigram has nonzero count — no smoothing needed, fully deterministic).

    Order-free exactness: each bigram's ln(p) rounds to 9dp and sums in
    the DECIMAL domain (float addition is order-dependent across
    partitions; decimal addition is not), then converts to double once.
    The final 6dp rounding uses the tie-safe floor form
    (numeric.round6_expr): a scale-9 decimal sum can terminate EXACTLY
    on the 6dp boundary (seed 505 produced one ending in ...500), where
    F.round and DuckDB round() split.  Scale shape: doc bigrams join
    the corpus LM table on (w1, w2) — one corpus-linear shuffle each
    side, the standard LM-scoring join; the per-doc rollup combines
    map-side."""
    t = load_tables(spark, sf_dir)
    per = _bigram_lm_per_doc(t["documents"])
    return (
        t["documents"]
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("long")
            .alias("n_bigrams"),
            numeric.round6_expr(
                F.coalesce(F.col("sum_lp"), F.lit(0.0))
            ).alias("sum_logprob"),
            numeric.round6_expr(
                F.when(
                    F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                    F.col("sum_lp") / F.col("n_bigrams"),
                ).otherwise(F.lit(0.0))
            ).alias("avg_logprob"),
        )
    )


@register(
    "llm_text_ccnet_buckets",
    oracle=f"""
        WITH {_SQL_BIGRAM_CTES},
        scored AS (
          SELECT p.doc_id,
                 CAST(ROUND(ln(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)),
                            9) AS DECIMAL(20,9)) AS lp
          FROM dpairs p
          JOIN bcounts c ON p.w1 = c.w1 AND p.w2 = c.w2
          JOIN btot t ON p.w1 = t.w1),
        per AS (
          SELECT doc_id, COUNT(*) AS n_bigrams,
                 CAST(SUM(lp) AS DOUBLE) AS sum_lp
          FROM scored GROUP BY doc_id),
        avg AS (
          SELECT d.doc_id, d.lang,
                 COALESCE(n_bigrams, 0) > 0 AS has_lm,
                 {numeric.sql_round6(
                     "CASE WHEN COALESCE(n_bigrams, 0) > 0 "
                     "THEN sum_lp / n_bigrams ELSE 0.0 END")}
                     AS avg_logprob
          FROM documents d LEFT JOIN per USING (doc_id)),
        tiled AS (
          SELECT doc_id, lang, avg_logprob,
                 NTILE(3) OVER (PARTITION BY lang
                                ORDER BY has_lm DESC, avg_logprob DESC,
                                         doc_id) AS t3
          FROM avg)
        SELECT doc_id, lang, avg_logprob,
               CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS ppl_bucket
        FROM tiled
    """,
    tags=("text", "lm", "quality"),
)
def llm_text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language perplexity bucketing: score every document
    with the corpus bigram LM (the llm_text_logprob recipe — decimal-domain
    ln sums, order-free exact) and split each language into head / middle /
    tail tertiles by mean log-probability, the filter CCNet uses to keep
    only the most-fluent web text per language.

    Determinism: the tertile order key is the ROUNDED 6dp score with a
    doc_id tiebreak — a total order, so NTILE agrees across engines.
    Scale shape: LM scoring is the standard (w1,w2) join; the tertile
    window partitions by language.  At 100 TB a per-language ntile is one
    sorted reducer per language — real CCNet derives the two cut scores
    from a SAMPLE and broadcasts them (a map-only bucket pass); this query
    is the exact-semantics twin the sampled path is validated against."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    per = _bigram_lm_per_doc(t["documents"])
    avg = (
        t["documents"]
        .select("doc_id", "lang")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            # unscoreable (no-bigram) docs must sort LAST, not ride their
            # 0.0 sentinel into the head tertile — has_lm leads the key
            (F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0).alias("has_lm"),
            numeric.round6_expr(
                F.when(
                    F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                    F.col("sum_lp") / F.col("n_bigrams"),
                ).otherwise(F.lit(0.0))
            ).alias("avg_logprob"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("has_lm"), F.desc("avg_logprob"), F.col("doc_id")
    )
    t3 = F.ntile(3).over(w)
    return avg.select(
        "doc_id",
        "lang",
        "avg_logprob",
        F.when(t3 == 1, F.lit("head"))
        .when(t3 == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


@register(
    "llm_text_lm_heldout",
    oracle=f"""
        WITH ttoks AS (
          SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
          WHERE doc_id % 2 = 0),
        tpairs AS (
          SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> [toks[i], toks[i + 1]])) AS pair
          FROM ttoks WHERE len(toks) >= 2),
        bcounts AS (SELECT pair[1] AS w1, pair[2] AS w2, COUNT(*) AS n
                    FROM tpairs GROUP BY 1, 2),
        btot AS (SELECT w1, SUM(n) AS total FROM bcounts GROUP BY w1),
        vocab AS (
          SELECT COUNT(DISTINCT tok) + 1 AS v FROM
            (SELECT unnest(toks) AS tok FROM ttoks)),
        htoks AS (
          SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
          WHERE doc_id % 2 = 1),
        hpairs AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(toks) - 1),
                        i -> [toks[i], toks[i + 1]])) AS pair
          FROM htoks WHERE len(toks) >= 2),
        hp AS (SELECT doc_id, pair[1] AS w1, pair[2] AS w2 FROM hpairs),
        scored AS (
          SELECT hp.doc_id,
                 CAST(ROUND(ln((CAST(COALESCE(c.n, 0) AS DOUBLE) + 1)
                               / (CAST(COALESCE(t.total, 0) AS DOUBLE)
                                  + CAST(vb.v AS DOUBLE))), 9)
                      AS DECIMAL(20,9)) AS lp
          FROM hp
          LEFT JOIN bcounts c ON hp.w1 = c.w1 AND hp.w2 = c.w2
          LEFT JOIN btot t ON hp.w1 = t.w1
          CROSS JOIN vocab vb),
        per AS (
          SELECT doc_id, COUNT(*) AS n_bigrams,
                 CAST(SUM(lp) AS DOUBLE) AS sum_lp
          FROM scored GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
               {numeric.sql_round6("COALESCE(sum_lp, 0.0)")}
                   AS sum_logprob,
               {numeric.sql_round6(
                   "CASE WHEN COALESCE(n_bigrams, 0) > 0 "
                   "THEN sum_lp / n_bigrams ELSE 0.0 END")}
                   AS avg_logprob
        FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        LEFT JOIN per USING (doc_id)
    """,
    tags=("text", "lm"),
)
def llm_text_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT language-model scoring with add-one smoothing — the
    train/test discipline llm_text_logprob's self-scoring deliberately
    skips: the bigram LM trains on even doc_ids only, odd doc_ids are
    scored as unseen data, and UNSEEN bigrams (including unseen w1) get
    Laplace mass (c+1)/(total+V) with V = |train vocab|+1 (the OOV
    bucket).  This is the CCNet/quality-filter production shape — the
    scoring model must never have seen the data it gates.

    Exactness: all smoothing inputs are exact integers (counts, vocab
    size), so both engines compute identical doubles; per-bigram ln rounds
    to 9dp and sums in the decimal domain (the accepted cross-engine
    recipe).  Scale shape: LEFT joins onto (w1,w2)/(w1) count tables —
    corpus-linear shuffles; V rides along as a broadcast 1-row aggregate,
    no driver-side collect anywhere."""
    from pyspark.sql.types import DecimalType

    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.col("text"))

    train_docs = t["documents"].filter(F.col("doc_id") % 2 == 0)
    tpairs = _doc_bigrams(train_docs)
    bcounts = tpairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    btot = bcounts.groupBy("w1").agg(F.sum("n").alias("total"))
    vocab = (
        train_docs.select(F.explode(toks).alias("tok"))
        .agg((F.countDistinct("tok") + 1).alias("v"))
    )
    hp = _doc_bigrams(t["documents"].filter(F.col("doc_id") % 2 == 1))
    p = (F.coalesce(F.col("n"), F.lit(0)).cast("double") + 1) / (
        F.coalesce(F.col("total"), F.lit(0)).cast("double")
        + F.col("v").cast("double")
    )
    lp = F.round(F.log(p), 9).cast(DecimalType(20, 9))
    per = (
        hp.join(bcounts, ["w1", "w2"], "left")
        .join(btot, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp").cast("double").alias("sum_lp"),
        )
    )
    return (
        t["documents"]
        .filter(F.col("doc_id") % 2 == 1)
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("long")
            .alias("n_bigrams"),
            numeric.round6_expr(
                F.coalesce(F.col("sum_lp"), F.lit(0.0))
            ).alias("sum_logprob"),
            numeric.round6_expr(
                F.when(
                    F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                    F.col("sum_lp") / F.col("n_bigrams"),
                ).otherwise(F.lit(0.0))
            ).alias("avg_logprob"),
        )
    )


@register(
    "llm_dedup_cdc_chunks",
    oracle=f"""
        WITH dtoks AS (
          SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
        flat AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(toks)),
                        i -> struct_pack(pos := i, tok := toks[i]))) AS s
          FROM dtoks WHERE len(toks) > 0),
        marked AS (
          SELECT doc_id, s.pos AS pos, s.tok AS tok,
                 CASE WHEN md5(s.tok) LIKE '0%' THEN 1 ELSE 0 END AS b
          FROM flat),
        cids AS (
          SELECT doc_id, pos, tok,
                 COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS cid
          FROM marked),
        chunks AS (
          SELECT doc_id, cid,
                 string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
                 COUNT(*) AS n_tokens
          FROM cids GROUP BY doc_id, cid)
        SELECT md5(chunk_text) AS chunk_hash,
               CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs,
               MIN(doc_id) AS first_doc_id
        FROM chunks
        GROUP BY chunk_hash
        HAVING COUNT(*) > 1
    """,
    tags=("dedup", "chunking"),
)
def llm_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup (the LBFS/FastCDC idiom applied to
    text): a token is a chunk BOUNDARY iff md5(token) starts with '0'
    (expected chunk length 16 tokens), the boundary token closes its chunk,
    and chunks dedup corpus-wide by content hash.  Unlike fixed-width
    chunking, an insertion early in a document only perturbs the one chunk
    it lands in — every later boundary re-synchronizes — which is why CDC
    is the storage-dedup standard.

    Scale shape: chunking is 100% row-local (operators/text.py
    ``cdc_chunks`` — tokens -> boundary positions -> slice bounds via
    array higher-order functions, scan -> project -> generate, no
    per-token shuffle, no window); only (chunk_hash, n_tokens, doc_id)
    rows reach the one hash aggregate, and the HAVING keeps output to
    actual duplicates.  The oracle recomputes the same chunks with a
    per-doc window cumsum — a deliberately different formulation."""
    t = load_tables(spark, sf_dir)
    per_chunk = text.cdc_chunks(t["documents"])
    return (
        per_chunk.select(
            F.md5(F.col("chunk_text")).alias("chunk_hash"),
            "n_tokens",
            "doc_id",
        )
        .groupBy("chunk_hash")
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


_CLUSTER_QUOTA = 12


@register(
    "llm_sample_cluster_balanced",
    oracle=f"""
        WITH cents AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
          FROM embx embeddings WHERE vec_id < 16
        ),
        assigned AS (
          SELECT e.vec_id,
                 (SELECT c.centroid_id FROM cents c
                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                        c.cvec), 6) DESC,
                           c.centroid_id
                  LIMIT 1) AS cell
          FROM embx e
        ),
        ranked AS (
          SELECT vec_id, cell,
                 CAST(ROW_NUMBER() OVER (PARTITION BY cell
                      ORDER BY {_SQL_H60.format(
                          x="'cb1:' || CAST(vec_id AS VARCHAR)")},
                               vec_id) AS BIGINT) AS rn
          FROM assigned)
        SELECT vec_id, cell, rn FROM ranked WHERE rn <= {_CLUSTER_QUOTA}
    """,
    tags=("sampling", "similarity"),
)
def llm_sample_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware subsampling: embeddings cluster into the 16
    deterministic IVF cells, then each cell contributes at most a fixed
    quota of vectors chosen by salted hash order — the cluster-balanced
    sampling step that keeps a training subsample from collapsing onto
    the dominant modes.  Per-cell quota selection is a bounded window
    (partitions = cells, rows ranked by a content-independent hash), and
    the same two-level prefix trick as mix_to_token_budget applies when a
    single cell dominates at scale.  Deterministic centroids make the
    whole pipeline hash-exact against the oracle; a production deployment
    swaps in kmeans_centroids without changing the plan shape."""
    from pyspark.sql.window import Window

    from ..operators.hashing import hash60_expr

    t = load_tables(spark, sf_dir)
    cells = similarity.ivf_cells(_emb(t), "vec_id", "embedding")
    w = Window.partitionBy("cell").orderBy(
        hash60_expr(
            F.concat(F.lit("cb1:"), F.col("vec_id").cast("string"))
        ),
        "vec_id",
    )
    return (
        cells.select("vec_id", "cell")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _CLUSTER_QUOTA)
    )


_N_SHARDS = 8


def _export_manifest(df: DataFrame) -> DataFrame:
    """Per-shard (n_docs, total_tokens, order-free integer checksum)."""
    return (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("fp") % F.lit(2147483647))
            .cast("long")
            .alias("content_checksum"),
        )
        .orderBy("shard")
    )


def _export_post_write_hook(out_dir: str, attempt: int) -> None:
    """Test seam: called after each export write attempt so the
    file-loss failure mode (the one a manifest mismatch detects) can be
    injected; a no-op in production."""


_MANIFEST_SCHEMA = (
    "shard long, n_docs long, total_tokens long, content_checksum long"
)


def _export_oracle_crosscheck(sf_dir: str, got: dict) -> None:
    """In-situ cross-engine audit of the export manifest: run this
    query's OWN registered DuckDB oracle over the same ``sf_dir``
    parquet, in-process, and compare shard by shard.  The r8/r9 driver
    rounds recorded hash_match=false on this key with the Spark-side
    self-check green — a divergence entirely OUTSIDE the write/read-back
    fault domain (root cause: the oracle's uncast SUM fetched as
    HUGEINT; fixed) — and a red row without names costs a round.  Any
    future Spark-vs-DuckDB split now raises HERE, naming the divergent
    shard and both (spark, duckdb) triples.  Skips silently only when
    duckdb itself is unavailable in the process."""
    try:
        import duckdb
    except ImportError:
        return
    from .registry import REGISTRY

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        rows = con.execute(REGISTRY["llm_corpus_export"].oracle).fetchall()
    except duckdb.Error as e:
        # source not DuckDB-readable (e.g. a Spark-written empty dataset
        # has no part files for the glob): the audit is best-effort
        # side-evidence — the Spark self-check already certified the
        # export, and the external driver's own comparison still runs
        import logging

        logging.getLogger(__name__).warning(
            "corpus export oracle cross-check skipped (source not "
            "auditable here): %s", e,
        )
        return
    finally:
        con.close()
    oracle = {r[0]: (r[1], r[2], r[3]) for r in rows}
    if oracle != got:
        diff = {
            s: {"spark": got.get(s), "duckdb": oracle.get(s)}
            for s in sorted(set(got) | set(oracle))
            if got.get(s) != oracle.get(s)
        }
        raise RuntimeError(
            "corpus export manifest diverges between Spark and the "
            f"in-situ DuckDB oracle; per-shard (spark, duckdb) diff: "
            f"{diff}"
        )


@register(
    "llm_corpus_export",
    oracle=f"""
        WITH base AS (
          SELECT doc_id, text,
                 CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
                 ({_SQL_H60.format(x="'shard1:' || CAST(doc_id AS VARCHAR)")})
                     % {_N_SHARDS} AS shard,
                 {text.sql_fingerprint(_SQL_TOKS)} AS fp
          FROM documents)
        SELECT shard,
               COUNT(*) AS n_docs,
               -- CAST is load-bearing: an uncast SUM(BIGINT) is HUGEINT,
               -- which pandas-based harnesses fetch as float64/Decimal
               -- and hash-mismatch against Spark's int64 (the r8/r9
               -- driver red on this key)
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(fp) % 2147483647 AS BIGINT) AS content_checksum
        FROM base GROUP BY shard ORDER BY shard
    """,
    tags=("sampling", "layout", "export"),
)
def llm_corpus_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus EXPORT with a verified manifest — the step that actually
    hands data to a trainer: shard-partitioned parquet is written to the
    export root, then the manifest (per-shard doc count, token total, and
    an order-free integer content checksum = sum of per-doc fingerprints
    mod P) is computed by READING THE EXPORT BACK, so the manifest
    certifies the files on disk rather than the plan that produced them.
    A checksum mismatch against the source means lost/duplicated docs —
    exactly what a 100 TB export job must detect before training starts.
    All manifest arithmetic is exact integers, so any partitioning gives
    the same manifest.

    SELF-CHECKING AND SELF-HEALING (one r8 driver round saw a read-back
    manifest diverge from the source — transient file loss on a loaded
    host): the expected manifest is computed from the source plan
    BEFORE writing; after the write the read-back manifest is compared
    shard by shard.  On divergence the export is rewritten ONCE to a
    fresh directory; if the second read-back still diverges, the error
    names every divergent shard with its (expected, on-disk) triple —
    so a red row diagnoses itself.  The returned frame is built from
    the VERIFIED read-back rows, so downstream consumers (and the
    correctness driver's collect) see exactly the certified manifest."""
    from ..operators.hashing import hash60_expr
    from ..scratch import scratch_dir

    t = load_tables(spark, sf_dir)
    sid = F.col("doc_id").cast("string")
    toks = text.tokens_expr(F.col("text"))
    base = t["documents"].select(
        "doc_id",
        "text",
        F.size(toks).cast("long").alias("n_tokens"),
        (
            hash60_expr(F.concat(F.lit("shard1:"), sid)) % F.lit(_N_SHARDS)
        ).alias("shard"),
        text.fingerprint_expr(toks).alias("fp"),
    )
    expected = {
        r["shard"]: (r["n_docs"], r["total_tokens"], r["content_checksum"])
        for r in _export_manifest(base).collect()
    }
    diff: dict = {}
    for attempt in range(2):
        out = scratch_dir("corpus_export_")
        base.write.mode("overwrite").partitionBy("shard").parquet(out)
        _export_post_write_hook(out, attempt)
        # explicit schema: an empty export writes no data files and
        # schema inference would fail; empty corpus -> 0-row manifest
        exported = spark.read.schema(
            "doc_id long, text string, n_tokens long, fp long, shard long"
        ).parquet(out)
        got_rows = _export_manifest(exported).collect()
        got = {
            r["shard"]: (
                r["n_docs"], r["total_tokens"], r["content_checksum"]
            )
            for r in got_rows
        }
        if got == expected:
            _export_oracle_crosscheck(sf_dir, got)
            return spark.createDataFrame(
                [tuple(r) for r in got_rows], schema=_MANIFEST_SCHEMA
            ).orderBy("shard")
        diff = {
            s: {"expected": expected.get(s), "on_disk": got.get(s)}
            for s in sorted(set(expected) | set(got))
            if expected.get(s) != got.get(s)
        }
        import logging

        logging.getLogger(__name__).warning(
            "corpus export manifest diverged from source on attempt %d "
            "(lost/duplicated docs)%s. Per-shard diff: %s",
            attempt,
            "; rewriting to a fresh directory" if attempt == 0 else "",
            diff,
        )
    raise RuntimeError(
        "corpus export lost/duplicated documents in two consecutive "
        f"write attempts; per-shard (expected, on_disk) diff: {diff}"
    )


@register(
    "llm_corpus_shard",
    oracle=f"""
        WITH base AS (
          SELECT doc_id,
                 CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
                 ({_SQL_H60.format(x="'shard1:' || CAST(doc_id AS VARCHAR)")})
                     % {_N_SHARDS} AS shard,
                 {_SQL_H60.format(x="'pos1:' || CAST(doc_id AS VARCHAR)")}
                     AS ord_key
          FROM documents)
        SELECT doc_id, shard, n_tokens,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard
                    ORDER BY ord_key, doc_id) AS BIGINT) AS pos
        FROM base
    """,
    tags=("sampling", "layout"),
)
def llm_corpus_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic shuffle + shard assignment — the last step of
    training-data prep: every doc gets a shard (salted-hash mod N) and a
    reproducible position inside it (rank by an independent salted hash).
    Hash-derived order means no RNG state and bit-identical output on any
    cluster size.  At 100 TB the write is
    ``repartition(shard).sortWithinPartitions(ord_key)`` — the rank here
    exists to pin the order for verification; the same two-level prefix
    trick as mix_to_token_budget applies if per-shard dense positions are
    really needed."""
    from pyspark.sql.window import Window

    from ..operators.hashing import hash60_expr

    t = load_tables(spark, sf_dir)
    sid = F.col("doc_id").cast("string")
    base = t["documents"].select(
        "doc_id",
        F.size(text.tokens_expr(F.col("text"))).cast("long").alias("n_tokens"),
        (hash60_expr(F.concat(F.lit("shard1:"), sid)) % _N_SHARDS).alias(
            "shard"
        ),
        hash60_expr(F.concat(F.lit("pos1:"), sid)).alias("ord_key"),
    )
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.row_number().over(w).cast("long").alias("pos"),
    )


@register(
    "llm_text_novelty",
    oracle=f"""
        WITH sh AS ({_SQL_SHINGLES}),
        ex AS (SELECT DISTINCT doc_id, {_SQL_H60.format(x='s')} AS h
               FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
        firsts AS (SELECT h, MIN(doc_id) AS first_doc FROM ex GROUP BY h),
        per AS (SELECT e.doc_id, COUNT(*) AS n_grams,
                       SUM(CASE WHEN f.first_doc < e.doc_id
                                THEN 1 ELSE 0 END) AS n_seen
                FROM ex e JOIN firsts f USING (h) GROUP BY 1)
        SELECT d.doc_id,
               CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
               CAST(COALESCE(n_seen, 0) AS BIGINT) AS n_seen,
               floor((CASE WHEN COALESCE(n_grams, 0) > 0
                          THEN 1.0 - CAST(n_seen AS DOUBLE)
                                     / CAST(n_grams AS DOUBLE)
                          ELSE 1.0 END) * 1000000.0 + 0.5) / 1000000.0
                   AS novelty
        FROM documents d LEFT JOIN per USING (doc_id)
    """,
    tags=("text", "dedup"),
)
def llm_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: per doc, the fraction of its distinct word
    3-grams NEVER seen in any lower-id document — the diminishing-returns
    signal that tells a data pipeline when additional crawl is mostly
    redundant.  First-occurrence attribution is a MIN(doc_id) aggregate
    per gram hash (order-free, no sequential scan), and only 60-bit
    hashes cross the two shuffles.  Empty/short docs get novelty 1.0."""
    from ..cache import scoped_persist
    from ..operators.hashing import hash60_expr

    t = load_tables(spark, sf_dir)
    # Token array behind an exchange: shingles_expr indexes it per
    # element, and an inline tokens_expr would re-run the whole-document
    # regexp per element_at (see with_token_boundary's docstring).
    tok = dedup.with_token_boundary(t["documents"], "doc_id")
    ex = scoped_persist(
        tok.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        dedup.shingles_expr(F.col("toks")),
                        lambda s: hash60_expr(s),
                    )
                )
            ).alias("h"),
        )
    )
    firsts = ex.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per = (
        ex.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
            ).alias("n_seen"),
        )
    )
    return (
        t["documents"]
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_seen"), F.lit(0)).cast("long").alias("n_seen"),
            numeric.round6_expr(
                F.when(
                    F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                    F.lit(1.0)
                    - F.col("n_seen").cast("double")
                    / F.col("n_grams").cast("double"),
                ).otherwise(F.lit(1.0))
            ).alias("novelty"),
        )
    )


@register(
    "llm_mix_temperature",
    oracle=f"""
        WITH c AS (SELECT source, COUNT(*) AS n_src
                   FROM documents GROUP BY source)
        SELECT d.doc_id, d.source, c.n_src
        FROM documents d JOIN c USING (source)
        WHERE ({_SQL_H60.format(x="'temp1:' || CAST(doc_id AS VARCHAR)")})
                  % 1000000
              < CAST(floor(1000000.0 * least(1.0,
                    3.0 / sqrt(CAST(n_src AS DOUBLE)))) AS BIGINT)
    """,
    tags=("sampling",),
)
def llm_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-style domain rebalancing: keep each doc with
    probability min(1, 3/sqrt(n_source)) — dominant domains are
    downsampled by the inverse square root of their size (the alpha=0.5
    temperature-sampling idea from multilingual/multi-domain training
    mixes), via a deterministic salted-hash Bernoulli, no RNG state.

    The per-source keep threshold deliberately avoids any cross-source
    float SUM (normalizing constants are where cross-engine float order
    bites); sqrt and division are IEEE-correctly-rounded single ops, so
    the floor()ed thresholds are bit-identical in both engines.  Source
    counts are a tiny broadcast — the corpus itself never reshuffles."""
    from ..operators.hashing import hash60_expr

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    thr = F.floor(
        F.lit(1000000.0)
        * F.least(
            F.lit(1.0), F.lit(3.0) / F.sqrt(F.col("n_src").cast("double"))
        )
    ).cast("long")
    bucket = hash60_expr(
        F.concat(F.lit("temp1:"), F.col("doc_id").cast("string"))
    ) % F.lit(1000000)
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(counts), "source")
        .filter(bucket < thr)
        .select("doc_id", "source", "n_src")
    )


_SEG_WINDOW = 64  # bytes per segment window
_SEG_HOP = 32     # hop between window starts


@register(
    "llm_multimodal_segments",
    oracle=f"""
        WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_size
                   FROM documents),
        s AS (SELECT doc_id, byte_size,
                     unnest(range(0, ((byte_size - 1) // {_SEG_HOP}) + 1))
                         AS seg_idx
              FROM m WHERE byte_size > 0)
        SELECT doc_id, byte_size,
               CAST(seg_idx AS BIGINT) AS seg_idx,
               CAST(seg_idx * {_SEG_HOP} AS BIGINT) AS seg_offset,
               least(CAST({_SEG_WINDOW} AS BIGINT),
                     byte_size - seg_idx * {_SEG_HOP}) AS seg_length
        FROM s
    """,
    tags=("multimodal",),
)
def llm_multimodal_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio/video-style fixed-window segmentation over OPAQUE payloads:
    each blob becomes (seg_idx, seg_offset, seg_length) pointer rows with
    a 64-byte window and 32-byte hop (the sliding-window shape of audio
    chunking / video GOP sampling), computed purely from size metadata —
    the blob bytes never move and never shuffle.  The generate-side
    sequence explode adds no exchange; downstream decode stages read
    (uri, offset, length) ranges, which is exactly how a 100 TB media
    table avoids materializing payloads before the per-segment stage."""
    t = load_tables(spark, sf_dir)
    m = multimodal.attach_binary_payload(t["documents"], "text").select(
        "doc_id", F.col("payload_meta.byte_size").alias("byte_size")
    )
    n_segs = ((F.col("byte_size") - 1) / _SEG_HOP).cast("long") + 1
    segs = (
        m.filter(F.col("byte_size") > 0)
        .select(
            "doc_id",
            "byte_size",
            F.explode(F.sequence(F.lit(0).cast("long"), n_segs - 1)).alias(
                "seg_idx"
            ),
        )
        .select(
            "doc_id",
            "byte_size",
            "seg_idx",
            (F.col("seg_idx") * _SEG_HOP).alias("seg_offset"),
            F.least(
                F.lit(_SEG_WINDOW).cast("long"),
                F.col("byte_size") - F.col("seg_idx") * _SEG_HOP,
            ).alias("seg_length"),
        )
    )
    return segs


_LB_BUCKET = 16  # token-length bucket width
_LB_BATCH = 8    # docs per batch


@register(
    "llm_batch_by_length",
    oracle=f"""
        WITH d AS (SELECT doc_id,
                          CAST(len({_SQL_TOKS}) AS BIGINT) AS n
                   FROM documents),
        r AS (SELECT doc_id, n, n // {_LB_BUCKET} AS bucket,
                     ROW_NUMBER() OVER (PARTITION BY n // {_LB_BUCKET}
                          ORDER BY n DESC, doc_id) AS rn
              FROM d)
        SELECT bucket, CAST((rn - 1) // {_LB_BATCH} AS BIGINT) AS batch_idx,
               COUNT(*) AS n_docs, MAX(n) AS max_len,
               CAST(SUM(n) AS BIGINT) AS sum_len,
               CAST(COUNT(*) * MAX(n) - SUM(n) AS BIGINT) AS padding_waste
        FROM r GROUP BY 1, 2
    """,
    tags=("sampling", "batching"),
)
def llm_batch_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching: docs group into width-16
    token-length buckets, rank longest-first inside each bucket, and cut
    fixed-size batches of 8 — the dynamic-batching layout that minimizes
    padding waste (reported per batch as n_docs*max_len - sum_len).
    Windows partition by the length bucket, never globally, so no task
    ranks the whole corpus; at 100 TB the bucket column doubles as the
    write-partition key and each bucket batches independently."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "doc_id",
        F.size(text.tokens_expr(F.col("text"))).cast("long").alias("n"),
    )
    d = d.withColumn(
        "bucket", F.floor(F.col("n") / _LB_BUCKET).cast("long")
    )
    w = Window.partitionBy("bucket").orderBy(F.col("n").desc(), "doc_id")
    r = d.withColumn("rn", F.row_number().over(w))
    return (
        r.withColumn(
            "batch_idx",
            F.floor((F.col("rn") - 1) / _LB_BATCH).cast("long"),
        )
        .groupBy("bucket", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n").alias("max_len"),
            F.sum("n").cast("long").alias("sum_len"),
            (F.count(F.lit(1)) * F.max("n") - F.sum("n"))
            .cast("long")
            .alias("padding_waste"),
        )
    )


@register(
    "llm_curation_pipeline",
    oracle=f"""
        WITH f AS (SELECT doc_id, source, text, {_SQL_TOKS} AS toks
                   FROM documents),
        q AS (SELECT doc_id, source, text,
                     COALESCE(CASE WHEN len(toks) = 0 THEN FALSE
                          ELSE (len(toks) BETWEEN 20 AND 2000
                                AND length(text) / len(toks) <= 12
                                AND len(regexp_extract_all(COALESCE(text, ''),
                                        '[.,;:!?]')) * 4 <= len(toks))
                          END, FALSE) AS q_ok
              FROM f),
        h AS (SELECT *, md5(text) AS h FROM q),
        mins AS (SELECT h, MIN(doc_id) AS keep_id
                 FROM h WHERE q_ok GROUP BY h),
        j AS (SELECT a.doc_id, a.source, a.q_ok, m.keep_id
              FROM h a LEFT JOIN mins m USING (h)),
        surv AS (SELECT * FROM j WHERE q_ok AND doc_id = keep_id),
        c AS (SELECT source, COUNT(*) AS n_src FROM surv GROUP BY source),
        j2 AS (SELECT j.*, c.n_src FROM j LEFT JOIN c USING (source))
        SELECT doc_id, source,
               CASE WHEN NOT q_ok THEN 'quality'
                    WHEN keep_id IS NULL OR doc_id <> keep_id
                        THEN 'exact_dup'
                    WHEN ({_SQL_H60.format(
                        x="'cur1:' || CAST(doc_id AS VARCHAR)")}) % 1000000
                         >= CAST(floor(1000000.0 * least(1.0,
                              3.0 / sqrt(CAST(n_src AS DOUBLE)))) AS BIGINT)
                        THEN 'rebalanced'
                    ELSE 'kept' END AS outcome
        FROM j2
    """,
    tags=("text", "dedup", "sampling", "pipeline"),
)
def llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE Spark plan — the composition a
    training-data platform actually runs: Gopher-style quality gate ->
    exact dedup (keep min id among quality survivors) -> temperature
    rebalancing of the surviving source mix — with a per-document audit
    trail (outcome = quality | exact_dup | rebalanced | kept, first
    failing stage wins).  Stage outputs never leave the cluster: the
    dedup keep-set is a groupBy on the content hash, the rebalance
    thresholds come from a tiny broadcast of survivor counts, and every
    stage's rule is deterministic, so the whole pipeline is hash-exact
    against the oracle."""
    from ..operators.hashing import hash60_expr

    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.col("text"))
    n_tok = F.size(toks)
    n_punct = text.punct_count_expr(F.col("text"))
    q_ok = F.coalesce(
        F.when(n_tok == 0, F.lit(False)).otherwise(
            n_tok.between(20, 2000)
            & (F.length("text") / n_tok <= 12)
            & (n_punct * 4 <= n_tok)
        ),
        F.lit(False),
    )
    base = t["documents"].select(
        "doc_id", "source", q_ok.alias("q_ok"), F.md5("text").alias("h")
    )
    mins = (
        base.filter(F.col("q_ok"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    j = base.join(mins, "h", "left")
    surv = j.filter(F.col("q_ok") & (F.col("doc_id") == F.col("keep_id")))
    counts = surv.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    j2 = j.join(F.broadcast(counts), "source", "left")
    thr = F.floor(
        F.lit(1000000.0)
        * F.least(
            F.lit(1.0), F.lit(3.0) / F.sqrt(F.col("n_src").cast("double"))
        )
    ).cast("long")
    bucket = hash60_expr(
        F.concat(F.lit("cur1:"), F.col("doc_id").cast("string"))
    ) % F.lit(1000000)
    outcome = (
        F.when(~F.col("q_ok"), F.lit("quality"))
        .when(
            F.col("keep_id").isNull()
            | (F.col("doc_id") != F.col("keep_id")),
            F.lit("exact_dup"),
        )
        .when(bucket >= thr, F.lit("rebalanced"))
        .otherwise(F.lit("kept"))
    )
    return j2.select("doc_id", "source", outcome.alias("outcome"))


def _bpe_sql_stage(src: str, pairs: str, merges: str, out: str) -> str:
    """One unrolled BPE training iteration (pair count -> argmax merge ->
    fold application) as oracle CTE text."""
    return f"""
        {pairs} AS (
          SELECT syms[i] AS a, syms[i + 1] AS b, COUNT(*) AS c
          FROM (SELECT {text.sql_bpe_symbols('s')} AS syms FROM {src}) x,
               UNNEST(range(1, len(syms))) AS u(i)
          GROUP BY 1, 2
        ),
        {merges} AS (
          (SELECT a, b FROM {pairs} ORDER BY c DESC, a, b LIMIT 1)
          UNION ALL
          SELECT * FROM (VALUES ('', '')) fb(a, b)
          WHERE NOT EXISTS (SELECT 1 FROM {pairs})
        ),
        {out} AS (
          SELECT doc_id,
                 {text.sql_bpe_merge('s', f'{merges}.a', f'{merges}.b')} AS s
          FROM {src} CROSS JOIN {merges}
        )"""


@register(
    "llm_bpe_train",
    oracle=f"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(COALESCE(text, ''), '\\S+')
                              AS toks
                   FROM documents),
        s0 AS (SELECT doc_id,
                      CASE WHEN len(toks) > 0
                           THEN chr(1) || array_to_string(toks, chr(1))
                           ELSE '' END AS s
               FROM t),
        {_bpe_sql_stage('s0', 'p1', 'm1', 's1')},
        {_bpe_sql_stage('s1', 'p2', 'm2', 's2')}
        SELECT doc_id,
               CAST(len({text.sql_bpe_symbols('s')}) AS BIGINT) AS n_symbols,
               md5(s) AS sym_hash,
               (SELECT a || ' ' || b FROM m1) AS merge1,
               (SELECT a || ' ' || b FROM m2) AS merge2
        FROM s2
    """,
    tags=("text", "tokenizer"),
)
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training, two merge iterations: each
    iteration counts adjacent symbol pairs corpus-wide (one shuffle with
    map-side partials), collects the argmax pair — the 2-string collect
    IS the model update — and applies the merge as a per-row string fold
    with exact left-to-right greedy semantics (see
    operators/text.py::bpe_merge_expr).  Tie-breaks are (count desc,
    pair asc), so training is deterministic and the unrolled DuckDB
    oracle reproduces the identical merges, symbol strings, and hashes.
    At 100 TB each iteration is one linear pass; the learned merge table
    stays driver-side KBs, exactly like the IVF/SQ8 models."""
    from ..cache import scoped_persist

    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.coalesce(F.col("text"), F.lit("")))
    s0 = scoped_persist(
        t["documents"].select(
            "doc_id", text.bpe_initial_expr(toks).alias("s")
        )
    )
    a1, b1 = text.bpe_top_pair(s0)
    s1 = scoped_persist(
        s0.select(
            "doc_id", text.bpe_merge_expr(F.col("s"), a1, b1).alias("s")
        )
    )
    a2, b2 = text.bpe_top_pair(s1)
    s2 = s1.select(
        "doc_id", text.bpe_merge_expr(F.col("s"), a2, b2).alias("s")
    )
    syms2 = text.bpe_symbols_expr(F.col("s"))
    return s2.select(
        "doc_id",
        F.size(syms2).cast("long").alias("n_symbols"),
        F.md5("s").alias("sym_hash"),
        F.lit(a1 + " " + b1).alias("merge1"),
        F.lit(a2 + " " + b2).alias("merge2"),
    )


# The batched trainer's greedy candidate filter, as an oracle predicate:
# a pool pair survives iff neither symbol nor its concatenation collides
# with the already-accepted merge (operators/text.py::bpe_top_pairs).
_BPE_DISJOINT = (
    "p.a NOT IN (m1.a, m1.b, m1.a || m1.b) "
    "AND p.b NOT IN (m1.a, m1.b, m1.a || m1.b) "
    "AND (p.a || p.b) NOT IN (m1.a, m1.b, m1.a || m1.b)"
)

_BPE_MERGE_FMT = "CASE WHEN a = '' AND b = '' THEN '' ELSE a || ' ' || b END"


@register(
    "llm_bpe_train_batched",
    oracle=f"""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(COALESCE(text, ''), '\\S+')
                              AS toks
                   FROM documents),
        s0 AS (SELECT doc_id,
                      CASE WHEN len(toks) > 0
                           THEN chr(1) || array_to_string(toks, chr(1))
                           ELSE '' END AS s
               FROM t),
        pool AS (
          SELECT syms[i] AS a, syms[i + 1] AS b, COUNT(*) AS c
          FROM (SELECT {text.sql_bpe_symbols('s')} AS syms FROM s0) x,
               UNNEST(range(1, len(syms))) AS u(i)
          GROUP BY 1, 2
          ORDER BY c DESC, a, b
          LIMIT 16
        ),
        m1 AS (
          (SELECT a, b FROM pool ORDER BY c DESC, a, b LIMIT 1)
          UNION ALL
          SELECT * FROM (VALUES ('', '')) fb(a, b)
          WHERE NOT EXISTS (SELECT 1 FROM pool)
        ),
        m2 AS (
          (SELECT p.a, p.b FROM pool p CROSS JOIN m1
           WHERE {_BPE_DISJOINT}
           ORDER BY p.c DESC, p.a, p.b LIMIT 1)
          UNION ALL
          SELECT * FROM (VALUES ('', '')) fb(a, b)
          WHERE NOT EXISTS (SELECT 1 FROM pool p CROSS JOIN m1
                            WHERE {_BPE_DISJOINT})
        ),
        s1 AS (
          SELECT doc_id,
                 {text.sql_bpe_merge(
                     text.sql_bpe_merge('s', 'm1.a', 'm1.b'),
                     'm2.a', 'm2.b')} AS s
          FROM s0 CROSS JOIN m1 CROSS JOIN m2
        )
        SELECT doc_id,
               CAST(len({text.sql_bpe_symbols('s')}) AS BIGINT) AS n_symbols,
               md5(s) AS sym_hash,
               (SELECT {_BPE_MERGE_FMT} FROM m1) AS merge1,
               (SELECT {_BPE_MERGE_FMT} FROM m2) AS merge2
        FROM s1
    """,
    tags=("text", "tokenizer"),
)
def llm_bpe_train_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED BPE training (operators/text.py::bpe_train_batched): ONE
    distributed pair count applies up to K=2 symbol-disjoint merges as a
    single chained zero-shuffle fold pass — the Kx job-count reduction
    that makes full-vocab training feasible at scale (a 32k-merge vocab
    drops from 32k Spark jobs to 32k/K; reference-spirit: the
    BatchTrigger principle of A1 applied to model updates).

    ``max_rounds=1`` pins the job-graph shape, so the unrolled oracle is
    EXACTLY equivalent on any input: both sides rank pairs by (count
    desc, pair asc), keep the same 8*K=16-candidate pool, accept the
    top pair, then the best pool pair disjoint from it (''-pair no-op
    when none), and apply both merges sequentially in one pass."""
    t = load_tables(spark, sf_dir)
    toks = text.tokens_expr(F.coalesce(F.col("text"), F.lit("")))
    s0 = t["documents"].select(
        "doc_id", text.bpe_initial_expr(toks).alias("s")
    )
    s1, merges = text.bpe_train_batched(
        s0, n_merges=2, batch_k=2, max_rounds=1
    )

    def fmt(i: int) -> str:
        return " ".join(merges[i]) if i < len(merges) else ""

    syms = text.bpe_symbols_expr(F.col("s"))
    return s1.select(
        "doc_id",
        F.size(syms).cast("long").alias("n_symbols"),
        F.md5("s").alias("sym_hash"),
        F.lit(fmt(0)).alias("merge1"),
        F.lit(fmt(1)).alias("merge2"),
    )


# Fixed "pretrained" merge table for llm_bpe_encode: applying an
# already-trained tokenizer to a corpus is the everyday production op
# (training is rare; encoding happens on every ingest).  The merges are
# ordered — later merges may consume symbols produced by earlier ones
# (('tablehash', 'scan') only exists after ('table', 'hash') fires), which
# exercises the hierarchical-vocab path.  The table ships as plan
# literals on both engines, exactly like the IVF/SQ8/PQ models.
_BPE_PRETRAINED_MERGES = (
    ("table", "hash"),
    ("part", "filter"),
    ("slow", "key"),
    ("merge", "group"),
    ("customer", "join"),
    ("vector", "small"),
    ("filter", "hash"),
    ("tablehash", "scan"),
)


def _pretrained_bpe_cols(engine: str = "pandas"):
    """(whitespace tokens, encoded symbol string) under the fixed merge
    table — the shared front of llm_bpe_encode / llm_bpe_fertility.

    ``engine='pandas'`` (production default since r12) encodes via the
    Arrow-batched vectorized-regex path
    (text.bpe_encode_pandas_expr — the sf10 decade table's slowest
    row-linear key was this fold chain); ``engine='fold'`` keeps the
    pure-Catalyst fold chain, bitwise identical (pinned by
    test_bpe_pandas_encoder_matches_fold_chain), for plan-only contexts."""
    toks = text.tokens_expr(F.col("text"))
    if engine == "pandas":
        return toks, text.bpe_encode_pandas_expr(
            F.col("text"), _BPE_PRETRAINED_MERGES
        )
    s = text.bpe_initial_expr(toks)
    for a, b in _BPE_PRETRAINED_MERGES:
        s = text.bpe_merge_expr(s, a, b)
    return toks, s


def _bpe_encode_ctes(carry: str = "doc_id") -> tuple[str, str]:
    """(CTE text, final-stage name) applying the fixed merge table
    left-to-right (one list_reduce fold per merge — the DuckDB twin of
    the Spark fold chain), carrying ``carry`` columns through every
    stage."""
    stages = []
    src = "s0"
    for i, (a, b) in enumerate(_BPE_PRETRAINED_MERGES, start=1):
        out = f"s{i}"
        stages.append(
            f"{out} AS (SELECT {carry}, n_tokens, "
            f"{text.sql_bpe_merge('s', repr(a), repr(b))} AS s FROM {src})"
        )
        src = out
    chain = ",\n        ".join(stages)
    ctes = f"""t AS (SELECT {carry}, {_SQL_TOKS} AS toks FROM documents),
        s0 AS (SELECT {carry}, CAST(len(toks) AS BIGINT) AS n_tokens,
                      CASE WHEN len(toks) > 0
                           THEN chr(1) || array_to_string(toks, chr(1))
                           ELSE '' END AS s
               FROM t),
        {chain}"""
    return ctes, src


def _bpe_encode_oracle() -> str:
    ctes, last = _bpe_encode_ctes()
    return f"""
        WITH {ctes},
        fin AS (SELECT doc_id, n_tokens,
                       CAST(len({text.sql_bpe_symbols('s')}) AS BIGINT)
                           AS n_symbols,
                       md5(s) AS sym_hash
                FROM {last})
        SELECT doc_id, n_tokens, n_symbols, sym_hash,
               CASE WHEN n_tokens > 0
                    THEN floor(CAST(n_symbols AS DOUBLE) /
                               CAST(n_tokens AS DOUBLE)
                               * 1000000.0 + 0.5) / 1000000.0
               END AS compression
        FROM fin
    """


@register(
    "llm_bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("text", "tokenizer"),
)
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a PRETRAINED BPE merge table to the corpus (the complement
    of llm_bpe_train: train once, encode on every ingest).  The 8-merge
    vocabulary is a plan literal; encoding is a chain of per-row greedy
    folds (operators/text.py::bpe_merge_expr) inside ONE narrow
    projection — zero shuffles, zero Python, scales as a single linear
    pass over the corpus at 100 TB.  Later merges consume earlier
    merges' output symbols, exercising hierarchical vocab entries."""
    t = load_tables(spark, sf_dir)
    toks, s = _pretrained_bpe_cols()
    # TWO projections on purpose: n_symbols and sym_hash both consume
    # the 8-merge fold chain `s`; a single projection pastes that chain
    # twice and evaluates it twice per row (measured 2x: 22 s -> 11 s at
    # sf1 — the simhash_expr lesson applied to the fold chain).
    # CollapseProject keeps the split because `s` is non-cheap and
    # multiply-referenced.
    mid = t["documents"].select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        s.alias("s"),
    )
    enc = mid.select(
        "doc_id",
        "n_tokens",
        F.size(text.bpe_symbols_expr(F.col("s")))
        .cast("long")
        .alias("n_symbols"),
        F.md5(F.col("s")).alias("sym_hash"),
    )
    return enc.select(
        "doc_id",
        "n_tokens",
        "n_symbols",
        "sym_hash",
        F.when(
            F.col("n_tokens") > 0,
            numeric.round6_expr(
                F.col("n_symbols").cast("double")
                / F.col("n_tokens").cast("double")
            ),
        ).alias("compression"),
    )


@register(
    "llm_text_langid_confusion",
    oracle=f"""
        WITH d AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
        pred AS (SELECT lang AS labeled_lang,
                        {{pred}} AS predicted_lang
                 FROM d)
        SELECT labeled_lang, predicted_lang,
               COUNT(*) AS n_docs,
               floor(CAST(COUNT(*) AS DOUBLE) /
                     CAST(SUM(COUNT(*)) OVER (PARTITION BY labeled_lang)
                          AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
                   AS frac_of_label
        FROM pred
        GROUP BY 1, 2
    """.replace("{pred}", text.sql_lang_id("toks")),
    tags=("text",),
)
def llm_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID EVALUATION: confusion matrix of the stopword-argmax
    heuristic against the labeled ``lang`` column, with each cell's
    fraction of its true-label row.  The matrix is |langs|^2 cells
    regardless of corpus size — one hash aggregation plus a window over
    the tiny aggregate, so the 100 TB cost is the single linear scan."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    pred = t["documents"].select(
        F.col("lang").alias("labeled_lang"),
        text.lang_id_expr(text.tokens_expr(F.col("text"))).alias(
            "predicted_lang"
        ),
    )
    agg = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("labeled_lang")
    return agg.select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        numeric.round6_expr(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("frac_of_label"),
    )


@register(
    "llm_ann_recall_eval",
    oracle="""
        WITH q0 AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                    FROM embx embeddings WHERE vec_id < 20),
        c0 AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
               FROM embx embeddings),
        ex_scored AS (SELECT query_id, cand_id,
                             round(list_cosine_similarity(qv, cv), 6) AS cos
                      FROM q0, c0 WHERE cand_id <> query_id),
        ex_ranked AS (SELECT query_id, cand_id,
                             ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, cand_id) AS r
                      FROM ex_scored),
        exact AS (SELECT query_id, cand_id FROM ex_ranked WHERE r <= 10),
        cents AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
                  FROM embx embeddings WHERE vec_id < 16),
        assigned AS (
          SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                 (SELECT c.centroid_id FROM cents c
                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                        c.cvec), 6) DESC,
                           c.centroid_id
                  LIMIT 1) AS cell
          FROM embx e
        ),
        qi AS (SELECT vec_id AS query_id, v AS qv, cell
               FROM assigned WHERE vec_id < 20),
        iv_scored AS (
          SELECT qi.query_id, a.vec_id AS cand_id,
                 round(list_cosine_similarity(qi.qv, a.v), 6) AS cos
          FROM qi JOIN assigned a
            ON a.cell = qi.cell AND a.vec_id <> qi.query_id
        ),
        iv_ranked AS (SELECT query_id, cand_id,
                             ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, cand_id) AS r
                      FROM iv_scored),
        ivf AS (SELECT query_id, cand_id FROM iv_ranked WHERE r <= 10)
        SELECT e.query_id,
               COUNT(*) AS n_exact,
               CAST(SUM(CASE WHEN i.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               floor(CAST(SUM(CASE WHEN i.cand_id IS NOT NULL
                                   THEN 1 ELSE 0 END) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE) * 1000000.0 + 0.5)
                   / 1000000.0 AS recall_at_10
        FROM exact e
        LEFT JOIN ivf i
          ON i.query_id = e.query_id AND i.cand_id = e.cand_id
        GROUP BY 1
    """,
    tags=("similarity", "evaluation"),
)
def llm_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index EVALUATION: per-query recall@10 of the single-probe IVF
    index against exact brute-force top-10 — the standard acceptance
    gate before swapping an approximate index into a retrieval pipeline.
    Composes the two existing operators; the join/aggregate runs over
    (query_set x k) rows only, so evaluation cost is dominated by the
    exact arm (run it on a sampled query set at 100 TB, as here: the
    query set IS a 20-vector sample)."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    qs = emb.filter(F.col("vec_id") < 20)
    exact = similarity.brute_force_topk(emb, "vec_id", "embedding", qs, 10)
    approx = similarity.ivf_probe_topk(emb, "vec_id", "embedding", qs, 10)
    hits = exact.select("query_id", "cand_id").join(
        approx.select("query_id", "cand_id").withColumn("hit", F.lit(1)),
        ["query_id", "cand_id"],
        "left",
    )
    return hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
        numeric.round6_expr(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("recall_at_10"),
    )


_RP_DIM_IN, _RP_DIM_OUT = 64, 8


def _rp_matrix() -> list[list[float]]:
    """Deterministic Rademacher (+/-1) projection matrix, md5-seeded —
    the same fixed-literal model discipline as the PQ codebooks; both
    engines receive the identical literal rows.  Salted ``jl:`` — the
    LSH plane weights (operators/similarity.py ``_plane_weights``) own
    the ``rp:`` namespace with a DIFFERENT bit rule; two fixed models
    must never share a salt namespace or "deduplicating" them silently
    changes one family's frozen outputs."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest(), 16
            )
            % 2
            == 0
            else -1.0
            for j in range(_RP_DIM_IN)
        ]
        for i in range(_RP_DIM_OUT)
    ]


def _rp_oracle() -> str:
    rows = _rp_matrix()
    # floor-form 6dp rounding (numeric.sql_round6): a signed projection
    # can land in (-5e-7, 0), where DuckDB's round returns -0.0 but
    # Spark's never does (BigDecimal has no signed zero) — the floor
    # form yields +0.0 in both engines (seed-606 finding)
    cols = ",\n               ".join(
        numeric.sql_round6(
            "list_dot_product(v, ["
            + ",".join(f"{x:.1f}" for x in row)
            + "]::DOUBLE[])"
        )
        + " AS y" + str(i)
        for i, row in enumerate(rows)
    )
    return f"""
        WITH p AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embx embeddings)
        SELECT vec_id,
               {cols}
        FROM p
    """


@register(
    "llm_embedding_project",
    oracle=_rp_oracle(),
    tags=("similarity", "projection"),
)
def llm_embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss
    via Rademacher signs, cf. Achlioptas 2003): 64-dim embeddings map to
    8 components, each a sequential-fold dot with a fixed +/-1 literal
    row — the storage/ANN-prefilter reduction a 100 TB embedding corpus
    applies before sharding.

    Scale shape: ZERO shuffles — a row-local projection inside one map
    stage; the model is 512 literal doubles on both engines, and the
    fold dot is bitwise-equal to DuckDB's list_dot_product (the SQ8/PQ
    oracle identity), so components match exactly before the 6dp
    round.  The round itself is the floor form (numeric.round6_expr):
    signed projections land arbitrarily close to zero, and for values
    in (-5e-7, 0) DuckDB's round returns -0.0 where Spark's returns
    0.0 — repr-distinct to the driver's hash (seed-606 finding)."""
    from ..functions.vectors import dot_product_expr

    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    v = F.col("embedding")

    def darr(row: list[float]) -> F.Column:
        return F.expr(
            "array(" + ",".join(f"{x:.1f}D" for x in row) + ")"
        )

    return emb.select(
        "vec_id",
        *[
            numeric.round6_expr(dot_product_expr(v, darr(row))).alias(
                f"y{i}"
            )
            for i, row in enumerate(_rp_matrix())
        ],
    )


@register(
    "llm_embedding_drift",
    oracle=f"""
        WITH e AS (SELECT label, vec_id % 2 AS half,
                          embedding::DOUBLE[] AS v
                   FROM embx embeddings),
        d AS (SELECT label, half, t.i AS idx, v[t.i] AS val
              FROM e, range(1, {_EMB_DIM + 1}) t(i)),
        m AS (SELECT label, half, idx,
                     CAST(SUM(CAST(val AS DECIMAL(27,10))) AS DOUBLE)
                         / COUNT(*) AS m
              FROM d GROUP BY 1, 2, 3),
        c AS (SELECT label, half, list(m ORDER BY idx) AS c
              FROM m GROUP BY 1, 2),
        n AS (SELECT label, half, COUNT(*) AS n FROM e GROUP BY 1, 2)
        SELECT a.label,
               na.n AS n_a, nb.n AS n_b,
               round(list_cosine_similarity(a.c, b.c), 6) AS centroid_cos,
               round(sqrt(list_dot_product(b.c, b.c)) /
                     sqrt(list_dot_product(a.c, a.c)), 6) AS norm_ratio
        FROM c a
        JOIN c b ON b.label = a.label AND a.half = 0 AND b.half = 1
        JOIN n na ON na.label = a.label AND na.half = 0
        JOIN n nb ON nb.label = a.label AND nb.half = 1
    """,
    tags=("similarity", "evaluation"),
)
def llm_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution DRIFT MONITOR: split the corpus into two
    snapshots (even/odd vec_id — stand-ins for 'last week' vs 'this
    week'), compute per-label per-dimension centroid means with
    ORDER-FREE decimal-domain sums (the llm_ann_ivf_kmeans arithmetic —
    bitwise-stable under any partitioning), and report the cosine between
    the two half-centroids plus their norm ratio per label.  A drop in
    centroid cosine flags upstream distribution shift before it poisons
    training.  Scale shape: one linear pass into a (labels x 2 x dim)
    partial aggregation; everything after operates on the model-sized
    aggregate (KBs), so 100 TB costs one scan."""
    from ..functions.vectors import cosine_similarity_expr, norm_expr

    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    e = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.col("embedding").alias("v"),
    )
    dims = e.select(
        "label", "half", F.posexplode(F.col("v")).alias("idx0", "val")
    )
    means = (
        dims.groupBy("label", "half", "idx0")
        .agg(
            F.sum(F.col("val").cast("decimal(27,10)")).alias("s"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "label",
            "half",
            "idx0",
            (F.col("s").cast("double") / F.col("cnt")).alias("m"),
        )
    )
    cent = means.groupBy("label", "half").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx0", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )
    counts = e.groupBy("label", "half").agg(F.count(F.lit(1)).alias("n"))
    a = cent.filter(F.col("half") == 0).select("label", F.col("c").alias("ca"))
    b = cent.filter(F.col("half") == 1).select("label", F.col("c").alias("cb"))
    na = counts.filter(F.col("half") == 0).select("label", F.col("n").alias("n_a"))
    nb = counts.filter(F.col("half") == 1).select("label", F.col("n").alias("n_b"))
    return (
        a.join(b, "label")
        .join(na, "label")
        .join(nb, "label")
        .select(
            "label",
            "n_a",
            "n_b",
            F.round(
                cosine_similarity_expr(F.col("ca"), F.col("cb")), 6
            ).alias("centroid_cos"),
            F.round(
                norm_expr(F.col("cb")) / norm_expr(F.col("ca")), 6
            ).alias("norm_ratio"),
        )
    )


def _bpe_fertility_oracle() -> str:
    ctes, last = _bpe_encode_ctes(carry="doc_id, lang")
    return f"""
        WITH {ctes},
        fin AS (SELECT lang, n_tokens,
                       CAST(len({text.sql_bpe_symbols('s')}) AS BIGINT)
                           AS n_symbols
                FROM {last})
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_symbols) AS BIGINT) AS total_symbols,
               CASE WHEN SUM(n_tokens) > 0
                    THEN floor(CAST(SUM(n_symbols) AS DOUBLE) /
                               CAST(SUM(n_tokens) AS DOUBLE)
                               * 1000000.0 + 0.5) / 1000000.0
               END AS fertility
        FROM fin
        GROUP BY 1
    """


@register(
    "llm_bpe_fertility",
    oracle=_bpe_fertility_oracle(),
    tags=("text", "tokenizer", "evaluation"),
)
def llm_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by language: symbols-per-word of the
    pretrained BPE vocabulary per lang — the standard multilingual
    tokenizer-equity metric (a vocabulary trained on one language
    over-fragments the others; fertility near 1.0 = well covered).
    The encode is the same zero-shuffle fold chain as llm_bpe_encode;
    the rollup sums are integer (exact under any partitioning) with one
    final double division."""
    t = load_tables(spark, sf_dir)
    toks, s = _pretrained_bpe_cols()
    enc = t["documents"].select(
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(text.bpe_symbols_expr(s)).cast("long").alias("n_symbols"),
    )
    agg = enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_symbols").cast("long").alias("total_symbols"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_tokens",
        "total_symbols",
        F.when(
            F.col("total_tokens") > 0,
            numeric.round6_ratio_expr(
                F.col("total_symbols"), F.col("total_tokens")
            ),
        ).alias("fertility"),
    )


@register(
    "llm_dedup_lsh_eval",
    oracle=f"""
        WITH {_SQL_JACCARD_CTES},
        {_minhash_cand_ctes()},
        truth AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
        m AS (SELECT COALESCE(t.id_a, c.id_a) AS id_a,
                     CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_true,
                     CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS is_cand
              FROM truth t
              FULL OUTER JOIN cand c
                ON c.id_a = t.id_a AND c.id_b = t.id_b)
        SELECT CAST(SUM(is_true) AS BIGINT) AS n_true,
               CAST(SUM(is_cand) AS BIGINT) AS n_cand,
               CAST(SUM(is_true * is_cand) AS BIGINT) AS n_hits,
               CASE WHEN SUM(is_true) > 0
                    THEN floor(CAST(SUM(is_true * is_cand) AS DOUBLE) /
                               CAST(SUM(is_true) AS DOUBLE)
                               * 1000000.0 + 0.5) / 1000000.0
               END AS recall,
               CASE WHEN SUM(is_cand) > 0
                    THEN floor(CAST(SUM(is_true * is_cand) AS DOUBLE) /
                               CAST(SUM(is_cand) AS DOUBLE)
                               * 1000000.0 + 0.5) / 1000000.0
               END AS precision
        FROM m
    """,
    tags=("dedup", "evaluation"),
)
def llm_dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-index EVALUATION: candidate-pair recall and precision of the
    MinHash-LSH banding against exact-Jaccard ground truth at the 0.8
    threshold — the acceptance gate for LSH banding parameters (bands x
    rows trade recall against candidate volume).  Ground truth is the
    shingle-blocked exact-Jaccard join (pairs sharing >= 1 shingle; never
    all-pairs), so at 100 TB the evaluation runs the same way recall is
    audited in practice: on a corpus slice, with both sides blocked."""
    t = load_tables(spark, sf_dir)
    tok = dedup.with_token_boundary(t["documents"], "doc_id")
    docs_sh = tok.select(
        "doc_id", dedup.shingles_expr(F.col("toks")).alias("shingles")
    )
    truth = dedup.exact_jaccard_pairs(docs_sh, "doc_id", "shingles", 0.8).select(
        "id_a", "id_b", F.lit(1).alias("is_true")
    )
    _, cands = dedup.minhash_candidate_pairs(t["documents"], "doc_id")
    m = truth.join(
        cands.select("id_a", "id_b", F.lit(1).alias("is_cand")),
        ["id_a", "id_b"],
        "full",
    ).select(
        F.coalesce(F.col("is_true"), F.lit(0)).alias("is_true"),
        F.coalesce(F.col("is_cand"), F.lit(0)).alias("is_cand"),
    )
    agg = m.agg(
        F.sum("is_true").cast("long").alias("n_true"),
        F.sum("is_cand").cast("long").alias("n_cand"),
        F.sum(F.col("is_true") * F.col("is_cand")).cast("long").alias("n_hits"),
    )
    return agg.select(
        "n_true",
        "n_cand",
        "n_hits",
        F.when(
            F.col("n_true") > 0,
            numeric.round6_ratio_expr(F.col("n_hits"), F.col("n_true")),
        ).alias("recall"),
        F.when(
            F.col("n_cand") > 0,
            numeric.round6_ratio_expr(F.col("n_hits"), F.col("n_cand")),
        ).alias("precision"),
    )


def _centrality_oracle() -> str:
    """Two unrolled power iterations + connected components over the
    verified near-dup pair graph (same CTE pattern as the BPE / k-means
    oracles: the iteration count is a model constant, so the loop
    unrolls into plain SQL)."""
    it = """s{o} AS (
          SELECT e.v AS u,
                 0.15 + 0.85 * CAST(SUM(CAST(s.s / d.deg
                                             AS DECIMAL(27,10)))
                                    AS DOUBLE) AS s
          FROM edges e
          JOIN s{i} s ON s.u = e.u
          JOIN deg d ON d.u = e.u
          GROUP BY e.v
        )"""
    # MATERIALIZED is load-bearing at scale: edges is referenced many
    # times (degree/iteration/closure terms) and DuckDB inlines plain
    # CTEs per reference — re-evaluating the whole shingle/MinHash pair
    # pipeline each time; at sf1 that spilled >76 GB of temp disk for a
    # 272-pair graph.  Materializing runs the pipeline exactly once.
    return f"""
        WITH RECURSIVE pairs AS MATERIALIZED (
          SELECT id_a, id_b FROM ({_minhash_oracle()})
        ),
        edges AS MATERIALIZED (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u),
        s0 AS (SELECT u, 1.0 AS s FROM deg),
        {it.format(i=0, o=1)},
        {it.format(i=1, o=2)},
        reach(u, v) AS (
          SELECT u, u FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        comp AS (SELECT u AS doc_id, MIN(v) AS cluster_id
                 FROM reach GROUP BY u)
        SELECT c.doc_id, c.cluster_id,
               round(s2.s, 6) AS centrality,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY c.cluster_id
                    ORDER BY round(s2.s, 6) DESC, c.doc_id) AS BIGINT)
                   AS rank,
               (CAST(ROW_NUMBER() OVER (
                    PARTITION BY c.cluster_id
                    ORDER BY round(s2.s, 6) DESC, c.doc_id) AS BIGINT) = 1)
                   AS is_canonical
        FROM comp c JOIN s2 ON s2.u = c.doc_id
    """


@register(
    "llm_dedup_canonical_centrality",
    oracle=_centrality_oracle(),
    tags=("dedup", "graph"),
)
def llm_dedup_canonical_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANONICAL-document selection by similarity-graph centrality: two
    deterministic power iterations (degree-normalized, 0.15/0.85
    damping — the PageRank kernel) over the VERIFIED near-dup pair
    graph, then rank within each connected component; rank 1 is the
    canonical representative a dedup pipeline keeps.  Centrality picks
    the member most similar to the rest of its clique — a better keeper
    than min-id when near-dup clusters mix originals and mutations.

    Iteration arithmetic is order-free (per-edge contributions cast to
    decimal before the sum — the Lloyd-trainer pattern), so scores are
    bitwise-stable under any partitioning and the unrolled SQL oracle
    reproduces them.  Scale shape: each iteration is one shuffle join on
    node id over the PAIR GRAPH (tiny vs the corpus — near-dup cliques),
    exactly like the connected-components rounds."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    pairs = dedup.minhash_neardup_pairs(
        t["documents"], "doc_id", "text", 0.8
    ).select("id_a", "id_b")
    from ..cache import scoped_persist

    edges = scoped_persist(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).union(
            pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
        )
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select("u", F.lit(1.0).alias("s"))
    for _ in range(2):
        contrib = (
            edges.join(nodes, "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                (F.col("s") / F.col("deg")).cast("decimal(27,10)").alias("c"),
            )
        )
        nodes = contrib.groupBy("node").agg(
            (
                F.lit(0.15) + F.lit(0.85) * F.sum("c").cast("double")
            ).alias("s")
        ).select(F.col("node").alias("u"), "s")
    comp = dedup.connected_components(pairs)
    w = Window.partitionBy("cluster_id").orderBy(
        F.round(F.col("s"), 6).desc(), F.col("doc_id")
    )
    return (
        comp.join(nodes, comp["doc_id"] == nodes["u"])
        .select(
            "doc_id",
            "cluster_id",
            F.round(F.col("s"), 6).alias("centrality"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .withColumn("is_canonical", F.col("rank") == 1)
    )


def _recall_matrix_oracle() -> str:
    """Exact top-10 vs each approximate index's top-10, macro-averaged
    per index — CTE namespaces x_/i_/l_/s_ keep the four ranked
    pipelines (copies of the individual queries' oracles) disjoint."""
    rank10 = (
        "SELECT query_id, cand_id FROM ({inner}) z "
        "WHERE z.r <= 10"
    )
    x_inner = """
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC,
                             cand_id) AS r
        FROM x_q, x_c WHERE cand_id <> query_id
    """
    i_inner = """
        SELECT i_q.query_id, a.vec_id AS cand_id,
               ROW_NUMBER() OVER (PARTITION BY i_q.query_id
                    ORDER BY round(list_cosine_similarity(i_q.qv, a.v), 6)
                             DESC, a.vec_id) AS r
        FROM i_q JOIN assigned a
          ON a.cell = i_q.cell AND a.vec_id <> i_q.query_id
    """
    l_inner = """
        SELECT l_q.query_id, l_c.cand_id,
               ROW_NUMBER() OVER (PARTITION BY l_q.query_id
                    ORDER BY round(list_cosine_similarity(l_q.qv, l_c.cv), 6)
                             DESC, l_c.cand_id) AS r
        FROM l_c JOIN l_q USING (bucket)
        WHERE l_c.cand_id <> l_q.query_id
    """
    s_inner = f"""
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY list_sum(list_transform(range(1, {_EMB_DIM + 1}),
                             i -> CAST((qq[i] - cq[i]) * (qq[i] - cq[i])
                                       AS BIGINT))) ASC, cand_id) AS r
        FROM s_q, s_c WHERE cand_id <> query_id
    """
    recall = (
        "SELECT '{name}' AS index_type, e.query_id,"
        " CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END)"
        "      AS DOUBLE) / COUNT(*) AS r"
        " FROM exact e LEFT JOIN {tbl} a"
        "   ON a.query_id = e.query_id AND a.cand_id = e.cand_id"
        " GROUP BY e.query_id"
    )
    return f"""
        WITH x_q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                     FROM embx embeddings WHERE vec_id < 20),
        x_c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
                FROM embx embeddings),
        exact AS ({rank10.format(inner=x_inner)}),
        cents AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec
                  FROM embx embeddings WHERE vec_id < 16),
        assigned AS (
          SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
                 (SELECT c.centroid_id FROM cents c
                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                        c.cvec), 6) DESC,
                           c.centroid_id
                  LIMIT 1) AS cell
          FROM embx e
        ),
        i_q AS (SELECT vec_id AS query_id, v AS qv, cell
                FROM assigned WHERE vec_id < 20),
        ivf AS ({rank10.format(inner=i_inner)}),
        l_e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                       {similarity.sql_rp_bucket('embedding::DOUBLE[]', _EMB_DIM)}
                           AS bucket
                FROM embx embeddings),
        l_q AS (SELECT vec_id AS query_id, v AS qv, bucket
                FROM l_e WHERE vec_id < 20),
        l_c AS (SELECT vec_id AS cand_id, v AS cv, bucket FROM l_e),
        lsh AS ({rank10.format(inner=l_inner)}),
        {_SQL_SQ8_CTES},
        s_q AS (SELECT vec_id AS query_id, qv AS qq FROM quant
                WHERE vec_id < 20),
        s_c AS (SELECT vec_id AS cand_id, qv AS cq FROM quant),
        sq8 AS ({rank10.format(inner=s_inner)}),
        rec AS (
          {recall.format(name="ivf", tbl="ivf")}
          UNION ALL
          {recall.format(name="lsh", tbl="lsh")}
          UNION ALL
          {recall.format(name="sq8", tbl="sq8")}
        )
        SELECT index_type,
               COUNT(*) AS n_queries,
               floor(CAST(SUM(CAST(floor(r * 1000000.0 + 0.5)
                                    / 1000000.0 AS DECIMAL(27,10)))
                          AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
                   / 1000000.0 AS macro_recall
        FROM rec
        GROUP BY index_type
    """


@register(
    "llm_ann_recall_matrix",
    oracle=_recall_matrix_oracle(),
    tags=("similarity", "evaluation"),
)
def llm_ann_recall_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN ACCEPTANCE MATRIX: macro-averaged recall@10 of every
    approximate index family (single-probe IVF, RP-LSH buckets, SQ8
    integer ranking) against exact brute-force top-10 over the same
    query sample — the one-row-per-index report a retrieval platform
    publishes before switching index types.  Composes the existing
    operators; per-query recalls are rounded then summed in the decimal
    domain, so the macro average is bitwise-stable under any layout."""
    from ..cache import scoped_persist

    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    qs = emb.filter(F.col("vec_id") < 20)
    exact = scoped_persist(
        similarity.brute_force_topk(emb, "vec_id", "embedding", qs, 10).select(
            "query_id", "cand_id"
        )
    )
    mins, maxs = similarity.sq8_train(emb, "embedding")
    variants = {
        "ivf": similarity.ivf_probe_topk(emb, "vec_id", "embedding", qs, 10),
        "lsh": similarity.rp_lsh_bucketed_topk(
            emb, "vec_id", "embedding", qs, 10
        ),
        "sq8": similarity.sq8_topk(
            emb, "vec_id", "embedding", qs, mins, maxs, 10
        ),
    }
    out = None
    for name, approx in variants.items():
        hits = exact.join(
            approx.select("query_id", "cand_id").withColumn(
                "hit", F.lit(1)
            ),
            ["query_id", "cand_id"],
            "left",
        )
        perq = hits.groupBy("query_id").agg(
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("r")
        )
        agg = perq.agg(
            F.count(F.lit(1)).alias("n_queries"),
            numeric.round6_expr(
                F.sum(
                    numeric.round6_expr(F.col("r")).cast("decimal(27,10)")
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("macro_recall"),
        ).select(
            F.lit(name).alias("index_type"), "n_queries", "macro_recall"
        )
        out = agg if out is None else out.unionByName(agg)
    return out


# ---------------------------------------------------------------------------
# Weighted systematic sampling (round 7)
# ---------------------------------------------------------------------------

_WSYS_K = 40


@register(
    "llm_sample_weighted",
    oracle=f"""
        WITH base AS (
          SELECT doc_id, n_chars AS w,
                 ('0x'||substr(md5('wsys1:'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                     AS ord_key
          FROM documents WHERE n_chars > 0),
        tot AS (SELECT SUM(w) AS total_w FROM base),
        cum AS (
          SELECT doc_id, w,
                 CAST(COALESCE(SUM(w) OVER (
                     ORDER BY ord_key, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS cum_before
          FROM base)
        SELECT doc_id, w, cum_before,
               CAST(((cum_before + w) * {_WSYS_K}) // total_w
                    - (cum_before * {_WSYS_K}) // total_w AS BIGINT) AS n_picks
        FROM cum, tot
        WHERE ((cum_before + w) * {_WSYS_K}) // total_w
              > (cum_before * {_WSYS_K}) // total_w
    """,
    tags=("sampling",),
)
def llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling WITHOUT random numbers: systematic
    (Madow) selection over a salted-hash ordering, all-integer
    arithmetic, so the k-stratum sample is bit-identical on any cluster
    size (the reproducibility property PPS poisson sampling loses).
    Weights = document length (the usual proxy for training-token cost);
    an over-stride document reports n_picks > 1 instead of silently
    capping its inclusion probability.  Scale shape: two-level prefix
    sum (64-bucket offsets window globally, rows window only inside
    their bucket) + broadcast 1-row total — see
    operators/sampling.py::weighted_systematic_sample."""
    from ..operators.sampling import weighted_systematic_sample

    t = load_tables(spark, sf_dir)
    return weighted_systematic_sample(
        t["documents"], "doc_id", "n_chars", _WSYS_K
    )


# ---------------------------------------------------------------------------
# DSIR-style importance scoring (round 7)
# ---------------------------------------------------------------------------

_DSIR_B = 64  # hashed feature buckets


@register(
    "llm_text_dsir",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents),
        btok AS (
          SELECT doc_id,
                 (('0x'||substr(md5('dsir:'||tok),1,15))::BIGINT % {_DSIR_B})
                     AS bucket
          FROM tok),
        tot AS (
          SELECT COUNT(*) AS s_total,
                 COALESCE(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END), 0)
                     AS t_total
          FROM btok),
        stats AS (
          SELECT bucket, COUNT(*) AS cs,
                 SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS ct
          FROM btok GROUP BY bucket),
        w AS (
          SELECT bucket,
                 CAST(ROUND(ln(
                     (CAST(ct + 1 AS DOUBLE) * CAST(s_total + {_DSIR_B} AS DOUBLE))
                     / (CAST(cs + 1 AS DOUBLE) * CAST(t_total + {_DSIR_B} AS DOUBLE))),
                     9) AS DECIMAL(20,9)) AS lw
          FROM stats, tot),
        per AS (
          SELECT b.doc_id, COUNT(*) AS n_tokens, SUM(w.lw) AS s
          FROM btok b JOIN w USING (bucket) GROUP BY b.doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
               {numeric.sql_round6("CAST(COALESCE(per.s, 0) AS DOUBLE)")} AS dsir_score,
               (d.doc_id % 5 = 0) AS is_target
        FROM documents d LEFT JOIN per USING (doc_id)
    """,
    tags=("text", "sampling"),
)
def llm_text_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): score every document
    by its hashed-unigram log importance ratio between a TARGET
    distribution (here the doc_id%5==0 subset as the trusted-domain
    stand-in) and the raw-corpus distribution, with add-one smoothing
    over 64 feature buckets.  Per-bucket log-ratios round to 9dp and sum
    in the DECIMAL domain (the llm_text_logprob exactness pattern), so
    the score is partitioning-independent.  Scale shape: the bucket
    model is a 64-row broadcast literal-sized table built in one
    map-side-combined pass; scoring is explode -> broadcast join ->
    per-doc combine — one corpus-linear shuffle on (doc_id), nothing
    quadratic, the model never exceeds KBs regardless of corpus size."""
    from pyspark.sql.types import DecimalType

    from ..operators.hashing import hash60_expr

    from ..cache import scoped_persist

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    toks = text.tokens_expr(F.col("text"))
    # btok feeds THREE branches (global totals, per-bucket stats, the
    # scoring join) — persist so the tokenize+hash pass runs once
    btok = scoped_persist(
        docs.select("doc_id", F.explode(toks).alias("tok")).select(
            "doc_id",
            F.pmod(
                hash60_expr(F.concat(F.lit("dsir:"), F.col("tok"))),
                F.lit(_DSIR_B),
            ).alias("bucket"),
        )
    )
    is_t = F.col("doc_id") % 5 == 0
    tot = btok.agg(
        F.count(F.lit(1)).alias("s_total"),
        F.coalesce(F.sum(F.when(is_t, 1).otherwise(0)), F.lit(0)).alias(
            "t_total"
        ),
    )
    stats = btok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cs"),
        F.sum(F.when(is_t, 1).otherwise(0)).alias("ct"),
    )
    w = stats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log(
                (
                    (F.col("ct") + 1).cast("double")
                    * (F.col("s_total") + _DSIR_B).cast("double")
                )
                / (
                    (F.col("cs") + 1).cast("double")
                    * (F.col("t_total") + _DSIR_B).cast("double")
                )
            ),
            9,
        )
        .cast(DecimalType(20, 9))
        .alias("lw"),
    )
    per = (
        btok.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lw").alias("s"))
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        numeric.round6_expr(F.coalesce(F.col("s"), F.lit(0))).alias(
            "dsir_score"
        ),
        is_t.alias("is_target"),
    )


# ---------------------------------------------------------------------------
# Two-stage retrieval: SQ8 coarse scan + exact rerank (round 7)
# ---------------------------------------------------------------------------


@register(
    "llm_ann_sq8_rerank",
    oracle=f"""
        WITH {_SQL_SQ8_CTES},
        q8 AS (SELECT vec_id AS query_id, qv AS qq FROM quant
               WHERE vec_id < 10),
        c8 AS (SELECT vec_id AS cand_id, qv AS cq FROM quant),
        s8 AS (SELECT query_id, cand_id,
                      CAST(list_sum(list_transform(range(1, {_EMB_DIM + 1}),
                           i -> CAST((qq[i] - cq[i]) * (qq[i] - cq[i])
                                AS BIGINT))) AS BIGINT) AS qdist
               FROM q8, c8 WHERE cand_id <> query_id),
        r8 AS (SELECT query_id, cand_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY qdist ASC, cand_id) AS sq8_rank
               FROM s8),
        cand AS (SELECT query_id, cand_id,
                        CAST(sq8_rank AS BIGINT) AS sq8_rank
                 FROM r8 WHERE sq8_rank <= 50),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embx),
        x AS (SELECT c.query_id, c.cand_id, c.sq8_rank,
                     round(list_cosine_similarity(eq.v, ec.v), 6) AS cos
              FROM cand c
              JOIN e eq ON eq.vec_id = c.query_id
              JOIN e ec ON ec.vec_id = c.cand_id),
        f AS (SELECT query_id, cand_id, cos, sq8_rank,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, cand_id) AS BIGINT) AS rank
              FROM x)
        SELECT query_id, cand_id, cos, rank, sq8_rank
        FROM f WHERE rank <= 10
    """,
    tags=("similarity",),
)
def llm_ann_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN serving: coarse top-50 over SQ8 codes (exact integer
    distances — zero rounding hazard), then exact-cosine rerank of only
    those 50 to the final top-10.  The shape that makes 100 TB retrieval
    affordable: the full corpus is scanned ONLY in its 4x-compressed
    form, full-precision vectors are fetched for |Q| x 50 rows via a
    broadcast candidate-list join, and the observable ``sq8_rank`` vs
    ``rank`` gap is the quantization error the rerank repairs (see
    operators/similarity.py::sq8_rerank_topk)."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    mins, maxs = similarity.sq8_train(emb, "embedding")
    return similarity.sq8_rerank_topk(
        emb, "vec_id", "embedding",
        emb.filter(F.col("vec_id") < 10), mins, maxs, 50, 10,
    )


# ---------------------------------------------------------------------------
# Containment dedup (round 7)
# ---------------------------------------------------------------------------


@register(
    "llm_dedup_containment",
    oracle=f"""
        WITH {_SQL_JACCARD_CTES},
        {_minhash_cand_ctes()},
        cont AS (
          SELECT i.id_a, i.id_b,
                 CAST(i.i AS BIGINT) AS n_common,
                 CAST(ca.n AS BIGINT) AS n_a,
                 CAST(cb.n AS BIGINT) AS n_b,
                 round(CAST(i.i AS DOUBLE) / CAST(ca.n AS DOUBLE), 6)
                     AS cont_a_in_b,
                 round(CAST(i.i AS DOUBLE) / CAST(cb.n AS DOUBLE), 6)
                     AS cont_b_in_a
          FROM inter i
          JOIN cnt ca ON ca.doc_id = i.id_a
          JOIN cnt cb ON cb.doc_id = i.id_b
          JOIN cand c ON c.id_a = i.id_a AND c.id_b = i.id_b)
        SELECT id_a, id_b, n_common, n_a, n_b, cont_a_in_b, cont_b_in_a
        FROM cont
        WHERE cont_a_in_b >= 0.6 OR cont_b_in_a >= 0.6
    """,
    tags=("dedup",),
)
def llm_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment dedup (|A∩B|/|A| per side) over MinHash-LSH
    candidates — catches the quote/boilerplate inclusions whose union-
    relative Jaccard stays under the llm_dedup_minhash_lsh cut (a short
    doc pasted into a long one).  Verify work is candidate-bounded, the
    shingle sets shuffle as 8-byte hashes, and the 6dp-rounded ratios
    make the 0.6 threshold hash-exact (see
    operators/dedup.py::containment_pairs)."""
    t = load_tables(spark, sf_dir)
    return dedup.containment_pairs(t["documents"], "doc_id", "text", 0.6)


# ---------------------------------------------------------------------------
# Gopher-style rule gate (round 7)
# ---------------------------------------------------------------------------

# ONE definition of the Gopher stopword set — the Arrow doc profile
# (operators/text.py::doc_profile_pandas_expr) counts against the same
# tuple the oracles inline
_GOPHER_STOPS = text.GOPHER_STOPS
_GOPHER_MIN_WORDS = 30
_GOPHER_MAX_WORDS = 100_000


@register(
    "llm_text_dup_ngrams",
    oracle=f"""
        WITH {text.sql_dup_ngram_coverage(text.sql_tokens('text'), 5)}
        SELECT doc_id, total_chars, covered_chars,
               CASE WHEN total_chars > 0
                    THEN floor(CAST(covered_chars AS DOUBLE)
                               / CAST(total_chars AS DOUBLE)
                               * 1000000.0 + 0.5) / 1000000.0
                    ELSE 0.0 END AS dup_char_frac
        FROM dupstats
    """,
    tags=("text", "quality"),
)
def llm_text_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher duplicate-5-gram character coverage
    (operators/text.py::dup_ngram_coverage): the share of each
    document's token characters inside word 5-grams that repeat WITHIN
    the document — the repetition gate the Gopher rules family
    (llm_text_gopher_rules, llm_text_repetition) lacked: coverage
    semantics (overlapping duplicate grams count a character once)
    instead of occurrence ratios.  The plan is the explode + hash-agg
    relational shape (gram occurrences exploded, duplicates found by
    hash aggregation, covered characters by a distinct coverage union)
    — deliberately NOT the nested higher-order-lambda form, which
    re-inlines under Catalyst projection collapse into an
    O(pos × grams²) expression and hangs; integer char counts are
    engine-exact, fraction rounded 6dp."""
    t = load_tables(spark, sf_dir)
    return text.dup_ngram_coverage(t["documents"], "doc_id", "text", 5)


@register(
    "llm_text_gopher_rules",
    oracle=f"""
        WITH d AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 CASE WHEN len(toks) > 0 THEN floor(
                     CAST(list_sum(list_transform(toks, t ->
                          CAST(length(t) AS BIGINT))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) * 1000000.0 + 0.5)
                     / 1000000.0 ELSE 0.0 END
                     AS mean_word_len,
                 CASE WHEN len(toks) > 0 THEN floor(
                     CAST(len(list_filter(toks, t ->
                          regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) * 1000000.0 + 0.5)
                     / 1000000.0 ELSE 0.0 END
                     AS alpha_frac,
                 CAST(len(list_intersect(
                     list_distinct(list_transform(toks, t -> lower(t))),
                     {list(_GOPHER_STOPS)!r})) AS BIGINT) AS n_stops
          FROM d)
        SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stops,
               (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
                   AS rule_word_count,
               (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
                   AS rule_mean_word_len,
               (alpha_frac >= 0.8) AS rule_alpha_frac,
               (n_stops >= 2) AS rule_stopwords,
               ((n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND alpha_frac >= 0.8 AND n_stops >= 2) AS keep
        FROM m
    """,
    tags=("text", "quality"),
)
def llm_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021 §A1.1) rule-based quality gate as a
    per-document audit report: word-count bounds, mean word length in
    [3,10], >=80% words containing an alphabetic character, and >=2
    distinct English stopwords present — each rule surfaced as its own
    boolean next to the composite ``keep``, because a production gate is
    tuned per-rule from exactly this table.  All four rules are narrow
    row-local Catalyst expressions over the shared '\\S+' tokenization
    (zero shuffles, filter-pushdown-friendly); ratios round to 6dp
    before thresholding so the cut is hash-exact cross-engine."""
    t = load_tables(spark, sf_dir)
    # all four rule inputs off the shared Arrow profile (r13): the
    # interpreted per-token aggregate/filter/intersect lambdas collapse
    # into one vectorized pass — integers identical by construction
    p = t["documents"].select(
        "doc_id", text.doc_profile_pandas_expr(F.col("text")).alias("p")
    )
    n = F.col("p.n_tokens")
    m = p.select(
        "doc_id",
        n.alias("n_words"),
        F.when(
            n > 0,
            numeric.round6_expr(
                F.col("p.sum_tok_len").cast("double") / n.cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        F.when(
            n > 0,
            numeric.round6_expr(
                F.col("p.alpha_cnt").cast("double") / n.cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("alpha_frac"),
        F.col("p.n_stops").alias("n_stops"),
    )
    rule_wc = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    rule_mwl = (F.col("mean_word_len") >= 3.0) & (
        F.col("mean_word_len") <= 10.0
    )
    rule_af = F.col("alpha_frac") >= 0.8
    rule_st = F.col("n_stops") >= 2
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_frac",
        "n_stops",
        rule_wc.alias("rule_word_count"),
        rule_mwl.alias("rule_mean_word_len"),
        rule_af.alias("rule_alpha_frac"),
        rule_st.alias("rule_stopwords"),
        (rule_wc & rule_mwl & rule_af & rule_st).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Cross-source contamination matrix (round 7)
# ---------------------------------------------------------------------------


@register(
    "llm_corpus_overlap_matrix",
    oracle=f"""
        WITH {_SQL_DECON_CTES},
        sg AS (SELECT DISTINCT source, s FROM ex),
        tot AS (SELECT source, COUNT(*) AS n FROM sg GROUP BY source),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
          FROM sg a JOIN sg b ON a.s = b.s AND a.source < b.source
          GROUP BY 1, 2)
        SELECT p.src_a, p.src_b,
               CAST(p.n_shared AS BIGINT) AS n_shared,
               CAST(ta.n AS BIGINT) AS n_a,
               CAST(tb.n AS BIGINT) AS n_b,
               floor(CAST(p.n_shared AS DOUBLE)
                     / CAST(LEAST(ta.n, tb.n) AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 AS overlap_frac
        FROM pairs p
        JOIN tot ta ON ta.source = p.src_a
        JOIN tot tb ON tb.source = p.src_b
    """,
    tags=("dedup", "decontamination"),
)
def llm_corpus_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE contamination matrix: for every source pair, the
    count of distinct shared word-3grams and the min-normalized overlap
    fraction — the corpus-level complement of per-document
    decontamination (llm_decontaminate): it tells you WHICH feeds are
    copying from each other before you pick a canonical one.  Scale
    shape: grams dedup to (source, gram) FIRST (one map-combinable
    distinct), so the gram self-join fans out at most
    |sources|-choose-2 rows per gram regardless of how many documents
    repeat it — bounded by the source count, never by corpus size; the
    matrix itself is |sources|^2 rows, a model-sized result."""
    t = load_tables(spark, sf_dir)
    tok = dedup.spread(t["documents"]).select(
        "source", dedup.tokens_expr(F.col("text")).alias("toks")
    )
    sg = tok.select(
        "source",
        F.explode(dedup.shingles_expr(F.col("toks"))).alias("s"),
    ).distinct()
    tot = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sg.select(F.col("source").alias("src_a"), "s")
    b = sg.select(F.col("source").alias("src_b"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            numeric.round6_expr(
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("overlap_frac"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (round 7)
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

# CTE chain shared by the BM25 oracle and the RRF hybrid oracle: postings
# (tf/df), deterministic top-df query terms, corpus stats, 9dp-decimal term
# partials, per-doc sums, global (score, doc_id) ranking.
_BM25_SQL_CTES = f"""d AS (
          SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
          WHERE len({_SQL_TOKS}) > 0),
        dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
        words AS (SELECT doc_id, unnest(toks) AS w FROM d),
        tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY 1, 2),
        dft AS (SELECT w, COUNT(*) AS dfx FROM tf GROUP BY w),
        q AS (SELECT w, dfx FROM dft ORDER BY dfx DESC, w LIMIT 3),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS total_dl
          FROM dl),
        scored AS (
          SELECT tf.doc_id,
                 CAST(ROUND(
                   ROUND(ln((CAST(s.n_docs - q.dfx AS DOUBLE) + 0.5)
                            / (CAST(q.dfx AS DOUBLE) + 0.5) + 1.0), 9)
                   * ((CAST(tf.tf AS DOUBLE) * {_BM25_K1 + 1.0})
                      / (CAST(tf.tf AS DOUBLE)
                         + {_BM25_K1} * (1.0 - {_BM25_B}
                            + {_BM25_B} * (CAST(dl.dl AS DOUBLE)
                               / (CAST(s.total_dl AS DOUBLE)
                                  / CAST(s.n_docs AS DOUBLE)))))),
                   9) AS DECIMAL(20,9)) AS st
          FROM tf
          JOIN q ON q.w = tf.w
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats s),
        per AS (
          SELECT doc_id, SUM(st) AS s FROM scored GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, {numeric.sql_round6("CAST(s AS DOUBLE)")} AS bm25,
                 CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id)
                      AS BIGINT) AS rank
          FROM per)"""


@register(
    "llm_text_bm25",
    oracle=f"""
        WITH {_BM25_SQL_CTES}
        SELECT doc_id, bm25, rank FROM ranked WHERE rank <= {_BM25_TOPK}
    """,
    tags=("text", "retrieval"),
)
def llm_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked lexical retrieval (k1=1.2, b=0.75) — the sparse twin
    of the ANN family: score every document against the corpus's top-3
    most frequent terms (a deterministic self-contained query set) and
    return the top-20.  Exactness: each (doc, term) partial rounds its
    ln-idf to 9dp and the whole term score to 9dp DECIMAL before the
    per-doc sum (the llm_text_logprob discipline), so ranking is
    hash-exact cross-engine.

    Scale shape — rewritten in optimization r13 (guide §2.3/§2.4/§4.2):
    the old postings build shuffled EVERY distinct (doc, word) pair with
    its word string through a global groupBy, joined dl on another
    exchange — and tokenized the corpus once per consumer (measured
    8-16 s per JVM regexp pass at sf10).  Now:

      pass 1  df over per-doc DISTINCT words (row-local array_distinct
              below the explode — no (doc, word) exchange, the vocab
              aggregate map-combines) -> the 3 query terms COLLECT to
              the driver (3 rows: the collect-IS-the-model idiom, like
              IVF centroids / bloom words);
      pass 2  ONE integer-only Arrow pass computes (dl, tf of each
              query term) per document — no strings cross the Python
              boundary, nothing corpus-sized shuffles, and the tiny
              (doc_id, dl, tf x 3) relation persists for the stats
              aggregate + scoring (both consumers read ~20 MB);
      score   per-term decimal contributions as ROW-WISE expressions
              with the dfx literals — the old per-(doc, term) exchange
              and groupBy sum collapse into a projection (decimal
              addition is exact in any association), then the pinned
              TakeOrderedAndProject top-K."""
    from pyspark.sql.types import DecimalType
    from pyspark.sql.window import Window

    from ..cache import scoped_persist

    t = load_tables(spark, sf_dir)
    d = dedup.spread(t["documents"])
    toks = text.tokens_expr(F.col("text"))
    dft = (
        d.select(F.explode(F.array_distinct(toks)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("dfx"))
    )
    qrows = dft.orderBy(F.col("dfx").desc(), "w").limit(3).collect()
    qterms = [(r["w"], int(r["dfx"])) for r in qrows]
    prof = scoped_persist(
        d.select(
            "doc_id",
            text.query_tf_pandas_expr(
                F.col("text"), [w for w, _ in qterms]
            ).alias("p"),
        )
        .select("doc_id", "p.*")
        .filter(F.col("dl") > 0)
    )
    stats = prof.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    zero_dec = F.lit(0).cast(DecimalType(20, 9))

    def term_st(i: int, dfx: int):
        tf = F.col(f"tf{i}").cast("double")
        idf = F.round(
            F.log(
                ((F.col("n_docs") - F.lit(dfx)).cast("double") + F.lit(0.5))
                / (F.lit(dfx).cast("double") + F.lit(0.5))
                + F.lit(1.0)
            ),
            9,
        )
        part = (tf * F.lit(_BM25_K1 + 1.0)) / (
            tf
            + F.lit(_BM25_K1)
            * (
                F.lit(1.0 - _BM25_B)
                + F.lit(_BM25_B) * (F.col("dl").cast("double") / avgdl)
            )
        )
        # a term absent from the doc contributed NO row to the old
        # per-(doc, term) sum — the exact-zero decimal is the identity
        return F.when(
            F.col(f"tf{i}") > 0,
            F.round(idf * part, 9).cast(DecimalType(20, 9)),
        ).otherwise(zero_dec)

    s_expr = zero_dec
    any_tf = F.lit(False)
    for i, (_, dfx) in enumerate(qterms):
        s_expr = s_expr + term_st(i, dfx)
        any_tf = any_tf | (F.col(f"tf{i}") > 0)
    per = (
        prof.crossJoin(F.broadcast(stats))
        .filter(any_tf)
        .select("doc_id", s_expr.alias("s"))
    )
    # global top-K via TakeOrderedAndProject (per-partition top-K, K-row
    # merge — the pinned b12_topk shape), then rank only the K survivors:
    # identical ranks to a global row_number because the top-K rows ARE
    # ranks 1..K under the same total order (r12, VERDICT r11 wrong #2)
    top = per.orderBy(F.col("s").desc(), "doc_id").limit(_BM25_TOPK)
    w = Window.orderBy(F.col("s").desc(), "doc_id")  # bounded-window-ok: <= _BM25_TOPK rows
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "doc_id",
            numeric.round6_expr(F.col("s")).alias("bm25"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion (round 7)
# ---------------------------------------------------------------------------

_RRF_C = 60
_RRF_K = 10


@register(
    "llm_hybrid_rrf",
    oracle=f"""
        WITH {_BM25_SQL_CTES},
        lex AS (SELECT doc_id, rank AS r_lex FROM ranked
                WHERE rank <= {_BM25_TOPK}),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embx),
        qv AS (SELECT v FROM e WHERE vec_id = 0),
        dscored AS (
          SELECT c.vec_id AS doc_id,
                 round(list_cosine_similarity(c.v, q.v), 6) AS cos
          FROM e c, qv q WHERE c.vec_id <> 0),
        dr AS (SELECT doc_id,
                      CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
                           AS BIGINT) AS r_dense
               FROM dscored),
        dense AS (SELECT doc_id, r_dense FROM dr
                  WHERE r_dense <= {_BM25_TOPK}),
        fused AS (
          SELECT COALESCE(l.doc_id, dn.doc_id) AS doc_id,
                 l.r_lex, dn.r_dense,
                 CAST(COALESCE(ROUND(CAST(1 AS DOUBLE)
                      / CAST({_RRF_C} + l.r_lex AS DOUBLE), 9), 0)
                      AS DECIMAL(20,9))
                 + CAST(COALESCE(ROUND(CAST(1 AS DOUBLE)
                        / CAST({_RRF_C} + dn.r_dense AS DOUBLE), 9), 0)
                        AS DECIMAL(20,9)) AS s
          FROM lex l FULL OUTER JOIN dense dn ON l.doc_id = dn.doc_id),
        out AS (
          SELECT doc_id, r_lex, r_dense,
                 {numeric.sql_round6("CAST(s AS DOUBLE)")} AS rrf,
                 CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id)
                      AS BIGINT) AS rank
          FROM fused)
        SELECT doc_id, r_lex, r_dense, rrf, rank
        FROM out WHERE rank <= {_RRF_K}
    """,
    tags=("text", "retrieval", "similarity"),
)
def llm_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval by reciprocal rank fusion (Cormack et al. 2009):
    the BM25 top-20 (llm_text_bm25's lexical ranking, reused verbatim)
    fuses with the dense cosine top-20 around query vector 0 as
    sum(1/(60+rank)), missing-list membership contributing nothing —
    the standard way production search merges a sparse and a dense
    index without score calibration.  Rank reciprocals round to 9dp and
    sum in the decimal domain, so the fused ordering is hash-exact.
    Scale shape: both component rankings are already top-k-bounded
    model-sized lists; the fusion is a 40-row full-outer join — free at
    any corpus size; all the heavy lifting inherits the component
    operators' bounded shapes."""
    from pyspark.sql.types import DecimalType
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    lex = llm_text_bm25(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("r_lex")
    )
    emb = _emb(t)
    dense = (
        similarity.brute_force_topk(
            emb, "vec_id", "embedding",
            emb.filter(F.col("vec_id") == 0), _BM25_TOPK,
        )
        .select(F.col("cand_id").alias("doc_id"), F.col("rank").alias("r_dense"))
    )
    zero = F.lit(0).cast(DecimalType(20, 9))
    recip = lambda col: F.coalesce(  # noqa: E731
        F.round(
            F.lit(1).cast("double") / (F.lit(_RRF_C) + F.col(col)).cast("double"),
            9,
        ).cast(DecimalType(20, 9)),
        zero,
    )
    fused = lex.join(dense, "doc_id", "full").withColumn(
        "s", recip("r_lex") + recip("r_dense")
    )
    w = Window.orderBy(F.col("s").desc(), "doc_id")  # bounded-window-ok: <= 2*_BM25_TOPK fused rows
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _RRF_K)
        .select(
            "doc_id",
            "r_lex",
            "r_dense",
            numeric.round6_expr(F.col("s")).alias("rrf"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Round 11 — semantic quality cascade, fuzzy URL dedup, incremental
# decontamination (the three surface-growth items from VERDICT r10 §Next)
# ---------------------------------------------------------------------------

_CAL_MOD = 5            # calibration-modulus FLOOR: vec_id % mod == 0
_CAL_KEEP_NUM = 2       # keep scores >= the (2/5 from the top) sample rank
_CAL_KEEP_DEN = 5
_CAL_PER = 1024         # one calibration row per ~1024 embeddings
_CAL_FALLBACK = -1e18   # empty-sample threshold: keep every survivor


def _cal_mod(n_emb: int) -> int:
    """Data-scaled calibration modulus: ``max(5, n_emb // 1024)``
    (all-integer; oracle twin GREATEST(5, COUNT(*) // 1024)).  The r11
    shape sampled a constant FRACTION (vec_id % 5 == 0 — 20% of the
    corpus) and ranked it in ONE task (`WindowExec: No Partition
    Defined`), the same constant-fraction-to-one-place disease fixed
    three times elsewhere that round (semantic cells, URL buckets,
    state partitions).  Scaling the modulus keeps the sample
    constant-SIZE (~1024·5 rows at any corpus size, ~5120 at the floor
    crossover), which is also what a real calibration pass does: the
    empirical quantile of a few thousand scores is as good as the
    quantile of 20% of 100 TB.  Driver scales are unchanged (500/500/
    2000 embeddings → mod 5 everywhere)."""
    return max(_CAL_MOD, n_emb // _CAL_PER)


def _semantic_head_weights() -> list[int]:
    """Deterministic integer weights in [-1000, 1000] for the embedding
    linear head (md5-derived, salt 'sem:'), the same shipped-in-the-plan
    model idiom as text._classifier_weights — a stand-in for a trained
    FineWeb-Edu-style regression head with identical shape/plumbing."""
    import hashlib

    return [
        int(hashlib.md5(f"sem:{j}".encode()).hexdigest()[:15], 16) % 2001
        - 1000
        for j in range(_EMB_DIM)
    ]


def _semantic_score_expr(vec) -> "F.Column":
    """round6( dot(vec, W) / 1000 ) — sequential left-to-right fold in
    double, matching DuckDB's list_sum order (the proven line-for-line
    idiom of the PQ/SQ8 oracles)."""
    w = F.array(*[F.lit(x) for x in _semantic_head_weights()])
    dot = F.aggregate(
        F.zip_with(vec, w, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return numeric.round6_expr(dot / F.lit(1000.0))


# r12 measurement note: an Arrow-batched numpy twin of the stage-3
# scorer (the ivf_cells_pandas construction, bitwise-verified) was built
# and REJECTED by measurement — sf10 cascade wall 52.4 s with it vs
# 49.8 s with the fold, because the embeddings table (~200k rows at
# sf10) is a tenth of the docs table the stage-1/2 tokenizer+classifier
# scan (~2M rows): stage 3 is not the cascade's slope.  The ×7.25/decade
# step is the docs-side row-linear data term, shared with every
# tokenize-everything key.


def _sql_semantic_score(emb: str = "embedding") -> str:
    w = "[" + ",".join(str(x) for x in _semantic_head_weights()) + "]"
    dot = (
        f"list_sum(list_transform(range(1, {_EMB_DIM + 1}), "
        f"i -> ({emb}::DOUBLE[])[i] * CAST(({w})[i] AS DOUBLE)))"
    )
    return numeric.sql_round6(f"({dot} / 1000.0)")


# Shared by llm_quality_cascade and the per-source funnel report — one
# definition so the two can never drift.
_SQL_CASCADE_ORACLE = (
    f"""
        WITH feat AS MATERIALIZED (
          SELECT doc_id,
                 CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
                 {{CLS}} AS logit_sum,
                 (len({_SQL_TOKS}) BETWEEN 20 AND 2000
                  AND length(COALESCE(text, '')) / len({_SQL_TOKS}) <= 12
                  AND len(regexp_extract_all(COALESCE(text, ''),
                          '[.,;:!?]')) * 4 <= len({_SQL_TOKS})) AS s1
          FROM documents),
        scored AS MATERIALIZED (
          SELECT vec_id, {{SEM}} AS sem_score FROM embx),
        km AS (SELECT GREATEST({_CAL_MOD}, COUNT(*) // {_CAL_PER}) AS m
               FROM embx),
        cal AS (SELECT vec_id, sem_score AS s FROM scored, km
                WHERE vec_id % km.m = 0),
        ranked AS (SELECT s,
                          ROW_NUMBER() OVER (ORDER BY s DESC, vec_id) AS rn,
                          COUNT(*) OVER () AS cnt
                   FROM cal),
        thr AS (SELECT COALESCE(
                   (SELECT s FROM ranked
                    WHERE rn = GREATEST(1, (cnt * {_CAL_KEEP_NUM})
                                           // {_CAL_KEEP_DEN})),
                   {_CAL_FALLBACK}) AS threshold),
        surv AS (
          SELECT f.doc_id, f.n_tokens, f.logit_sum, s.sem_score,
                 CASE WHEN s.vec_id IS NOT NULL THEN t.threshold END
                     AS threshold,
                 CASE WHEN s.vec_id IS NULL THEN 'keep_no_embedding'
                      WHEN s.sem_score >= t.threshold THEN 'keep_semantic'
                      ELSE 'drop_semantic' END AS verdict
          FROM feat f
          LEFT JOIN scored s ON f.doc_id = s.vec_id
          CROSS JOIN thr t
          WHERE f.s1 AND f.logit_sum > 0),
        fails AS (
          SELECT doc_id, n_tokens, logit_sum,
                 CAST(NULL AS DOUBLE) AS sem_score,
                 CAST(NULL AS DOUBLE) AS threshold,
                 CASE WHEN NOT s1 THEN 'drop_heuristic'
                      ELSE 'drop_classifier' END AS verdict
          FROM feat WHERE NOT (s1 AND logit_sum > 0))
        SELECT doc_id, n_tokens, logit_sum, sem_score, threshold, verdict,
               verdict IN ('keep_semantic', 'keep_no_embedding') AS keep
        FROM (SELECT * FROM surv UNION ALL SELECT * FROM fails)
    """.replace("{CLS}", text.sql_classifier_score(_SQL_TOKS))
    .replace("{SEM}", _sql_semantic_score())
)


@register(
    "llm_quality_cascade",
    oracle=_SQL_CASCADE_ORACLE,
    tags=("text", "classifier", "similarity"),
)
def llm_quality_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb-style three-stage quality cascade with a CALIBRATED
    semantic threshold — the classifier-cascade shape a 100 TB corpus
    filter runs so the expensive model only ever sees cheap-stage
    survivors:

      stage 1  Gopher-ish heuristics (token count / mean token length /
               punctuation ratio) — pushed-down Catalyst predicates;
      stage 2  hashed-token linear classifier (the fastText stand-in,
               text.classifier_score_expr) — zero-shuffle map stage;
      stage 3  embedding linear head (the FineWeb-Edu regression-head
               stand-in): dot(embedding, W)/1000 over the embeddings
               table, joined ONLY for stage-1/2 survivors, with the keep
               threshold CALIBRATED from the empirical score
               distribution of a data-scaled sample (vec_id % mod == 0,
               mod = max(5, n//1024) — see :func:`_cal_mod`), not a
               magic constant: threshold = the (2/5·n)-th largest sample
               score, i.e. keep ≈ the top 40% of the sample quantile.

    Scale shape (r12 rework of the r11 single-partition rank): the
    calibration sample is constant-SIZE by construction (~5k rows at
    any corpus size), the k-th-largest sample score comes from
    ``orderBy().limit(k)`` — TakeOrderedAndProject, per-partition
    top-k then a k-row merge, the pinned b12_topk shape — followed by
    a 1-row ``min`` aggregate, so there is NO unpartitioned window and
    no global sort anywhere; the 1-row threshold broadcasts to the
    corpus; survivors join embeddings on the id equi-key
    (co-partitionable); docs without an embedding fall back to the
    stage-2 decision ('keep_no_embedding'), the embed-on-demand gap
    every real pipeline has.  An EMPTY calibration sample (no
    embedding ids hit the modulus) degrades to threshold=-1e18 — every
    stage-1/2 survivor keeps — instead of silently dropping all
    survivors through an empty cross join (ADVICE r11)."""
    t = load_tables(spark, sf_dir)
    d = dedup.spread(t["documents"])
    # stages 1+2 come off the shared Arrow-vectorized doc profile (r13;
    # text.doc_profile_pandas_expr — the BPE-encode pattern applied to
    # the family's tokenize+classify scan): same integers, one C pass
    prof = d.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit("")))
        .cast("long")
        .alias("n_chars"),
        text.doc_profile_pandas_expr(F.col("text")).alias("p"),
    )
    n_tok = F.col("p.n_tokens")
    base = prof.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.col("p.logit_sum").alias("logit_sum"),
        (
            n_tok.between(20, 2000)
            & (F.col("n_chars") / n_tok <= 12)
            & (F.col("p.punct_count") * 4 <= n_tok)
        ).alias("s1"),
    ).withColumn("s2", F.col("logit_sum") > 0)
    return _cascade_stage3(t, sf_dir, base, "logit_sum")


def _cascade_stage3(
    t, sf_dir: str, base: DataFrame, score_col: str
) -> DataFrame:
    """Stage 3 of the quality cascade — the calibrated embedding head —
    shared by the fixed-weight (``llm_quality_cascade``) and TRAINED
    (``llm_quality_cascade_trained``) variants so the calibration
    machinery can never drift between them.  ``base`` carries
    (doc_id, n_tokens, <score_col>, s1, s2)."""
    emb = _emb(t)
    # plan-build-time data scaling, the _url_bucket_count idiom: the
    # modulus and top-k literals come from column-pruned counts memoized
    # per (session, sf_dir) — one scan per session, not per query build
    # (cache.plan_count; ADVICE r12)
    mod = _cal_mod(plan_count(emb, sf_dir, "embeddings_nonnull"))
    n_cal = plan_count(
        emb.filter(F.col("vec_id") % mod == 0),
        sf_dir,
        f"embeddings_cal_mod{mod}",
    )
    k = max(1, (n_cal * _CAL_KEEP_NUM) // _CAL_KEEP_DEN)
    scored = emb.select(
        "vec_id", _semantic_score_expr(F.col("embedding")).alias("sem_score")
    )
    cal = scored.filter(F.col("vec_id") % mod == 0).select(
        "vec_id", F.col("sem_score").alias("s")
    )
    # k-th largest sample score = min over the top-k (s DESC, vec_id)
    # rows — TakeOrderedAndProject + a 1-row aggregate, never a window;
    # the argless agg always yields one row (NULL s on an empty
    # sample), so the COALESCE fallback keeps the broadcast non-empty
    thr = (
        cal.orderBy(F.col("s").desc(), "vec_id")
        .limit(k)
        .agg(F.min("s").alias("threshold"))
        .select(
            F.coalesce(F.col("threshold"), F.lit(_CAL_FALLBACK)).alias(
                "threshold"
            )
        )
    )

    surv = (
        base.filter(F.col("s1") & F.col("s2"))
        .join(scored, F.col("doc_id") == F.col("vec_id"), "left")
        .crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            "n_tokens",
            score_col,
            "sem_score",
            F.when(F.col("vec_id").isNotNull(), F.col("threshold")).alias(
                "threshold"
            ),
            F.when(F.col("vec_id").isNull(), F.lit("keep_no_embedding"))
            .when(
                F.col("sem_score") >= F.col("threshold"),
                F.lit("keep_semantic"),
            )
            .otherwise(F.lit("drop_semantic"))
            .alias("verdict"),
        )
    )
    fails = base.filter(~(F.col("s1") & F.col("s2"))).select(
        "doc_id",
        "n_tokens",
        score_col,
        F.lit(None).cast("double").alias("sem_score"),
        F.lit(None).cast("double").alias("threshold"),
        F.when(~F.col("s1"), F.lit("drop_heuristic"))
        .otherwise(F.lit("drop_classifier"))
        .alias("verdict"),
    )
    return surv.unionByName(fails).withColumn(
        "keep", F.col("verdict").isin("keep_semantic", "keep_no_embedding")
    )


# -- trained Naive-Bayes quality classifier (r13; VERDICT r12 Next #4) -------

_NB_POS_SOURCES = ("src0", "src1")  # curated-reference positive seed (the
# decontamination convention's bench sources double as the labeled
# high-quality set — the FineWeb-Edu shape: positives are a curated corpus)
_NB_NEG_MOD = 17  # negative seed: every 17th non-reference document


def _nb_token_buckets(d: DataFrame) -> DataFrame:
    """(doc_id, source, j, c): per-document md5 feature-hash bucket
    COUNTS (the classifier_score_expr hashing trick — identical bucket
    ids, so the trained and fixed-weight classifiers share a feature
    space).  Optimization r13: was one row + one md5 per token
    OCCURRENCE; now one Arrow pass per document (md5 once per unique
    token per worker, rows = distinct buckets per doc) — downstream
    aggregates weigh by ``c``, bitwise-identical integer/decimal
    arithmetic (see text.nb_bucket_counts_pandas_expr)."""
    return d.select(
        "doc_id",
        "source",
        F.explode(
            text.nb_bucket_counts_pandas_expr(F.col("text"))
        ).alias("jc"),
    ).select("doc_id", "source", F.col("jc.j").alias("j"), F.col("jc.c").alias("c"))


def _nb_doc_scores(
    t, train_even_only: bool = False, score_filter=None
) -> DataFrame:
    """Per-document (doc_id, n_tokens, nb_sum) under a multinomial
    Naive-Bayes log-count-ratio head TRAINED from the deterministic
    seed labeling (positives = the curated _NB_POS_SOURCES feeds,
    negatives = every _NB_NEG_MOD-th other document) — the
    quality-classifier training loop VERDICT r12 named as the missing
    piece of the fixed-weight stand-in.

    Training is two integer aggregates: per-bucket token-occurrence
    counts by label (map-combinable, CLASSIFIER_DIM rows out) and their
    1-row totals; the weight per bucket is the Laplace-smoothed
    log-count ratio ln((pos_j+1)/(pos_tot+D)) - ln((neg_j+1)/(neg_tot+D))
    computed ENGINE-SIDE under the accepted cross-engine ln recipe
    (round 9dp -> DECIMAL(20,9), the llm_text_logprob pattern), so the
    model is hash-exact without ever leaving the DataFrame domain.
    Buckets unseen in the seed fall back to the zero-count weight (one
    1-row broadcast).  Scoring joins the corpus's bucketed tokens to
    the broadcast D-row model and sums weights in the DECIMAL domain —
    order-free exact under any partitioning.

    Scale shape at 100 TB: one seed-filtered corpus-linear explode for
    training (filter pushes below the Arrow pass), then ONE fused Arrow
    scoring pass over the score side — the trained model is
    CLASSIFIER_DIM rows, so it COLLECTS to the driver and ships in the
    scoring closure (the BM25 collect-IS-the-model idiom), replacing
    the old per-(doc, bucket) explode + broadcast weight join +
    per-doc rollup (optimization r13: the bucket pass alone measured
    7.2 s at the sf10 decade — nested (j, c) arrays through Arrow plus
    a 16M-row explode-join-aggregate, now gone).  The weight ln stays
    ENGINE-side (the cross-engine ln recipe), only the finished
    DECIMAL(20,9) values collect."""
    w_scaled = _nb_model_scaled(t, train_even_only=train_even_only)
    d = dedup.spread(t["documents"])
    if score_filter is not None:
        d = d.filter(score_filter)
    q = d.select(
        "doc_id",
        text.nb_profile_score_pandas_expr(F.col("text"), w_scaled).alias(
            "q"
        ),
    )
    # the old explode dropped zero-token documents from the output —
    # reproduce that row set exactly (consumers left-join + coalesce)
    return q.select(
        "doc_id",
        F.col("q.n_tokens").alias("n_tokens"),
        F.col("q.nb9").cast("decimal(38,9)").alias("nb_sum"),
    ).filter(F.col("n_tokens") > 0)


def _nb_model_scaled(t, train_even_only: bool = False) -> list[int] | None:
    """Train the NB log-count-ratio head (the :func:`_nb_doc_scores`
    aggregates, ln engine-side) and return the CLASSIFIER_DIM-long list
    of scale-9 scaled-int weights with the unseen-bucket fallback baked
    in — or ``None`` for the degenerate empty-seed corpus, where every
    weight is the NULL decimal (the old all-NULL weight sum).  One
    seed-sliced tokenize + one collect of <= CLASSIFIER_DIM + 1 rows."""
    from pyspark.sql.types import DecimalType

    dim = text.CLASSIFIER_DIM
    docs = dedup.spread(t["documents"])
    is_pos_doc = F.col("source").isin(*_NB_POS_SOURCES)
    seed_docs = docs.filter(is_pos_doc | (F.col("doc_id") % _NB_NEG_MOD == 0))
    if train_even_only:
        # held-out protocol (the llm_text_lm_heldout convention): train
        # on even-id seed docs only; odd-id seeds stay unseen for eval
        seed_docs = seed_docs.filter(F.col("doc_id") % 2 == 0)
    is_pos = F.col("source").isin(*_NB_POS_SOURCES)
    cnt = _nb_token_buckets(seed_docs).groupBy("j").agg(
        F.sum(F.when(is_pos, F.col("c")).otherwise(0))
        .cast("long")
        .alias("pos_cnt"),
        F.sum(F.when(is_pos, 0).otherwise(F.col("c")))
        .cast("long")
        .alias("neg_cnt"),
    )
    tot = cnt.agg(
        F.sum("pos_cnt").cast("long").alias("pos_tot"),
        F.sum("neg_cnt").cast("long").alias("neg_tot"),
    )

    def ln9(num, den):  # ROUND(ln(x), 9) -> DECIMAL(20,9), the logprob recipe
        return F.round(
            F.log(num.cast("double") / den.cast("double")), 9
        ).cast(DecimalType(20, 9))

    w = cnt.crossJoin(F.broadcast(tot)).select(
        "j",
        (
            ln9(F.col("pos_cnt") + 1, F.col("pos_tot") + dim)
            - ln9(F.col("neg_cnt") + 1, F.col("neg_tot") + dim)
        ).alias("w"),
    )
    w0 = tot.select(
        F.lit(-1).cast("long").alias("j"),
        (
            ln9(F.lit(1), F.col("pos_tot") + dim)
            - ln9(F.lit(1), F.col("neg_tot") + dim)
        ).alias("w"),
    )
    rows = w.unionByName(w0).collect()  # <= dim + 1 rows — the model
    by_j = {r["j"]: r["w"] for r in rows}
    fallback = by_j.get(-1)
    if fallback is None:
        # empty seed: pos_tot/neg_tot NULL -> every weight NULL
        return None
    def scale9(dec) -> int:
        return int(dec.scaleb(9))

    w0_scaled = scale9(fallback)
    return [
        scale9(by_j[j]) if j in by_j else w0_scaled for j in range(dim)
    ]


# DuckDB twin of _nb_doc_scores — CTE template reused by the trained keys
# (train_pred narrows the training seed, e.g. the held-out even-id split).
def _sql_nb_ctes(train_pred: str = "TRUE") -> str:
    return f"""
        d AS (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents),
        tokj AS MATERIALIZED (
          SELECT doc_id, source,
                 ({_SQL_H60.format(x='tk')} % {text.CLASSIFIER_DIM}) AS j
          FROM (SELECT doc_id, source, unnest(toks) AS tk FROM d)),
        seed AS (SELECT j, source IN {_NB_POS_SOURCES!r} AS pos
                 FROM tokj
                 WHERE (source IN {_NB_POS_SOURCES!r}
                        OR doc_id % {_NB_NEG_MOD} = 0)
                   AND {train_pred}),
        cnt AS (SELECT j,
                       CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                           AS pos_cnt,
                       CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
                           AS neg_cnt
                FROM seed GROUP BY j),
        tot AS (SELECT CAST(SUM(pos_cnt) AS BIGINT) AS pos_tot,
                       CAST(SUM(neg_cnt) AS BIGINT) AS neg_tot
                FROM cnt),
        wts AS (SELECT j,
                  CAST(ROUND(ln(CAST(pos_cnt + 1 AS DOUBLE)
                              / CAST(pos_tot + {text.CLASSIFIER_DIM}
                                     AS DOUBLE)), 9) AS DECIMAL(20,9))
                - CAST(ROUND(ln(CAST(neg_cnt + 1 AS DOUBLE)
                              / CAST(neg_tot + {text.CLASSIFIER_DIM}
                                     AS DOUBLE)), 9) AS DECIMAL(20,9)) AS w
                FROM cnt, tot),
        w0 AS (SELECT
                  CAST(ROUND(ln(CAST(1 AS DOUBLE)
                              / CAST(pos_tot + {text.CLASSIFIER_DIM}
                                     AS DOUBLE)), 9) AS DECIMAL(20,9))
                - CAST(ROUND(ln(CAST(1 AS DOUBLE)
                              / CAST(neg_tot + {text.CLASSIFIER_DIM}
                                     AS DOUBLE)), 9) AS DECIMAL(20,9)) AS w0
               FROM tot),
        nbper AS MATERIALIZED (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 SUM(COALESCE(wts.w, w0.w0)) AS nb_sum
          FROM tokj LEFT JOIN wts USING (j) CROSS JOIN w0
          GROUP BY doc_id)
"""


_SQL_NB_CTES = _sql_nb_ctes()


@register(
    "llm_quality_classifier_trained",
    oracle=f"""
        WITH {_SQL_NB_CTES}
        SELECT dd.doc_id,
               CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               {numeric.sql_round6(
                   "COALESCE(CAST(p.nb_sum AS DOUBLE), 0.0)")} AS nb_score,
               COALESCE(p.nb_sum > 0, FALSE) AS keep,
               CASE WHEN dd.source IN {_NB_POS_SOURCES!r} THEN 'pos'
                    WHEN dd.doc_id % {_NB_NEG_MOD} = 0 THEN 'neg'
               END AS seed_label
        FROM documents dd LEFT JOIN nbper p ON dd.doc_id = p.doc_id
    """,
    tags=("text", "classifier", "training"),
)
def llm_quality_classifier_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRAINED quality classifier (the FineWeb-Edu/DCLM loop, VERDICT
    r12 What's-missing #2): a multinomial Naive-Bayes log-count-ratio
    head over hashed tokens, trained distributed from the deterministic
    seed labeling and applied to the whole corpus — see
    :func:`_nb_doc_scores` for the exactness recipe and scale shape.
    Every document comes back with its token count, NB score (round6 of
    the exact decimal weight sum), keep = score > 0, and its seed role
    ('pos'/'neg'/NULL) so the training set is auditable in-band."""
    t = load_tables(spark, sf_dir)
    per = _nb_doc_scores(t)
    is_pos = F.col("source").isin(*_NB_POS_SOURCES)
    return (
        t["documents"]
        .select("doc_id", "source")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            numeric.round6_expr(
                F.coalesce(F.col("nb_sum").cast("double"), F.lit(0.0))
            ).alias("nb_score"),
            F.coalesce(F.col("nb_sum") > 0, F.lit(False)).alias("keep"),
            F.when(is_pos, F.lit("pos"))
            .when(F.col("doc_id") % _NB_NEG_MOD == 0, F.lit("neg"))
            .alias("seed_label"),
        )
    )


@register(
    "llm_quality_cascade_trained",
    oracle=(
        f"""
        WITH {_SQL_NB_CTES},
        feat AS MATERIALIZED (
          SELECT dd.doc_id,
                 CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
                 {numeric.sql_round6(
                     "COALESCE(CAST(p.nb_sum AS DOUBLE), 0.0)")} AS nb_score,
                 COALESCE(p.nb_sum > 0, FALSE) AS s2,
                 (len({_SQL_TOKS}) BETWEEN 20 AND 2000
                  AND length(COALESCE(text, '')) / len({_SQL_TOKS}) <= 12
                  AND len(regexp_extract_all(COALESCE(text, ''),
                          '[.,;:!?]')) * 4 <= len({_SQL_TOKS})) AS s1
          FROM documents dd LEFT JOIN nbper p ON dd.doc_id = p.doc_id),
        scored AS MATERIALIZED (
          SELECT vec_id, {{SEM}} AS sem_score FROM embx),
        km AS (SELECT GREATEST({_CAL_MOD}, COUNT(*) // {_CAL_PER}) AS m
               FROM embx),
        cal AS (SELECT vec_id, sem_score AS s FROM scored, km
                WHERE vec_id % km.m = 0),
        ranked AS (SELECT s,
                          ROW_NUMBER() OVER (ORDER BY s DESC, vec_id) AS rn,
                          COUNT(*) OVER () AS cnt
                   FROM cal),
        thr AS (SELECT COALESCE(
                   (SELECT s FROM ranked
                    WHERE rn = GREATEST(1, (cnt * {_CAL_KEEP_NUM})
                                           // {_CAL_KEEP_DEN})),
                   {_CAL_FALLBACK}) AS threshold),
        surv AS (
          SELECT f.doc_id, f.n_tokens, f.nb_score, s.sem_score,
                 CASE WHEN s.vec_id IS NOT NULL THEN t.threshold END
                     AS threshold,
                 CASE WHEN s.vec_id IS NULL THEN 'keep_no_embedding'
                      WHEN s.sem_score >= t.threshold THEN 'keep_semantic'
                      ELSE 'drop_semantic' END AS verdict
          FROM feat f
          LEFT JOIN scored s ON f.doc_id = s.vec_id
          CROSS JOIN thr t
          WHERE f.s1 AND f.s2),
        fails AS (
          SELECT doc_id, n_tokens, nb_score,
                 CAST(NULL AS DOUBLE) AS sem_score,
                 CAST(NULL AS DOUBLE) AS threshold,
                 CASE WHEN NOT s1 THEN 'drop_heuristic'
                      ELSE 'drop_classifier' END AS verdict
          FROM feat WHERE NOT (s1 AND s2))
        SELECT doc_id, n_tokens, nb_score, sem_score, threshold, verdict,
               verdict IN ('keep_semantic', 'keep_no_embedding') AS keep
        FROM (SELECT * FROM surv UNION ALL SELECT * FROM fails)
    """.replace("{SEM}", _sql_semantic_score())
    ),
    tags=("text", "classifier", "similarity", "training"),
)
def llm_quality_cascade_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The quality cascade with the TRAINED Naive-Bayes head as stage 2
    (VERDICT r12 Next #4's wiring ask): stage 1 heuristics and the
    stage-3 calibrated embedding head are the shared
    :func:`_cascade_stage3` machinery (identical to
    llm_quality_cascade), stage 2 keeps docs whose trained NB decimal
    weight sum is positive.  Same verdict taxonomy, so the funnel/
    ablation reporting shapes apply unchanged."""
    t = load_tables(spark, sf_dir)
    # ONE fused Arrow pass (optimization r13): stage-1 profile features
    # AND the trained-NB score from the same tokenize + token memo —
    # previously a profile pass plus a separate bucket-counts pass with
    # a per-(doc, bucket) explode + weight join (the model is collected
    # by _nb_model_scaled and rides the scoring closure).  Zero-token
    # documents score the exact-zero decimal, which the old left join's
    # missing-row coalesce also produced — values identical.
    w_scaled = _nb_model_scaled(t)
    d = dedup.spread(t["documents"])
    fused = d.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit("")))
        .cast("long")
        .alias("n_chars"),
        text.nb_profile_score_pandas_expr(
            F.col("text"), w_scaled, with_profile=True
        ).alias("q"),
    )
    n_tok = F.col("q.n_tokens")
    nb_sum = F.col("q.nb9").cast("decimal(38,9)")
    base = fused.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        numeric.round6_expr(
            F.coalesce(nb_sum.cast("double"), F.lit(0.0))
        ).alias("nb_score"),
        (
            n_tok.between(20, 2000)
            & (F.col("n_chars") / n_tok <= 12)
            & (F.col("q.punct_count") * 4 <= n_tok)
        ).alias("s1"),
        F.coalesce(nb_sum > 0, F.lit(False)).alias("s2"),
    )
    return _cascade_stage3(t, sf_dir, base, "nb_score")


@register(
    "llm_quality_classifier_heldout",
    oracle=f"""
        WITH {_sql_nb_ctes("doc_id % 2 = 0")},
        ev AS (SELECT doc_id,
                      CASE WHEN source IN {_NB_POS_SOURCES!r}
                           THEN 'pos' ELSE 'neg' END AS seed_label
               FROM documents
               WHERE (source IN {_NB_POS_SOURCES!r}
                      OR doc_id % {_NB_NEG_MOD} = 0)
                 AND doc_id % 2 = 1)
        SELECT e.seed_label,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN COALESCE(p.nb_sum > 0, FALSE)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
               {numeric.sql_round6(
                   "CAST(SUM(CASE WHEN (e.seed_label = 'pos') = "
                   "COALESCE(p.nb_sum > 0, FALSE) THEN 1 ELSE 0 END) "
                   "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")} AS accuracy
        FROM ev e LEFT JOIN nbper p USING (doc_id)
        GROUP BY e.seed_label
    """,
    tags=("text", "classifier", "training", "reporting"),
)
def llm_quality_classifier_heldout(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HELD-OUT acceptance gate for the trained NB classifier — the
    evaluation a production quality filter ships before it gates a
    crawl: train on the EVEN-id half of the seed labeling
    (llm_text_lm_heldout's protocol — the model never sees the docs it
    is scored on), score the odd-id half, and report per-label
    (n_docs, predicted keeps, accuracy).  A label whose held-out
    accuracy collapses means the hashed-feature space or the seed
    labeling is broken — this table is the gate that catches it before
    the corpus filter runs.

    Scale shape: identical to llm_quality_classifier_trained (two
    integer training aggregates + broadcast model scoring) plus one
    2-row label rollup; accuracy is an integer/integer ratio, so the
    tie-safe floor rounding applies (the seed-202 class).

    Expected READING on the synthetic fixture: pos accuracy is high and
    neg accuracy near zero — the generator draws every source from the
    same text distribution, so a token-distribution classifier CANNOT
    separate a random-negative sample from the curated feeds, and the
    gate correctly reports that (a real crawl's negatives differ
    distributionally and score separably).  The oracle checks the exact
    counts, not a quality threshold — the operator under test is the
    evaluation machinery."""
    t = load_tables(spark, sf_dir)
    is_pos_f = F.col("source").isin(*_NB_POS_SOURCES)
    # score-side pruning: only the odd-id seed slice is evaluated, so
    # the scoring explode never touches the rest of the corpus (the
    # left join would discard it anyway — same result, corpus-fraction
    # less work at 100 TB; the oracle's nbper scores all docs and the
    # final join selects the same slice, so hashes are unchanged)
    per = _nb_doc_scores(
        t,
        train_even_only=True,
        score_filter=(
            (is_pos_f | (F.col("doc_id") % _NB_NEG_MOD == 0))
            & (F.col("doc_id") % 2 == 1)
        ),
    ).select("doc_id", "nb_sum")
    d = t["documents"]
    is_pos = F.col("source").isin(*_NB_POS_SOURCES)
    ev = d.filter(
        (is_pos | (F.col("doc_id") % _NB_NEG_MOD == 0))
        & (F.col("doc_id") % 2 == 1)
    ).select(
        "doc_id",
        F.when(is_pos, F.lit("pos")).otherwise(F.lit("neg")).alias(
            "seed_label"
        ),
    )
    keep = F.coalesce(F.col("nb_sum") > 0, F.lit(False))
    correct = F.when(F.col("seed_label") == "pos", keep).otherwise(~keep)
    return (
        ev.join(per, "doc_id", "left")
        .groupBy("seed_label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_keep"),
            numeric.round6_expr(
                F.sum(F.when(correct, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("accuracy"),
        )
    )


_URL_MOD = 40  # path-bucket FLOOR of the synthetic URL fixture
_URL_DOCS_PER_BUCKET = 128


def _url_bucket_count(n_docs: int) -> int:
    """Data-scaled path-bucket count for the URL fixture:
    ``max(40, n // 128)`` (all-integer; oracle twin GREATEST(40,
    COUNT(*) // 128)).  A FIXED bucket width made same-URL block
    population grow linearly with the corpus — the semantic-dedup
    fixed-cell disease surfacing in the fixture itself: 5.4k candidate
    pairs at sf0.1 exploded to 470k at sf1 (O(N²/4000)).  Scaling the
    bucket count keeps per-URL duplicate cardinality constant, which is
    also what a real crawl looks like (a URL's duplicate count does not
    grow because the crawl got bigger).  Driver scales are unchanged
    (500/500/5000 docs → 40 buckets everywhere)."""
    return max(_URL_MOD, n_docs // _URL_DOCS_PER_BUCKET)


def _url_buckets(t, sf_dir: str) -> int:
    """Data-scaled URL bucket count off the documents row count, read
    from the parquet FOOTER (cache.table_footer_count): a whole-table
    count needs no scan at all — the first fresh-session build at the
    sf10 decade paid a 4 s Spark count here before r13."""
    from ..cache import table_footer_count

    return _url_bucket_count(table_footer_count(sf_dir, "documents"))


def _url_fixture(docs: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """(doc_id, url, text) crawl fixture with deterministic DIRTY urls —
    the documents table carries no URL column, so one is derived from
    (source, lang, doc_id), the same fixture-derivation idiom as
    _phash_media: query-string / www-prefix / trailing-slash variants on
    the base corpus, plus for every 23rd doc an exact MIRROR copy
    (+1_000_000, 'm-' host, same text) and a CHANGED RE-CRAWL
    (+2_000_000, '-' path variant, last char edited).

    The path bucket is md5-derived, NOT doc_id % k: the generator
    assigns source = doc_id % 20, so any affine bucket collapses to 2
    values per source and the (host, path) blocks grow quadratically
    with sf (93k pairs at sf0.1 under the affine form vs ~5k hashed).
    ``n_buckets`` scales with the corpus (see :func:`_url_bucket_count`)
    so per-URL duplicate cardinality stays constant across scales; a
    caller that sees only a SLICE of the corpus (the streaming admission
    op derives fixture rows per micro-batch) must pass the full-table
    value explicitly or the per-batch count would shift the buckets."""
    from ..operators.hashing import hash60_expr

    if n_buckets is None:
        n_buckets = _url_bucket_count(docs.count())
    b = docs.select(
        "doc_id",
        "source",
        "lang",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    host = F.concat(F.col("source"), F.lit(".example.com"))
    path = F.concat(
        F.col("lang"),
        F.lit("/p"),
        (hash60_expr(F.col("doc_id").cast("string")) % n_buckets).cast(
            "string"
        ),
    )
    url = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit("https://"), host, F.lit("/"), path,
                F.lit("?utm_source=feed"),
            ),
        )
        .when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("https://www."), host, F.lit("/"), path),
        )
        .when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.lit("https://"), host, F.lit("/"), path, F.lit("/")),
        )
        .otherwise(F.concat(F.lit("https://"), host, F.lit("/"), path))
    )
    base = b.select("doc_id", url.alias("url"), "text")
    m = b.filter(F.col("doc_id") % 23 == 1)
    mirror = m.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("https://m-"), host, F.lit("/"), path).alias("url"),
        "text",
    )
    recrawl = m.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(
            F.lit("https://"), host, F.lit("/"), path, F.lit("-")
        ).alias("url"),
        F.concat(
            F.expr("substring(text, 1, greatest(length(text) - 1, 0))"),
            F.lit("#"),
        ).alias("text"),
    )
    return base.unionByName(mirror).unionByName(recrawl)


def _url_side(fx: DataFrame) -> DataFrame:
    """(doc_id, canon_host, cpath, simhash) for a URL fixture — the
    shared probe side of the fuzzy / incremental URL dedup keys.

    r13 shape: URL normalization and the content SimHash come out of ONE
    aggregation (the regexp chain is row-local, so canon_host/cpath ride
    ``simhash_df``'s groupBy as functionally-dependent carry keys — the
    old ``parsed JOIN simhash_df ON doc_id`` evaluated the whole
    fixture+tokenize pipeline on both sides of an extra exchange), and
    the result is scoped_persisted: capped_blocked_join consumes it 3-4
    times (left, right, right-sizes), each of which previously re-ran
    fixture + tokenize + simhash from scratch.  Rows are (id, host,
    path, 64-bit hash) — a small fraction of corpus bytes, the same
    persist-once-consume-thrice contract as minhash_candidate_pairs."""
    from ..cache import scoped_persist

    return scoped_persist(
        dedup.simhash_df(
            _url_parsed(fx, with_text=True),
            "doc_id",
            "text",
            carry_cols=("canon_host", "cpath"),
        )
    )


_SQL_URL_PB = f"({_SQL_H60.format(x='doc_id::VARCHAR')} % kb.m)"
_SQL_URL_BASE = (
    f"'https://'||source||'.example.com/'||lang||'/p'||{_SQL_URL_PB}"
)

_SQL_URL_FIXTURE = f"""
        kb AS (
          -- _url_bucket_count twin: one path bucket per ~128 docs,
          -- floor 40 (all-integer; 40 at every driver scale)
          SELECT GREATEST({_URL_MOD},
                          COUNT(*) // {_URL_DOCS_PER_BUCKET}) AS m
          FROM documents),
        fx AS MATERIALIZED (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0
                        THEN {_SQL_URL_BASE}||'?utm_source=feed'
                      WHEN doc_id % 11 = 0
                        THEN 'https://www.'||source||'.example.com/'
                             ||lang||'/p'||{_SQL_URL_PB}
                      WHEN doc_id % 13 = 0 THEN {_SQL_URL_BASE}||'/'
                      ELSE {_SQL_URL_BASE} END AS url,
                 COALESCE(text, '') AS text
          FROM documents, kb
          UNION ALL
          SELECT doc_id + 1000000,
                 'https://m-'||source||'.example.com/'
                 ||lang||'/p'||{_SQL_URL_PB},
                 COALESCE(text, '')
          FROM documents, kb WHERE doc_id % 23 = 1
          UNION ALL
          SELECT doc_id + 2000000, {_SQL_URL_BASE}||'-',
                 substr(COALESCE(text, ''), 1,
                        greatest(length(COALESCE(text, '')) - 1, 0)) || '#'
          FROM documents, kb WHERE doc_id % 23 = 1)
"""


@register(
    "llm_dedup_url_fuzzy",
    oracle=f"""
        WITH {_SQL_URL_FIXTURE},
        parsed AS MATERIALIZED (
          SELECT doc_id,
                 regexp_replace(
                     regexp_extract(
                         regexp_replace(url, '^https?://', ''), '^[^/]+'),
                     '^(www\\.|m-)', '') AS canon_host,
                 regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(
                         regexp_replace(url, '^https?://', ''),
                         '^[^/]+/', ''),
                     '\\?.*$', ''), '/+$', ''), '-$', '') AS cpath,
                 text
          FROM fx),
        h AS (SELECT doc_id,
                     list_transform(
                         regexp_extract_all(COALESCE(text, ''), '\\S+'),
                         t -> ('0x'||substr(md5(t),1,15))::BIGINT) AS th
              FROM parsed),
        sh AS (SELECT doc_id, CAST({{SIM}} AS BIGINT) AS simhash FROM h),
        side AS MATERIALIZED (
          SELECT p.doc_id, p.canon_host, p.cpath, s.simhash
          FROM parsed p JOIN sh s USING (doc_id))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.canon_host, a.cpath,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                   AS hamming,
               CASE WHEN bit_count(xor(a.simhash, b.simhash)) <= 3
                    THEN 'dup' ELSE 'changed' END AS verdict
        FROM side a
        JOIN side b ON a.canon_host = b.canon_host
                   AND a.cpath = b.cpath
                   AND a.doc_id < b.doc_id
    """.replace("{SIM}", _simhash_sql_value()),
    tags=("dedup", "metadata"),
)
def llm_dedup_url_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level fuzzy URL/metadata dedup: candidates come from
    NORMALIZED-URL blocking (strip scheme / www. / mirror-host prefix /
    query string / trailing slash / '-' variant suffix — a pure
    JVM-side regexp chain), every same-(host, path) pair is then
    verified by CONTENT SimHash: hamming <= 3 -> 'dup' (the mirror /
    re-crawl to drop), else 'changed' (same URL, genuinely new content
    — a re-crawl worth keeping).  This joins the b14_fuzzy_join
    blocked-join machinery with the minhash/simhash content family,
    exactly the snapshot-merge pass a crawl refresh runs before
    near-dup text dedup ever gets involved.

    Scale shape: the pair work is confined to (canon_host, cpath)
    blocks and runs through operators/skew.py::capped_blocked_join, so
    one degenerate URL bucket (a link-farm host) salts into bounded
    slices instead of pinning a task; the shuffle carries (host, path,
    64-bit simhash), never text.  The oracle replicates the identical
    normalization + simhash pipeline (shared CTEs MATERIALIZED — the
    round-10 oracle-scalability lesson)."""
    from ..operators.skew import capped_blocked_join

    t = load_tables(spark, sf_dir)
    fx = _url_fixture(
        dedup.spread(t["documents"]), n_buckets=_url_buckets(t, sf_dir)
    )
    side = _url_side(fx)
    a = side.select(
        F.col("doc_id").alias("id_a"),
        "canon_host",
        "cpath",
        F.col("simhash").alias("sh_a"),
    )
    b = side.select(
        F.col("doc_id").alias("id_b"),
        "canon_host",
        "cpath",
        F.col("simhash").alias("sh_b"),
    )
    return (
        capped_blocked_join(a, b, ["canon_host", "cpath"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "canon_host",
            "cpath",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("int")
            .alias("hamming"),
        )
        .withColumn(
            "verdict",
            F.when(F.col("hamming") <= 3, F.lit("dup")).otherwise(
                F.lit("changed")
            ),
        )
    )


@register(
    "llm_decontaminate_incremental",
    oracle=f"""
        WITH toks AS (SELECT doc_id, source, {_SQL_TOKS} AS toks
                      FROM documents),
        shg AS (SELECT doc_id, source,
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(1, len(toks) - 1),
                          i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])
                     ELSE []::VARCHAR[] END AS shingles
                FROM toks),
        ex AS MATERIALIZED (
          SELECT DISTINCT doc_id, source, s
          FROM (SELECT doc_id, source, unnest(shingles) AS s FROM shg)),
        bench AS MATERIALIZED (
          SELECT DISTINCT s FROM ex WHERE source IN ('src0', 'src1')),
        existing AS MATERIALIZED (
          SELECT doc_id, s FROM ex
          WHERE source NOT IN ('src0', 'src1') AND doc_id % 2 = 0),
        newdocs AS MATERIALIZED (
          SELECT doc_id, s FROM ex
          WHERE source NOT IN ('src0', 'src1') AND doc_id % 2 = 1),
        contam AS (SELECT DISTINCT e.doc_id
                   FROM existing e JOIN bench b ON e.s = b.s),
        proxy AS MATERIALIZED (
          SELECT DISTINCT e.s
          FROM existing e JOIN contam c USING (doc_id)
          WHERE e.s NOT IN (SELECT s FROM bench)),
        nb AS (SELECT n.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench
               FROM newdocs n JOIN bench b ON n.s = b.s GROUP BY 1),
        np AS (SELECT n.doc_id, CAST(COUNT(*) AS BIGINT) AS n_proxy
               FROM newdocs n JOIN proxy p ON n.s = p.s GROUP BY 1)
        SELECT COALESCE(nb.doc_id, np.doc_id) AS doc_id,
               COALESCE(nb.n_bench, 0) AS n_bench,
               COALESCE(np.n_proxy, 0) AS n_proxy,
               CASE WHEN COALESCE(nb.n_bench, 0) > 0
                         AND COALESCE(np.n_proxy, 0) > 0 THEN 'both'
                    WHEN COALESCE(nb.n_bench, 0) > 0 THEN 'bench'
                    ELSE 'proxy' END AS via
        FROM nb FULL JOIN np ON nb.doc_id = np.doc_id
    """,
    tags=("dedup", "decontamination"),
)
def llm_decontaminate_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot INCREMENTAL decontamination — llm_decontaminate's
    one-shot scan recast as the snapshot-vs-corpus asymmetric pattern of
    llm_dedup_incremental (VERDICT r10 Next #2c): an already-ingested
    corpus snapshot (even doc ids) has a standing contamination ledger
    against the benchmark set (sources src0+src1); a NEW crawl snapshot
    (odd doc ids) arrives and only IT is scanned.  Each new doc is
    checked two ways:

      n_bench — distinct 3-grams shared with the benchmark set itself;
      n_proxy — distinct 3-grams shared with grams of ALREADY-FLAGGED
                existing docs (minus bench grams): contamination BY
                PROXY, catching paraphrased/partial eval copies that
                entered through a contaminated near-dup rather than the
                eval set verbatim (the transitive leak one-shot
                decontamination misses across snapshots).

    Scale shape: both probe sets broadcast — bench grams are fixed and
    tiny; proxy grams are bounded by the contamination rate times docs,
    orders below corpus scale — so the new snapshot streams once
    through two broadcast-hash semi joins with zero pair explosion, and
    the existing snapshot is NOT rescanned at ingest time (its ledger
    and gram set are reusable artifacts; they are recomputed here only
    so the registry query is self-contained and deterministic).

    Optimization r13 (guide §2.3/§2.4): the global (doc, source, gram)
    DISTINCT exchange is gone — per-doc gram dedup happens row-locally
    inside the Arrow shingle pass (doc_id unique per row, so
    within-array dedup IS the (doc, gram) distinct; see
    llm_decontaminate) — and so is the round-1 scoped_persist of EVERY
    corpus gram row (materializing + re-reading ~50M gram strings cost
    more than the Arrow re-fold it saved; each branch now folds only
    its own slice, the filters sitting below the UDF).  Only the small
    bench gram set persists (it feeds three probes).  The two
    new-snapshot probes (bench + proxy) fused into ONE broadcast union
    — a single pass over the new snapshot, one map-combined aggregate
    producing both counts, and the old nb-vs-np FULL OUTER join
    exchange is gone (a doc's two counts now come out of one row)."""
    from ..cache import scoped_persist

    t = load_tables(spark, sf_dir)
    d = dedup.spread(t["documents"])
    is_bench = F.col("source").isin("src0", "src1")

    def grams_of(pred):
        return d.filter(pred).select(
            "doc_id",
            F.explode(
                dedup.shingles_pandas_expr(F.col("text"), distinct=True)
            ).alias("s"),
        )

    bench = scoped_persist(grams_of(is_bench).select("s").distinct())
    existing = grams_of(~is_bench & (F.col("doc_id") % 2 == 0))
    new = grams_of(~is_bench & (F.col("doc_id") % 2 == 1))
    contam = existing.join(F.broadcast(bench), "s").select("doc_id").distinct()
    proxy = (
        existing.join(F.broadcast(contam), "doc_id")
        .select("s")
        .distinct()
        .join(F.broadcast(bench), "s", "left_anti")
    )
    probes = bench.select("s", F.lit(True).alias("is_b")).unionByName(
        proxy.select("s", F.lit(False).alias("is_b"))
    )
    counts = (
        new.join(F.broadcast(probes), "s")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("is_b"), 1).otherwise(0))
            .cast("long")
            .alias("n_bench"),
            F.sum(F.when(F.col("is_b"), 0).otherwise(1))
            .cast("long")
            .alias("n_proxy"),
        )
    )
    return counts.select(
        "doc_id",
        "n_bench",
        "n_proxy",
        F.when(
            (F.col("n_bench") > 0) & (F.col("n_proxy") > 0), F.lit("both")
        )
        .when(F.col("n_bench") > 0, F.lit("bench"))
        .otherwise(F.lit("proxy"))
        .alias("via"),
    )


_HOST_CAP = 15  # max docs kept per host (crawl-diversity cap)


@register(
    "llm_host_diversity_cap",
    oracle=f"""
        WITH scored AS (
          SELECT doc_id, source || '.example.com' AS host,
                 {{CLS}} AS quality
          FROM documents),
        ranked AS (
          SELECT doc_id, host, quality,
                 CAST(ROW_NUMBER() OVER (PARTITION BY host
                      ORDER BY quality DESC, doc_id) AS BIGINT) AS host_rank
          FROM scored)
        SELECT doc_id, host, quality, host_rank,
               (host_rank <= {_HOST_CAP}) AS kept
        FROM ranked
    """.replace("{CLS}", text.sql_classifier_score(_SQL_TOKS)),
    tags=("text", "sampling", "metadata"),
)
def llm_host_diversity_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-diversity capping — the FineWeb/CC pipeline step that runs
    AFTER URL dedup: keep at most _HOST_CAP documents per host, best
    quality first (classifier logit, doc_id tie-break), so no single
    site dominates the training mix however big the crawl gets.  Every
    doc is returned with its in-host rank and a kept flag, making the
    cut auditable (how close was the host to its cap, what got dropped).

    Scale shape: one shuffle on host + a per-host rank.  The per-host
    sort is bounded by host size, not corpus size; for the pathological
    hot host (a link farm with millions of pages) the production form is
    the two-phase top-K (per-partition top-_HOST_CAP, then merge — the
    monotone-merge property b28_stream_incremental_topk pins), since
    only _HOST_CAP rows per host can ever be kept.  Quality is the
    integer classifier logit — exact in both engines, no float ordering
    hazard in the rank."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    d = dedup.spread(t["documents"])
    scored = d.select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        text.doc_profile_pandas_expr(F.col("text"))
        .getField("logit_sum")
        .alias("quality"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("quality").desc(), "doc_id"
    )
    return (
        scored.withColumn(
            "host_rank", F.row_number().over(w).cast("long")
        )
        .withColumn("kept", F.col("host_rank") <= _HOST_CAP)
    )


@register(
    "llm_dedup_soft_weights",
    oracle=f"""
        WITH RECURSIVE pairs AS MATERIALIZED (
          SELECT id_a, id_b FROM ({{MH}})
        ),
        edges AS MATERIALIZED (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(u, v) AS (
          SELECT u, u FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        cc AS (SELECT u AS doc_id, MIN(v) AS cluster_id
               FROM reach GROUP BY u),
        fullc AS (
          SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN cc USING (doc_id)),
        sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
                  FROM fullc GROUP BY 1)
        SELECT f.doc_id, f.cluster_id,
               CAST(s.cluster_size AS BIGINT) AS cluster_size,
               {numeric.sql_round6_ratio('1', 's.cluster_size')} AS weight
        FROM fullc f JOIN sizes s USING (cluster_id)
    """.replace("{MH}", _minhash_oracle()),
    tags=("dedup", "sampling"),
)
def llm_dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup (the D4/SemDeDup-style sampling alternative to hard
    removal): every document gets sampling weight 1/|near-dup cluster|,
    so a page crawled from 40 mirrors contributes ~one document's worth
    of gradient instead of 40 — duplicates are DOWN-WEIGHTED, not
    deleted, preserving coverage while killing memorization pressure.
    Clusters are connected components over the verified MinHash-LSH pair
    graph; unpaired docs are singletons with weight 1.0.

    Scale shape: reuses the banded pair pipeline (shuffles carry hashes,
    never text) and the O(diameter)-round min-label propagation of
    llm_dedup_cluster; the weight join is an equi-join on cluster_id.
    The integer 1/n ratio rounds via the tie-safe floor form (1/2 and
    1/4 terminate exactly on 6dp boundaries — precisely the divergence
    class numeric.round6_ratio_expr exists for)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    pairs = dedup.minhash_neardup_pairs(d, "doc_id", "text", 0.8)
    cc = dedup.connected_components(pairs)
    fullc = d.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    sizes = fullc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return fullc.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        numeric.round6_ratio_expr(
            F.lit(1), F.col("cluster_size")
        ).alias("weight"),
    )


# ---------------------------------------------------------------------------
# Round 12 — cross-snapshot URL-level incremental dedup, repetition-aware
# Gopher rules, domain-level contamination report (VERDICT r11 Next #6)
# ---------------------------------------------------------------------------

# best-match encode: hamming (<= 64) * 1e7 + existing doc_id (< 1e7) — an
# all-integer argmin key both engines decode exactly
_URLINC_ENC = 10_000_000

# Shared URL-side CTEs: normalized (host, path) + content SimHash per
# fixture row — textually identical to the llm_dedup_url_fuzzy oracle's
# chain so the two operators verify the same derivation.
_SQL_URL_SIDE = f"""
        parsed AS MATERIALIZED (
          SELECT doc_id,
                 regexp_replace(
                     regexp_extract(
                         regexp_replace(url, '^https?://', ''), '^[^/]+'),
                     '^(www\\.|m-)', '') AS canon_host,
                 regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(
                         regexp_replace(url, '^https?://', ''),
                         '^[^/]+/', ''),
                     '\\?.*$', ''), '/+$', ''), '-$', '') AS cpath,
                 text
          FROM fx),
        h AS (SELECT doc_id,
                     list_transform(
                         regexp_extract_all(COALESCE(text, ''), '\\S+'),
                         t -> ('0x'||substr(md5(t),1,15))::BIGINT) AS th
              FROM parsed),
        sh AS (SELECT doc_id, CAST({{SIM}} AS BIGINT) AS simhash FROM h),
        side AS MATERIALIZED (
          SELECT p.doc_id, p.canon_host, p.cpath, s.simhash
          FROM parsed p JOIN sh s USING (doc_id))
""".replace("{SIM}", _simhash_sql_value())


@register(
    "llm_dedup_url_incremental",
    oracle=f"""
        WITH {_SQL_URL_FIXTURE},
        {_SQL_URL_SIDE},
        newside AS (SELECT * FROM side WHERE doc_id >= 1000000),
        oldside AS (SELECT * FROM side WHERE doc_id < 1000000),
        best AS (
          SELECT n.doc_id,
                 MIN(CAST(bit_count(xor(n.simhash, o.simhash)) AS BIGINT)
                     * {_URLINC_ENC} + o.doc_id) AS k
          FROM newside n JOIN oldside o
            ON n.canon_host = o.canon_host AND n.cpath = o.cpath
          GROUP BY n.doc_id)
        SELECT n.doc_id, n.canon_host, n.cpath,
               CAST(b.k % {_URLINC_ENC} AS BIGINT) AS matched_doc_id,
               CAST(b.k // {_URLINC_ENC} AS INTEGER) AS hamming,
               CASE WHEN b.k IS NULL THEN 'ingest_new'
                    WHEN b.k // {_URLINC_ENC} <= 3 THEN 'skip_duplicate'
                    ELSE 'ingest_changed' END AS action
        FROM newside n LEFT JOIN best b ON n.doc_id = b.doc_id
    """,
    tags=("dedup", "metadata", "incremental"),
)
def llm_dedup_url_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot URL-LEVEL incremental dedup (VERDICT r11 Next #6a):
    a NEW crawl snapshot (the fixture's mirror/re-crawl rows, doc_id >=
    1e6) arrives against an EXISTING ingested corpus (the base rows);
    only the new snapshot is scanned.  Each new document is blocked to
    the existing corpus by its NORMALIZED (host, path) — the
    llm_dedup_url_fuzzy regexp chain — and verified against its BEST
    (lowest-hamming, lowest-id tie-break) existing version by content
    SimHash:

      no same-URL existing doc       -> 'ingest_new'
      best match hamming <= 3        -> 'skip_duplicate' (a mirror /
                                        unchanged re-crawl: don't ingest)
      best match hamming  > 3        -> 'ingest_changed' (same URL,
                                        genuinely new content: a re-crawl
                                        worth keeping)

    This is the crawl-refresh admission decision made BEFORE any text
    enters the corpus — the asymmetric-snapshot pattern of
    llm_decontaminate_incremental applied to the URL index: the existing
    side's (host, path, simhash) triple is a standing per-URL index a
    production frontier keeps (recomputed here so the registry query is
    self-contained), never the existing text.

    Scale shape: the pair work is the asymmetric new x existing blocked
    join, confined to (canon_host, cpath) blocks through
    operators/skew.py::capped_blocked_join (the big EXISTING side is the
    salted right side, so a link-farm URL cannot pin a task); the
    best-match argmin is an all-integer MIN over hamming*1e7+id — one
    map-combinable aggregate, no window; the shuffle carries (host,
    path, 64-bit simhash), never text."""
    from ..operators.skew import capped_blocked_join

    t = load_tables(spark, sf_dir)
    fx = _url_fixture(
        dedup.spread(t["documents"]), n_buckets=_url_buckets(t, sf_dir)
    )
    side = _url_side(fx)
    new = side.filter(F.col("doc_id") >= 1_000_000)
    old = side.filter(F.col("doc_id") < 1_000_000).select(
        F.col("doc_id").alias("old_id"),
        "canon_host",
        "cpath",
        F.col("simhash").alias("sh_o"),
    )
    matches = capped_blocked_join(
        new.select(
            "doc_id", "canon_host", "cpath",
            F.col("simhash").alias("sh_n"),
        ),
        old,
        ["canon_host", "cpath"],
    )
    best = matches.groupBy("doc_id").agg(
        F.min(
            F.bit_count(F.col("sh_n").bitwiseXOR(F.col("sh_o")))
            .cast("long")
            * F.lit(_URLINC_ENC)
            + F.col("old_id")
        ).alias("k")
    )
    ham = F.expr(f"CAST(k div {_URLINC_ENC} AS INT)")
    return new.join(best, "doc_id", "left").select(
        "doc_id",
        "canon_host",
        "cpath",
        (F.col("k") % _URLINC_ENC).cast("long").alias("matched_doc_id"),
        ham.alias("hamming"),
        F.when(F.col("k").isNull(), F.lit("ingest_new"))
        .when(ham <= 3, F.lit("skip_duplicate"))
        .otherwise(F.lit("ingest_changed"))
        .alias("action"),
    )


_SEG_TOKENS = 10       # pseudo-paragraph width (the corpus has no \n\n)
_TOPGRAM_MAX = {2: 0.20, 3: 0.18}  # Gopher top-n-gram char-fraction caps
_DUP_PARA_MAX = 0.30
_DUP_PARA_CHAR_MAX = 0.20


def _sql_topgram(n: int) -> str:
    """Per-doc most frequent word n-gram (count desc, gram asc) + its
    char fraction of the doc."""
    join = "||' '||".join(f"toks[i+{j}]" for j in range(n))
    return f"""g{n} AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(toks) - {n - 2}),
                                            i -> {join})) AS g
               FROM b WHERE len(toks) >= {n}),
        c{n} AS (SELECT doc_id, g, COUNT(*) AS c FROM g{n} GROUP BY 1, 2),
        t{n} AS (SELECT doc_id, c, g FROM (
                   SELECT doc_id, c, g,
                          ROW_NUMBER() OVER (PARTITION BY doc_id
                                             ORDER BY c DESC, g) AS rn
                   FROM c{n}) WHERE rn = 1)"""


@register(
    "llm_text_gopher_repetition",
    oracle=f"""
        WITH d AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
        b AS (SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_words,
                     CAST(length(array_to_string(toks, ' ')) AS BIGINT)
                         AS total_chars,
                     toks
              FROM d),
        segs AS (SELECT doc_id,
                        unnest(list_transform(
                            range(0, (len(toks) + {_SEG_TOKENS - 1})
                                     // {_SEG_TOKENS}),
                            i -> array_to_string(
                                list_slice(toks, i * {_SEG_TOKENS} + 1,
                                           i * {_SEG_TOKENS}
                                           + {_SEG_TOKENS}), ' '))) AS seg
                 FROM b WHERE len(toks) > 0),
        sc AS (SELECT doc_id, seg, COUNT(*) AS c FROM segs GROUP BY 1, 2),
        pd AS (SELECT doc_id,
                      CAST(SUM(c) AS BIGINT) AS n_segments,
                      CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END)
                           AS BIGINT) AS dup_occ,
                      CAST(SUM(c * length(seg)) AS BIGINT) AS tot_sc,
                      CAST(SUM(CASE WHEN c >= 2 THEN c * length(seg)
                               ELSE 0 END) AS BIGINT) AS dup_sc
               FROM sc GROUP BY 1),
        {_sql_topgram(2)},
        {_sql_topgram(3)}
        SELECT b.doc_id, b.n_words,
               COALESCE(pd.n_segments, 0) AS n_segments,
               {numeric.sql_round6(
                   "CASE WHEN pd.n_segments > 0 THEN CAST(pd.dup_occ AS "
                   "DOUBLE) / CAST(pd.n_segments AS DOUBLE) ELSE 0.0 END"
               )} AS dup_para_frac,
               {numeric.sql_round6(
                   "CASE WHEN pd.tot_sc > 0 THEN CAST(pd.dup_sc AS DOUBLE)"
                   " / CAST(pd.tot_sc AS DOUBLE) ELSE 0.0 END"
               )} AS dup_para_char_frac,
               {numeric.sql_round6(
                   "CASE WHEN b.total_chars > 0 AND t2.c IS NOT NULL THEN "
                   "CAST(t2.c * length(t2.g) AS DOUBLE) / "
                   "CAST(b.total_chars AS DOUBLE) ELSE 0.0 END"
               )} AS top2_char_frac,
               {numeric.sql_round6(
                   "CASE WHEN b.total_chars > 0 AND t3.c IS NOT NULL THEN "
                   "CAST(t3.c * length(t3.g) AS DOUBLE) / "
                   "CAST(b.total_chars AS DOUBLE) ELSE 0.0 END"
               )} AS top3_char_frac
        FROM b
        LEFT JOIN pd ON b.doc_id = pd.doc_id
        LEFT JOIN t2 ON b.doc_id = t2.doc_id
        LEFT JOIN t3 ON b.doc_id = t3.doc_id
    """,
    tags=("text", "quality"),
)
def llm_text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-aware Gopher rules (Rae et al. 2021 §A1.1, the
    repetition half the llm_text_gopher_rules gate lacked — VERDICT r11
    Next #6b): per document,

      dup_para_frac       fraction of pseudo-paragraphs (fixed 10-token
                          segments — the corpus carries no newlines, so
                          the paragraph boundary is the chunking grid of
                          llm_doc_chunking) that are duplicates within
                          the document (every occurrence of a repeated
                          segment counts, Gopher's definition);
      dup_para_char_frac  fraction of segment CHARACTERS inside those
                          duplicated segments;
      top2/top3_char_frac fraction of document characters covered by the
                          single most frequent word 2-gram / 3-gram
                          (count desc, gram asc tie-break) — Gopher's
                          "top n-gram character fraction" family.

    Complements llm_text_dup_ngrams (coverage of ALL duplicated 5-grams)
    with the occurrence-ratio and top-gram rules.

    Scale shape — rewritten in optimization r13 (guide §2.4): every
    output here is a per-document integer depending only on that
    document's own tokens, so the old relational pipeline (two
    explode+groupBy gram counts, a segment groupBy, a per-doc window per
    gram width, three joins back to base — five Exchanges) computed a
    row-local function with shuffles.  All integer features now come
    from ONE Arrow-batched projection
    (``text.repetition_profile_pandas_expr``, the doc-profile pattern);
    the ratio arithmetic below is byte-identical to the old final
    select, so the float path is unchanged.  Zero Exchange."""
    t = load_tables(spark, sf_dir)
    out = dedup.spread(t["documents"]).select(
        "doc_id",
        text.repetition_profile_pandas_expr(
            F.col("text"), _SEG_TOKENS
        ).alias("p"),
    ).select("doc_id", "p.*")

    zero6 = F.lit(0.0)
    frac = lambda num, den: numeric.round6_expr(  # noqa: E731
        num.cast("double") / den.cast("double")
    )
    return out.select(
        "doc_id",
        "n_words",
        F.coalesce(F.col("n_segments"), F.lit(0).cast("long")).alias(
            "n_segments"
        ),
        F.when(
            F.col("n_segments") > 0, frac(F.col("dup_occ"), F.col("n_segments"))
        )
        .otherwise(zero6)
        .alias("dup_para_frac"),
        F.when(F.col("tot_sc") > 0, frac(F.col("dup_sc"), F.col("tot_sc")))
        .otherwise(zero6)
        .alias("dup_para_char_frac"),
        F.when(
            (F.col("total_chars") > 0) & F.col("topc2").isNotNull(),
            frac(F.col("topc2"), F.col("total_chars")),
        )
        .otherwise(zero6)
        .alias("top2_char_frac"),
        F.when(
            (F.col("total_chars") > 0) & F.col("topc3").isNotNull(),
            frac(F.col("topc3"), F.col("total_chars")),
        )
        .otherwise(zero6)
        .alias("top3_char_frac"),
    )


_DOMAIN_CONTAM_MIN = 3  # distinct shared 3-grams to call a doc contaminated


@register(
    "llm_corpus_domain_contamination",
    oracle=f"""
        WITH {_SQL_URL_FIXTURE},
        hosts AS (SELECT doc_id,
                         regexp_replace(
                             regexp_extract(
                                 regexp_replace(url, '^https?://', ''),
                                 '^[^/]+'),
                             '^(www\\.|m-)', '') AS canon_host
                  FROM fx WHERE doc_id < 1000000),
        toks AS (SELECT doc_id, source, {_SQL_TOKS} AS toks
                 FROM documents),
        shg AS (SELECT doc_id, source,
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(1, len(toks) - 1),
                          i -> toks[i]||' '||toks[i+1]||' '||toks[i+2])
                     ELSE []::VARCHAR[] END AS shingles
                FROM toks),
        ex AS MATERIALIZED (
          SELECT DISTINCT doc_id, source, s
          FROM (SELECT doc_id, source, unnest(shingles) AS s FROM shg)),
        bench AS MATERIALIZED (
          SELECT DISTINCT s FROM ex WHERE source IN ('src0', 'src1')),
        shared AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench
                   FROM ex e JOIN bench USING (s)
                   WHERE e.source NOT IN ('src0', 'src1')
                   GROUP BY 1),
        dh AS (SELECT d.doc_id, h.canon_host,
                      COALESCE(s.n_bench, 0) AS n_bench
               FROM documents d
               JOIN hosts h ON d.doc_id = h.doc_id
               LEFT JOIN shared s ON d.doc_id = s.doc_id
               WHERE d.source NOT IN ('src0', 'src1'))
        SELECT canon_host,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_bench >= {_DOMAIN_CONTAM_MIN}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
               CAST(SUM(n_bench) AS BIGINT) AS n_shared_grams,
               {numeric.sql_round6(
                   "CAST(SUM(CASE WHEN n_bench >= "
                   + str(_DOMAIN_CONTAM_MIN)
                   + " THEN 1 ELSE 0 END) AS DOUBLE) / "
                   "CAST(COUNT(*) AS DOUBLE)"
               )} AS contam_frac
        FROM dh GROUP BY 1
    """,
    tags=("decontamination", "metadata"),
)
def llm_corpus_domain_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DOMAIN-level contamination report (VERDICT r11 Next #6c): per
    normalized host, how much of its corpus content overlaps the
    benchmark set — llm_corpus_overlap_matrix's which-feeds-leak
    question asked at the granularity operators actually act on (crawl
    block/allow lists are host-level): a doc is contaminated when it
    shares >= 3 distinct word-3-grams with the benchmark sources
    (src0/src1, the llm_decontaminate convention); hosts roll up to
    (n_docs, n_contaminated, total shared grams, contaminated fraction).
    Bench-source docs themselves are excluded from the corpus side —
    the report covers ingestable hosts only.

    Scale shape: bench grams broadcast (fixed eval sets are tiny); the
    corpus streams once through one broadcast semi-join + two hash
    rollups (doc, then host) — both map-combinable; host metadata comes
    from the URL fixture's normalization chain (one regexp projection,
    no extra shuffle).  The result is |hosts| rows — model-sized."""
    t = load_tables(spark, sf_dir)
    d = dedup.spread(t["documents"])
    fx = _url_fixture(d, n_buckets=_url_buckets(t, sf_dir)).filter(
        F.col("doc_id") < 1_000_000
    )
    nosch = F.regexp_replace(F.col("url"), "^https?://", "")
    hosts = fx.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_extract(nosch, "^[^/]+", 0), "^(www\\.|m-)", ""
        ).alias("canon_host"),
    )
    # r13: per-doc Arrow gram dedup replaces the global (doc, gram)
    # DISTINCT exchange — this family's dominant sf10 cost (guide §2.4);
    # see llm_decontaminate for the doc_id-uniqueness argument
    is_bench = F.col("source").isin("src0", "src1")
    bench = (
        d.filter(is_bench)
        .select(
            F.explode(
                dedup.shingles_pandas_expr(F.col("text"), distinct=True)
            ).alias("s")
        )
        .distinct()
    )
    shared = (
        d.filter(~is_bench)
        .select(
            "doc_id",
            F.explode(
                dedup.shingles_pandas_expr(F.col("text"), distinct=True)
            ).alias("s"),
        )
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bench"))
    )
    dh = (
        d.filter(~is_bench)
        .select("doc_id")
        .join(hosts, "doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "canon_host",
            F.coalesce(F.col("n_bench"), F.lit(0).cast("long")).alias(
                "n_bench"
            ),
        )
    )
    contaminated = F.when(
        F.col("n_bench") >= _DOMAIN_CONTAM_MIN, F.lit(1)
    ).otherwise(F.lit(0))
    return dh.groupBy("canon_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(contaminated).cast("long").alias("n_contaminated"),
        F.sum("n_bench").cast("long").alias("n_shared_grams"),
        numeric.round6_expr(
            F.sum(contaminated).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("contam_frac"),
    )


_HARDNEG_QUERIES = 8       # anchor vectors: vec_id < 8
_HARDNEG_DUP_COS = 0.95    # >= this cosine = near-dup, NOT a negative
_HARDNEG_K = 5             # hard negatives kept per anchor


@register(
    "llm_ann_hard_negatives",
    oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embx embeddings WHERE vec_id < {_HARDNEG_QUERIES}),
        c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
              FROM embx embeddings),
        scored AS (SELECT query_id, cand_id,
                          round(list_cosine_similarity(qv, cv), 6) AS cos
                   FROM q, c WHERE cand_id <> query_id),
        eligible AS (SELECT * FROM scored
                     WHERE cos < {_HARDNEG_DUP_COS}),
        ranked AS (SELECT query_id, cand_id, cos,
                          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS BIGINT)
                              AS neg_rank
                   FROM eligible)
        SELECT query_id, cand_id, cos, neg_rank
        FROM ranked WHERE neg_rank <= {_HARDNEG_K}
    """,
    tags=("similarity", "training"),
)
def llm_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive HARD-NEGATIVE mining (the dense-retrieval training
    prep, e.g. DPR/Contriever): for each anchor vector, the K most
    similar candidates that are NOT near-duplicates — maximally
    confusable yet genuinely different examples.  Candidates at cosine
    >= 0.95 are excluded BEFORE ranking (they are the positives/dups the
    dedup family removes; training on them as negatives poisons the
    contrastive objective), then the top-{_HARDNEG_K} of the remainder
    are the hard negatives.

    Scale shape: identical to llm_ann_topk's proven exact-retrieval
    shape — anchors broadcast (model-sized query set), the corpus never
    shuffles vectors (norms materialize once, the ranking exchange
    carries only (query, cand, cos) triples), and the near-dup cut is a
    pushed-down filter between scoring and ranking, so the window ranks
    strictly fewer rows than plain top-k.  At 100 TB the scoring side
    swaps to the IVF/multiprobe cell-pruned path with no change to the
    exclusion-then-rank semantics."""
    t = load_tables(spark, sf_dir)
    emb = _emb(t)
    from pyspark.sql.window import Window

    from ..functions.vectors import dot_product_expr, norm_expr
    from ..operators.similarity import spread

    q = emb.filter(F.col("vec_id") < _HARDNEG_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        norm_expr(F.col("embedding")).alias("qn"),
    )
    c = spread(emb).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        norm_expr(F.col("embedding")).alias("cn"),
    )
    pair_cos = dot_product_expr(F.col("qv"), F.col("cv")) / (
        F.col("qn") * F.col("cn")
    )
    eligible = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", F.round(pair_cos, 6))
        .filter(F.col("cos") < _HARDNEG_DUP_COS)
        .select("query_id", "cand_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    return (
        eligible.withColumn(
            "neg_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("neg_rank") <= _HARDNEG_K)
        .select("query_id", "cand_id", "cos", "neg_rank")
    )


def _url_parsed(fx: DataFrame, with_text: bool = False) -> DataFrame:
    """(doc_id, canon_host, cpath[, text]) via the shared normalization
    chain (strip scheme / www. / mirror-host prefix / query string /
    trailing slash / '-' variant suffix) — the single Spark-side
    definition the URL family and its streaming twin share; SQL twin:
    the ``parsed`` CTE of ``_SQL_URL_SIDE``.  ``with_text`` carries the
    document text through for callers that fuse the content SimHash into
    the same pass (see :func:`_url_side`)."""
    nosch = F.regexp_replace(F.col("url"), "^https?://", "")
    cols = [
        F.col("doc_id"),
        F.regexp_replace(
            F.regexp_extract(nosch, "^[^/]+", 0), "^(www\\.|m-)", ""
        ).alias("canon_host"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(nosch, "^[^/]+/", ""), "\\?.*$", ""
                ),
                "/+$",
                "",
            ),
            "-$",
            "",
        ).alias("cpath"),
    ]
    if with_text:
        cols.append(F.col("text"))
    return fx.select(*cols)


@register(
    "llm_corpus_shard_tokens",
    oracle=f"""
        WITH base AS (
          SELECT doc_id,
                 CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens,
                 {_SQL_H60.format(x="'shtok1:' || CAST(doc_id AS VARCHAR)")}
                     AS ord_key
          FROM documents),
        cum AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                      ORDER BY ord_key, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS cum_before
          FROM base),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM cum)
        SELECT c.doc_id, c.n_tokens, c.cum_before,
               CASE WHEN t.total > 0
                    THEN LEAST({_N_SHARDS - 1},
                               (c.cum_before * {_N_SHARDS}) // t.total)
                    ELSE 0 END AS shard
        FROM cum c, tot t
    """,
    tags=("export", "sampling"),
)
def llm_corpus_shard_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-balanced shard assignment — the export-time complement of
    llm_corpus_shard (which balances document COUNTS): training shards
    should hold equal token mass, or short-doc shards starve the data
    loader while long-doc shards lag an epoch.  Each doc's shard is
    ``cum_before * N // total`` over the exclusive token prefix sum in
    salted-hash order, so shard token totals differ by at most one
    boundary document (the pack_sequences honest-overshoot semantics),
    deterministically on any cluster size.

    Scale shape: the prefix sum is operators/sampling.py::
    salted_cum_before — the TWO-LEVEL distributed form (bucket totals +
    within-bucket windows), never a global-order window; the corpus
    total is a 1-row broadcast.  The DuckDB twin computes the identical
    exclusive sum with a plain window (oracle-side, scale-exempt).
    Balance is asserted in tests/test_llm_operators.py."""
    from ..operators.sampling import salted_cum_before

    t = load_tables(spark, sf_dir)
    base = t["documents"].select(
        "doc_id",
        F.size(text.tokens_expr(F.col("text"))).cast("long").alias(
            "n_tokens"
        ),
    )
    cum = salted_cum_before(base, "doc_id", "n_tokens", "shtok1")
    tot = cum.agg(F.sum("n_tokens").cast("long").alias("total"))
    return cum.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_tokens",
        "cum_before",
        F.when(
            F.col("total") > 0,
            F.least(
                F.lit(_N_SHARDS - 1).cast("long"),
                # all-integer division (oracle twin `//`) — never the
                # double-divide-then-floor form, whose rounding can
                # disagree at extreme magnitudes
                F.expr(f"cum_before * {_N_SHARDS} div total"),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("shard"),
    )


@register(
    "llm_quality_funnel",
    oracle=f"""
        WITH casc AS ({{CASCADE}}),
        src AS (SELECT doc_id, source FROM documents)
        SELECT s.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN c.verdict <> 'drop_heuristic'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_heuristic,
               CAST(SUM(CASE WHEN c.verdict NOT IN
                        ('drop_heuristic', 'drop_classifier')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_classifier,
               CAST(SUM(CASE WHEN c.keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keep,
               {numeric.sql_round6(
                   "CAST(SUM(CASE WHEN c.keep THEN 1 ELSE 0 END) AS "
                   "DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
               )} AS keep_frac
        FROM casc c JOIN src s ON c.doc_id = s.doc_id
        GROUP BY s.source
    """.replace("{CASCADE}", _SQL_CASCADE_ORACLE.strip()),
    tags=("text", "classifier", "reporting"),
)
def llm_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE quality funnel — the acceptance report every corpus
    filter ships to its operators: how many of each feed's documents
    survive each cascade stage (heuristics → classifier → semantic
    keep), straight off llm_quality_cascade's verdict column (ONE
    definition of the cascade — the funnel can never drift from the
    filter; oracle reuses the identical shared SQL).  A feed whose
    keep_frac collapses is the first thing a crawl operator
    investigates.

    Scale shape: inherits the cascade's (constant-size calibration,
    broadcast threshold, no unpartitioned windows) plus one
    map-combinable per-source rollup of boolean flags — |sources| rows
    out."""
    t = load_tables(spark, sf_dir)
    casc = llm_quality_cascade(spark, sf_dir)
    src = t["documents"].select("doc_id", "source")
    keep = F.when(F.col("keep"), 1).otherwise(0)
    return (
        casc.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("verdict") != "drop_heuristic", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_pass_heuristic"),
            F.sum(
                F.when(
                    ~F.col("verdict").isin(
                        "drop_heuristic", "drop_classifier"
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_pass_classifier"),
            F.sum(keep).cast("long").alias("n_keep"),
            numeric.round6_expr(
                F.sum(keep).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("keep_frac"),
        )
    )


_GOPHER_RULE_NAMES = (
    "rule_word_count",
    "rule_mean_word_len",
    "rule_alpha_frac",
    "rule_stopwords",
)


@register(
    "llm_text_gopher_ablation",
    oracle=f"""
        WITH d AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 CASE WHEN len(toks) > 0 THEN floor(
                     CAST(list_sum(list_transform(toks, t ->
                          CAST(length(t) AS BIGINT))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) * 1000000.0 + 0.5)
                     / 1000000.0 ELSE 0.0 END
                     AS mean_word_len,
                 CASE WHEN len(toks) > 0 THEN floor(
                     CAST(len(list_filter(toks, t ->
                          regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) * 1000000.0 + 0.5)
                     / 1000000.0 ELSE 0.0 END
                     AS alpha_frac,
                 CAST(len(list_intersect(
                     list_distinct(list_transform(toks, t -> lower(t))),
                     {list(_GOPHER_STOPS)!r})) AS BIGINT) AS n_stops
          FROM d),
        r AS (
          SELECT doc_id,
                 (n_words BETWEEN {_GOPHER_MIN_WORDS}
                              AND {_GOPHER_MAX_WORDS}) AS r1,
                 (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS r2,
                 (alpha_frac >= 0.8) AS r3,
                 (n_stops >= 2) AS r4
          FROM m),
        u AS (
          SELECT 'rule_word_count' AS rule, NOT r1 AS fails,
                 (NOT r1 AND r2 AND r3 AND r4) AS exclusive FROM r
          UNION ALL
          SELECT 'rule_mean_word_len', NOT r2,
                 (r1 AND NOT r2 AND r3 AND r4) FROM r
          UNION ALL
          SELECT 'rule_alpha_frac', NOT r3,
                 (r1 AND r2 AND NOT r3 AND r4) FROM r
          UNION ALL
          SELECT 'rule_stopwords', NOT r4,
                 (r1 AND r2 AND r3 AND NOT r4) FROM r)
        SELECT rule,
               CAST(SUM(CASE WHEN fails THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_fail,
               CAST(SUM(CASE WHEN exclusive THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_exclusive
        FROM u GROUP BY rule
    """,
    tags=("text", "quality", "reporting"),
)
def llm_text_gopher_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-RULE ablation of the Gopher gate (llm_text_gopher_rules): for
    each rule, how many documents fail it at all (``n_fail``) and how
    many fail ONLY it (``n_exclusive`` — the documents that would be
    recovered if the rule were dropped, every other rule passing).  This
    is the table a production gate is TUNED from: a rule with large
    n_exclusive and marginal quality value is the one to relax; a rule
    whose failures are all shared adds nothing and costs nothing.

    Scale shape: the per-doc rule booleans are the same zero-shuffle
    row-local expressions as the gate itself; the 4-way unpivot
    multiplies rows by the RULE COUNT (a constant), and one hash
    aggregation reduces to |rules| rows."""
    t = load_tables(spark, sf_dir)
    rules = llm_text_gopher_rules(spark, sf_dir).select(
        "doc_id", *_GOPHER_RULE_NAMES
    )
    others = {
        r: [o for o in _GOPHER_RULE_NAMES if o != r]
        for r in _GOPHER_RULE_NAMES
    }
    stack = F.array(
        *[
            F.struct(
                F.lit(r).alias("rule"),
                (~F.col(r)).alias("fails"),
                (
                    ~F.col(r)
                    & F.col(others[r][0])
                    & F.col(others[r][1])
                    & F.col(others[r][2])
                ).alias("exclusive"),
            )
            for r in _GOPHER_RULE_NAMES
        ]
    )
    u = rules.select(F.explode(stack).alias("x")).select(
        F.col("x.rule").alias("rule"),
        F.col("x.fails").alias("fails"),
        F.col("x.exclusive").alias("exclusive"),
    )
    return u.groupBy("rule").agg(
        F.sum(F.when(F.col("fails"), 1).otherwise(0))
        .cast("long")
        .alias("n_fail"),
        F.sum(F.when(F.col("exclusive"), 1).otherwise(0))
        .cast("long")
        .alias("n_exclusive"),
    )


@register(
    "llm_decontaminate_bloom",
    oracle=f"""
        WITH {_SQL_DECON_CTES}
        SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM ex e JOIN bench b ON e.s = b.s
        WHERE e.source NOT IN ('src0', 'src1')
        GROUP BY e.doc_id
        ORDER BY n_shared DESC, e.doc_id
    """,
    tags=("dedup", "decontamination", "sketch"),
)
def llm_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with a BLOOM pre-filter — the constant-size form
    of llm_decontaminate for when the benchmark suite is too big to
    broadcast as a gram set (a full eval-suite union is easily 100M+
    grams = GBs; the Bloom filter of those grams is a fixed 32 KB plan
    literal whatever the suite size):

      stage 1  every corpus gram tests K codegen'd bits against the
               bench-gram Bloom filter (operators/bloom.py — the same
               build/probe machinery as b04_bloom_join_prune); misses
               drop map-side, BEFORE any shuffle;
      stage 2  the surviving grams (true hits + the filter's small
               false-positive tail) verify against the exact bench gram
               set — the join now runs over orders-of-magnitude fewer
               rows, and false positives under-PRUNE only, so the
               result is EXACTLY llm_decontaminate's (the oracle is the
               plain exact SQL, the b04 pattern).

    At 100 TB this is the shape that actually ships: the probe is pure
    whole-stage-codegen bit arithmetic on the scan, the shuffle carries
    only bloom-surviving (doc_id, gram) pairs, and the bench set is
    read once to build 32 KB of state."""
    from ..cache import scoped_persist
    from ..operators.bloom import bloom_build, bloom_prune

    t = load_tables(spark, sf_dir)
    is_bench = F.col("source").isin("src0", "src1")
    d = dedup.spread(t["documents"])
    # r13: per-doc Arrow gram dedup replaces the global (doc, gram)
    # DISTINCT exchange (guide §2.4); the bloom probe now tests bits on
    # a zero-shuffle projection — see llm_decontaminate.  The bench
    # gram set persists because it feeds TWO jobs (the bloom build
    # collect and the exact-verify broadcast) — without the cache the
    # bench-side scan + distinct runs twice (measured ~8.5 s each at
    # sf10)
    bench = scoped_persist(
        d.filter(is_bench)
        .select(
            F.explode(
                dedup.shingles_pandas_expr(F.col("text"), distinct=True)
            ).alias("s")
        )
        .distinct()
    )
    words = bloom_build(bench, F.col("s"))
    corpus = d.filter(~is_bench).select(
        "doc_id",
        F.explode(
            dedup.shingles_pandas_expr(F.col("text"), distinct=True)
        ).alias("s"),
    )
    survivors = bloom_prune(corpus, F.col("s"), words)
    return (
        survivors.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy(F.col("n_shared").desc(), "doc_id")
    )


_UNIMAX_EPOCH_CAP = 2   # no source repeats more than E epochs
_UNIMAX_BUDGET_DEN = 2  # training budget = total corpus tokens // 2


@register(
    "llm_mix_unimax",
    oracle=f"""
        WITH RECURSIVE persrc AS (
          SELECT source,
                 CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS supply
          FROM documents GROUP BY source),
        sup AS (
          SELECT source, supply,
                 CAST(ROW_NUMBER() OVER (ORDER BY supply, source)
                      AS BIGINT) AS rn,
                 CAST(COUNT(*) OVER () AS BIGINT) AS n,
                 CAST(SUM(supply) OVER () AS BIGINT) AS tot
          FROM persrc),
        alloc AS (
          SELECT CAST(0 AS BIGINT) AS rn,
                 CAST(NULL AS VARCHAR) AS source,
                 CAST(NULL AS BIGINT) AS supply,
                 CAST(NULL AS BIGINT) AS allocated,
                 (SELECT ANY_VALUE(tot) // {_UNIMAX_BUDGET_DEN} FROM sup)
                     AS remaining
          UNION ALL
          SELECT s.rn, s.source, s.supply,
                 LEAST(s.supply * {_UNIMAX_EPOCH_CAP},
                       a.remaining // (s.n - a.rn)) AS allocated,
                 a.remaining
                 - LEAST(s.supply * {_UNIMAX_EPOCH_CAP},
                         a.remaining // (s.n - a.rn))
          FROM alloc a JOIN sup s ON s.rn = a.rn + 1)
        SELECT source, supply AS supply_tokens,
               CAST(allocated AS BIGINT) AS allocated_tokens,
               {numeric.sql_round6(
                   "CASE WHEN supply > 0 THEN CAST(allocated AS DOUBLE)"
                   " / CAST(supply AS DOUBLE) ELSE 0.0 END"
               )} AS epochs
        FROM alloc WHERE rn >= 1
    """,
    tags=("sampling", "mixing"),
)
def llm_mix_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    distribute a training token budget (here total//2) across sources
    by WATER-FILLING under a per-source epoch cap — sources are visited
    in ascending-supply order and each receives
    ``min(supply x {_UNIMAX_EPOCH_CAP} epochs, remaining // sources_left)``,
    so scarce sources are never over-repeated (the epoch cap) and the
    freed budget flows to larger sources (the fair-share recomputation)
    — the principled alternative to temperature sampling for highly
    skewed corpora.  All-integer arithmetic end to end, so the
    allocation is hash-exact cross-engine.

    Scale shape: the ONLY distributed work is the per-source token
    supply aggregate (one map-combinable pass over the corpus); the
    water-filling recurrence runs over the |sources|-row MODEL-SIZED
    aggregate — driver-side here (the fixed_centroids collect-IS-the-
    model idiom; |sources| ≈ 20), a recursive CTE on the oracle — and
    the result itself is |sources| rows.  Downstream, the allocation
    feeds llm_mix_token_budget's per-source greedy selection to
    materialize the actual sample."""
    t = load_tables(spark, sf_dir)
    supply = (
        t["documents"]
        .groupBy("source")
        .agg(
            F.sum(F.size(text.tokens_expr(F.col("text"))))
            .cast("long")
            .alias("supply")
        )
    )
    rows = sorted(
        ((r["supply"], r["source"]) for r in supply.collect())
    )
    total = sum(s for s, _ in rows)
    remaining = total // _UNIMAX_BUDGET_DEN
    out = []
    n = len(rows)
    for i, (s, src) in enumerate(rows):
        fair = remaining // (n - i)
        alloc = min(s * _UNIMAX_EPOCH_CAP, fair)
        remaining -= alloc
        out.append((src, s, alloc))
    result = spark.createDataFrame(
        out, "source string, supply_tokens long, allocated_tokens long"
    )
    return result.select(
        "source",
        "supply_tokens",
        "allocated_tokens",
        F.when(
            F.col("supply_tokens") > 0,
            numeric.round6_expr(
                F.col("allocated_tokens").cast("double")
                / F.col("supply_tokens").cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("epochs"),
    )
