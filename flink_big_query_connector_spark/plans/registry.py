"""Registry of (name -> Spark query, DuckDB oracle SQL) pairs.

Every operator the engine claims in SURVEY.md §2 gets a registry entry; the
correctness driver runs the Spark callable and the oracle SQL side by side
at sf0.01 and hash-compares values.  Entries whose semantics are not
SQL-expressible (approximate sketches, stateful streaming internals)
register with ``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QueryDef"] = {}


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


# The engine's VECTOR CONTRACT, oracle side: similarity oracles reference
# `embx` instead of raw `embeddings`, and the CTE below is prepended to
# any oracle that uses it.  MATERIALIZED is load-bearing: with a plain
# view/CTE DuckDB's optimizer can evaluate list_cosine_similarity below
# the IS NOT NULL filter when scanning physical parquet with NULL vectors
# and hard-error ("argument can not contain NULL values") — the barrier
# pins filter-then-compute.  The Spark twin is llm_ops._emb.
_EMBX_CTE = (
    "embx AS MATERIALIZED "
    "(SELECT * FROM embeddings WHERE embedding IS NOT NULL)"
)


def _finalize_oracle(name: str, oracle: str | None) -> str | None:
    if oracle is None or "embx" not in oracle:
        return oracle
    stripped = oracle.lstrip()
    if not stripped.startswith("WITH "):
        raise ValueError(
            f"{name}: oracle references embx but does not start with WITH"
        )
    return stripped.replace("WITH ", f"WITH {_EMBX_CTE},\n        ", 1)


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""
):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(
            name, fn, _finalize_oracle(name, oracle), tags,
            doc or (fn.__doc__ or ""),
        )
        return fn

    return deco


# The external correctness driver samples the FIRST 50 entries of
# ``queries()`` each round.  Registration order had kept the same 50
# early relational queries in that window for five rounds, so the
# newest (least externally proven) operators were only ever checked by
# the in-repo harness.  The surface functions therefore emit these
# priority keys first — newest/least-driver-checked queries — followed
# by everything else in registration order.  tools/check_correctness.py
# and the test sweeps run the FULL registry either way.
DRIVER_PRIORITY: tuple[str, ...] = (
    "llm_multimodal_phash_dedup",
    "b14_fuzzy_join",
    "llm_dedup_canonical_centrality",
    "b26_stream_backfill",
    "llm_ann_pq_encode",
    "llm_ann_pq_adc",
    "llm_ann_recall_matrix",
    "llm_ann_recall_eval",
    "llm_ann_sq8",
    "llm_heavy_hitters_cms",
    "llm_bpe_train",
    "llm_bpe_encode",
    "llm_bpe_fertility",
    "llm_text_langid_confusion",
    "llm_embedding_drift",
    "llm_dedup_lsh_eval",
    "b04_skew_profile",
    "b24_stream_decontaminate",
    "b25_stream_budget_admission",
    "b26_stream_cdc_apply",
    "b26_stream_scd2_history",
    "b24_stream_neardup_history",
    "b28_stream_incremental_topk",
    "b21_stream_three_way_join",
    "llm_dedup_incremental",
    "llm_dedup_cluster",
    "llm_ann_ivf_kmeans",
    "llm_dedup_span_removal",
    "llm_mix_token_budget",
    "b26_incremental_matview",
)


def _surface_order() -> list[str]:
    rest = [n for n in REGISTRY if n not in DRIVER_PRIORITY]
    return [n for n in DRIVER_PRIORITY if n in REGISTRY] + rest


def queries() -> dict[str, QueryFn]:
    return {n: REGISTRY[n].fn for n in _surface_order()}


def oracle_sql() -> dict[str, str]:
    return {
        n: REGISTRY[n].oracle
        for n in _surface_order()
        if REGISTRY[n].oracle is not None
    }
