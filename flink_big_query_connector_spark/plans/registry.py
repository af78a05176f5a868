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


def queries() -> dict[str, QueryFn]:
    return {n: d.fn for n, d in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: d.oracle for n, d in REGISTRY.items() if d.oracle is not None}
