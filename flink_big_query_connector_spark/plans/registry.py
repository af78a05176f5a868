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


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""
):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(name, fn, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: d.fn for n, d in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: d.oracle for n, d in REGISTRY.items() if d.oracle is not None}
