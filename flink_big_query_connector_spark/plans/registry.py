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


# ``queries()`` / ``oracle_sql()`` ORDERING IS LOAD-BEARING: an external
# correctness driver samples a prefix (historically the first 50 entries)
# of ``queries()`` each round.  For five rounds a static registration
# order kept the same early relational queries in that window, so the
# newest operators were only ever checked by the in-repo harness
# (tools/check_correctness.py, which always runs the FULL registry).
#
# Rather than a hand-curated priority tuple (which silently re-creates
# the gap for every query not added to it), the surface order is now
# DERIVED from the audit trail the driver itself leaves behind: the
# ``CORRECTNESS_r*.json`` files committed at the repo root.  The rule is
#
#   1. queries whose LATEST driver row is a FAILURE (harness error, or
#      any of rows/schema/hash not matching), sorted by name — a red
#      row must re-enter the very next window or it can never turn
#      green (before this tier, an r3 harness crash left
#      ``b17_array_setops`` unchecked for five rounds because its
#      last-seen round made it "recently checked" to the LRU rule);
#   2. then queries that have NEVER appeared in any
#      CORRECTNESS_r*.json, sorted by name;
#   3. then previously-checked green queries, least-recently-checked
#      first (ascending last round seen, name as tie-break).
#
# This is deterministic for a given checkout, self-maintaining (a brand
# new query has no CORRECTNESS row, so it lands near the front of the
# next round's window automatically; a failed one jumps the queue), and
# converges to a steady rotation of the least-recently-audited keys
# once every query has been checked at least once and is green.
# COVERAGE.md carries the human-readable ledger.
def _driver_checked_rounds(root=None) -> dict[str, tuple[int, bool]]:
    """name -> (last round a CORRECTNESS_r*.json recorded it, was that
    latest row green).  Green = no harness error and all three of
    rows/schema/hash match (a null hash_match — the rows-only check —
    counts as green; an explicit False does not)."""
    import json
    import re
    from pathlib import Path

    root = root or Path(__file__).resolve().parents[2]
    last_seen: dict[str, tuple[int, bool]] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for key, row in data.items():
            green = (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is not False
            )
            prev = last_seen.get(key)
            if prev is None or rnd >= prev[0]:
                last_seen[key] = (rnd, green)
    return last_seen


def _surface_order() -> list[str]:
    last_seen = _driver_checked_rounds()
    failed = sorted(
        n for n in REGISTRY if n in last_seen and not last_seen[n][1]
    )
    never = sorted(n for n in REGISTRY if n not in last_seen)
    green = sorted(
        (n for n in REGISTRY if n in last_seen and last_seen[n][1]),
        key=lambda n: (last_seen[n][0], n),
    )
    return failed + never + green


def queries() -> dict[str, QueryFn]:
    return {n: REGISTRY[n].fn for n in _surface_order()}


def oracle_sql() -> dict[str, str]:
    return {
        n: REGISTRY[n].oracle
        for n in _surface_order()
        if REGISTRY[n].oracle is not None
    }
