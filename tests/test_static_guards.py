"""Static source guards.

Round 2 died on a testdata physical-type flip (events.ts shipped as both
int64-nanos and timestamp[us] across driver rounds); the fix was to route
ALL event-time access through ``ts_micros`` / ``ts_event_time`` in
``sources/tables.py``.  These tests make a recurrence impossible to land:
any raw ``ts`` arithmetic outside the helper module fails the suite
before it can fail a driver round.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "flink_big_query_connector_spark"

# Each pattern is one way a plan can hard-wire the physical type of
# events.ts.  `col("ts").cast(...)` breaks on the int64-nanos read
# (interprets nanos as seconds); `ts div 1000` and `unix_micros(col("ts"))`
# break on the timestamp read; `withWatermark("ts", ...)` rejects the NTZ
# read.  All four must go through the helpers instead.
FORBIDDEN = [
    re.compile(r"""col\(['"]ts['"]\)\s*\.\s*cast"""),
    re.compile(r"""['"`]ts div 1000"""),
    re.compile(r"""unix_micros\(\s*F\.col\(['"]ts['"]\)\s*\)"""),
    re.compile(r"""withWatermark\(\s*['"]ts['"]"""),
    re.compile(r"""timestamp_micros\(\s*F\.col\(['"]ts['"]\)"""),
]

ALLOWED_FILES = {PKG / "sources" / "tables.py"}


def test_no_raw_ts_arithmetic_outside_tables_helpers():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        if path in ALLOWED_FILES:
            continue
        text = path.read_text()
        for lineno, line in enumerate(text.splitlines(), 1):
            for pat in FORBIDDEN:
                if pat.search(line):
                    offenders.append(f"{path}:{lineno}: {line.strip()}")
    assert not offenders, (
        "raw events.ts arithmetic outside sources/tables.py — use "
        "ts_micros()/ts_event_time() instead:\n" + "\n".join(offenders)
    )


def test_vector_contract_no_raw_embeddings_in_similarity_oracles():
    """The vector contract (NULL embeddings never reach a similarity
    operator; registry.py::_finalize_oracle) cannot be bypassed by a new
    query: any registered oracle that touches the embeddings table must
    read it through the materialized ``embx`` CTE, and any Spark query in
    llm_ops must go through ``_emb(t)`` rather than ``t["embeddings"]``."""
    import sys

    sys.path.insert(0, str(PKG.parent))
    from flink_big_query_connector_spark.plans import REGISTRY

    offenders = [
        name
        for name, d in REGISTRY.items()
        if d.oracle is not None
        and re.search(r"\bFROM\s+embeddings\b", d.oracle)
        and "embx" not in d.oracle
    ]
    assert offenders == [], offenders

    src = (PKG / "plans" / "llm_ops.py").read_text()
    raw_uses = [
        lineno
        for lineno, line in enumerate(src.splitlines(), 1)
        if 't["embeddings"]' in line and "def _emb" not in line
        # the helper's own body is the single allowed access
        and "return t" not in line
    ]
    assert raw_uses == [], raw_uses
