"""Per-process scratch space for queries that need on-disk state.

Several registry queries materialize side state (bucketed tables,
compaction targets, streaming checkpoints, CDC keyed-state tables).
Creating a bare ``tempfile.mkdtemp`` per invocation leaks disk across
repeated bench/sweep loops and, with fixed names, races concurrent runs
in one session.  All such state now lives under ONE per-process root
that is removed at interpreter exit, and helpers hand out per-invocation
unique names so concurrent invocations never collide.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil
import tempfile

_ROOT: str | None = None
_counter = itertools.count()


def scratch_root() -> str:
    """The per-process scratch root (created lazily, removed at exit)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="bqspark_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the scratch root; cleaned up at exit."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())


def unique_name(base: str) -> str:
    """A per-invocation unique identifier (for catalog table names)."""
    return f"{base}_{os.getpid()}_{next(_counter)}"
