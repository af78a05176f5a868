"""Environment compatibility shims.

One job today: make the pure-Python ``google.protobuf`` runtime available
when the interpreter has no protobuf distribution installed, so Spark 4's
``transformWithStateInPandas`` runner (whose worker-side state protocol is
protobuf-serialized, ``pyspark/sql/streaming/proto/StateMessage_pb2.py``)
can execute instead of import-skipping.  The reference behavior that rides
on it is the 7-day idle-stream TTL (``process/StreamStateHandler.java:33``)
mapped onto native TWS ValueState TTL in ``streaming/stream_state.py``.

Strategy: several publicly-installed toolchains ship a self-contained
pure-Python protobuf runtime; if one is present on this machine, expose
ONLY its ``google/protobuf`` subtree through a private shim directory
(a symlink under a namespace-package ``google``), never the bundle root —
the bundle ships other packages (e.g. an App Engine SDK) that must not
leak onto every child interpreter's path.  The shim goes on ``sys.path``
— and on ``PYTHONPATH`` so forked Python WORKERS inherit it (the TWS
state client runs worker-side; enabling only the driver would fail at
the first state access).  Protobuf's own documented escape hatch
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` bridges a gencode/runtime
minor-version skew (e.g. 6.33 gencode on a 6.32 runtime — within
protobuf's cross-version guarantee for same-major versions).

Availability is decided by probing the ACTUAL CONSUMER — importing
``pyspark.sql.streaming.proto.StateMessage_pb2`` against the bundled
runtime — not merely ``import google.protobuf``.  A bundle whose major
version cannot load Spark's generated gencode (the version check only
waives same-major skew) would otherwise report True here and crash
worker-side at the first state access, the exact failure this gate
exists to prevent.  On probe failure every mutation (sys.path, env)
rolls back, so a broken bundle leaves no poisoned state behind.

Must run BEFORE the SparkSession's JVM starts: worker processes get their
environment from the JVM, which snapshots ours at launch.
``session.get_spark`` calls this first.
"""

from __future__ import annotations

import os
import sys
import tempfile

# Known self-contained pure-Python protobuf runtimes.  Each entry is a
# directory that contains ``google/protobuf/__init__.py``.
_BUNDLE_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

_VERSION_CHECK_ENV = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"


def _make_shim(bundle_root: str) -> str | None:
    """Build (or reuse) a shim dir exposing only ``google/protobuf``.

    Layout: ``<tmp>/fbqcs_protobuf_shim_<pid-stable-key>/google/protobuf``
    where ``protobuf`` is a symlink into the bundle and ``google`` is a
    bare implicit-namespace directory (no ``__init__.py`` — so a real
    ``google.*`` install elsewhere on the path still merges with it).
    A stable, world-readable path keyed on the bundle location (not the
    pid) so worker processes spawned later resolve the same PYTHONPATH
    entry.  Returns None if the shim cannot be built (e.g. no symlink
    support) — callers then skip this bundle.
    """
    import hashlib

    key = hashlib.md5(bundle_root.encode()).hexdigest()[:8]
    shim = os.path.join(
        tempfile.gettempdir(), f"fbqcs_protobuf_shim_{key}"
    )
    link = os.path.join(shim, "google", "protobuf")
    target = os.path.join(bundle_root, "google", "protobuf")
    try:
        os.makedirs(os.path.join(shim, "google"), exist_ok=True)
        if not os.path.islink(link):
            os.symlink(target, link)
        elif os.readlink(link) != target:
            os.remove(link)
            os.symlink(target, link)
    except OSError:
        return None
    return shim


def _probe_consumer() -> bool:
    """True iff Spark's TWS state gencode loads against the runtime."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except Exception:  # ImportError, or protobuf's own TypeError guards
        return False


def enable_bundled_protobuf() -> bool:
    """Make ``google.protobuf`` usable BY SPARK, returning availability.

    No-op (True) if an installed protobuf already loads Spark's state
    gencode; False if nothing on this machine can — callers keep their
    ``applyInPandasWithState`` fallback for that case.
    """
    try:
        import google.protobuf  # noqa: F401

        return _probe_consumer()
    except ImportError:
        pass
    for root in _BUNDLE_CANDIDATES:
        if not os.path.isfile(
            os.path.join(root, "google", "protobuf", "__init__.py")
        ):
            continue
        shim = _make_shim(root)
        if shim is None:
            continue
        # Stage every mutation, then probe the REAL consumer; commit only
        # on success so a broken bundle can never leave a poisoned
        # sys.path / PYTHONPATH / version-check override behind.
        saved_check = os.environ.get(_VERSION_CHECK_ENV)
        saved_pp = os.environ.get("PYTHONPATH")
        if shim not in sys.path:
            sys.path.append(shim)  # append: never shadow real installs
        # documented protobuf escape hatch for same-major version skew;
        # set via the environment so worker processes inherit it too
        os.environ[_VERSION_CHECK_ENV] = "true"
        pp = saved_pp or ""
        if shim not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{pp}{os.pathsep}{shim}" if pp else shim
            )
        try:
            import google.protobuf  # noqa: F401

            ok = _probe_consumer()
        except ImportError:
            ok = False
        if ok:
            return True
        # rollback: drop the path entry, restore env, evict any
        # half-imported modules so a later attempt starts clean
        if shim in sys.path:
            sys.path.remove(shim)
        if saved_check is None:
            os.environ.pop(_VERSION_CHECK_ENV, None)
        else:
            os.environ[_VERSION_CHECK_ENV] = saved_check
        if saved_pp is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = saved_pp
        for mod in [m for m in sys.modules if m.startswith("google")]:
            del sys.modules[mod]
    return False
