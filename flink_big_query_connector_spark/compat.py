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


def _private_shim_base() -> str | None:
    """A per-user 0700 directory to hold shims, ownership-verified.

    The shim goes on every child interpreter's PYTHONPATH, so its path
    must not be writable by any other local user: a shared /tmp
    location with ``makedirs(exist_ok=True)`` would silently ADOPT a
    directory another user pre-created (and they could then swap the
    symlink target between our check and a worker's import — TOCTOU —
    injecting code into driver and workers).  Candidates are
    ``~/.cache/fbqcs`` then ``<tmp>/fbqcs-<uid>``; whichever exists or
    is created must be a real directory (not a symlink), owned by the
    current uid, with no group/other permission bits — refused (and
    repaired by chmod only when we own it) otherwise."""
    import stat as _stat

    uid = os.getuid()
    candidates = []
    home = os.path.expanduser("~")
    if home and not home.startswith("~"):
        candidates.append(os.path.join(home, ".cache", "fbqcs"))
    candidates.append(
        os.path.join(tempfile.gettempdir(), f"fbqcs-{uid}")
    )
    for base in candidates:
        try:
            os.makedirs(base, mode=0o700, exist_ok=True)
            st = os.lstat(base)
            if not _stat.S_ISDIR(st.st_mode) or st.st_uid != uid:
                continue  # someone else's object at this path: refuse
            if st.st_mode & 0o077:
                os.chmod(base, 0o700)
                st = os.lstat(base)
                if st.st_mode & 0o077:
                    continue
            return base
        except OSError:
            continue
    return None


def _make_shim(bundle_root: str) -> str | None:
    """Build (or reuse) a shim dir exposing only ``google/protobuf``.

    Layout: ``<base>/protobuf_shim_<key>/google/protobuf`` where
    ``protobuf`` is a symlink into the bundle, ``google`` is a bare
    implicit-namespace directory (no ``__init__.py`` — so a real
    ``google.*`` install elsewhere on the path still merges with it),
    and ``<base>`` is the user-private 0700 directory from
    :func:`_private_shim_base` — nobody else can retarget the symlink.
    The path is keyed on the bundle location (not the pid) so worker
    processes spawned later resolve the same PYTHONPATH entry.  Returns
    None if the shim cannot be built (no private base, no symlink
    support) — callers then skip this bundle.
    """
    import hashlib

    base = _private_shim_base()
    if base is None:
        return None
    key = hashlib.md5(bundle_root.encode()).hexdigest()[:8]
    shim = os.path.join(base, f"protobuf_shim_{key}")
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
