"""Environment compatibility shims.

One job today: make the pure-Python ``google.protobuf`` runtime available
when the interpreter has no protobuf distribution installed, so Spark 4's
``transformWithStateInPandas`` runner (whose worker-side state protocol is
protobuf-serialized, ``pyspark/sql/streaming/proto/StateMessage_pb2.py``)
can execute instead of import-skipping.  The reference behavior that rides
on it is the 7-day idle-stream TTL (``process/StreamStateHandler.java:33``)
mapped onto native TWS ValueState TTL in ``streaming/stream_state.py``.

Strategy: several publicly-installed toolchains ship a self-contained
pure-Python protobuf runtime; if one is present on this machine, put it on
``sys.path`` — and on ``PYTHONPATH`` so forked Python WORKERS inherit it
(the TWS state client runs worker-side; enabling only the driver would
fail at the first state access).  Protobuf's own documented escape hatch
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` bridges a gencode/runtime
minor-version skew (e.g. 6.33 gencode on a 6.32 runtime — within
protobuf's cross-version guarantee for same-major versions).

Must run BEFORE the SparkSession's JVM starts: worker processes get their
environment from the JVM, which snapshots ours at launch.
``session.get_spark`` calls this first.
"""

from __future__ import annotations

import os
import sys

# Known self-contained pure-Python protobuf runtimes.  Each entry is a
# directory that contains ``google/protobuf/__init__.py``.
_BUNDLE_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def enable_bundled_protobuf() -> bool:
    """Make ``google.protobuf`` importable, returning availability.

    No-op (True) if a protobuf distribution is already installed; False
    if none is installed and no known bundle exists on this machine —
    callers keep their ``applyInPandasWithState`` fallback for that case.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    for root in _BUNDLE_CANDIDATES:
        if not os.path.isfile(
            os.path.join(root, "google", "protobuf", "__init__.py")
        ):
            continue
        # probe the bundle FIRST; the process-wide environment (inherited
        # by every worker/JVM child) mutates only once the import is known
        # to work — a broken bundle must not leave a poisoned PYTHONPATH
        # or a globally disabled protobuf version check behind
        if root not in sys.path:
            sys.path.append(root)  # append: never shadow real installs
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            sys.path.remove(root)
            continue
        # documented protobuf escape hatch for same-major version skew;
        # set via the environment so worker processes inherit it too
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        pp = os.environ.get("PYTHONPATH", "")
        if root not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{pp}{os.pathsep}{root}" if pp else root
            )
        return True
    return False
