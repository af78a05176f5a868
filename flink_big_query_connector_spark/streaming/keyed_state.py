"""Distributed bucketed keyed state for ``foreachBatch`` consumers.

The Delta-style copy-on-write MERGE primitive the streaming CDC apply and
SCD2 history queries share: keyed state lives as hash-bucketed parquet on
disk; each micro-batch reads back ONLY the buckets it touches, merges,
and rewrites just those buckets into a new version directory.  A tiny
bucket→path manifest (at most ``n_buckets`` entries — the moral
equivalent of a Delta transaction-log entry) is the only driver-side
bookkeeping; per-key state never reaches the driver (plan-pinned in
tests/test_scale_patterns.py).

Reference semantics preserved: the keyed-state discipline of
``process/StreamStateHandler.java:53-102`` (newest-wins merges, durable
per-key continuation across batches).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class BucketedKeyedState:
    """Hash-bucketed parquet keyed-state table with versioned rewrites."""

    def __init__(
        self, root: str, key_col: str, schema: str, n_buckets: int = 16
    ):
        self.root = root
        self.key_col = key_col
        self.schema = schema
        self.n_buckets = n_buckets
        self.manifest_path = os.path.join(root, "manifest.json")
        os.makedirs(root, exist_ok=True)

    def bucket_expr(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets))

    #: Reserved manifest key recording the last merged batch id.  Kept in
    #: the same JSON document as the bucket map so both advance in the one
    #: atomic ``os.replace`` — deriving it from surviving bucket paths is
    #: NOT safe: a batch whose touched buckets all merge to empty deletes
    #: its entries, and a re-delivered copy would then pass the
    #: ``batch_id <= last_batch()`` replay guard.
    _LAST_BATCH_KEY = "__last_batch"

    def _manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {}

    def _bucket_paths(self, manifest: dict) -> dict:
        return {
            k: v for k, v in manifest.items() if k != self._LAST_BATCH_KEY
        }

    def touched_buckets(self, df: DataFrame) -> list[int]:
        """Distinct bucket ids present in ``df`` — the ONLY driver-side
        collect in the merge loop, bounded by ``n_buckets``."""
        return sorted(
            r["b"]
            for r in df.select(
                self.bucket_expr(F.col(self.key_col)).alias("b")
            )
            .distinct()
            .collect()
        )

    def read_buckets(self, spark, buckets: list[int]) -> DataFrame:
        """Current state rows of the given buckets (empty frame if none
        were ever written)."""
        manifest = self._bucket_paths(self._manifest())
        paths = [
            manifest[str(b)] for b in buckets if str(b) in manifest
        ]
        if not paths:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(*paths)

    def write_buckets(
        self, df: DataFrame, batch_id: int, touched: list[int]
    ) -> None:
        """Rewrite the touched buckets from ``df`` (which must contain
        ALL surviving rows for those buckets) into a fresh version
        directory, then atomically advance the manifest.  Version dirs
        are keyed by batch id, so a replayed batch overwrites its own
        attempt — idempotent under checkpoint recovery.

        A touched bucket whose merged output has ZERO rows produces no
        ``bucket=b`` directory under ``vdir`` (partitionBy writes no
        empty partitions), so its manifest entry is DELETED rather than
        advanced — pointing it at the nonexistent path would make the
        next read fail with PATH_NOT_FOUND.

        The write hash-repartitions by the bucket value first so each
        bucket lands wholly in ONE task and therefore ONE file: a
        partitionBy write over unaligned input emits one file per
        (task, bucket) pair — at a data-scaled bucket count that is
        tasks x buckets tiny files (measured ~32 x 3906 at the sf10
        decade), paid again by every later read's file listing.  The
        shuffle moves only the state rows (keys + fixed-width metadata,
        never payloads), and AQE coalesces the post-shuffle partitions,
        so task count stays bounded while the file count drops to
        exactly one per bucket."""
        vdir = os.path.join(self.root, f"v{batch_id}")
        (
            df.withColumn("bucket", self.bucket_expr(F.col(self.key_col)))
            .repartition(F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(vdir)
        )
        present = {
            int(d.split("=", 1)[1])
            for d in os.listdir(vdir)
            if d.startswith("bucket=")
        }
        manifest = self._manifest()
        for b in touched:
            if b in present:
                manifest[str(b)] = os.path.join(vdir, f"bucket={b}")
            else:
                manifest.pop(str(b), None)
        manifest[self._LAST_BATCH_KEY] = max(
            batch_id, manifest.get(self._LAST_BATCH_KEY, -1)
        )
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self.manifest_path)

    def last_batch(self) -> int:
        """Last batch id merged into the manifest, or -1 if never
        written.  Because the manifest advance is the final atomic step
        of :meth:`write_buckets`'s callers, ``batch_id <= last_batch()``
        identifies a RE-DELIVERED micro-batch after checkpoint recovery:
        non-idempotent merges (running totals, interval stitching) must
        no-op instead of re-applying the batch.  Read from the explicit
        ``__last_batch`` manifest field (with a legacy fallback to the
        largest version directory a bucket path points at, for manifests
        written before the field existed)."""
        manifest = self._manifest()
        recorded = manifest.get(self._LAST_BATCH_KEY)
        if recorded is not None:
            return int(recorded)
        versions = [-1]
        for path in self._bucket_paths(manifest).values():
            name = os.path.basename(os.path.dirname(path))
            if name.startswith("v"):
                try:
                    versions.append(int(name[1:]))
                except ValueError:
                    pass
        return max(versions)

    def read_all(self, spark) -> DataFrame:
        manifest = self._bucket_paths(self._manifest())
        if not manifest:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(*manifest.values())

    def compact(self, spark, keep_predicate: str, batch_id: int) -> None:
        """Rewrite EVERY live bucket keeping only rows matching
        ``keep_predicate`` — the index-level TTL/compaction pass
        (reference twin: the 7-day keyed-state TTL of
        ``process/StreamStateHandler.java:33``, applied to the standing
        index instead of per-stream state).

        Consumers expire lazily on READ (their liveness filter), so a
        compaction never changes query results — it reclaims the space
        of rows no future read can match (dead rows otherwise persist
        forever in buckets no later batch touches).  One full-index
        rewrite under the same versioned-manifest discipline as a merge:
        crash mid-compact leaves the old manifest intact; ``batch_id``
        must exceed every merged batch so the replay guard still
        orders."""
        manifest = self._bucket_paths(self._manifest())
        buckets = sorted(int(b) for b in manifest)
        if not buckets:
            return
        live = self.read_buckets(spark, buckets).filter(keep_predicate)
        self.write_buckets(live, batch_id, buckets)
