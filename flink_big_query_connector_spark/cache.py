"""Scoped persist tracking — cache hygiene for multi-consumer operators.

Several operators persist an intermediate (a shingle/md5 pass, IVF cell
assignment) because the returned lazy plan consumes it from 2-3 branches.
A bare ``DataFrame.persist()`` lives until the session dies: in a loop
that times many queries back-to-back (bench.py) the leaked caches from
one operator squeeze executor memory for the next — the round-3 bench saw
``llm_dedup_simhash`` run 2.8x slower immediately after two persisted
``llm_dedup_minhash_lsh`` passes.

``scoped_persist`` is a drop-in replacement that records the DataFrame so
harnesses can bulk-release with :func:`release_caches` once the consumer
has materialized the result.  Operators that run their own actions and
unpersist inline (``connected_components``) don't need this; everything
that returns a lazy plan over a persisted intermediate does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SCOPED: list[DataFrame] = []

# (applicationId, sf_dir, label) -> row count.  The data-scaled-literal
# plan-build idiom (semantic cell count, URL bucket count, calibration
# modulus) issues a driver-blocking .count() per QUERY BUILD; the inputs
# are immutable parquet per sf_dir, so the count is a session constant —
# cache it once per (session, directory, label) like the table-plan cache
# in sources/tables.py (ADVICE r12: at 100 TB each miss is a column-pruned
# scan, paid once per session instead of once per query).  Keyed by
# applicationId so a restarted session never reads a stale count.
_COUNT_CACHE: dict[tuple[str, str, str], int] = {}


def table_footer_count(sf_dir: str, table: str) -> int:
    """Row count of a RAW testdata table straight from its parquet
    footer(s) — the exact number a full ``df.count()`` scan returns
    (parquet footers record ``num_rows`` per file), at metadata cost
    instead of a data scan.  Only valid for a WHOLE-table count: any
    filtered count (``embeddings_nonnull`` etc.) must keep the Spark
    job, because footer column statistics cannot express row-level
    predicates (list-typed columns in particular conflate null rows,
    empty lists and null elements in leaf null counts).

    Memoized per (sf_dir, table): the inputs are immutable per
    directory, and the count is re-read from the files on every new
    process — nothing persists across runs.  Measured: the first
    ``documents`` plan-build count at the sf10 decade was a 4 s Spark
    scan; the footer read is milliseconds."""
    import glob
    import os

    key = (sf_dir, table)
    n = _FOOTER_COUNT_CACHE.get(key)
    if n is None:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{table}.parquet")
        files = (
            sorted(glob.glob(os.path.join(path, "*.parquet")))
            if os.path.isdir(path)
            else [path]
        )
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        _FOOTER_COUNT_CACHE[key] = n
    return n


_FOOTER_COUNT_CACHE: dict[tuple[str, str], int] = {}


def plan_count(df: DataFrame, sf_dir: str, label: str) -> int:
    """``df.count()`` memoized per (session, sf_dir, label).

    ``label`` names WHAT is being counted (e.g. ``embeddings_nonnull``);
    callers must keep it 1:1 with the dataframe's logical content — two
    different frames under one label would alias.  Only plan-build-time
    sizing counts over the immutable testdata go through here; operators
    counting mutable/derived state keep their own jobs."""
    key = (df.sparkSession.sparkContext.applicationId, sf_dir, label)
    n = _COUNT_CACHE.get(key)
    if n is None:
        n = df.count()
        _COUNT_CACHE[key] = n
    return n


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` that registers the cache for later bulk release."""
    p = df.persist()
    _SCOPED.append(p)
    return p


def release_caches(spark: SparkSession | None = None) -> int:
    """Unpersist every scoped cache (non-blocking); returns count released.

    With ``spark`` given, also clears the session's whole cache manager —
    belt and braces for harness loops that must not carry storage across
    timed queries.
    """
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    if spark is not None:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
    return n
