"""Parquet source catalog for the driver-generated TESTDATA tables.

Columnar parquet scans are the engine's batch source: Catalyst pushes
filters and prunes columns down to the scan (visible as ``PushedFilters``
and ``ReadSchema`` in ``df.explain``), so every downstream query pays only
for the bytes it touches — the property that matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (they grow
# sublinearly or are fixed-size in TPC-H-style schemas).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table as a lazy DataFrame keyed by name."""
    tune_session(spark)
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register each table as a temp view (for the SQL entry points)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(prefix + name)
