"""Tri-scale wall-time curves for the heaviest registry entries.

The bench set proves per-query speed at one scale; this tool proves the
GROWTH SHAPE — the 100x-scale-up evidence.  Each query runs at
sf0.001 / sf0.01 / sf0.1 (100x data growth across the sweep) and the
table reports wall time plus the growth ratio per 10x data step.  A
near-linear operator should grow well under 10x per step on local[32]
at these sizes (fixed overheads — session, micro-batch replay, plan
build — dominate small scales, so ratios below ~3 are typical; a ratio
APPROACHING 10 means the data term dominates and anything clearly above
10 is super-linear and a scale bug).

Usage:  python tools/scaling_curve.py [query ...]
        (default: the slowest multi-batch/iterative registry entries)

Prints one JSON line {"query": {"sf0.001": s, "sf0.01": s, "sf0.1": s,
"ratio_01": r, "ratio_1": r}} after a human table.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_big_query_connector_spark import plans  # noqa: E402
from flink_big_query_connector_spark.cache import release_caches  # noqa: E402
from flink_big_query_connector_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "b24_stream_neardup_history",
    "llm_dedup_canonical_centrality",
    "llm_dedup_cluster",
    "b21_stream_three_way_join",
    "llm_dedup_minhash_lsh",
    "b26_dsv2_roundtrip",
    "llm_bpe_encode",
]

SCALES = ["0.001", "0.01", "0.1"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark()
    out: dict[str, dict] = {}
    for name in names:
        fn = plans.REGISTRY[name].fn
        row: dict[str, float] = {}
        for sf in SCALES:
            sf_dir = f"/root/testdata/sf{sf}"
            # warm the table catalog cache out of the timing, then time
            # plan build + execution the way the driver observes it
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            row[f"sf{sf}"] = round(time.monotonic() - t0, 2)
            release_caches(spark)
        row["ratio_01"] = round(row["sf0.01"] / row["sf0.001"], 2)
        row["ratio_1"] = round(row["sf0.1"] / row["sf0.01"], 2)
        out[name] = row
        print(
            f"{name:34s} {row['sf0.001']:7.2f}s {row['sf0.01']:7.2f}s "
            f"{row['sf0.1']:7.2f}s   x{row['ratio_01']:<5} x{row['ratio_1']}"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
