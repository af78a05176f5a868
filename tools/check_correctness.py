"""Local stand-in for the driver's duckdb-oracle correctness gate.

Runs every registry query through Spark AND its oracle SQL through DuckDB
on the same parquet tables, then compares row count, column names and
order-insensitive values (columns sorted by name, rows sorted, floats
compared bitwise after canonicalization).

Usage:  python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from flink_big_query_connector_spark import plans  # noqa: E402
from flink_big_query_connector_spark.cache import release_caches  # noqa: E402
from flink_big_query_connector_spark.session import get_spark  # noqa: E402
from flink_big_query_connector_spark.sources.tables import TABLES  # noqa: E402


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full round-trip precision — bitwise comparison
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, bytes):
        return f"bytes:{v.hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon_value(r[i]) for i in order))
    out.sort()
    return sorted(c for c in cols), out


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("correctness-check", cpus=8, shuffle_partitions=8)

    registry = plans.REGISTRY
    selected = names or sorted(registry)
    n_pass = n_fail = n_rowsonly = 0
    for name in selected:
        qd = registry[name]
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # in finally: a throwing query must not leak its scoped
            # persists into every subsequent query's timing/memory
            release_caches(spark)
        if qd.oracle is None:
            print(f"ROWS-ONLY {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(qd.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = canon_rows(scols, srows)
        oc, orr = canon_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} duck={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(orr)}")
            n_fail += 1
            continue
        if sr != orr:
            bad = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sr)} rows  ({time.time()-t0:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
