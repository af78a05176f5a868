"""Schema-compatible synthetic testdata generator (seed-robustness tool).

The driver's `/root/testdata/sf*` parquet is generated once with seed=42
(TESTDATA.md); every oracle comparison in this repo has therefore only
ever seen ONE sample per scale.  A constant accidentally tuned to that
sample — a threshold that happens to split, a tie that happens not to
occur — would be invisible to the harness.  This tool regenerates the
same ten tables at any scale factor with any seed, matching the driver
data's schemas (exact Arrow types, timestamp[us]), value domains, key
relationships, and row-count scaling rules, so the full correctness
harness can run against a fresh sample:

    python tools/gen_testdata.py /tmp/sf0.01_seed7 0.01 7
    python tools/check_correctness.py /tmp/sf0.01_seed7

Distributions were measured from the driver data (sf0.001/0.01/0.1):
row counts scale as customer=150k*sf, supplier=10k*sf, part=200k*sf,
orders=1.5M*sf, lineitem=6M*sf, events=1M*sf (users=15k*sf),
documents=max(500, 50k*sf), embeddings=max(500, 20k*sf); region=5 and
nation=25 fixed.  Events span 2024-01-01..31 sorted by ts with
sequential ids; event value ~ Exp(mean 50) rounded to 2dp; document
text is a 10..100-word salad over the same 31-word vocabulary with a
~0.4/0.15x4 language mix and planted exact + one-word-mutated
near-duplicates; embeddings are unit-norm 64-dim with 10 weak label
clusters (intra-label cosine ~0.02, as measured).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000
DAY_US = 86_400 * US

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ORDERSTATUS = ["F", "O", "P"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

EPOCH_2024 = np.datetime64("2024-01-01", "us").astype("int64")
EPOCH_1995 = np.datetime64("1995-01-01", "us").astype("int64")


def _ts_us(int_array: np.ndarray) -> pa.Array:
    return pa.array(int_array.astype("int64"), type=pa.timestamp("us"))


def _days(rng, n: int, start_us: int, n_days: int) -> pa.Array:
    return _ts_us(start_us + rng.integers(0, n_days, n) * DAY_US)


def gen(out_dir: str, sf: float, seed: int) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(150_000 * sf)
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(MKTSEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))

    n_supp = int(10_000 * sf)
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    n_part = int(200_000 * sf)
    keys = np.arange(n_part)
    write("part", pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array([
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(rng.integers(0, 8, n_part),
                            rng.integers(0, 8, n_part))
        ]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.integers(1, 26, n_part)]
        ),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (keys % 1000) / 10.0,
    }))

    n_ord = int(1_500_000 * sf)
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(ORDERSTATUS)[rng.integers(0, 3, n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2),
        "o_orderdate": _days(rng, n_ord, EPOCH_1995, 2405),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    n_li = int(6_000_000 * sf)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": _days(rng, n_li, EPOCH_1995 + DAY_US, 2500),
    }))

    n_ev = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    ts = np.sort(rng.integers(0, 30 * DAY_US, n_ev)) + EPOCH_2024
    value = np.round(np.minimum(rng.exponential(50.0, n_ev), 550.0), 2)
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_us(ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
        ),
        "value": np.maximum(value, 0.01),
        "props": pa.array(
            [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]
        ),
    }))

    n_doc = max(500, int(50_000 * sf))
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n_doc):
        k = int(rng.integers(10, 101))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), k)]))
    # planted duplicates: ~0.2% exact copies, ~0.5% one-word mutations of
    # an earlier doc — keeps the dedup/LSH operator families non-degenerate
    for i in range(1, n_doc):
        r = rng.random()
        if r < 0.002:
            texts[i] = texts[int(rng.integers(0, i))]
        elif r < 0.007:
            words = texts[int(rng.integers(0, i))].split(" ")
            words[int(rng.integers(0, len(words)))] = str(
                vocab[int(rng.integers(0, len(vocab)))]
            )
            texts[i] = " ".join(words)
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_P)),
        "source": pa.array(
            [f"src{i}" for i in rng.integers(0, 20, n_doc)]
        ),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_emb = max(500, int(20_000 * sf))
    dim = 64
    centers = rng.standard_normal((10, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = rng.standard_normal((n_emb, dim)) + 1.2 * centers[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype("float32")],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    out_dir, sf = sys.argv[1], float(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    gen(out_dir, sf, seed)
    total = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
    )
    print(f"wrote sf={sf} seed={seed} to {out_dir} ({total >> 20} MiB)")


if __name__ == "__main__":
    main()
