"""Generate a LOCAL scale proxy of the driver's synthetic tables.

The driver's round-end bench may run at sf1.0 (10x sf0.1), but that
directory is driver-generated and not present between rounds. This tool
fabricates a statistically similar dataset (same schemas, same
distributional shape measured from sf0.1: 31-word uniform vocab documents
of 10-100 tokens, unit-norm random 64-dim embeddings, TPC-H-ish keys) so
before/after optimization measurements can be taken at driver scale.

It is a MEASUREMENT tool only: correctness is checked against the real
sf0.001/0.01/0.1 data; nothing in the engine reads the proxy.

Usage: python tools/make_scale_proxy.py <out_dir> [scale_vs_sf01]
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "batch", "part", "line", "order", "sort",
    "fast", "scan", "hash", "group", "agg", "filter", "query", "big",
    "key", "row", "slow", "join", "customer", "the", "a", "dedup",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    out_dir = sys.argv[1]
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    rng = np.random.RandomState(777)
    os.makedirs(out_dir, exist_ok=True)

    n_docs = int(5000 * scale)
    ntoks = rng.randint(10, 101, size=n_docs)
    vocab = np.array(VOCAB, dtype=object)
    texts = [" ".join(vocab[rng.randint(0, len(vocab), k)]) for k in ntoks]
    # a sprinkle of exact duplicates (sf0.1 has ~8/5000)
    for i in rng.choice(n_docs, size=max(2, int(n_docs * 0.0016)), replace=False):
        texts[i] = texts[(i * 7 + 13) % n_docs]
    doc_id = np.arange(n_docs, dtype=np.int64)
    _write(out_dir, "documents", pa.table({
        "doc_id": doc_id,
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(rng.choice(LANGS, size=n_docs, p=LANG_P)),
        "source": pa.array(["src%d" % (i % 20) for i in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    n_vec = int(2000 * scale)
    V = rng.randn(n_vec, 64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": pa.array([row for row in V.astype(np.float32)],
                              type=pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_vec), type=pa.int32()),
    }))

    n_ev = int(100_000 * scale)
    ts0 = np.datetime64("2024-01-01T00:00:00.000000")
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(ts0 + (rng.randint(0, 30 * 86_400_000_000, n_ev)
                              ).astype("timedelta64[us]")),
        "user_id": pa.array(rng.randint(0, int(1500 * scale), n_ev),
                            type=pa.int64()),
        "event_type": pa.array(rng.choice(
            ["error", "view", "signup", "purchase", "click"], size=n_ev)),
        "value": np.round(rng.exponential(90.0, n_ev), 2),
        "props": pa.array(['{"k": %d}' % k for k in rng.randint(0, 100, n_ev)]),
    }))

    n_ord = int(150_000 * scale)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": pa.array(rng.randint(0, int(15_000 * scale), n_ord),
                              type=pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], size=n_ord)),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(ts0 + (rng.randint(0, 2500 * 86_400_000_000 // 1000,
                                                   n_ord) * 1000
                                       ).astype("timedelta64[us]")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            size=n_ord)),
    }))

    n_li = int(600_000 * scale)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.randint(0, n_ord, n_li), type=pa.int64()),
        "l_partkey": pa.array(rng.randint(0, int(20_000 * scale), n_li),
                              type=pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, int(1000 * scale), n_li),
                              type=pa.int64()),
        "l_linenumber": pa.array(rng.randint(1, 8, n_li), type=pa.int32()),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": pa.array(rng.choice(["N", "A", "R"], size=n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], size=n_li)),
        "l_shipdate": pa.array(ts0 + (rng.randint(0, 2500 * 86_400, n_li)
                                      * 1_000_000).astype("timedelta64[us]")),
    }))

    n_cust = int(15_000 * scale)
    _write(out_dir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": pa.array(["Customer#%09d" % i for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": pa.array(rng.choice(
            ["FURNITURE", "MACHINERY", "BUILDING", "AUTOMOBILE", "HOUSEHOLD"],
            size=n_cust)),
    }))

    n_part = int(20_000 * scale)
    _write(out_dir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": pa.array([
            "%s %s" % (rng.choice(["large", "small", "hot", "cold"]),
                       rng.choice(["ring", "bolt", "cap", "pin"]))
            for _ in range(n_part)]),
        "p_brand": pa.array(["Brand#%d" % b for b in rng.randint(1, 26, n_part)]),
        "p_type": pa.array(rng.choice(["LARGE", "ECONOMY", "STANDARD", "SMALL"],
                                      size=n_part)),
        "p_size": pa.array(rng.randint(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(900 + 0.1 * np.arange(n_part), 2),
    }))

    n_sup = int(1000 * scale)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_sup, dtype=np.int64),
        "s_name": pa.array(["Supplier#%09d" % i for i in range(n_sup)]),
        "s_nationkey": pa.array(rng.randint(0, 25, n_sup), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_sup), 2),
    }))

    for small in ("nation", "region"):
        shutil.copy(f"/root/testdata/sf0.1/{small}.parquet",
                    os.path.join(out_dir, f"{small}.parquet"))
        print(f"  {small}: copied from sf0.1")


if __name__ == "__main__":
    main()
