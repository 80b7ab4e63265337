"""Generate a driver-scale (sf≈1.0) measurement dataset at /root/sf1x.

The driver's round-end bench runs at sf1.0 (BENCH_r05.json "sf": 1.0)
but /root/testdata only ships sf0.001/0.01/0.1. This synthesizes
statistically equivalent tables at 10x sf0.1 row counts so
optimizations can be measured at the scale the driver grades:

  documents   50,000 rows — 30-word uniform vocab, 10..100 tokens,
              lang mix ~41% en, ~0.16%% exact-dup rate (matches the
              sf0.1 empirical profile)
  embeddings  20,000 rows — 64-dim float32 around 10 label centroids
              fitted from sf0.1
  lineitem    6,000,000 rows — returnflag/extendedprice resampled
              from the sf0.1 empirical distribution

Deterministic (seed 42). MEASUREMENT ONLY: correctness stays pinned
to the driver testdata + DuckDB oracles; nothing here feeds results
back into bench.py or the oracle paths.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1x"
SRC = "/root/testdata/sf0.1"

VOCAB = ["spark", "window", "merge", "table", "column", "vector",
         "stream", "value", "data", "small", "join", "filter", "big",
         "group", "hash", "customer", "sort", "order", "slow", "line",
         "part", "fast", "row", "the", "agg", "key", "query", "a",
         "scan", "batch"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def documents(n=50_000, seed=42):
    rng = np.random.default_rng(seed)
    lens = rng.integers(10, 101, size=n)
    texts = []
    for ln in lens:
        idx = rng.integers(0, len(VOCAB), size=ln)
        texts.append(" ".join(VOCAB[i] for i in idx))
    # ~0.2% exact dups (sf0.1 has 8/5000)
    for i in rng.integers(0, n, size=n // 600):
        j = int(rng.integers(0, n))
        texts[j] = texts[int(i)]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": [f"src{i % 20}" for i in range(n)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def embeddings(n=20_000, seed=43):
    rng = np.random.default_rng(seed)
    src = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    v = np.stack(src.embedding.values)
    lab = src.label.values
    means = np.stack([v[lab == c].mean(0) for c in range(10)])
    stds = np.stack([v[lab == c].std(0) for c in range(10)])
    labels = rng.integers(0, 10, size=n)
    out = means[labels] + rng.standard_normal((n, 64)) * stds[labels]
    out = out.astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(out), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })


def lineitem(mult=10, seed=44):
    src = pq.read_table(f"{SRC}/lineitem.parquet")
    rng = np.random.default_rng(seed)
    n = src.num_rows
    parts = []
    for m in range(mult):
        idx = rng.permutation(n)
        t = src.take(idx)
        ok = pa.array(np.asarray(t["l_orderkey"]) + m * 10_000_000,
                      pa.int64())
        t = t.set_column(t.schema.get_field_index("l_orderkey"),
                         "l_orderkey", ok)
        parts.append(t)
    return pa.concat_tables(parts)


def events(mult=10):
    src = pq.read_table(f"{SRC}/events.parquet")
    n = src.num_rows
    parts = []
    for m in range(mult):
        t = src
        eid = pa.array(np.asarray(t["event_id"]) + m * 10_000_000,
                       pa.int64())
        uid = pa.array(np.asarray(t["user_id"]) + m * 1_000_000,
                       pa.int64())
        t = t.set_column(t.schema.get_field_index("event_id"),
                         "event_id", eid)
        t = t.set_column(t.schema.get_field_index("user_id"),
                         "user_id", uid)
        parts.append(t)
    return pa.concat_tables(parts)


def orders(mult=10):
    # orderkey offsets MATCH lineitem's replicas so join queries see
    # driver-scale join cardinalities
    src = pq.read_table(f"{SRC}/orders.parquet")
    parts = []
    for m in range(mult):
        t = src
        ok = pa.array(np.asarray(t["o_orderkey"]) + m * 10_000_000,
                      pa.int64())
        t = t.set_column(t.schema.get_field_index("o_orderkey"),
                         "o_orderkey", ok)
        parts.append(t)
    return pa.concat_tables(parts)


def main():
    os.makedirs(OUT, exist_ok=True)
    jobs = {"documents": documents, "embeddings": embeddings,
            "lineitem": lineitem, "events": events, "orders": orders}
    for name, fn in jobs.items():
        path = f"{OUT}/{name}.parquet"
        if os.path.exists(path):
            print("skip", path)
            continue
        pq.write_table(fn(), path)
        print("wrote", path)
    # small tables: reuse sf0.1 unchanged
    import shutil
    for name in ["customer", "nation", "part", "region", "supplier"]:
        path = f"{OUT}/{name}.parquet"
        if not os.path.exists(path):
            shutil.copy(f"{SRC}/{name}.parquet", path)
            print("copied", path)


if __name__ == "__main__":
    main()
