"""Generate a larger sf directory that mirrors the driver's testdata shape.

The driver's round-end measurement runs bench.py at a driver-generated
scale factor (sf1.0 in BENCH_r05: documents x10, lineitem ~6M). That
directory is not present in this sandbox, so for optimization work we
synthesize one with the same table shapes and statistics as
/root/testdata/sf0.1 scaled by --factor:

- documents: regenerated from the observed 31-word vocabulary with the
  observed length/lang/source distributions and the observed exact-dup
  rate (copying rows 10x would fabricate cross-copy near-dup structure
  the driver's data does not have).
- embeddings: sampled from the observed per-label vectors + small noise
  (preserves cluster geometry for the IVF/PQ families).
- lineitem/orders/customer/part/supplier/events: replicated with
  consistent key offsets; nation/region copied.

Usage: python tools/make_sf.py --factor 10 --out /root/sfdata/sf1.0
Timing-only data: correctness stays on the driver's sf0.01.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANG_WEIGHTS = {"en": 2059, "zh": 753, "es": 744, "fr": 742, "de": 702}


def gen_documents(n: int, seed: int) -> pa.Table:
    rng = random.Random(seed)
    langs = list(LANG_WEIGHTS)
    weights = list(LANG_WEIGHTS.values())
    texts, lang_col, src_col = [], [], []
    for i in range(n):
        k = rng.randint(10, 100)
        texts.append(" ".join(rng.choices(VOCAB, k=k)))
        lang_col.append(rng.choices(langs, weights=weights)[0])
        src_col.append(f"src{i % 20}")
    # plant exact dups at the observed rate (16/5000 docs in dup pairs)
    n_pairs = max(1, (n * 16) // 5000 // 2)
    for _ in range(n_pairs):
        a, b = rng.randrange(n), rng.randrange(n)
        texts[b] = texts[a]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
            "source": pa.array(src_col, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, seed: int) -> pa.Table:
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    emb = np.array(src.column("embedding").to_pylist())
    lab = np.array(src.column("label").to_pylist())
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(emb), n)
    noise = rng.normal(0.0, 0.03, (n, emb.shape[1]))
    out = emb[idx] + noise
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(out.tolist(), pa.list_(pa.float64())),
            "label": pa.array(lab[idx].tolist(), pa.int64()),
        }
    )


def replicate(name: str, factor: int, key_cols: dict[str, int]) -> pa.Table:
    """Concatenate ``factor`` copies with per-copy key offsets."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    chunks = []
    for i in range(factor):
        cols = {}
        for c in t.column_names:
            col = t.column(c)
            if c in key_cols and i > 0:
                off = key_cols[c] * i
                cols[c] = pa.compute.add(col, off)
            else:
                cols[c] = col
        chunks.append(pa.table(cols))
    return pa.concat_tables(chunks)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/root/sfdata/sf1.0")
    ap.add_argument("--seed", type=int, default=4242)
    args = ap.parse_args()
    f = args.factor
    os.makedirs(args.out, exist_ok=True)

    def w(name: str, table: pa.Table) -> None:
        pq.write_table(table, f"{args.out}/{name}.parquet")
        print(name, table.num_rows)

    w("documents", gen_documents(5000 * f, args.seed))
    w("embeddings", gen_embeddings(2000 * f, args.seed + 1))
    # TPC-H-ish tables: offsets keep FK relationships intact per copy
    w("customer", replicate("customer", f, {"c_custkey": 15000}))
    w("supplier", replicate("supplier", f, {"s_suppkey": 1000}))
    w("part", replicate("part", f, {"p_partkey": 20000}))
    w("orders", replicate("orders", f, {"o_orderkey": 600000, "o_custkey": 15000}))
    w(
        "lineitem",
        replicate(
            "lineitem",
            f,
            {"l_orderkey": 600000, "l_partkey": 20000, "l_suppkey": 1000},
        ),
    )
    w("events", replicate("events", f, {"event_id": 100000, "user_id": 100000}))
    for name in ("nation", "region"):
        w(name, pq.read_table(f"{SRC}/{name}.parquet"))


if __name__ == "__main__":
    main()
