"""Deterministic local amplifier for perf measurement at ~sf1.0 scale.

The driver's sf1.0 directory (used for round-5/6 measurement) is generated
fresh by the driver and is not present in this sandbox. For before/after
perf work we need tables of the same magnitude; this script builds a
~10x-of-sf0.1 dataset mimicking the driver generator's observed shape:

- keyed tables are replicated K times with FK-consistent key shifts and
  categorical columns untouched (so self-join fan-out grows quadratically,
  matching the observed sf0.01 -> sf0.1 -> sf1.0 pair counts);
- documents are freshly sampled from the observed 31-word vocabulary with
  the observed length/lang mix and a ~0.2% exact-duplicate rate;
- embeddings are fresh seeded unit vectors (64-dim, labels 0..9);
- files are written with pyarrow's default ~1Mi-row row groups, matching
  the driver generator's layout (its sf0.1 files are single-group only
  because every table there is under 1Mi rows; at sf1.0 lineitem spans
  multiple groups and scans in parallel).

This is measurement tooling only: nothing in the engine or bench reads it
unless SPARK_GRAFT_SF_DIR points at the output. Results on this data are
used for relative A/B only; correctness stays pinned to the driver's
read-only sf0.001/sf0.01/sf0.1 oracles.

Usage: python tools/gen_sf.py [K] [outdir]   (defaults: 10 /root/data/sf1x)
"""

from __future__ import annotations

import os
import sys

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
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _write(tbl: pa.Table, out: str) -> None:
    pq.write_table(tbl, out)  # default row groups, like the driver generator


def _shift(col: pa.ChunkedArray, stride: int, k: int) -> pa.Array:
    a = col.combine_chunks()
    return pa.compute.add(a, stride * k)


def replicate(name: str, shifts: dict, K: int, outdir: str) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for k in range(K):
        cols = []
        for c in t.column_names:
            if c in shifts:
                cols.append(_shift(t.column(c), shifts[c], k))
            else:
                cols.append(t.column(c).combine_chunks())
        parts.append(pa.table(dict(zip(t.column_names, cols))))
    _write(pa.concat_tables(parts).combine_chunks(), f"{outdir}/{name}.parquet")
    print(name, t.num_rows, "->", t.num_rows * K)


def gen_documents(K: int, outdir: str) -> None:
    rng = np.random.default_rng(4242)
    n = 5000 * K
    lens = rng.integers(10, 101, size=n)
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    texts = []
    vocab = np.array(VOCAB)
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), size=lens[i])]
        texts.append(" ".join(words.tolist()))
    # ~0.2% exact duplicates of an earlier doc, like the source data
    for j in rng.choice(np.arange(1, n), size=max(1, n // 500), replace=False):
        texts[j] = texts[int(rng.integers(0, j))]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([LANGS[i] for i in langs], pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    _write(tbl, f"{outdir}/documents.parquet")
    print("documents 5000 ->", n)


def gen_embeddings(K: int, outdir: str) -> None:
    rng = np.random.default_rng(2424)
    n = 2000 * K
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })
    _write(tbl, f"{outdir}/embeddings.parquet")
    print("embeddings 2000 ->", n)


def main() -> None:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/data/sf1x"
    os.makedirs(outdir, exist_ok=True)
    for name in ("region", "nation"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        _write(t, f"{outdir}/{name}.parquet")
    replicate("customer", {"c_custkey": 15000}, K, outdir)
    replicate("supplier", {"s_suppkey": 1000}, K, outdir)
    replicate("part", {"p_partkey": 20000}, K, outdir)
    replicate("orders", {"o_orderkey": 150000, "o_custkey": 15000}, K, outdir)
    replicate(
        "lineitem",
        {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
        K, outdir,
    )
    replicate("events", {"event_id": 100000, "user_id": 1500}, K, outdir)
    gen_documents(K, outdir)
    gen_embeddings(K, outdir)
    open(f"{outdir}/_DONE", "w").close()
    print("done ->", outdir)


if __name__ == "__main__":
    main()
