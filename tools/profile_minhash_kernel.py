"""Offline profile of the minhash signature kernel on real corpus text.

Reads documents.parquet from the given sf dir (default /root/data/sf1b),
applies the same normalization the operator does, and times the current
per-doc kernel against candidate batched variants. Pure local numpy/python
— no Spark. Measurement tooling only.

Usage: python tools/profile_minhash_kernel.py [sf_dir] [n_docs]
"""

from __future__ import annotations

import cProfile
import hashlib
import pstats
import re
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from entity_resolution_pipeline_spark.operators.dedup import (  # noqa: E402
    _MERSENNE31,
    minhash_perm_coeffs,
)

K = 5
NUM_PERM = 32
MAX_CHARS = 2048
_WS = re.compile(r"\s+")


def load_texts(sf_dir: str, n: int) -> list[str]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    texts = t.column("text").to_pylist()[:n]
    return [_WS.sub(" ", x.strip()).lower()[:MAX_CHARS] for x in texts if x]


def kernel_current(texts, a, b, m):
    md5 = hashlib.md5
    memo = {}
    mget = memo.get
    sigs = []
    for nt in texts:
        sh = {nt} if len(nt) <= K else {nt[i:i + K] for i in range(len(nt) - K + 1)}
        vals = []
        for s in sh:
            v = mget(s)
            if v is None:
                v = int.from_bytes(md5(s.encode("utf-8")).digest()[:4], "big") >> 4
                memo[s] = v
            vals.append(v)
        h = np.asarray(vals, dtype=np.uint64)[None, :]
        sigs.append(((a * h + b) % m).min(axis=1).astype(np.int64))
    return sigs


def kernel_batched(texts, a, b, m, chunk_target=200_000):
    """Same shingle/memo path; permutations + min batched with reduceat."""
    md5 = hashlib.md5
    memo = {}
    mget = memo.get
    doc_vals = []
    for nt in texts:
        sh = {nt} if len(nt) <= K else {nt[i:i + K] for i in range(len(nt) - K + 1)}
        vals = []
        for s in sh:
            v = mget(s)
            if v is None:
                v = int.from_bytes(md5(s.encode("utf-8")).digest()[:4], "big") >> 4
                memo[s] = v
            vals.append(v)
        doc_vals.append(vals)
    sigs = [None] * len(doc_vals)
    i = 0
    while i < len(doc_vals):
        j = i
        tot = 0
        lens = []
        while j < len(doc_vals) and tot < chunk_target:
            lens.append(len(doc_vals[j]))
            tot += lens[-1]
            j += 1
        flat = np.fromiter(
            (v for d in doc_vals[i:j] for v in d), dtype=np.uint64, count=tot
        )
        p = (a * flat[None, :] + b) % m  # (32, tot)
        bounds = np.concatenate(([0], np.cumsum(lens)[:-1]))
        mins = np.minimum.reduceat(p, bounds, axis=1).astype(np.int64)  # (32, ndocs)
        for d in range(j - i):
            sigs[i + d] = mins[:, d]
        i = j
    return sigs


def kernel_sigmemo(texts, a, b, m, memo_cap=500_000):
    """Memoize the full 32-vector per distinct shingle; per-doc min-reduce."""
    md5 = hashlib.md5
    memo = {}
    mget = memo.get
    sigs = []
    for nt in texts:
        sh = {nt} if len(nt) <= K else {nt[i:i + K] for i in range(len(nt) - K + 1)}
        acc = None
        rows = []
        for s in sh:
            v = mget(s)
            if v is None:
                h = int.from_bytes(md5(s.encode("utf-8")).digest()[:4], "big") >> 4
                v = (a[:, 0] * np.uint64(h) + b[:, 0]) % m
                memo[s] = v
            rows.append(v)
        acc = np.minimum.reduce(rows) if len(rows) > 1 else rows[0]
        sigs.append(acc.astype(np.int64))
    return sigs


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/data/sf1b"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    texts = load_texts(sf, n)
    print(f"{len(texts)} docs, mean len {sum(map(len, texts)) / len(texts):.0f}")
    a_l, b_l = minhash_perm_coeffs(NUM_PERM)
    a = np.asarray(a_l, dtype=np.uint64)[:, None]
    b = np.asarray(b_l, dtype=np.uint64)[:, None]
    m = np.uint64(_MERSENNE31)

    results = {}
    for name, fn in [
        ("current", kernel_current),
        ("batched", kernel_batched),
        ("sigmemo", kernel_sigmemo),
    ]:
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sigs = fn(texts, a, b, m)
            best = min(best, time.perf_counter() - t0)
        results[name] = (best, sigs)
        print(f"{name}: {best:.3f}s")

    base = results["current"][1]
    for name in ("batched", "sigmemo"):
        other = results[name][1]
        same = all(np.array_equal(x, y) for x, y in zip(base, other))
        print(f"{name} value-identical: {same}")

    print("\n--- cProfile of current kernel ---")
    pr = cProfile.Profile()
    pr.enable()
    kernel_current(texts, a, b, m)
    pr.disable()
    pstats.Stats(pr).sort_stats("cumulative").print_stats(12)


if __name__ == "__main__":
    main()
