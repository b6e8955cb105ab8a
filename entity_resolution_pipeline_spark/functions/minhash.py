"""MinHash / LSH-band / SimHash sketch kernels (numpy-vectorized).

Used by the blocking stage (LSH over shingled extracted text replaces the
reference's Weaviate ANN serving, /root/reference/src/batch_querying.py:598-687)
and by the near-duplicate detection operators.

Determinism: shingle hashing uses zlib.crc32 (C-speed, process-independent);
permutations are affine maps ``(a*x + b) mod p`` with coefficients drawn once
from ``numpy.random.default_rng(seed)``.
"""

from __future__ import annotations

import zlib

import numpy as np

_MERSENNE_P = (1 << 61) - 1
_MAX32 = (1 << 32) - 1


def shingles(text: str, k: int = 5, mode: str = "char") -> list[str]:
    """k-shingles of normalized-ish text (char n-grams or token n-grams)."""
    if not text:
        return []
    if mode == "char":
        s = " ".join(text.lower().split())
        if len(s) <= k:
            return [s] if s else []
        return [s[i : i + k] for i in range(len(s) - k + 1)]
    tokens = text.lower().split()
    if len(tokens) <= k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def shingle_hashes(text: str, k: int = 5, mode: str = "char") -> np.ndarray:
    """Distinct 32-bit crc hashes of the shingle set, as uint64."""
    sh = shingles(text, k=k, mode=mode)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    h = np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in sh), dtype=np.uint64, count=len(sh)
    )
    return np.unique(h)


class MinHasher:
    """num_perm affine-permutation MinHash over crc32 shingle hashes."""

    def __init__(self, num_perm: int = 128, seed: int = 42, k: int = 5, mode: str = "char"):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.k = k
        self.mode = mode
        # a < 2^29 and x < 2^32 keep a*x + b < 2^62: uint64-safe, no bigints.
        self.a = rng.integers(1, 1 << 29, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE_P, size=num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        """(num_perm,) uint64 signature; all-max for empty text."""
        hashes = shingle_hashes(text, k=self.k, mode=self.mode)
        if hashes.size == 0:
            return np.full(self.num_perm, _MAX32, dtype=np.uint64)
        # (num_perm, n_shingles) affine permutation, fully uint64-vectorized.
        ax = (self.a[:, None] * hashes[None, :] + self.b[:, None]) % np.uint64(_MERSENNE_P)
        vals = ax & np.uint64(_MAX32)
        return vals.min(axis=1)

    def signatures(self, texts) -> np.ndarray:
        """(len(texts), num_perm) uint64 signatures."""
        out = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            out[i] = self.signature(t)
        return out


def band_hashes(signature: np.ndarray, bands: int) -> list[int]:
    """Split a signature into ``bands`` equal bands; crc32 each band's bytes.

    Docs sharing any band hash land in the same LSH bucket (candidate pair).
    Returned values are band-scoped: ``band_index * 2^32 + crc`` so different
    bands never collide into one bucket.
    """
    rows = len(signature) // bands
    out = []
    for b in range(bands):
        chunk = signature[b * rows : (b + 1) * rows]
        crc = zlib.crc32(chunk.astype("<u8").tobytes())
        out.append((b << 32) | crc)
    return out


def minhash_jaccard(sig1: np.ndarray, sig2: np.ndarray) -> float:
    """Jaccard estimate from two signatures."""
    if sig1.size == 0 or sig1.size != sig2.size:
        return 0.0
    return float(np.mean(sig1 == sig2))


def exact_jaccard(text1: str, text2: str, k: int = 5, mode: str = "char") -> float:
    a = set(shingles(text1, k=k, mode=mode))
    b = set(shingles(text2, k=k, mode=mode))
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (crc32-pair token hashing)."""
    tokens = text.lower().split() if text else []
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        data = tok.encode("utf-8")
        h = (zlib.crc32(data) << 32) | zlib.crc32(data + b"#2")
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
