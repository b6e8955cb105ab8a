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

    # shingles per permutation-buffer chunk. 4096 keeps the reused buffer at
    # num_perm * 4096 * 8 = 2 MB for 64 perms: L2/L3-resident AND allocated
    # exactly once — on this host, FIRST-TOUCH page faults on fresh large
    # numpy temporaries cost ~0.5 ms/page (measured: one 54 MB a*H temporary
    # took 7 s on first touch, 7 ms on reuse), so the kernel must never
    # allocate per-op matrices. All four affine-map ops write into the same
    # preallocated buffer via out=.
    _BATCH_CHUNK = 4096

    def signatures_batch(self, texts) -> np.ndarray:
        """(len(texts), num_perm) — value-identical to :meth:`signature`
        per row (pytest-pinned), one chunked vectorized pass per batch.

        Shingle hashes are concatenated with per-doc offsets; docs are
        packed into ~_BATCH_CHUNK-shingle chunks and each chunk runs the
        affine permutations in ONE reused buffer (np.multiply/add/
        remainder/bitwise_and with out=), with per-doc minima via
        ``np.minimum.reduceat``. Duplicate shingle hashes are NOT deduped
        (min is idempotent under duplicates; skipping np.unique is
        cheaper). A single doc longer than a chunk streams through the
        same buffer with a running minimum. Empty texts get the all-max
        sentinel, as in signature().
        """
        n = len(texts)
        out = np.full((n, self.num_perm), _MAX32, dtype=np.uint64)
        crc = zlib.crc32
        hash_chunks: list[np.ndarray] = []
        doc_lens: list[int] = []
        doc_idx: list[int] = []
        for i, t in enumerate(texts):
            sh = shingles(t, k=self.k, mode=self.mode)
            if not sh:
                continue
            hs = np.fromiter(
                (crc(s.encode("utf-8")) for s in sh), dtype=np.uint64, count=len(sh)
            )
            hash_chunks.append(hs)
            doc_lens.append(len(sh))
            doc_idx.append(i)
        if not hash_chunks:
            return out
        H = np.concatenate(hash_chunks)
        lens = np.asarray(doc_lens, dtype=np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        rows = np.asarray(doc_idx, dtype=np.int64)
        p = np.uint64(_MERSENNE_P)
        mask = np.uint64(_MAX32)
        ch = self._BATCH_CHUNK
        a_col = self.a[:, None]
        b_col = self.b[:, None]
        buf = np.empty((self.num_perm, ch), dtype=np.uint64)

        def perm_into(seg: np.ndarray) -> np.ndarray:
            # a < 2^29, h < 2^32, b < 2^61 -> a*h + b < 2^62: exact in uint64
            # (a Mersenne shift-add fold was measured SLOWER than the
            # hardware remainder here — the extra strided passes cost more
            # than the division saves)
            v = buf[:, : len(seg)]
            np.multiply(a_col, seg[None, :], out=v)
            np.add(v, b_col, out=v)
            np.remainder(v, p, out=v)
            np.bitwise_and(v, mask, out=v)
            return v

        n_docs = len(rows)
        i = 0
        while i < n_docs:
            if lens[i] > ch:
                # megadoc: stream through the buffer with a running min
                mins = np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
                for s0 in range(starts[i], ends[i], ch):
                    v = perm_into(H[s0:min(s0 + ch, ends[i])])
                    np.minimum(mins, v.min(axis=1), out=mins)
                out[rows[i]] = mins
                i += 1
                continue
            # pack as many whole docs as fit into one chunk
            j = i + 1
            span = lens[i]
            while j < n_docs and span + lens[j] <= ch:
                span += lens[j]
                j += 1
            v = perm_into(H[starts[i]:starts[i] + span])
            seg_starts = (starts[i:j] - starts[i]).astype(np.intp)
            out[rows[i:j]] = np.minimum.reduceat(v, seg_starts, axis=1).T
            i = j
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
