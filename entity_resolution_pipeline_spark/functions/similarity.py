"""String and vector similarity kernels.

Reproduces the reference's exact feature semantics
(/root/reference/src/parallel_features.py:1150-1300):

- ``levenshtein_sim``: ``1 - dist/max_len`` (1.0 when both empty).
- ``token_sort_ratio``: the reference calls this feature "jaro_winkler" but it
  is actually ``rapidfuzz.fuzz.token_sort_ratio(s1, s2) / 100`` — whitespace
  tokens sorted, joined with a single space, then the normalized indel
  similarity ``(len1+len2-dist_indel)/(len1+len2)``. rapidfuzz is unavailable
  here, so the indel distance is computed from an LCS DP (indel = m+n-2*LCS).
- "cosine" features are *string-estimated*: 1.0 on identical hash, else
  levenshtein_sim for person, token_sort_ratio for other fields.
- interaction features: harmonic mean, product, ratio capped at 10.0.

All kernels are pure Python over str; callers batch them inside Arrow pandas
UDFs (the vectorization boundary is the Arrow batch, per input_hint).
"""

from __future__ import annotations

import numpy as np


def _match_masks(s: str) -> dict[str, int]:
    """char -> bitmask of its positions in s (bit i = s[i])."""
    masks: dict[str, int] = {}
    bit = 1
    for c in s:
        masks[c] = masks.get(c, 0) | bit
        bit <<= 1
    return masks


def levenshtein_distance_dp(s1: str, s2: str) -> int:
    """Classic two-row DP — reference implementation for tests."""
    if s1 == s2:
        return 0
    m, n = len(s1), len(s2)
    if m == 0:
        return n
    if n == 0:
        return m
    if m < n:  # iterate over the shorter string's columns
        s1, s2, m, n = s2, s1, n, m
    prev = list(range(n + 1))
    cur = [0] * (n + 1)
    for i in range(1, m + 1):
        cur[0] = i
        c1 = s1[i - 1]
        for j in range(1, n + 1):
            cost = 0 if c1 == s2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return prev[n]


def levenshtein_distance(s1: str, s2: str) -> int:
    """Myers bit-parallel Levenshtein (1999): O(n) bigint steps.

    Python's unbounded ints act as the bit-vector, so any pattern length
    works in one "word". ~100x faster than the DP for typical field strings.
    """
    if s1 == s2:
        return 0
    m, n = len(s1), len(s2)
    if m == 0:
        return n
    if n == 0:
        return m
    if m > n:  # pattern = shorter string
        s1, s2, m, n = s2, s1, n, m

    peq = _match_masks(s1)
    mask = (1 << m) - 1
    high = 1 << (m - 1)
    pv = mask
    mv = 0
    score = m
    for c in s2:
        eq = peq.get(c, 0)
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | (~(xh | pv) & mask)
        mh = pv & xh
        if ph & high:
            score += 1
        if mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & mask
        mh = (mh << 1) & mask
        pv = mh | (~(xv | ph) & mask)
        mv = ph & xv
    return score


def levenshtein_sim(s1: str, s2: str) -> float:
    """1 - dist/max_len; 1.0 when both strings are empty."""
    max_len = max(len(s1), len(s2))
    if max_len == 0:
        return 1.0
    return 1.0 - levenshtein_distance(s1, s2) / max_len


def _lcs_len_dp(s1: str, s2: str) -> int:
    """LCS length, two-row DP — reference implementation for tests."""
    m, n = len(s1), len(s2)
    if m == 0 or n == 0:
        return 0
    if m < n:
        s1, s2, m, n = s2, s1, n, m
    prev = [0] * (n + 1)
    for i in range(1, m + 1):
        cur = [0] * (n + 1)
        c1 = s1[i - 1]
        for j in range(1, n + 1):
            if c1 == s2[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    return prev[n]


def _lcs_len(s1: str, s2: str, mask_cache: dict | None = None) -> int:
    """Allison-Dix bit-parallel LCS length: O(n) bigint steps.

    ``mask_cache`` (str -> char-mask dict) amortizes the per-pattern mask
    build across repeated strings — callers that score many pairs sharing
    strings (the ER scoring kernel) pass a per-partition dict.
    """
    m, n = len(s1), len(s2)
    if m == 0 or n == 0:
        return 0
    if m > n:  # pattern = shorter string
        s1, s2, m, n = s2, s1, n, m
    if mask_cache is None:
        masks = _match_masks(s1)
    else:
        masks = mask_cache.get(s1)
        if masks is None:
            masks = _match_masks(s1)
            mask_cache[s1] = masks
    mask = (1 << m) - 1
    row = 0
    for c in s2:
        x = row | masks.get(c, 0)
        row = x & ~((x - (((row << 1) | 1) & mask)) & mask) & mask
    return bin(row).count("1")


def indel_ratio(s1: str, s2: str, mask_cache: dict | None = None) -> float:
    """Normalized indel similarity in [0, 1] (rapidfuzz fuzz.ratio semantics).

    indel_distance = len1 + len2 - 2*LCS; ratio = 1 - dist/(len1+len2).
    """
    lensum = len(s1) + len(s2)
    if lensum == 0:
        return 1.0
    dist = lensum - 2 * _lcs_len(s1, s2, mask_cache=mask_cache)
    return 1.0 - dist / lensum


def token_sort_ratio(s1: str, s2: str) -> float:
    """rapidfuzz ``fuzz.token_sort_ratio / 100`` semantics, in [0, 1]."""
    t1 = " ".join(sorted(s1.split()))
    t2 = " ".join(sorted(s2.split()))
    return indel_ratio(t1, t2)


def harmonic_mean(a: float, b: float) -> float:
    """2ab/(a+b) when both positive, else 0 (parallel_features.py:1258-1264)."""
    if a > 0 and b > 0:
        return 2.0 * a * b / (a + b)
    return 0.0


def ratio_capped(a: float, b: float, cap: float = 10.0) -> float:
    """a/b when b>0 else 0, capped (parallel_features.py:1284-1300)."""
    if b > 0:
        return min(a / b, cap)
    return 0.0


def cosine_matrix(queries: np.ndarray, corpus: np.ndarray) -> np.ndarray:
    """Batched cosine similarity: (q, d) x (n, d) -> (q, n), zero-norm -> 0."""
    qn = np.linalg.norm(queries, axis=1, keepdims=True)
    cn = np.linalg.norm(corpus, axis=1, keepdims=True)
    qn[qn == 0] = np.inf
    cn[cn == 0] = np.inf
    return (queries / qn) @ (corpus / cn).T
