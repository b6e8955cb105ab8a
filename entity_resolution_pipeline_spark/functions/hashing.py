"""MurmurHash3 x64 128-bit, pure Python.

The reference keys every deduplicated string by
``str(mmh3.hash128(normalized, seed=42))`` (see
/root/reference/src/batch_preprocessing.py:450-474). ``mmh3`` is not
available in this environment, so this module implements the public
MurmurHash3_x64_128 algorithm (Austin Appleby, public domain) bit-compatibly:
``hash128(data, seed)`` returns the unsigned 128-bit integer laid out exactly
as the mmh3 wheel does (low 64 bits = h1, high 64 bits = h2).

``hash_string`` reproduces the reference's full key derivation:
strip -> lower -> collapse whitespace -> strip -> decimal-string of hash128.
"""

from __future__ import annotations

import re

_MASK64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F

_WS_RE = re.compile(r"\s+")


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def hash128(data: bytes | str, seed: int = 0) -> int:
    """MurmurHash3_x64_128 as an unsigned 128-bit int (mmh3.hash128 layout)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    length = len(data)
    h1 = seed & _MASK64
    h2 = seed & _MASK64

    nblocks = length // 16
    for i in range(nblocks):
        off = i * 16
        k1 = int.from_bytes(data[off : off + 8], "little")
        k2 = int.from_bytes(data[off + 8 : off + 16], "little")

        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64

        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64

    tail = data[nblocks * 16 :]
    tl = len(tail)
    k1 = 0
    k2 = 0
    if tl >= 9:
        for i in range(tl - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if tl > 0:
        for i in range(min(tl, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1 | (h2 << 64)


def hash64_pair(data: bytes | str, seed: int = 0) -> tuple[int, int]:
    """(h1, h2) as signed 64-bit ints — matches mmh3.hash64."""
    v = hash128(data, seed)
    h1 = v & _MASK64
    h2 = v >> 64

    def _signed(x: int) -> int:
        return x - (1 << 64) if x >= (1 << 63) else x

    return _signed(h1), _signed(h2)


def hash_string(text: object, seed: int = 42) -> str:
    """Reference-compatible dedup key (batch_preprocessing.py:450-474).

    None -> 'NULL'; otherwise strip/lower/collapse-ws/strip then the decimal
    string of hash128(seed=42).
    """
    if text is None:
        return "NULL"
    if not isinstance(text, str):
        text = str(text)
    normalized = text.strip().lower()
    normalized = _WS_RE.sub(" ", normalized)
    normalized = normalized.strip()
    return str(hash128(normalized, seed=seed))
