"""Minimal pure-Python PNG codec (stdlib zlib only) — the 'purepng'
multimodal decode backend.

Exists so at least one REAL (bit-exact, spec-conformant) image decode path
executes in environments without PIL/imageio — the Spark-side multimodal
plumbing (operators/multimodal.py) auto-upgrades PIL > purepng > fake, and
the purepng branch is exercised by the test suite in this container.

Scope: non-interlaced, 8-bit-per-channel PNGs of color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA); all five scanline filters (None, Sub,
Up, Average, Paeth) per the PNG spec §9. Palette (3) and 16-bit images
raise ValueError — callers fall back to the deterministic fake kernel for
that row, identical to how a PIL decode error is handled.

This is a correctness backend, not a throughput kernel: unfiltering is a
per-scanline numpy pass with a per-pixel loop only where the spec forces a
left-to-right data dependency (Sub/Average/Paeth). Real fleets get PIL.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (h, w, channels)."""
    if not data or data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, w, h, bit_depth, color_type, interlace = 8, 0, 0, 0, 0, 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc (crc unchecked)
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if w == 0 or h == 0:
        raise ValueError("missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={bit_depth} color={color_type} "
            f"interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG data")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = (line.astype(np.int32) + prev) % 256
            cur = cur.astype(np.uint8)
        else:
            cur = line.astype(np.int32).copy()
            pr = prev.astype(np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0  # left (already recon)
                b = pr[i]                          # up
                c = pr[i - ch] if i >= ch else 0   # upper-left
                if ftype == 1:  # Sub
                    cur[i] = (cur[i] + a) % 256
                elif ftype == 3:  # Average
                    cur[i] = (cur[i] + (a + b) // 2) % 256
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pred) % 256
                else:
                    raise ValueError(f"bad filter {ftype}")
            cur = cur.astype(np.uint8)
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """(h, w, ch) uint8 -> (h, w) uint8 luma, PIL convert('L') parity:
    ITU-R 601-2  L = (R*299 + G*587 + B*114) / 1000, truncated — alpha
    ignored, gray passthrough."""
    ch = img.shape[2]
    if ch in (1, 2):
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resample (PIL Image.resize(..., NEAREST) parity:
    src index = floor((dst + 0.5) * src/dst))."""
    sh, sw = img.shape[0], img.shape[1]
    ys = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(np.int64), sh - 1)
    xs = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(np.int64), sw - 1)
    return img[ys][:, xs]


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, ch) -> PNG bytes (filter 0, one IDAT)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(img[y].tobytes())

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )
