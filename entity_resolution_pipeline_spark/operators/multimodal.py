"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as ``binary``
columns with typed metadata structs. The decode/resize/frame-sample kernels
need codec libraries that are NOT in this container, so the *kernels* are
stubbed (deterministic fake or NotImplementedError), while the Spark-side
plumbing — schema, Arrow batch shape, partition sizing — is real and tested:

- ``media_metadata``: sniff magic bytes + sizes (real, pure Python over
  Arrow batches).
- ``decode_image_features``: mapInPandas with the production signature
  (binary in, fixed-width float feature vector out); the decoder itself is a
  deterministic fake (byte histogram) behind ``use_fake_decoder=True``, and
  raises NotImplementedError otherwise so a real codec drop-in is one
  function swap.
- ``resize_images``: binary -> fixed-size binary + dims (the resize kernel
  is a deterministic byte subsample/pad fake at the same single swap point).
- ``sample_video_frames``: binary -> one row PER SAMPLED FRAME (the 1->N
  Arrow batch shape a real ffmpeg frame sampler produces; fake frames are
  deterministic equal-stride payload slices).

Pattern note: keep binary columns OUT of shuffles — derive features early,
write them to their own table, and join by id. ``html`` in the ER pipeline
follows the same rule (never read past preprocessing).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"<html", "text/html"),
    (b"<!DOC", "text/html"),
]

META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def sniff_mime(data: bytes | None) -> str:
    if not data:
        return "application/octet-stream"
    head = data[:16]
    for magic, mime in _MAGIC:
        if head[: len(magic)].lower() == magic.lower():
            return mime
    return "application/octet-stream"


def media_metadata(df: DataFrame, id_col: str = "id", bin_col: str = "payload") -> DataFrame:
    """(id, mime, n_bytes) — magic-byte sniffing, one Arrow pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "mime": [sniff_mime(b) for b in payloads],
                    "n_bytes": [len(b) if b is not None else 0 for b in payloads],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=META_SCHEMA)


IMAGE_FEATURE_DIM = 16

IMG_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_image_features(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """binary -> fixed-width feature vector (production UDF signature).

    STUB: no image codec is available in this container. With
    ``use_fake_decoder`` the "decode" is a deterministic 16-bin byte
    histogram (stable across processes); otherwise NotImplementedError —
    swap in a real decoder (PIL/libvips) at that single point.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ws, hs = [], [], []
            for b in pdf[bin_col]:
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "real image decoding requires a codec library not present "
                        "in this environment; pass use_fake_decoder=True"
                    )
                if b is None or len(b) == 0:
                    feats.append([0.0] * IMAGE_FEATURE_DIM)
                    ws.append(0)
                    hs.append(0)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=IMAGE_FEATURE_DIM, range=(0, 256))
                feats.append((hist / max(len(arr), 1)).astype(np.float32).tolist())
                # fake dimensions derived from payload size (deterministic)
                ws.append(int(len(arr) % 1024))
                hs.append(int((len(arr) // 1024) % 1024))
            yield pd.DataFrame(
                {"id": pdf[id_col], "features": feats, "width": ws, "height": hs}
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=IMG_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("payload_resized", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    id_col: str = "id",
    bin_col: str = "payload",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """binary -> fixed-size binary + dims (production resize signature).

    STUB kernel at the same single swap point as decode_image_features: the
    fake "resize" strides/pads the byte stream to exactly target_w*target_h
    bytes (deterministic, size-exact — the property the downstream fixed-
    shape consumers rely on); a real implementation decodes + resamples.
    """
    out_len = target_w * target_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for b in pdf[bin_col]:
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "real image resizing requires a codec library not present "
                        "in this environment; pass use_fake_decoder=True"
                    )
                if b is None or len(b) == 0:
                    payloads.append(bytes(out_len))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                idx = (np.arange(out_len) * len(arr) // out_len) % len(arr)
                payloads.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "payload_resized": payloads,
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "id",
    bin_col: str = "payload",
    use_fake_decoder: bool = True,
) -> DataFrame:
    """binary video -> one row per sampled frame (1 -> N batch shape).

    The production shape an ffmpeg-backed sampler produces: each input row
    explodes into up to ``n_frames`` output rows inside the Arrow pass (no
    JVM-side explode of big binaries). STUB kernel: fake frames are the
    payload cut into equal strides (deterministic boundaries); empty/NULL
    payloads produce zero rows — exactly how a corrupt video behaves.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "real frame sampling requires ffmpeg, not present in "
                        "this environment; pass use_fake_decoder=True"
                    )
                if b is None or len(b) == 0:
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                k = min(n_frames, len(arr))
                bounds = [len(arr) * i // k for i in range(k + 1)]
                for i in range(k):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(arr[bounds[i]:bounds[i + 1]].tobytes())
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, bin_col).mapInPandas(run, schema=FRAMES_SCHEMA)
