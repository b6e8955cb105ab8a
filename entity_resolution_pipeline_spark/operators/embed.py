"""Stage "embed" — deterministic text embeddings inside pandas UDFs.

The reference embeds unique strings via the OpenAI API
(/root/reference/src/embedding.py:435-457, 1536-dim). External APIs are out
of scope (SURVEY.md §7.5), so the graft computes *feature-hashing* embeddings
locally: tokens hashed into ``dim`` signed buckets (crc32), L2-normalized.
Deterministic across processes, vectorized per Arrow batch, and good enough
to make cosine similarity track token overlap — which is all the downstream
operators (imputation donors, ANN demo) need.

Embeds only the deduplicated dimension (hash -> value), mirroring the
reference's embed-unique-strings design (README.md:10): at 100 TB the
distinct-string table is orders of magnitude smaller than the record table.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .util import ensure_parallelism
from pyspark.sql.types import ArrayType, FloatType, StringType, StructField, StructType

DEFAULT_DIM = 64


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Signed feature-hashing of lowercase whitespace tokens, L2-normalized."""
    v = np.zeros(dim, dtype=np.float64)
    if text:
        for tok in text.lower().split():
            h = zlib.crc32(tok.encode("utf-8"))
            sign = 1.0 if (h >> 31) & 1 else -1.0
            v[h % dim] += sign
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return v


EMB_SCHEMA = StructType(
    [
        StructField("hash", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def embed_unique_strings(unique_strings: DataFrame, dim: int = DEFAULT_DIM) -> DataFrame:
    """(hash, embedding) over the dedup dimension — one Arrow pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "hash": pdf["hash"],
                    "embedding": [
                        embed_text(v, dim).astype(np.float32).tolist() for v in pdf["value"]
                    ],
                }
            )

    return ensure_parallelism(unique_strings.select("hash", "value")).mapInPandas(run, schema=EMB_SCHEMA)
