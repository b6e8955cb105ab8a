"""Text-analysis operators over a documents table (doc_id, text, lang, ...).

Training-data-pipeline utilities that run alongside the ER DAG: token
counting, quality scoring, language-ID, and document fingerprinting. All the
ratio/count operators are pure JVM column expressions (whole-stage codegen,
DuckDB-oracle-checkable); only the BPE-ish tokenizer and the rolling-hash
fingerprint drop into Arrow passes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .util import ensure_parallelism
from ..functions.text import STOPWORDS, fingerprint, tokenize_bpeish

_NORM = lambda c: F.trim(F.regexp_replace(c, r"\s+", " "))  # noqa: E731


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token counts — JVM-side split on normalized text."""
    norm = _NORM(F.col(text_col))
    return docs.select(
        "doc_id",
        F.when(norm == "", 0)
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_tokens_ws"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


def quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / english-stopword / word-length signals."""
    norm = _NORM(F.col(text_col))
    n_chars = F.length(norm)
    tokens = F.when(norm == "", F.array().cast("array<string>")).otherwise(F.split(norm, " "))
    n_tokens = F.size(tokens)
    n_punct = n_chars - F.length(F.regexp_replace(norm, r"[^\w\s]", ""))
    sw = sorted(STOPWORDS["en"])
    stop_arr = F.array(*[F.lit(w) for w in sw])
    n_stop = F.size(F.filter(F.transform(tokens, lambda t: F.lower(t)), lambda t: F.array_contains(stop_arr, t)))
    sum_word_len = F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0).alias("punct_ratio"),
        F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0).alias("stopword_ratio"),
        F.when(n_tokens > 0, sum_word_len.cast("double") / n_tokens).otherwise(0.0).alias("mean_word_len"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic, JVM-side across 4 languages."""
    norm = F.lower(_NORM(F.col(text_col)))
    tokens = F.when(norm == "", F.array().cast("array<string>")).otherwise(F.split(norm, " "))
    n_tokens = F.size(tokens)
    hits = {}
    for lang, sw in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in sorted(sw)])
        hits[lang] = F.size(F.array_intersect(F.array_distinct(tokens), arr))
    # NOTE: array_intersect counts *distinct* stopword types, not occurrences —
    # cheaper at scale and adequate for the heuristic.
    best = None
    for lang in sorted(hits):
        h = hits[lang]
        if best is None:
            best = F.struct(h.alias("hits"), F.lit(lang).alias("lang"))
        else:
            best = F.when(h > best["hits"], F.struct(h.alias("hits"), F.lit(lang).alias("lang"))).otherwise(best)
    pred = (
        F.when(n_tokens == 0, "und")
        .when(best["hits"].cast("double") / n_tokens < 0.02, "und")
        .otherwise(best["lang"])
    )
    return docs.select("doc_id", pred.alias("lang_pred"))


_BPE_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("n_tokens_bpe", LongType())]
)


def token_counts_bpeish(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish regex token counts (Arrow pass)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens_bpe": [len(tokenize_bpeish(t or "")) for t in pdf[text_col]],
                }
            )

    return ensure_parallelism(docs.select("doc_id", text_col)).mapInPandas(run, schema=_BPE_SCHEMA)


_FP_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("fingerprint", LongType())]
)


def fingerprints(docs: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Rolling-hash (winnowing-min) fingerprints (Arrow pass)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fingerprint": [
                        fingerprint(t or "", window=window) - (1 << 62)
                        for t in pdf[text_col]
                    ],
                }
            )

    return ensure_parallelism(docs.select("doc_id", text_col)).mapInPandas(run, schema=_FP_SCHEMA)
