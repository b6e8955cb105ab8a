"""Deduplication operators over a documents table.

Training-data-pipeline near-duplicate detection, each as a Spark-first plan:

- exact_dedup        : hash-groupBy on normalized text (one shuffle).
- ngram_jaccard_dedup: candidate pairs by shared rare token, verified with
                       word-set Jaccard — pure JVM (array_intersect/union).
- minhash_lsh_dedup  : shingle -> MinHash -> band-bucket equi-join -> verify
                       with signature similarity (Arrow passes for sketches,
                       JVM joins for candidates).
- simhash_dedup      : 64-bit SimHash; candidates via 4x16-bit band equality
                       (Hamming<=3 guaranteed caught by pigeonhole), verified
                       by exact Hamming distance.
- embedding_cosine_dedup: near-dup pairs among embedding vectors (see ann.py
                       for the top-k variant).

Every operator returns pairs with doc_id1 < doc_id2 (canonical orientation,
halves the shuffle) or a keep/drop assignment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from .util import ensure_parallelism
from ..functions.minhash import MinHasher, band_hashes, simhash64

_NORM = lambda c: F.trim(F.regexp_replace(c, r"\s+", " "))  # noqa: E731


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, keep_id, group_size): exact duplicates by normalized text.

    keep_id = min doc_id of the group. One hash-shuffle; at 100 TB hash the
    text first (xxhash64) so the shuffle key is 8 bytes, not the document.
    """
    keyed = docs.select("doc_id", F.xxhash64(_NORM(F.col(text_col))).alias("tkey"))
    groups = keyed.groupBy("tkey").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("group_size")
    )
    return keyed.join(groups, "tkey").select("doc_id", "keep_id", "group_size")


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.8,
    block_token_pos: int = 0,
) -> DataFrame:
    """Word-set Jaccard near-dup pairs, blocked on one anchor token.

    Blocking key = first token of the normalized text (cheap demo key; the
    LSH operator below is the principled scale path). Verification is pure
    JVM: |intersect| / |union| over distinct word arrays.
    """
    norm = F.lower(_NORM(F.col(text_col)))
    toks = F.array_distinct(F.split(norm, " "))
    d = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.element_at(F.split(norm, " "), block_token_pos + 1).alias("bkey"),
    ).where(F.col("bkey").isNotNull() & (F.col("bkey") != ""))
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    return (
        a.join(b, F.col("a.bkey") == F.col("b.bkey"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id1"),
            F.col("b.doc_id").alias("doc_id2"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


_SIG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sig", ArrayType(LongType())),
        StructField("bands", ArrayType(LongType())),
    ]
)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, sig[], bands[]) — Arrow pass over text."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mh = MinHasher(num_perm=num_perm, seed=seed, k=shingle_k, mode="char")
        for pdf in batches:
            sigs, bnds = [], []
            for t in pdf[text_col]:
                s = mh.signature(t or "")
                sigs.append([int(x) for x in s])
                bnds.append([int(x) - (1 << 63) for x in band_hashes(s, bands)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs, "bands": bnds})

    return ensure_parallelism(docs.select("doc_id", text_col)).mapInPandas(run, schema=_SIG_SCHEMA)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket equi-join + signature verify.

    Replays the classic shingle -> minhash -> band -> bucket-join plan; the
    band explode turns the Jaccard θ-join into an equi-join (same trick as
    the ER blocking stage).
    """
    sigs = minhash_signatures(docs, text_col, num_perm, bands, shingle_k, seed)
    sigs.persist()
    buckets = sigs.select("doc_id", F.explode("bands").alias("band"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(b, "band")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id1"), F.col("b.doc_id").alias("doc_id2"))
        .distinct()
    )
    s1 = sigs.select(F.col("doc_id").alias("doc_id1"), F.col("sig").alias("sig1"))
    s2 = sigs.select(F.col("doc_id").alias("doc_id2"), F.col("sig").alias("sig2"))
    est = F.size(
        F.filter(F.zip_with("sig1", "sig2", lambda x, y: (x == y).cast("int")), lambda v: v == 1)
    ).cast("double") / F.size("sig1")
    return (
        cands.join(s1, "doc_id1")
        .join(s2, "doc_id2")
        .select("doc_id1", "doc_id2", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )


_SIMHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("simhash", LongType())]
)


def simhash_pairs(docs: DataFrame, text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs; 4x16-bit bands guarantee recall for ham<=3."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "simhash": [simhash64(t or "") - (1 << 63) for t in pdf[text_col]],
                }
            )

    sh = ensure_parallelism(docs.select("doc_id", text_col)).mapInPandas(run, schema=_SIMHASH_SCHEMA)
    sh.persist()
    # 4 bands of 16 bits: any pair with hamming<=3 shares at least one band
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                (
                    F.lit(i * (1 << 16))
                    + F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                ).alias(f"b{i}")
                for i in range(4)
            ])
        ).alias("band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, "band")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id1"),
            F.col("b.doc_id").alias("doc_id2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        cands.select("doc_id1", "doc_id2", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Near-dup pairs by cosine over an array<float> column — pure JVM.

    Without ``block_col`` this is a full self-join (O(n^2): only for small n
    or pre-blocked inputs; the IVF path in ann.py is the scale route).
    """
    normed = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x.cast("double") * x)).alias("nrm"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    ).where(F.col("nrm") > 0)
    a, b = normed.alias("a"), normed.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    joined = a.join(b, F.col("a.blk") == F.col("b.blk")) if block_col else a.crossJoin(b)
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        joined.where(cond)
        .select(
            F.col("a.id").alias("doc_id1"),
            F.col("b.id").alias("doc_id2"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
