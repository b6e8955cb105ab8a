"""Approximate / exact nearest-neighbor search over an embedding column.

Replaces the reference's Weaviate HNSW serving (S5/J1/W1,
/root/reference/src/indexing.py, /root/reference/src/batch_querying.py) with
two DataFrame plans over ``(id, array<float>)``:

- brute_force_topk: broadcast the (small) query set against the corpus,
  cosine via zip_with/aggregate (pure JVM), top-k via window row_number.
  Exact baseline; scales linearly in corpus size — the right tool when the
  query set is small.
- ivf_topk: IVF-style two-stage search. Deterministic centroids are chosen by
  hashing ids (evenly spaced sample), every corpus vector is assigned to its
  nearest centroid (one Arrow pass), and queries probe only the ``nprobe``
  nearest cells — the classic inverted-file trade of recall for a
  corpus-scan factor of ~nprobe/ncells.

Ties are broken by ascending corpus id so results are deterministic and
oracle-comparable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def _norm_col(vec_col: str):
    return F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x.cast("double") * x)
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda acc, x: acc + x
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact top-k by cosine."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm_col(vec_col).alias("cn"),
    ).where(F.col("cn") > 0)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm_col(vec_col).alias("qn"),
    ).where(F.col("qn") > 0)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


_ASSIGN_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("cell", IntegerType())]
)


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid — one Arrow pass."""
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nrm = np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = (V / nrm) @ cn.T
            yield pd.DataFrame(
                {"vec_id": pdf[id_col], "cell": sims.argmax(axis=1).astype(np.int32)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(run, schema=_ASSIGN_SCHEMA)


def pick_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic centroid sample: the n_cells smallest xxhash64(id)."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .withColumn("h", F.xxhash64(F.col("i").cast("string")))
        .orderBy("h")
        .limit(n_cells)
        .collect()
    )
    return np.array([r["v"] for r in rows], dtype=np.float64)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF two-stage ANN: probe the nprobe nearest cells per query."""
    centroids = pick_centroids(corpus, n_cells, id_col, vec_col)
    assign = ivf_assign(corpus, centroids, id_col, vec_col).withColumnRenamed(
        "vec_id", "__assign_id"
    )
    corpus_cells = corpus.join(
        assign, corpus[id_col] == assign["__assign_id"]
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm_col(vec_col).alias("cn"),
        "cell",
    ).where(F.col("cn") > 0)  # zero-norm guard, mirroring brute_force_topk

    # per-query probe cells (small: done in one Arrow pass over queries)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    probe_schema = StructType(
        [StructField("query_id", LongType()), StructField("cell", IntegerType())]
    )

    def probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nrm = np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            sims = (V / nrm) @ cn.T
            order = np.argsort(-sims, axis=1)[:, :nprobe]
            ids = np.repeat(pdf[id_col].to_numpy(), nprobe)
            yield pd.DataFrame({"query_id": ids, "cell": order.ravel().astype(np.int32)})

    q_probe = queries.select(id_col, vec_col).mapInPandas(probes, schema=probe_schema)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm_col(vec_col).alias("qn")
    ).where(F.col("qn") > 0)
    cand = (
        F.broadcast(q_probe.join(q, "query_id"))
        .join(corpus_cells, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
