"""Approximate / exact nearest-neighbor search over an embedding column.

Replaces the reference's Weaviate HNSW serving (S5/J1/W1,
/root/reference/src/indexing.py, /root/reference/src/batch_querying.py) with
two DataFrame plans over ``(id, array<float>)``:

- brute_force_topk: broadcast the (small) query set against the corpus,
  cosine via zip_with/aggregate (pure JVM), top-k via window row_number.
  Exact baseline; scales linearly in corpus size — the right tool when the
  query set is small.
- ivf_topk: IVF-style two-stage search. Deterministic centroids are chosen by
  md5-hashing ids (evenly spread sample, reproducible in DuckDB), every
  corpus vector is assigned to its nearest centroid, and queries probe only
  the ``nprobe`` nearest cells — the classic inverted-file trade of recall
  for a corpus-scan factor of ~nprobe/ncells. Every stage is a JVM
  DataFrame expression (no Python in the path).

Ties are broken by ascending corpus id / centroid index so results are
deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


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


def pick_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid sample as a (cidx, cv, cn0) DataFrame.

    The n_cells vectors with the smallest md5(id) — an evenly-spread,
    engine-independent hash sample (md5 exists in DuckDB too, so the
    correctness oracle picks the identical centroids). Zero-norm vectors are
    excluded (they cannot anchor a cosine cell).
    """
    h = F.md5(F.col(id_col).cast("string"))
    cents = (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cv0"),
            _norm_col(vec_col).alias("cn0"),
            h.alias("h"),
        )
        .where(F.col("cn0") > 0)
        .orderBy("h", "cid")
        .limit(n_cells)
    )
    w = Window.orderBy("h", "cid")
    return cents.withColumn("cidx", F.row_number().over(w)).select("cidx", "cv0", "cn0")


def _nearest_cells(
    vecs: DataFrame, cents: DataFrame, id_alias: str, n_keep: int
) -> DataFrame:
    """(id, cell) pairs: each vector's n_keep nearest centroids by cosine
    (ties -> smallest centroid index). Pure JVM: broadcast cross join over
    the tiny centroid table + window rank."""
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        F.col(id_alias),
        F.col("cidx").alias("cell"),
        (_dot(F.col("v"), F.col("cv0")) / (F.col("nrm") * F.col("cn0"))).alias("csim"),
    )
    w = Window.partitionBy(id_alias).orderBy(F.desc("csim"), F.asc("cell"))
    return (
        scored.withColumn("crn", F.row_number().over(w))
        .where(F.col("crn") <= n_keep)
        .select(id_alias, "cell")
    )


def refine_centroids(
    corpus: DataFrame,
    cents: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd refinement of IVF centroids, all DataFrame ops.

    Hash-sampled seeds are adequate on uniform data but lose recall on
    skewed 100 TB corpora; a couple of k-means iterations (assign ->
    per-cell per-component mean -> renormalize) move centroids onto the
    data's actual modes. Empty cells keep their previous centroid.
    """
    c = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), _norm_col(vec_col).alias("nrm")
    ).where(F.col("nrm") > 0)
    for _ in range(iters):
        assign = _nearest_cells(
            c.select(F.col("vid").alias("nid"), "v", "nrm"), cents, "nid", 1
        )
        comp = (
            c.select(F.col("vid").alias("nid"), F.posexplode("v").alias("pos", "x"))
            .join(assign, "nid")
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
        )
        new_cents = comp.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv_new")
        )
        cents = (
            cents.join(new_cents, cents.cidx == new_cents.cell, "left")
            .select(
                "cidx",
                F.coalesce(F.col("cv_new"), F.col("cv0")).alias("cv0"),
            )
            .withColumn(
                "cn0",
                F.sqrt(F.aggregate("cv0", F.lit(0.0), lambda a, x: a + x.cast("double") * x)),
            )
            .where(F.col("cn0") > 0)
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF two-stage ANN: probe the nprobe nearest cells per query.

    Fully deterministic and JVM-side (centroid pick, cell assignment, probe,
    and exact re-rank are all DataFrame expressions), so the whole operator
    is reproducible in ANSI SQL — the classic inverted-file trade of recall
    for a corpus-scan factor of ~nprobe/n_cells. ``kmeans_iters > 0`` adds
    Lloyd refinement of the hash-sampled centroids (better cells on skewed
    corpora; the SQL-oracled contract query keeps iters=0).

    Zero-norm vectors: cosine is undefined for the zero vector, so
    zero-norm CORPUS rows are never candidates and zero-norm QUERY rows
    produce **no output rows at all** (row counts are not preserved for
    them). Callers that need a signal for degenerate queries should
    pre-filter ``aggregate(v, 0d, (a,x) -> a + x*x) = 0`` and handle those
    ids explicitly.
    """
    cents = pick_centroids(corpus, n_cells, id_col, vec_col)
    if kmeans_iters > 0:
        cents = refine_centroids(corpus, cents, kmeans_iters, id_col, vec_col)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v"),
        _norm_col(vec_col).alias("nrm"),
    ).where(F.col("nrm") > 0)
    assign = _nearest_cells(c, cents, "neighbor_id", 1)
    corpus_cells = c.join(assign, "neighbor_id").select(
        "neighbor_id", F.col("v").alias("cv"), F.col("nrm").alias("cn"), "cell"
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("v"),
        _norm_col(vec_col).alias("nrm"),
    ).where(F.col("nrm") > 0)
    q_probe = _nearest_cells(q, cents, "query_id", nprobe)
    qv = q.select("query_id", F.col("v").alias("qv"), F.col("nrm").alias("qn"))

    cand = (
        F.broadcast(q_probe.join(qv, "query_id"))
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


def embedding_diagnostics(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-dimension + norm statistics over an embedding column — the
    distributed analogue of the reference's driver-side vector inspection
    scripts (/root/reference/analyze_vectors.py:36-49 shape/mean/min/max/
    std, npy_diagnostics.py), which np.load a whole .npy into one
    process; here one posexplode + aggregate covers a 100 TB table.

    Output: one row per dimension ``(dim, n, mean, std, min, max)`` plus
    a ``dim = -1`` row describing the L2-NORM distribution (its ``n`` is
    the vector count; NULL/empty vectors are excluded and reported via
    ``n`` deltas against the table count). Ordered by dim.
    """
    d = emb.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    ).select(id_col, F.posexplode(vec_col).alias("dim", "v"))
    per_dim = d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("v").alias("mean"),
        F.stddev_pop("v").alias("std"),
        F.min("v").alias("min"),
        F.max("v").alias("max"),
    )
    norms = (
        d.groupBy(id_col)
        .agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
        .agg(
            F.lit(-1).alias("dim"),
            F.count(F.lit(1)).alias("n"),
            F.avg("nrm").alias("mean"),
            F.stddev_pop("nrm").alias("std"),
            F.min("nrm").alias("min"),
            F.max("nrm").alias("max"),
        )
    )
    return per_dim.unionByName(norms).orderBy("dim")
