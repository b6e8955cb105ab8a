"""§2.10 — vector hot-deck imputation (J6 donor join + A7 donor aggregation).

Reference semantics (/root/reference/src/imputation.py:392-425): for each
record missing ``provision``/``subjects``, take its composite vector, find
donor records that *have* the field, keep donors with cosine >= 0.30, then

- 'average'          : imputed vector = element-wise mean of donor vectors;
                       imputed value = modal donor value (ties here break
                       lexicographically for determinism).
- 'weighted_average' : imputed vector = similarity-weighted mean of donor
                       vectors; imputed value = the highest-similarity
                       donor's value.
- 'nearest'          : the single best donor's value + vector.

Spark plan: the ANN donor lookup becomes a blocked θ-join — missing rows and
donors are bucketed by a blocking key (default: first person token) so the
cosine join is block-local, then window top-k per missing row; the vector
mean is a posexplode + per-component weighted aggregate (pure JVM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda acc, x: acc + x
    )


def impute_field(
    records: DataFrame,
    embeddings: DataFrame,
    field: str,
    sim_threshold: float = 0.30,
    max_donors: int = 10,
    method: str = "average",
    block_expr=None,
) -> DataFrame:
    """(url, imputed_value, donor_count, mean_sim) for records missing field.

    ``embeddings`` is (hash, embedding) over unique strings; records join it
    on composite_h. ``block_expr`` defaults to the lowercased first person
    token — donors outside the block are not considered (bounded join).
    """
    if block_expr is None:
        block_expr = F.lower(F.regexp_extract("person", r"^([A-Za-z]+)", 1))

    base = (
        records.select("url", "person", "composite_h", field)
        .where(F.col("composite_h").isNotNull())
        .withColumn("blk", block_expr)
        .where(F.col("blk") != "")
        .join(embeddings.withColumnRenamed("hash", "composite_h"), "composite_h")
    )
    missing = base.where(F.col(field).isNull()).select(
        F.col("url").alias("m_url"), F.col("blk"), F.col("embedding").alias("m_vec")
    )
    donors = base.where(F.col(field).isNotNull()).select(
        F.col("url").alias("d_url"),
        F.col("blk"),
        F.col("embedding").alias("d_vec"),
        F.col(field).alias("d_value"),
    )
    sim = _dot(F.col("m_vec"), F.col("d_vec"))  # embeddings are L2-normalized
    scored = (
        missing.join(donors, "blk")
        .select("m_url", "d_url", "d_value", "d_vec", sim.alias("sim"))
        .where(F.col("sim") >= sim_threshold)
    )
    w = Window.partitionBy("m_url").orderBy(F.desc("sim"), F.asc("d_url"))
    topk = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= max_donors)

    if method == "nearest":
        return topk.where(F.col("rn") == 1).select(
            F.col("m_url").alias("url"),
            F.col("d_value").alias("imputed_value"),
            F.col("d_vec").alias("imputed_vector"),
            F.lit(1).alias("donor_count"),
            F.col("sim").alias("mean_sim"),
        )

    # imputed vector: per-component (weighted) mean of donor vectors —
    # posexplode + aggregate, then re-assemble ordered by component index
    weight = F.col("sim") if method == "weighted_average" else F.lit(1.0)
    comps = topk.select("m_url", "sim", F.posexplode("d_vec").alias("pos", "x"))
    wmean = comps.groupBy("m_url", "pos").agg(
        (
            F.sum(F.col("x").cast("double") * weight) / F.sum(weight)
        ).alias("comp")
    )
    vectors = wmean.groupBy("m_url").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "comp"))), lambda s: s["comp"]
        ).alias("imputed_vector")
    )

    stats = topk.groupBy("m_url").agg(
        F.count(F.lit(1)).alias("donor_count"), F.avg("sim").alias("mean_sim")
    )

    if method == "weighted_average":
        # value from the highest-similarity donor (imputation.py:405-408)
        best = topk.where(F.col("rn") == 1).select(
            "m_url", F.col("d_value").alias("imputed_value")
        )
    else:
        # 'average': modal donor value (ties -> lexical min for determinism)
        counts = topk.groupBy("m_url", "d_value").agg(F.count(F.lit(1)).alias("votes"))
        w2 = Window.partitionBy("m_url").orderBy(F.desc("votes"), F.asc("d_value"))
        best = (
            counts.withColumn("rn2", F.row_number().over(w2))
            .where(F.col("rn2") == 1)
            .select("m_url", F.col("d_value").alias("imputed_value"))
        )

    return (
        best.join(vectors, "m_url")
        .join(stats, "m_url")
        .select(
            F.col("m_url").alias("url"),
            "imputed_value",
            "imputed_vector",
            "donor_count",
            "mean_sim",
        )
    )
