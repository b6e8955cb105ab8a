"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster.

    Python-kernel Arrow passes (minhash, normalization, year regexes) are
    CPU-bound; a single-row-group parquet file otherwise pins them to one
    task. The round-robin shuffle of the (narrow) input columns is orders of
    magnitude cheaper than serializing the kernel. No-op when the scan
    already has enough splits (the 100 TB case).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
