"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F  # noqa: N812


def md5_hash60(c: Column | str) -> Column:
    """60-bit integer from the first 15 hex chars of md5(x).

    The shared sketch-hash primitive: DuckDB computes the identical value
    via ``('0x' || substr(md5(x), 1, 15))::BIGINT``, which makes every
    md5-based sketch operator (SimHash, MinHash-LSH, winnowing fingerprints)
    exactly reproducible in ANSI SQL — the driver's correctness oracle runs
    the same sketch, value for value. 15 hex chars keep the value positive
    in a signed 64-bit column on both engines.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# the same primitive as a SQL fragment (for F.expr-composed plans)
MD5_HASH60_SQL = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"


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
