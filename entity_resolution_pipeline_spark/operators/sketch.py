"""KMV (k-minimum-values) distinct-count sketch — deterministic and
exactly reproducible across engines.

Spark's approx_count_distinct (HyperLogLog++) and DuckDB's approx sketch
produce engine-specific estimates, so neither can oracle the other. KMV
keeps the k smallest md5-60bit hash values of a column: the estimate
(k-1) / h_(k) * 2^60 is the classic unbiased distinct-count estimator
(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002), and because the k minima are an exact, deterministic SET,
the DuckDB oracle replays the whole sketch value for value — the
estimate, the kth minimum, everything.

Mergeability (what makes it a SKETCH, not just a query): the union of two
sketches' minima, re-topped to k, is the sketch of the union — partial
sketches per partition/day/source combine without rescanning, which is
the 100 TB usage pattern. ``kmv_merge`` implements exactly that and the
pytest pins merge(a, b) == sketch(a ∪ b).

Plan shape (bounded memory, never "collect all distinct then slice"):
per-group minima come from a row_number window (shuffle+sort per group,
spillable, keep k); the global variant uses orderBy+limit, which Spark
executes as a distributed TakeOrdered. Counts ride along from a plain
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from .util import md5_hash60

_SCALE = float(1 << 60)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_col: str | None = None,
) -> DataFrame:
    """(group?, minima array<bigint>, n_seen) — the k smallest distinct
    md5-60bit hashes (ascending) per group (or one global row with
    ``group_col=None``). ``n_seen`` = distinct hashes observed, so groups
    under k report exactly.
    """
    h = (
        df.select(
            *([group_col] if group_col else []),
            md5_hash60(F.col(value_col).cast("string")).alias("h"),
        )
        .where(F.col(value_col).isNotNull())
        .distinct()
    )
    if group_col:
        from pyspark.sql import Window

        # ONE evaluation of the hash+distinct subtree for BOTH outputs:
        # as separate top-k and count branches the distinct plan (md5 over
        # every value + its shuffle) ran twice and met again in a join.
        # collect_list skips NULLs, so `when(rn <= k, h)` collects exactly
        # the k minima while count(1) over the same rows is n_seen — and
        # the groupBy after the rank window reuses the window's
        # partitioning (no further Exchange).
        w = Window.partitionBy(group_col).orderBy("h")
        return (
            h.withColumn("rn", F.row_number().over(w))
            .groupBy(group_col)
            .agg(
                F.array_sort(
                    F.collect_list(F.when(F.col("rn") <= k, F.col("h")))
                ).alias("minima"),
                F.count(F.lit(1)).alias("n_seen"),
            )
        )
    minima = (
        h.orderBy("h").limit(k)
        .agg(F.array_sort(F.collect_list("h")).alias("minima"))
    )
    return minima.crossJoin(h.agg(F.count(F.lit(1)).alias("n_seen")))


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Adds ``distinct_est``: exact n_seen when the group holds fewer than
    k distinct values, else (k-1) / h_(k) scaled to the hash range."""
    kth = F.element_at("minima", k)
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(_SCALE)) / kth.cast("double"))
    return sketch.withColumn("distinct_est", est)


def kmv_merge(sketches: DataFrame, k: int = 256,
              group_col: str | None = None) -> DataFrame:
    """Merge partial sketches (rows of minima arrays) into one per group:
    union the minima, dedup, keep the k smallest — the defining sketch
    property. Input is sketch rows, so the explode is bounded at
    rows x k. n_seen is NOT mergeable exactly (overlap unknown); the
    merged row reports the union's minima count capped at k, which is all
    the estimator reads (under k, every partial was unsaturated, so the
    union count IS the exact union cardinality)."""
    keys = [group_col] if group_col else []
    exploded = sketches.select(*keys, F.explode("minima").alias("h")).distinct()
    grouped = exploded.groupBy(*keys) if keys else exploded.groupBy()
    return grouped.agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("minima"),
        F.least(F.count(F.lit(1)), F.lit(k)).cast("long").alias("n_seen"),
    )
