"""Deterministic, content-addressed sampling for training-data curation.

Web-scale pipelines re-mix corpora constantly (domain re-weighting,
train/holdout carve-outs, ablation subsets). Doing it with rand() makes
every rerun a different dataset; these operators key every keep/drop
decision on the md5-60bit hash of (salt, row key) — the shared
SQL-reproducible primitive (operators/util.md5_hash60) — so:

- the same row always lands on the same side for a given salt (resumable,
  diffable, audit-friendly at 100 TB: a re-run samples the identical set);
- rates compose: sample(rate=0.5) of sample(rate=0.5) with different salts
  is an unbiased 0.25 sample;
- the DuckDB oracle replays the exact keep set value for value.

Thresholds are precomputed driver-side as BIGINT (floor(rate * 2^60)) so
the comparison is exact integer < integer on both engines — no
float-rounding drift at the boundary. All map-only, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F  # noqa: N812

from .util import md5_hash60

_SCALE = 1 << 60


def _bucket(key_col: Column, salt: str) -> Column:
    """Uniform [0, 2^60) bucket for a row key — md5-60bit of 'salt|key'."""
    return md5_hash60(F.concat(F.lit(str(salt)), F.lit("|"), key_col.cast("string")))


def threshold_for(rate: float) -> int:
    """BIGINT keep-threshold for a rate in [0, 1] (exact on both engines)."""
    return int(min(max(rate, 0.0), 1.0) * _SCALE)


def sample_rows(df: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "s1") -> DataFrame:
    """Keep ~rate of rows, deterministically by key hash."""
    return df.where(_bucket(F.col(key_col), salt) < F.lit(threshold_for(rate)))


def sample_by_group(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    key_col: str = "doc_id",
    salt: str = "s1",
) -> DataFrame:
    """Stratified sampling: per-group keep rates (domain re-weighting).

    ``rates`` maps group values to keep rates; unlisted groups use
    ``default_rate``. The rate map is a literal CASE chain — at scale a
    rates TABLE would broadcast-join instead, but curation mixes are
    human-sized dicts.
    """
    thr: Column = F.lit(threshold_for(default_rate))
    for g in sorted(rates):
        thr = F.when(F.col(group_col) == g, F.lit(threshold_for(rates[g]))).otherwise(thr)
    return df.where(_bucket(F.col(key_col), salt) < thr)


def split_train_holdout(
    df: DataFrame,
    holdout_frac: float = 0.01,
    key_col: str = "doc_id",
    salt: str = "split1",
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'holdout') — the deterministic
    decontamination-friendly carve-out: membership depends only on the key
    hash, so later batches of the same corpus route identically and the
    holdout never leaks into training across reruns."""
    cut = F.lit(threshold_for(holdout_frac))
    return df.withColumn(
        "split",
        F.when(_bucket(F.col(key_col), salt) < cut, "holdout").otherwise("train"),
    )
