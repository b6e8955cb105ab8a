"""Stages 2-3 — blocking keys and candidate-pair generation.

Replaces the reference's Weaviate HNSW ANN blocking join
(/root/reference/src/batch_querying.py:598-687, J1 in SURVEY.md §2.3) with
three explicit, shuffle-friendly key families:

- ``name``  : year-stripped, lowercased person name (F14 normalizer).
- ``host``  : url host + first person token (host alone is too hot — the
  synthetic corpus has a deliberately hot aggregator host).
- ``lsh:b`` : MinHash band hashes over char-shingled composite text; turns the
  cosine/Jaccard θ-join into an equi-join on band ids (catches typo and
  token-reorder variants that exact keys miss).

Skew handling is explicit (north_rule): NULL keys are dropped (they can never
match on that key), block sizes are measured first, and blocks larger than
``max_block_size`` are excluded from pair generation and *returned* to the
caller for manifest logging — bounded work per key, no silent truncation.
AQE skew-join splitting covers residual imbalance.

Pairs are canonicalized (url1 < url2) before the union-distinct so each
unordered pair shuffles once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from .util import ensure_parallelism
from ..functions.minhash import MinHasher, band_hashes
from ..functions.years import normalize_name

DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16
DEFAULT_MAX_BLOCK = 64


def name_keys(records: DataFrame) -> DataFrame:
    """(url, key) on the normalized person name; NULL names dropped."""
    schema = StructType([StructField("url", StringType()), StructField("key", StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, str | None] = {}
        for pdf in batches:
            keys = []
            for p in pdf["person"]:
                if p is None:
                    keys.append(None)
                    continue
                k = memo.get(p)
                if k is None and p not in memo:
                    nk = normalize_name(p).lower()
                    k = ("name|" + nk) if nk else None
                    memo[p] = k
                keys.append(k)
            yield pd.DataFrame({"url": pdf["url"], "key": keys})

    out = ensure_parallelism(records.select("url", "person")).mapInPandas(run, schema=schema)
    return out.where(F.col("key").isNotNull())


def host_keys(records: DataFrame) -> DataFrame:
    """(url, key) = host + first person token — pure JVM expressions."""
    # no trailing "/": path-less URLs (https://host.com) must still get a key
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    first_tok = F.lower(F.regexp_extract("person", r"^([A-Za-z]+)", 1))
    return (
        records.where(F.col("person").isNotNull())
        .select(
            "url",
            F.concat(F.lit("host|"), host, F.lit("|"), first_tok).alias("key"),
        )
        .where(F.length("key") > 6)
    )


def lsh_keys(
    records: DataFrame,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(url, key) — one row per MinHash band over the composite text."""
    schema = StructType(
        [StructField("url", StringType()), StructField("bands", ArrayType(LongType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mh = MinHasher(num_perm=num_perm, seed=seed, k=shingle_k, mode="char")
        for pdf in batches:
            out = []
            for comp in pdf["composite"]:
                if not comp:
                    out.append(None)
                    continue
                sig = mh.signature(comp)
                # uint64 band ids -> int64 column (stable reinterpret)
                out.append([int(b) - (1 << 63) for b in band_hashes(sig, bands)])
            yield pd.DataFrame({"url": pdf["url"], "bands": out})

    out = ensure_parallelism(records.select("url", "composite")).mapInPandas(run, schema=schema)
    return (
        out.where(F.col("bands").isNotNull())
        .select("url", F.explode("bands").alias("band"))
        .select("url", F.concat(F.lit("lsh|"), F.col("band").cast("string")).alias("key"))
    )


def block_sizes(keys: DataFrame) -> DataFrame:
    return keys.groupBy("key").agg(F.count(F.lit(1)).alias("block_size"))


def candidate_pairs(
    keys: DataFrame,
    max_block_size: int = DEFAULT_MAX_BLOCK,
    oversized_strategy: str = "window_cap",
    neighbor_cap: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Self-equi-join within blocks -> canonical distinct (url1 < url2).

    Skew handling (north_rule): blocks larger than ``max_block_size`` would
    contribute O(B^2) pairs. Strategy:

    - ``window_cap``: the hot block's rows are sorted (deterministic) and each
      row pairs only with its next ``neighbor_cap`` neighbors — O(B*K) pairs,
      the DataFrame analogue of the reference's top-K ANN fanout cap
      (/root/reference/src/batch_querying.py:651, top-200 per record).
    - ``drop``: exclude the block entirely.

    Either way, oversized blocks are *returned* for manifest logging — no
    silent truncation.
    """
    sizes = block_sizes(keys)
    oversized = sizes.where(F.col("block_size") > max_block_size)
    ok_keys = keys.join(F.broadcast(oversized.select("key")), "key", "left_anti")

    # self-join on the 8-byte hash of the (long string) key: much smaller
    # shuffle and faster comparisons. A 64-bit collision would only merge two
    # blocks — extra candidates get scored, none are lost.
    hk = ok_keys.select("url", F.xxhash64("key").alias("kh"))
    a = hk.alias("a")
    b = hk.alias("b")
    pairs = (
        a.join(b, "kh")
        .where(F.col("a.url") < F.col("b.url"))
        .select(F.col("a.url").alias("url1"), F.col("b.url").alias("url2"))
    )

    if oversized_strategy == "window_cap":
        from pyspark.sql import Window

        # mega-blocks (> salt_factor * max_block_size) are pre-split by a
        # url-hash salt so no single task sorts the whole block — the same
        # bounded-recall trade the cap already makes (cross-salt pairs are
        # dropped), but the per-task work is O(block/salts * log) instead of
        # one straggler sorting millions of rows. Moderately-hot blocks
        # (<= salt_factor * cap) keep exact neighbor-cap semantics.
        salt_factor = 4
        hot = keys.join(F.broadcast(oversized), "key")
        n_sub = F.greatest(
            F.lit(1),
            F.ceil(F.col("block_size") / F.lit(salt_factor * max_block_size)).cast("int"),
        )
        hot = hot.withColumn("salt", F.pmod(F.xxhash64("url"), n_sub))
        w = Window.partitionBy("key", "salt").orderBy("url")
        ranked = hot.select("key", "salt", "url", F.row_number().over(w).alias("rn"))
        r1 = ranked.alias("r1")
        r2 = ranked.alias("r2")
        capped = (
            r1.join(
                r2,
                (F.col("r1.key") == F.col("r2.key"))
                & (F.col("r1.salt") == F.col("r2.salt"))
                & (F.col("r2.rn") > F.col("r1.rn"))
                & (F.col("r2.rn") <= F.col("r1.rn") + neighbor_cap),
            )
            .select(
                F.least(F.col("r1.url"), F.col("r2.url")).alias("url1"),
                F.greatest(F.col("r1.url"), F.col("r2.url")).alias("url2"),
            )
        )
        pairs = pairs.unionByName(capped)

    return pairs.distinct(), oversized


def all_blocking_keys(
    records: DataFrame,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Union of the three key families."""
    return (
        name_keys(records)
        .unionByName(host_keys(records))
        .unionByName(lsh_keys(records, num_perm=num_perm, bands=bands))
    )
