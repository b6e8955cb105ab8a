"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from SURVEY.md §2
over the driver's testdata tables; ``oracle_sql()`` gives the DuckDB-checkable
equivalent for EVERY query (the sketches — MinHash-LSH, SimHash, winnowing
fingerprints, IVF — are built on a shared md5-60bit hash primitive that
DuckDB reproduces exactly; iterative CC is validated via a SQL-derivable
graph). ``entry(spark)`` runs the flagship near-dup + connected-components
flow on sf0.001.

Column names are aliased identically on both sides; float results are rounded
identically on both sides (the driver compares order-insensitive value
hashes).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F  # noqa: N812

from entity_resolution_pipeline_spark.operators import ann as _ann
from entity_resolution_pipeline_spark.operators import cluster as _cluster
from entity_resolution_pipeline_spark.operators import dedup as _dedup
from entity_resolution_pipeline_spark.operators import textstats as _ts

SF_DEFAULT = "/root/testdata/sf0.001"

from entity_resolution_pipeline_spark.operators.dedup import minhash_perm_coeffs

_MH_A, _MH_B = (
    "[" + ",".join(str(x) + "::BIGINT" for x in c) + "]"
    for c in minhash_perm_coeffs(32)
)


def _hyperplanes_sql(n_planes: int = 16, dim: int = 64, seed: int = 42) -> str:
    """The operator's seeded Gaussian hyperplanes as a DuckDB nested-list
    literal. repr round-trips each float64 exactly, but the two engines may
    still SUM the dot product in different orders (numpy BLAS vs DuckDB
    left-fold), so a product landing within ~1 ulp of the >=0 sign boundary
    (or a cosine within ~1 ulp of the threshold) could in principle flip
    between engines. The synthetic embeddings are coarse random floats whose
    plane dots sit far (>>1e-9) from 0, so band membership is stable in
    practice; if the testdata generator ever changes, re-check that margin
    rather than trusting exact-match here."""
    import numpy as np

    planes = np.random.RandomState(seed).randn(n_planes, dim)
    return "[" + ",".join(
        "[" + ",".join(repr(float(x)) for x in row) + "]" for row in planes
    ) + "]"

_EN = sorted(
    __import__(
        "entity_resolution_pipeline_spark.functions.text", fromlist=["STOPWORDS"]
    ).STOPWORDS["en"]
)
_LANGS = ["de", "en", "es", "fr"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _norm(c):
    return F.trim(F.regexp_replace(c, r"\s+", " "))


_NORM_SQL = "trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


# --------------------------------------------------------------------------
# projections / filters
# --------------------------------------------------------------------------

def q_p1_null_projection(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("text") == "", None).otherwise(F.col("text")).alias("text_nn"),
        F.when(F.col("lang") == "", None).otherwise(F.col("lang")).alias("lang_nn"),
        "n_chars",
    )


def q_p2_normalize_text(spark, sf_dir):
    """The invariant normalizer (pandas UDF, Python re) vs SQL regexp."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from entity_resolution_pipeline_spark.functions.text import normalize_text

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("norm_text", StringType())]
    )

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "norm_text": [normalize_text(t) for t in pdf["text"]]}
            )

    return d.mapInPandas(run, schema=schema)


# --------------------------------------------------------------------------
# aggregations
# --------------------------------------------------------------------------

_PY_WARMED: set[int] = set()


def _warm_python_workers(spark: SparkSession) -> None:
    """One tiny eager Arrow job per session: forks the Python worker pool
    and imports numpy/pandas inside it. bench.py's untimed warm-up call
    (its comment: "warm the JVM + python workers + file index once")
    reaches only the operators the first query uses — a1 is pure JVM, so
    without this the daemon/worker startup cost lands in whichever TIMED
    query first touches a Python kernel. Pure infrastructure warm-up: no
    input data is read, nothing is computed or kept."""
    key = id(spark.sparkContext._jsc)
    if key in _PY_WARMED:
        return
    _PY_WARMED.add(key)

    def _f(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        for pdf in batches:
            yield pdf

    n = spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, n).mapInPandas(_f, "id long").write.format(
        "noop"
    ).mode("overwrite").save()


def q_a1_unique_strings(spark, sf_dir):
    _warm_python_workers(spark)
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(_norm(F.col("text")).alias("value"), "doc_id")
        .groupBy("value")
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("cnt"))
    )


def q_a3_field_usage(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_a4_field_stats(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_occurrences"),
            F.countDistinct("text").alias("distinct_values"),
        )
    )


def q_a6_null_heuristic(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    total = d.count()
    return (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 0.15 * total)
    )


def q_a9_confusion(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").select(
        (F.col("label") == 0).cast("int").alias("y"),
        (F.col("vec_id") % 2 == 0).cast("int").alias("pred"),
    )
    return e.agg(
        F.sum(((F.col("y") == 1) & (F.col("pred") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("y") == 0) & (F.col("pred") == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("y") == 1) & (F.col("pred") == 0)).cast("long")).alias("fn"),
        F.sum(((F.col("y") == 0) & (F.col("pred") == 0)).cast("long")).alias("tn"),
    )


def q_a10_cluster_stats(spark, sf_dir):
    """A10 full parity: base stats + interpolated quantiles + size buckets
    (the cluster_size_stats operator over orders-as-clusters)."""
    from entity_resolution_pipeline_spark.operators.cluster import cluster_size_stats

    clusters = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("cluster_id"))
    s = cluster_size_stats(clusters)
    return s.select(
        "n_clusters", "min_size", "max_size",
        F.round("mean_size", 6).alias("mean_size"),
        "median_size",
        F.round("std_size", 6).alias("std_size"),
        F.round("size_q10", 6).alias("size_q10"),
        F.round("size_q25", 6).alias("size_q25"),
        F.round("size_q75", 6).alias("size_q75"),
        F.round("size_q90", 6).alias("size_q90"),
        "g_1", "g_2_5", "g_6_10", "g_11_20", "g_21_50", "g_51_plus",
    )


def q_a11_corr(spark, sf_dir):
    """A11 feature-health: pairwise Pearson correlation matrix (upper
    triangle) + constant-feature detection over lineitem numerics
    (parallel_features.py:1008-1042 analogue)."""
    li = _t(spark, sf_dir, "lineitem")
    feats = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    rows = []
    for i, f1 in enumerate(feats):
        for f2 in feats[i + 1:]:
            rows.append(
                li.agg(
                    F.lit(f1).alias("f1"),
                    F.lit(f2).alias("f2"),
                    F.round(F.corr(f1, f2), 6).alias("pearson_r"),
                    (F.stddev_pop(f1) == 0).cast("int").alias("f1_constant"),
                    (F.stddev_pop(f2) == 0).cast("int").alias("f2_constant"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def q_m6_pr_curve(spark, sf_dir):
    """M6 precision/recall curve points: cumulative TP over descending
    score thresholds (classification.py:1085-1150 analogue) on a
    deterministic synthetic score over embeddings."""
    e = _t(spark, sf_dir, "embeddings").select(
        (F.col("label") == 0).cast("int").alias("y"),
        ((F.col("vec_id") * 37 % 21) / 20.0).alias("score"),
    )
    g = e.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w = Window.orderBy(F.desc("score"))
    wall = Window.partitionBy()
    c = g.select(
        "score",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("pos").over(wall).alias("tot_pos"),
    )
    return c.select(
        F.round("score", 6).alias("threshold"),
        F.round(F.col("cum_pos").cast("double") / F.col("cum_n"), 6).alias("prec"),
        F.round(F.col("cum_pos").cast("double") / F.col("tot_pos"), 6).alias("rec"),
    )


# --------------------------------------------------------------------------
# windows / top-k / sorts
# --------------------------------------------------------------------------

def q_a11_feature_stats(spark, sf_dir):
    """A11 feature diagnostics: per-column min/max/mean/std over numeric
    features (describe-style, exact aggregates)."""
    li = _t(spark, sf_dir, "lineitem")
    rows = []
    for c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        rows.append(
            li.agg(
                F.lit(c).alias("feature"),
                F.round(F.min(c), 6).alias("min_v"),
                F.round(F.max(c), 6).alias("max_v"),
                F.round(F.avg(c), 6).alias("mean_v"),
                F.round(F.stddev_pop(c), 6).alias("std_v"),
                F.sum(F.isnan(c).cast("long")).alias("n_nan"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def q_w1_topk_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


def q_w2_mode_value(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("votes"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("votes"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "votes")
    )


def q_w3_largest_groups(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.asc("n_name"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# joins / set ops
# --------------------------------------------------------------------------

def q_j1_blocking_selfjoin(spark, sf_dir):
    from entity_resolution_pipeline_spark.operators.util import ensure_parallelism

    bkey = F.substring(_norm(F.col("text")), 1, 10).alias("bkey")
    d = _t(spark, sf_dir, "documents").select("doc_id", bkey)
    # single-row-group parquet -> the broadcast-join probe side (where the
    # block expansion happens) would run in one task; spread the raw rows
    # FIRST so the normalization regex also runs post-shuffle instead of
    # serially in the scan task. No-op at real scale.
    a = (
        ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id", "text"))
        .select("doc_id", bkey)
        .alias("a")
    )
    b = d.alias("b")
    return (
        a.join(b, "bkey")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("bkey"),
            F.col("a.doc_id").alias("doc_id1"),
            F.col("b.doc_id").alias("doc_id2"),
        )
    )


def q_j2_dim_lookup_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_so1_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def q_so4_distinct_count(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.countDistinct("text").alias("n_distinct_texts"))
    )


# --------------------------------------------------------------------------
# scalar functions
# --------------------------------------------------------------------------

def q_f3_levenshtein_pairs(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand", "p_size")
    # The (brand, size) self-join expands ~80x before the levenshtein
    # projection, but the probe side is a single small parquet split — the
    # whole expansion would run in ONE task (measured 32 s at sf1.0).
    # Spread the probe side to the configured shuffle parallelism; the
    # partition count stays conf-derived, never a local constant.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    a = p.repartition(n_part, "p_partkey").alias("a")
    b = p.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    max_len = F.greatest(F.length("a.p_name"), F.length("b.p_name"))
    # two projections on purpose: inside one Project the lev_sim copy of
    # levenshtein sits in a conditional branch, which codegen subexpression
    # elimination skips — the plan evaluated levenshtein TWICE per pair
    # (measured 1.77 vs 1.23 s). CollapseProject keeps the split because
    # the non-cheap lev_dist is referenced twice downstream; the executed
    # plan carries exactly one levenshtein call.
    step = (
        a.join(b, (F.col("a.p_brand") == F.col("b.p_brand")) & (F.col("a.p_size") == F.col("b.p_size")))
        .where(F.col("a.p_partkey") < F.col("b.p_partkey"))
        .select(
            F.col("a.p_partkey").alias("p1"),
            F.col("b.p_partkey").alias("p2"),
            lev.alias("lev_dist"),
            max_len.alias("_ml"),
        )
    )
    return step.select(
        "p1",
        "p2",
        "lev_dist",
        F.round(
            F.when(
                F.col("_ml") > 0, 1.0 - F.col("lev_dist").cast("double") / F.col("_ml")
            ).otherwise(1.0),
            6,
        ).alias("lev_sim"),
    )


def q_f6_interactions(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    a, b = F.col("l_discount"), F.col("l_tax")
    harmonic = F.when((a > 0) & (b > 0), 2 * a * b / (a + b)).otherwise(0.0)
    ratio = F.least(F.when(b > 0, a / b).otherwise(0.0), F.lit(10.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(harmonic, 6).alias("harmonic"),
        F.round(a * b, 6).alias("product"),
        F.round(ratio, 6).alias("ratio_capped"),
    )


def q_f9_year_extraction(spark, sf_dir):
    """Canonical birth-death range strings -> (birth, death) via the full
    15-pattern UDF chain; the oracle needs only the range regex because the
    constructed strings are canonical pattern-4 forms."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from entity_resolution_pipeline_spark.functions.years import extract_birth_death_years

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.concat(
            F.col("p_name"),
            F.lit(", "),
            (F.lit(1500) + F.col("p_size") * 3 % 380).cast("int").cast("string"),
            F.lit("-"),
            (F.lit(1540) + F.col("p_size") * 3 % 380).cast("int").cast("string"),
        ).alias("name_str"),
    )
    schema = StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("birth_year", IntegerType()),
            StructField("death_year", IntegerType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ys = [extract_birth_death_years(s) for s in pdf["name_str"]]
            yield pd.DataFrame(
                {
                    "p_partkey": pdf["p_partkey"],
                    "birth_year": [y[0] for y in ys],
                    "death_year": [y[1] for y in ys],
                }
            )

    return p.mapInPandas(run, schema=schema)


def q_f12_sigmoid_threshold(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    z = 3.0 * F.col("l_discount") - 2.0 * F.col("l_tax") + 0.5
    prob = 1.0 / (1.0 + F.exp(-z))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(prob, 6).alias("match_prob"),
        (prob >= 0.6).cast("int").alias("pred"),
    )


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

def q_text_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish token counts in one contract row (merged from
    the former text_token_counts / text_token_counts_bpe pair so the
    driver's 50-query correctness budget covers every operator)."""
    d = _t(spark, sf_dir, "documents")
    return _ts.token_counts(d).join(_ts.token_counts_bpeish(d), "doc_id")


def q_text_quality(spark, sf_dir):
    q = _ts.quality(_t(spark, sf_dir, "documents"))
    return q.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("mean_word_len", 6).alias("mean_word_len"),
    )


def q_text_langid(spark, sf_dir):
    return _ts.language_id(_t(spark, sf_dir, "documents"))


def q_text_langid_v2(spark, sf_dir):
    return _ts.language_id_v2(_t(spark, sf_dir, "documents"))


def q_text_gopher_quality(spark, sf_dir):
    g = _ts.gopher_quality(_t(spark, sf_dir, "documents"))
    return g.select(
        "doc_id", "n_words",
        F.round("top_word_frac", 6).alias("top_word_frac"),
        F.round("frac_dup_lines", 6).alias("frac_dup_lines"),
        F.round("frac_ellipsis_lines", 6).alias("frac_ellipsis_lines"),
        F.round("symbol_word_ratio", 6).alias("symbol_word_ratio"),
        F.round("frac_alpha_words", 6).alias("frac_alpha_words"),
    )


def q_text_redact_pii(spark, sf_dir):
    return _ts.redact_pii(_t(spark, sf_dir, "documents"))


def q_text_tfidf_top_terms(spark, sf_dir):
    t = _ts.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)
    return t.select("doc_id", "term", "tf", F.round("score", 6).alias("score"), "rank")


BM25_QUERY = "spark join window table"


def q_text_bm25(spark, sf_dir):
    out = _ts.bm25_search(_t(spark, sf_dir, "documents"), BM25_QUERY, k=20)
    return out.select("doc_id", F.round("score", 6).alias("score"), "rank")


def q_text_decontaminate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return _ts.decontaminate(d, d.where(F.col("doc_id") % 20 == 0))


def q_asof_join(spark, sf_dir):
    from entity_resolution_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(left, right, on="user_id", ts_col="ts", right_cols=["value"])
    return out.select(
        "event_id", "user_id", "ts",
        F.round("value", 6).alias("value"),
        F.round("value_asof", 6).alias("value_asof"),
        "ts_asof",
    )


def q_sessionize(spark, sf_dir):
    from entity_resolution_pipeline_spark.streaming.ingest import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap="17 minutes")


def q_kmv_distinct(spark, sf_dir):
    from entity_resolution_pipeline_spark.operators.sketch import (
        kmv_estimate,
        kmv_sketch,
    )

    s = kmv_estimate(
        kmv_sketch(_t(spark, sf_dir, "events"), "props", k=64,
                   group_col="event_type"),
        k=64,
    )
    return s.select(
        "event_type",
        F.element_at("minima", 1).alias("h_min"),
        F.element_at("minima", 64).alias("h_kth"),
        "n_seen",
        F.round("distinct_est", 6).alias("distinct_est"),
    )


def q_time_rollup(spark, sf_dir):
    from entity_resolution_pipeline_spark.streaming.ingest import time_rollup

    return time_rollup(_t(spark, sf_dir, "events"))


def q_stream_windowed_counts(spark, sf_dir):
    """Batch replay of the streaming windowed-counts query — the EXACT
    aggregation the stream runs (streaming/ingest.windowed_counts; the
    streaming twin differs only by the watermark operator), so the
    stream's core semantics get a value-level SQL oracle, not just the
    pytest batch-equivalence check."""
    from entity_resolution_pipeline_spark.streaming.ingest import windowed_counts

    return windowed_counts(_t(spark, sf_dir, "events"))


def q_stream_dedup_batch(spark, sf_dir):
    """Batch degenerate of the streaming exact-dedup (first-seen-wins per
    128-bit normalized-text key): min doc_id per key survives —
    deterministic and SQL-replayable."""
    from entity_resolution_pipeline_spark.streaming.ingest import dedup_stream

    d = _t(spark, sf_dir, "documents")
    return dedup_stream(d, batch_order=["doc_id"]).select("doc_id", "source")


def q_range_join(spark, sf_dir):
    """Every event must land in exactly one of its user's sessions — the
    range join against the sessionize output is a semantic self-check
    (row count == event count) on top of the value-level oracle."""
    from entity_resolution_pipeline_spark.operators.asof import range_join
    from entity_resolution_pipeline_spark.streaming.ingest import sessionize

    ev = _t(spark, sf_dir, "events")
    sessions = sessionize(ev, gap="17 minutes")
    out = range_join(ev.select("event_id", "user_id", "ts"), sessions)
    return out.select("event_id", "user_id", "ts", "session_start", "session_end")


SAMPLE_RATES = {"src0": 0.9, "src1": 0.5, "src2": 0.25}


def q_sample_stratified(spark, sf_dir):
    """Stratified sample + train/holdout split composed in one contract
    row (merged from the former sample_stratified / sample_split pair):
    each per-group-sampled row carries its deterministic split tag —
    exactly how a curation run consumes the two operators together.
    Rates compose across distinct salts by design."""
    from entity_resolution_pipeline_spark.operators.sample import (
        sample_by_group,
        split_train_holdout,
    )

    d = _t(spark, sf_dir, "documents")
    sampled = sample_by_group(
        d, "source", SAMPLE_RATES, default_rate=0.1, key_col="doc_id", salt="s1"
    ).select("doc_id", "source")
    split = split_train_holdout(
        d, holdout_frac=0.05, key_col="doc_id", salt="split1"
    ).select("doc_id", "split")
    return sampled.join(split, "doc_id")


# --------------------------------------------------------------------------
# dedup / similarity
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return _dedup.exact_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark, sf_dir):
    out = _dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)
    return out.select("doc_id1", "doc_id2", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_clusters(spark, sf_dir):
    return _dedup.near_dup_clusters(
        _t(spark, sf_dir, "documents"), method="minhash", threshold=0.5
    )


def q_dedup_embedding_cosine(spark, sf_dir):
    """Blocked exact-cosine AND hyperplane-LSH near-dup pairs in one
    contract row (merged from the former dedup_embedding_cosine /
    dedup_embedding_lsh pair), tagged by method — both paths stay
    value-for-value oracled."""
    e = _t(spark, sf_dir, "embeddings").withColumn("blk", F.concat(
        F.col("label").cast("string"), F.lit("|"), (F.col("vec_id") % 10).cast("string")
    ))
    blocked = _dedup.embedding_cosine_pairs(e, threshold=0.2, block_col="blk").select(
        F.lit("blocked").alias("method"),
        "doc_id1", "doc_id2", F.round("cosine", 4).alias("cosine"),
    )
    lsh = _dedup.embedding_lsh_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, n_planes=16, bands=4, seed=42
    ).select(
        F.lit("lsh").alias("method"),
        "doc_id1", "doc_id2", F.round("cosine", 4).alias("cosine"),
    )
    return blocked.unionByName(lsh)


def q_ann_bruteforce_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    out = _ann.brute_force_topk(e, e.where(F.col("vec_id") < 5), k=10)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


def q_cc_components(spark, sf_dir):
    """Iterative large-star/small-star CC on a SQL-derivable graph: every
    doc links to its bucket hub (5*floor(id/5)); components = buckets with
    >= 2 members, labeled by their min id."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    edges = (
        d.select(
            F.col("doc_id").alias("src"),
            (F.floor(F.col("doc_id") / 5) * 5).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    # hubs might not exist as rows; CC treats ids as abstract nodes, matching
    # the oracle which derives the same bucket membership
    return _cluster.connected_components(edges).select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


# ---- md5-rebased sketches (exact DuckDB oracles via the shared
# hash60 primitive, operators/util.md5_hash60) ----

def q_dedup_minhash_lsh(spark, sf_dir):
    out = _dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, num_perm=32, bands=8, shingle_k=5
    )
    return out.select("doc_id1", "doc_id2", F.round("est_jaccard", 6).alias("est_jaccard"))


def q_dedup_simhash(spark, sf_dir):
    return _dedup.simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=12)


def q_ann_ivf_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    out = _ann.ivf_topk(e, e.where(F.col("vec_id") < 5), k=10, n_cells=8, nprobe=4)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


def q_text_fingerprints(spark, sf_dir):
    return _ts.fingerprints(_t(spark, sf_dir, "documents"))


def q_multimodal_mime(spark, sf_dir):
    from entity_resolution_pipeline_spark.operators.multimodal import media_metadata

    d = _t(spark, sf_dir, "documents")
    payload = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit(bytes(b"\x89PNG")), F.encode("text", "UTF-8")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit(bytes(b"\xff\xd8\xff")), F.encode("text", "UTF-8")))
        .otherwise(F.encode("text", "UTF-8"))
    )
    df = d.select(F.col("doc_id").alias("id"), payload.alias("payload"))
    return media_metadata(df)


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-dup blocking (MinHash LSH) + connected components over
    sf0.001 documents — the ER DAG's blocking->pairs->cluster spine."""
    docs = _t(spark, SF_DEFAULT, "documents")
    pairs = _dedup.minhash_lsh_pairs(docs, threshold=0.4, num_perm=64, bands=16)
    edges = pairs.select(
        F.col("doc_id1").cast("string").alias("src"),
        F.col("doc_id2").cast("string").alias("dst"),
    )
    nodes = docs.select(F.col("doc_id").cast("string").alias("node"))
    clusters = _cluster.assign_clusters(edges, nodes)
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    return clusters.join(sizes, "cluster_id").select("entity_id", "cluster_id", "size")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "p1_null_projection": q_p1_null_projection,
        "p2_normalize_text": q_p2_normalize_text,
        "a1_unique_strings": q_a1_unique_strings,
        "a3_field_usage": q_a3_field_usage,
        "a4_field_stats": q_a4_field_stats,
        "a6_null_heuristic": q_a6_null_heuristic,
        "a9_confusion": q_a9_confusion,
        "a10_cluster_stats": q_a10_cluster_stats,
        "a11_feature_stats": q_a11_feature_stats,
        "a11_corr": q_a11_corr,
        "m6_pr_curve": q_m6_pr_curve,
        "w1_topk_per_group": q_w1_topk_per_group,
        "w2_mode_value": q_w2_mode_value,
        "w3_largest_groups": q_w3_largest_groups,
        "j1_blocking_selfjoin": q_j1_blocking_selfjoin,
        "j2_dim_lookup_join": q_j2_dim_lookup_join,
        "so1_anti_join": q_so1_anti_join,
        "so4_distinct_count": q_so4_distinct_count,
        "f3_levenshtein_pairs": q_f3_levenshtein_pairs,
        "f6_interactions": q_f6_interactions,
        "f9_year_extraction": q_f9_year_extraction,
        "f12_sigmoid_threshold": q_f12_sigmoid_threshold,
        "text_token_counts": q_text_token_counts,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_langid_v2": q_text_langid_v2,
        "text_gopher_quality": q_text_gopher_quality,
        "text_tfidf_top_terms": q_text_tfidf_top_terms,
        "text_decontaminate": q_text_decontaminate,
        "text_bm25": q_text_bm25,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "time_rollup": q_time_rollup,
        "kmv_distinct": q_kmv_distinct,
        "text_redact_pii": q_text_redact_pii,
        "sample_stratified": q_sample_stratified,
        "stream_windowed_counts": q_stream_windowed_counts,
        "stream_dedup_batch": q_stream_dedup_batch,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_embedding": q_dedup_embedding_cosine,
        "ann_bruteforce_topk": q_ann_bruteforce_topk,
        "cc_components": q_cc_components,
        "multimodal_mime": q_multimodal_mime,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_simhash": q_dedup_simhash,
        "ann_ivf_topk": q_ann_ivf_topk,
        "text_fingerprints": q_text_fingerprints,
    }


def _langid_v2_sql(norm: str) -> str:
    """DuckDB replay of operators/textstats.language_id_v2: identical
    trigram extraction (space-padded, distinct), identical literal
    profiles, identical argmax with smallest-language tie-break."""
    from entity_resolution_pipeline_spark.functions.text import (
        LANGID_MAX_CHARS,
        TRIGRAM_MIN_HITS,
        TRIGRAM_PROFILES,
    )

    langs = sorted(TRIGRAM_PROFILES)
    lists = {
        lang: "[" + ",".join("'" + t.replace("'", "''") + "'" for t in TRIGRAM_PROFILES[lang]) + "]"
        for lang in langs
    }
    hit_cols = ",\n                     ".join(
        f"len(list_intersect(tris, {lists[lang]})) AS h_{lang}" for lang in langs
    )
    all_h = ", ".join(f"h_{lang}" for lang in langs)
    cases = []
    for i in range(len(langs) - 1, 0, -1):
        smaller = ", ".join(f"h_{l}" for l in langs[:i])
        gt = f"greatest({smaller})" if i > 1 else smaller
        cases.append(f"WHEN h_{langs[i]} > {gt} THEN '{langs[i]}'")
    case_chain = "\n                   ".join(cases)
    return f"""
            WITH t AS (
              SELECT doc_id,
                     substr(coalesce(lower({norm}), ''), 1, {LANGID_MAX_CHARS}) AS nrm,
                     ' ' || substr(coalesce(lower({norm}), ''), 1, {LANGID_MAX_CHARS}) || ' ' AS padded
              FROM documents),
            tr AS (
              SELECT doc_id, nrm,
                     list_distinct(list_transform(range(1, length(padded) - 1),
                         i -> substr(padded, i, 3))) AS tris
              FROM t),
            h AS (SELECT doc_id, nrm,
                     {hit_cols}
                  FROM tr)
            SELECT doc_id,
              CASE WHEN nrm = '' THEN 'und'
                   WHEN greatest({all_h}) < {TRIGRAM_MIN_HITS} THEN 'und'
                   {case_chain}
                   ELSE '{langs[0]}' END AS lang_pred
            FROM h
        """


def _minhash_pairs_sql(norm: str, threshold: float) -> str:
    """The md5-MinHash-LSH pair sweep as a self-contained SELECT producing
    (doc_id1, doc_id2, est) — shared by the dedup_minhash_lsh oracle and
    the dedup_clusters transitive-closure oracle."""
    return f"""
            WITH d0 AS (SELECT doc_id, substr(lower({norm}), 1, 2048) AS nt FROM documents),
            d AS (
              SELECT doc_id,
                     CASE WHEN nt = '' THEN []::VARCHAR[]
                          WHEN length(nt) <= 5 THEN [nt]
                          ELSE list_distinct(list_transform(
                               range(1, length(nt) - 5 + 2),
                               i -> substr(nt, i, 5))) END AS sh
              FROM d0),
            hh AS (
              SELECT doc_id,
                     list_transform(sh, sg ->
                       ('0x' || substr(md5(sg), 1, 7))::BIGINT) AS hs
              FROM d WHERE len(sh) > 0),
            s AS (
              SELECT doc_id,
                     list_transform(range(1, 33), j ->
                       list_min(list_transform(hs, h ->
                         ({_MH_A}[j] * h + {_MH_B}[j]) % 2147483647))) AS sig
              FROM hh),
            b AS (
              SELECT doc_id, sig,
                     unnest(list_transform(range(0, 8), bb ->
                       md5(concat(bb::VARCHAR, ':',
                         list_aggregate(list_transform(
                           list_slice(sig, bb * 4 + 1, bb * 4 + 4),
                           x -> x::VARCHAR), 'string_agg', ','))))) AS band
              FROM s),
            p AS (
              SELECT DISTINCT a.doc_id AS doc_id1, b2.doc_id AS doc_id2,
                     len(list_filter(range(1, 33), i -> a.sig[i] = b2.sig[i]))::DOUBLE
                       / 32 AS est
              FROM b a JOIN b b2 ON a.band = b2.band AND a.doc_id < b2.doc_id)
            SELECT doc_id1, doc_id2, est FROM p WHERE est >= {threshold}
    """


# gaps-and-islands replay of streaming/ingest.sessionize — shared by the
# sessionize oracle and the range_join oracle (which joins events back onto
# these sessions). Spark's session_window MERGES an event landing at exactly
# (last + gap): break only on STRICTLY greater.
_SESSIONIZE_SQL = """
            WITH m AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts)
                               > INTERVAL 17 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            s AS (
              SELECT user_id, ts, value,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM m)
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL 17 MINUTE AS session_end,
                   count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM s GROUP BY user_id, sid
        """


def _bm25_sql(norm: str, k1: float = 1.2, b: float = 0.75, k: int = 20) -> str:
    """DuckDB replay of bm25_search: identical float literals via repr (so
    both engines parse the exact same doubles) and identical operator
    associativity. N/avgdl are computed by each engine's own aggregate —
    double-precision identical for these plain sums at this scale."""
    terms = sorted({t for t in BM25_QUERY.lower().split() if t})
    in_list = ",".join(f"'{t}'" for t in terms)
    k1p1 = repr(k1 + 1.0)
    one_minus_b = repr(1.0 - b)
    return f"""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN lower({norm}) = '' THEN []::VARCHAR[]
                      ELSE str_split(lower({norm}), ' ') END AS toks
          FROM documents),
        lens AS (SELECT doc_id, len(toks) AS dl FROM d),
        g AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok
               WHERE tok IN ({in_list}) GROUP BY doc_id, tok),
        dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        sc AS (
          SELECT tf.doc_id,
                 sum(ln((g.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                     * (tf.tf * {k1p1})
                     / (tf.tf + {repr(k1)} * ({one_minus_b} + {repr(b)} * lens.dl / g.avgdl))) AS score
          FROM tf JOIN dfq USING (tok) JOIN lens USING (doc_id) CROSS JOIN g
          GROUP BY tf.doc_id),
        ranked AS (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
          FROM sc)
        SELECT doc_id, round(score, 6) AS score, rank
        FROM ranked WHERE rank <= {k}
    """


def _sample_sql() -> str:
    """DuckDB replay of sample_by_group: identical md5-60bit buckets and
    identical precomputed BIGINT thresholds (exact integer compare — no
    float-boundary drift between engines)."""
    from entity_resolution_pipeline_spark.operators.sample import threshold_for

    cases = " ".join(
        f"WHEN source = '{g}' THEN {threshold_for(r)}"
        for g, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
        SELECT doc_id, source FROM documents
        WHERE ('0x' || substr(md5('s1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              < (CASE {cases} ELSE {threshold_for(0.1)} END)
    """


def _split_sql() -> str:
    from entity_resolution_pipeline_spark.operators.sample import threshold_for

    return f"""
        SELECT doc_id,
          CASE WHEN ('0x' || substr(md5('split1|' || CAST(doc_id AS VARCHAR)),
                     1, 15))::BIGINT < {threshold_for(0.05)}
               THEN 'holdout' ELSE 'train' END AS split
        FROM documents
    """


def oracle_sql() -> dict[str, str]:
    norm = _NORM_SQL.format(c="text")
    en_list = "[" + ",".join(f"'{w}'" for w in _EN) + "]"
    lang_lists = {
        lang: "["
        + ",".join(
            f"'{w}'"
            for w in sorted(
                __import__(
                    "entity_resolution_pipeline_spark.functions.text",
                    fromlist=["STOPWORDS"],
                ).STOPWORDS[lang]
            )
        )
        + "]"
        for lang in _LANGS
    }
    hits = {
        lang: (
            f"len(list_intersect(list_distinct(str_split(lower({norm}), ' ')), {lst}))"
        )
        for lang, lst in lang_lists.items()
    }
    return {
        "p1_null_projection": """
            SELECT doc_id,
                   CASE WHEN text = '' THEN NULL ELSE text END AS text_nn,
                   CASE WHEN lang = '' THEN NULL ELSE lang END AS lang_nn,
                   n_chars
            FROM documents
        """,
        "p2_normalize_text": f"""
            SELECT doc_id, {norm} AS norm_text FROM documents
        """,
        "a1_unique_strings": f"""
            SELECT {norm} AS value, min(doc_id) AS rep_id, count(*) AS cnt
            FROM documents GROUP BY 1
        """,
        "a3_field_usage": """
            SELECT lang, source, count(*) AS cnt FROM documents GROUP BY lang, source
        """,
        "a4_field_stats": """
            SELECT source, count(*) AS total_occurrences,
                   count(DISTINCT text) AS distinct_values
            FROM documents GROUP BY source
        """,
        "a6_null_heuristic": """
            SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
            HAVING count(*) > 0.15 * (SELECT count(*) FROM documents)
        """,
        "a9_confusion": """
            WITH e AS (
              SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
                     CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS pred
              FROM embeddings)
            SELECT sum(CASE WHEN y=1 AND pred=1 THEN 1 ELSE 0 END)::BIGINT AS tp,
                   sum(CASE WHEN y=0 AND pred=1 THEN 1 ELSE 0 END)::BIGINT AS fp,
                   sum(CASE WHEN y=1 AND pred=0 THEN 1 ELSE 0 END)::BIGINT AS fn,
                   sum(CASE WHEN y=0 AND pred=0 THEN 1 ELSE 0 END)::BIGINT AS tn
            FROM e
        """,
        "a10_cluster_stats": """
            WITH sizes AS (
              SELECT o_custkey, count(*) AS size FROM orders GROUP BY o_custkey)
            SELECT count(*) AS n_clusters,
                   min(size) AS min_size,
                   max(size) AS max_size,
                   round(avg(size), 6) AS mean_size,
                   median(size) AS median_size,
                   round(stddev_pop(size), 6) AS std_size,
                   round(quantile_cont(size, 0.1), 6) AS size_q10,
                   round(quantile_cont(size, 0.25), 6) AS size_q25,
                   round(quantile_cont(size, 0.75), 6) AS size_q75,
                   round(quantile_cont(size, 0.9), 6) AS size_q90,
                   sum(CASE WHEN size = 1 THEN 1 ELSE 0 END)::BIGINT AS g_1,
                   sum(CASE WHEN size BETWEEN 2 AND 5 THEN 1 ELSE 0 END)::BIGINT AS g_2_5,
                   sum(CASE WHEN size BETWEEN 6 AND 10 THEN 1 ELSE 0 END)::BIGINT AS g_6_10,
                   sum(CASE WHEN size BETWEEN 11 AND 20 THEN 1 ELSE 0 END)::BIGINT AS g_11_20,
                   sum(CASE WHEN size BETWEEN 21 AND 50 THEN 1 ELSE 0 END)::BIGINT AS g_21_50,
                   sum(CASE WHEN size >= 51 THEN 1 ELSE 0 END)::BIGINT AS g_51_plus
            FROM sizes
        """,
        "a11_corr": """
            WITH pairs(f1, f2) AS (
              VALUES ('l_quantity', 'l_extendedprice'),
                     ('l_quantity', 'l_discount'),
                     ('l_quantity', 'l_tax'),
                     ('l_extendedprice', 'l_discount'),
                     ('l_extendedprice', 'l_tax'),
                     ('l_discount', 'l_tax')),
            stats AS (
              SELECT round(corr(l_quantity, l_extendedprice), 6) AS c_qe,
                     round(corr(l_quantity, l_discount), 6) AS c_qd,
                     round(corr(l_quantity, l_tax), 6) AS c_qt,
                     round(corr(l_extendedprice, l_discount), 6) AS c_ed,
                     round(corr(l_extendedprice, l_tax), 6) AS c_et,
                     round(corr(l_discount, l_tax), 6) AS c_dt,
                     CASE WHEN stddev_pop(l_quantity) = 0 THEN 1 ELSE 0 END AS k_q,
                     CASE WHEN stddev_pop(l_extendedprice) = 0 THEN 1 ELSE 0 END AS k_e,
                     CASE WHEN stddev_pop(l_discount) = 0 THEN 1 ELSE 0 END AS k_d,
                     CASE WHEN stddev_pop(l_tax) = 0 THEN 1 ELSE 0 END AS k_t
              FROM lineitem)
            SELECT p.f1, p.f2,
                   CASE p.f1 || '|' || p.f2
                     WHEN 'l_quantity|l_extendedprice' THEN s.c_qe
                     WHEN 'l_quantity|l_discount' THEN s.c_qd
                     WHEN 'l_quantity|l_tax' THEN s.c_qt
                     WHEN 'l_extendedprice|l_discount' THEN s.c_ed
                     WHEN 'l_extendedprice|l_tax' THEN s.c_et
                     ELSE s.c_dt END AS pearson_r,
                   CASE p.f1 WHEN 'l_quantity' THEN s.k_q
                     WHEN 'l_extendedprice' THEN s.k_e
                     WHEN 'l_discount' THEN s.k_d ELSE s.k_t END AS f1_constant,
                   CASE p.f2 WHEN 'l_quantity' THEN s.k_q
                     WHEN 'l_extendedprice' THEN s.k_e
                     WHEN 'l_discount' THEN s.k_d ELSE s.k_t END AS f2_constant
            FROM pairs p CROSS JOIN stats s
        """,
        "m6_pr_curve": """
            WITH s AS (
              SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
                     (vec_id * 37 % 21) / 20.0 AS score
              FROM embeddings),
            g AS (SELECT score, count(*) AS n, sum(y) AS pos FROM s GROUP BY score),
            c AS (
              SELECT score,
                     sum(n) OVER (ORDER BY score DESC) AS cum_n,
                     sum(pos) OVER (ORDER BY score DESC) AS cum_pos,
                     sum(pos) OVER () AS tot_pos
              FROM g)
            SELECT round(score, 6) AS threshold,
                   round(cum_pos::DOUBLE / cum_n, 6) AS prec,
                   round(cum_pos::DOUBLE / tot_pos, 6) AS rec
            FROM c
        """,
        "a11_feature_stats": """
            SELECT feature,
                   round(min_v, 6) AS min_v, round(max_v, 6) AS max_v,
                   round(mean_v, 6) AS mean_v, round(std_v, 6) AS std_v,
                   n_nan, n_null
            FROM (
              SELECT 'l_quantity' AS feature, min(l_quantity) AS min_v,
                     max(l_quantity) AS max_v, avg(l_quantity) AS mean_v,
                     stddev_pop(l_quantity) AS std_v,
                     sum(CASE WHEN isnan(l_quantity) THEN 1 ELSE 0 END)::BIGINT AS n_nan,
                     sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', min(l_extendedprice), max(l_extendedprice),
                     avg(l_extendedprice), stddev_pop(l_extendedprice),
                     sum(CASE WHEN isnan(l_extendedprice) THEN 1 ELSE 0 END)::BIGINT,
                     sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::BIGINT
              FROM lineitem
              UNION ALL
              SELECT 'l_discount', min(l_discount), max(l_discount),
                     avg(l_discount), stddev_pop(l_discount),
                     sum(CASE WHEN isnan(l_discount) THEN 1 ELSE 0 END)::BIGINT,
                     sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)::BIGINT
              FROM lineitem
              UNION ALL
              SELECT 'l_tax', min(l_tax), max(l_tax),
                     avg(l_tax), stddev_pop(l_tax),
                     sum(CASE WHEN isnan(l_tax) THEN 1 ELSE 0 END)::BIGINT,
                     sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END)::BIGINT
              FROM lineitem)
        """,
        "w1_topk_per_group": """
            SELECT o_custkey, o_orderkey, rnk FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
              FROM orders WHERE o_custkey < 200)
            WHERE rnk <= 3
        """,
        "w2_mode_value": """
            SELECT o_orderstatus, mode_priority, votes FROM (
              SELECT o_orderstatus, o_orderpriority AS mode_priority,
                     count(*) AS votes,
                     row_number() OVER (PARTITION BY o_orderstatus
                                        ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
              FROM orders GROUP BY o_orderstatus, o_orderpriority)
            WHERE rn = 1
        """,
        "w3_largest_groups": """
            SELECT n_name, count(*) AS n_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            ORDER BY n_customers DESC, n_name ASC
            LIMIT 10
        """,
        "j1_blocking_selfjoin": f"""
            WITH d AS (SELECT doc_id, substr({norm}, 1, 10) AS bkey FROM documents)
            SELECT a.bkey, a.doc_id AS doc_id1, b.doc_id AS doc_id2
            FROM d a JOIN d b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
        """,
        "j2_dim_lookup_join": """
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "so1_anti_join": """
            SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "so4_distinct_count": """
            SELECT lang, count(DISTINCT text) AS n_distinct_texts
            FROM documents GROUP BY lang
        """,
        "f3_levenshtein_pairs": """
            SELECT a.p_partkey AS p1, b.p_partkey AS p2,
                   levenshtein(a.p_name, b.p_name) AS lev_dist,
                   round(CASE WHEN greatest(length(a.p_name), length(b.p_name)) > 0
                         THEN 1.0 - levenshtein(a.p_name, b.p_name)::DOUBLE
                              / greatest(length(a.p_name), length(b.p_name))
                         ELSE 1.0 END, 6) AS lev_sim
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_size = b.p_size
             AND a.p_partkey < b.p_partkey
        """,
        "f6_interactions": """
            SELECT l_orderkey, l_linenumber,
                   round(CASE WHEN l_discount > 0 AND l_tax > 0
                         THEN 2 * l_discount * l_tax / (l_discount + l_tax)
                         ELSE 0.0 END, 6) AS harmonic,
                   round(l_discount * l_tax, 6) AS product,
                   round(least(CASE WHEN l_tax > 0 THEN l_discount / l_tax
                               ELSE 0.0 END, 10.0), 6) AS ratio_capped
            FROM lineitem
        """,
        "f9_year_extraction": """
            WITH p AS (
              SELECT p_partkey,
                     p_name || ', ' || (1500 + p_size * 3 % 380)::VARCHAR
                            || '-'  || (1540 + p_size * 3 % 380)::VARCHAR AS name_str
              FROM part)
            SELECT p_partkey,
                   regexp_extract(name_str, '(\\d{2,4})\\s*-\\s*(\\d{2,4})', 1)::INT AS birth_year,
                   regexp_extract(name_str, '(\\d{2,4})\\s*-\\s*(\\d{2,4})', 2)::INT AS death_year
            FROM p
        """,
        "f12_sigmoid_threshold": """
            SELECT l_orderkey, l_linenumber,
                   round(1.0 / (1.0 + exp(-(3.0 * l_discount - 2.0 * l_tax + 0.5))), 6) AS match_prob,
                   CASE WHEN 1.0 / (1.0 + exp(-(3.0 * l_discount - 2.0 * l_tax + 0.5))) >= 0.6
                        THEN 1 ELSE 0 END AS pred
            FROM lineitem
        """,
        "text_token_counts": f"""
            SELECT doc_id,
                   CASE WHEN {norm} = '' THEN 0
                        ELSE len(str_split({norm}, ' ')) END AS n_tokens_ws,
                   length({norm}) AS n_chars_norm,
                   len(regexp_extract_all(text, '[A-Za-z]+|\\d+|[^\\sA-Za-z\\d]'))::BIGINT
                     AS n_tokens_bpe
            FROM documents
        """,
        "text_quality": f"""
            WITH d AS (SELECT doc_id, {norm} AS nt FROM documents),
            t AS (SELECT doc_id, nt, length(nt) AS n_chars,
                         CASE WHEN nt = '' THEN [] ELSE str_split(nt, ' ') END AS toks
                  FROM d)
            SELECT doc_id, n_chars,
                   len(toks) AS n_tokens,
                   round(CASE WHEN n_chars > 0 THEN
                     (n_chars - length(regexp_replace(nt, '[^\\w\\s]', '', 'g')))::DOUBLE / n_chars
                     ELSE 0.0 END, 6) AS punct_ratio,
                   round(CASE WHEN len(toks) > 0 THEN
                     len(list_filter(toks, x -> list_contains({en_list}, lower(x))))::DOUBLE / len(toks)
                     ELSE 0.0 END, 6) AS stopword_ratio,
                   round(CASE WHEN len(toks) > 0 THEN
                     list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
                     ELSE 0.0 END, 6) AS mean_word_len
            FROM t
        """,
        "text_langid": f"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN {norm} = '' THEN 0
                          ELSE len(str_split({norm}, ' ')) END AS n_tokens,
                     {hits['de']} AS h_de, {hits['en']} AS h_en,
                     {hits['es']} AS h_es, {hits['fr']} AS h_fr
              FROM documents)
            SELECT doc_id,
              CASE WHEN n_tokens = 0 THEN 'und'
                   WHEN greatest(h_de, h_en, h_es, h_fr)::DOUBLE / n_tokens < 0.02 THEN 'und'
                   WHEN h_fr > greatest(h_de, h_en, h_es) THEN 'fr'
                   WHEN h_es > greatest(h_de, h_en) THEN 'es'
                   WHEN h_en > h_de THEN 'en'
                   ELSE 'de' END AS lang_pred
            FROM t
        """,
        "text_langid_v2": _langid_v2_sql(norm),
        "text_gopher_quality": f"""
            WITH d AS (
              SELECT doc_id, text AS raw,
                     CASE WHEN lower({norm}) = '' THEN []::VARCHAR[]
                          ELSE str_split(lower({norm}), ' ') END AS words,
                     CASE WHEN text IS NULL OR text = '' THEN []::VARCHAR[]
                          ELSE str_split(text, chr(10)) END AS lines
              FROM documents),
            base AS (
              SELECT doc_id, len(words) AS n_words_all,
                CASE WHEN len(lines) > 0 THEN
                  (len(lines) - len(list_distinct(lines)))::DOUBLE / len(lines)
                  ELSE 0 END AS frac_dup_lines,
                CASE WHEN len(lines) > 0 THEN
                  len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…'))::DOUBLE
                    / len(lines)
                  ELSE 0 END AS frac_ellipsis_lines,
                coalesce((length(raw) - length(replace(raw, '#', '')))
                  + (length(raw) - length(replace(raw, '…', '')))
                  + len(regexp_extract_all(raw, '\\.\\.\\.')), 0) AS n_symbols,
                len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS n_alpha_words
              FROM d),
            tok AS (SELECT doc_id, unnest(words) AS tok FROM d),
            tw AS (
              SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_words FROM
                (SELECT doc_id, tok, count(*) AS cnt FROM tok
                 WHERE tok <> '' GROUP BY doc_id, tok)
              GROUP BY doc_id)
            SELECT b.doc_id,
              coalesce(tw.n_words, 0)::BIGINT AS n_words,
              round(CASE WHEN coalesce(tw.n_words, 0) > 0
                    THEN tw.top_cnt::DOUBLE / tw.n_words ELSE 0 END, 6) AS top_word_frac,
              round(b.frac_dup_lines, 6) AS frac_dup_lines,
              round(b.frac_ellipsis_lines, 6) AS frac_ellipsis_lines,
              round(CASE WHEN coalesce(tw.n_words, 0) > 0
                    THEN b.n_symbols::DOUBLE / tw.n_words ELSE 0 END, 6) AS symbol_word_ratio,
              round(CASE WHEN coalesce(tw.n_words, 0) > 0
                    THEN b.n_alpha_words::DOUBLE / tw.n_words ELSE 0 END, 6) AS frac_alpha_words
            FROM base b LEFT JOIN tw USING (doc_id)
        """,
        "text_tfidf_top_terms": f"""
            WITH tok AS (
              SELECT doc_id, unnest(str_split(lower({norm}), ' ')) AS tok
              FROM documents),
            tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok
                   WHERE tok <> '' GROUP BY doc_id, tok),
            n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
            dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
            scored AS (
              SELECT tf.doc_id, tf.tok, tf.tf,
                     tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS score
              FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
            ranked AS (
              SELECT doc_id, tok, tf, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, tok ASC) AS rank
              FROM scored)
            SELECT doc_id, tok AS term, tf, round(score, 6) AS score, rank
            FROM ranked WHERE rank <= 3
        """,
        "text_bm25": _bm25_sql(norm),
        "asof_join": """
            WITH l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'purchase'),
            r AS (SELECT user_id, ts, value FROM events
                  WHERE event_type = 'click')
            SELECT l.event_id, l.user_id, l.ts,
                   round(l.value, 6) AS value,
                   round(r.value, 6) AS value_asof,
                   r.ts AS ts_asof
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "sessionize": _SESSIONIZE_SQL,
        "kmv_distinct": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     ('0x' || substr(md5(CAST(props AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM events WHERE props IS NOT NULL),
            r AS (SELECT event_type, h,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY h) AS rn
                  FROM h),
            m AS (SELECT event_type,
                         max(CASE WHEN rn = 1 THEN h END) AS h_min,
                         max(CASE WHEN rn = 64 THEN h END) AS h_kth
                  FROM r WHERE rn <= 64 GROUP BY event_type),
            c AS (SELECT event_type, count(*) AS n_seen FROM h GROUP BY event_type)
            SELECT m.event_type, m.h_min, m.h_kth, c.n_seen,
                   round(CASE WHEN c.n_seen < 64 THEN c.n_seen::DOUBLE
                         ELSE 63.0 * 1152921504606846976.0 / m.h_kth END,
                         6) AS distinct_est
            FROM m JOIN c USING (event_type)
        """,
        "time_rollup": """
            SELECT '1 hour' AS grain, date_trunc('hour', ts) AS bucket_start,
                   event_type, count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY 2, 3
            UNION ALL
            SELECT '1 day', date_trunc('day', ts), event_type, count(*),
                   round(sum(value), 6)
            FROM events GROUP BY 2, 3
        """,
        "range_join": f"""
            WITH sess AS ({_SESSIONIZE_SQL})
            SELECT e.event_id, e.user_id, e.ts,
                   sess.session_start, sess.session_end
            FROM events e JOIN sess
              ON e.user_id = sess.user_id
             AND e.ts >= sess.session_start AND e.ts < sess.session_end
        """,
        "text_decontaminate": f"""
            WITH d0 AS (SELECT doc_id, {norm} AS nt FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN length(nt) = 0 THEN []::VARCHAR[]
                          WHEN length(nt) <= 8 THEN [nt]
                          ELSE list_transform(range(1, length(nt) - 8 + 2),
                               i -> substr(nt, i, 8)) END AS grams
              FROM d0),
            h AS (
              SELECT doc_id, list_transform(grams, gg ->
                       ('0x' || substr(md5(gg), 1, 15))::BIGINT) AS hs
              FROM g),
            w AS (
              SELECT doc_id,
                     CASE WHEN len(hs) = 0 THEN []::BIGINT[]
                          WHEN len(hs) <= 8 THEN [list_min(hs)]
                          ELSE list_transform(range(1, len(hs) - 8 + 2),
                               j -> list_min(list_slice(hs, j, j + 7))) END AS wmins
              FROM h),
            fps AS (SELECT doc_id, unnest(list_distinct(wmins)) AS fp FROM w),
            ef AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 20 = 0),
            hits AS (SELECT doc_id, count(DISTINCT fp) AS n_shared_fps
                     FROM fps JOIN ef USING (fp) GROUP BY doc_id)
            SELECT d0.doc_id,
                   coalesce(hits.n_shared_fps, 0) AS n_shared_fps,
                   coalesce(hits.n_shared_fps, 0) >= 1 AS contaminated
            FROM d0 LEFT JOIN hits USING (doc_id)
        """,
        "text_redact_pii": """
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
                '\\b\\d{9,}\\b', '<ID>', 'g') AS clean_text,
              len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
              len(regexp_extract_all(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b'))::BIGINT AS n_ips,
              len(regexp_extract_all(regexp_replace(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
                '\\b\\d{9,}\\b'))::BIGINT AS n_longnums
            FROM documents
        """,
        "sample_stratified": f"""
            SELECT s.doc_id, s.source, sp.split
            FROM ({_sample_sql()}) s JOIN ({_split_sql()}) sp USING (doc_id)
        """,
        "stream_windowed_counts": """
            SELECT date_trunc('hour', ts) AS window_start,
                   date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
                   event_type, count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "stream_dedup_batch": r"""
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY trim(regexp_replace(text, '\s+', ' ', 'g'))
                       ORDER BY doc_id) AS rn
              FROM documents) WHERE rn = 1
        """,
        "dedup_exact": f"""
            WITH k AS (SELECT doc_id, {norm} AS nt FROM documents),
            g AS (SELECT nt, min(doc_id) AS keep_id, count(*) AS group_size
                  FROM k GROUP BY nt)
            SELECT k.doc_id, g.keep_id, g.group_size
            FROM k JOIN g ON k.nt = g.nt
        """,
        "dedup_ngram_jaccard": f"""
            WITH d AS (
              SELECT doc_id, list_distinct(str_split(lower({norm}), ' ')) AS toks
              FROM documents
              WHERE lower({norm}) <> ''),
            t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
            t2 AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
            tdf_all AS (SELECT tok, count(*) AS dfreq FROM t2 GROUP BY tok),
            tdf AS (SELECT tok, dfreq FROM tdf_all WHERE dfreq <= 64),
            r AS (
              SELECT t2.doc_id, t2.tok,
                     row_number() OVER (PARTITION BY t2.doc_id
                                        ORDER BY tdf.dfreq, t2.tok) AS rn
              FROM t2 JOIN tdf USING (tok)),
            bk AS (SELECT doc_id, tok AS bkey FROM r WHERE rn <= 2),
            -- anchor-less fallback: min-df token + doc_id-neighbor cap (8)
            anchorless AS (
              SELECT doc_id FROM d
              WHERE doc_id NOT IN (SELECT doc_id FROM bk)),
            fbr AS (
              SELECT t2.doc_id, t2.tok,
                     row_number() OVER (PARTITION BY t2.doc_id
                                        ORDER BY tdf_all.dfreq, t2.tok) AS rn
              FROM t2 JOIN tdf_all USING (tok)
              WHERE t2.doc_id IN (SELECT doc_id FROM anchorless)),
            fbk AS (SELECT doc_id, tok AS bkey FROM fbr WHERE rn = 1),
            -- oversized fallback blocks are pre-split by a deterministic
            -- doc_id salt (blocks > 256 docs), mirroring the Spark side's
            -- bounded per-task sort
            fbs AS (SELECT bkey, count(*) AS bsz FROM fbk GROUP BY bkey),
            fbsalt AS (
              SELECT fbk.doc_id, fbk.bkey,
                     ('0x' || substr(md5(CAST(fbk.doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % greatest(1, cast(ceil(fbs.bsz / 256.0) AS INT)) AS salt
              FROM fbk JOIN fbs USING (bkey)),
            fbn AS (SELECT doc_id, bkey, salt,
                           row_number() OVER (PARTITION BY bkey, salt
                                              ORDER BY doc_id) AS brn
                    FROM fbsalt),
            cand AS (
              SELECT DISTINCT doc_id1, doc_id2 FROM (
                SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2
                FROM bk a JOIN bk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
                UNION ALL
                SELECT f1.doc_id AS doc_id1, f2.doc_id AS doc_id2
                FROM fbn f1 JOIN fbn f2 ON f1.bkey = f2.bkey
                  AND f1.salt = f2.salt
                  AND f2.brn > f1.brn AND f2.brn <= f1.brn + 8)),
            p AS (
              SELECT doc_id1, doc_id2,
                     len(list_intersect(da.toks, db.toks))::DOUBLE
                       / len(list_distinct(list_concat(da.toks, db.toks))) AS j
              FROM cand
              JOIN d da ON da.doc_id = cand.doc_id1
              JOIN d db ON db.doc_id = cand.doc_id2)
            SELECT doc_id1, doc_id2, round(j, 6) AS jaccard
            FROM p WHERE j >= 0.5
        """,
        "dedup_embedding": f"""
            WITH e0 AS (
              SELECT vec_id, embedding,
                     label::VARCHAR || '|' || (vec_id % 10)::VARCHAR AS blk,
                     sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x))) AS nrm
              FROM embeddings),
            p0 AS (
              SELECT a.vec_id AS doc_id1, b.vec_id AS doc_id2,
                     list_sum(list_transform(list_zip(a.embedding, b.embedding),
                              z -> z[1]::DOUBLE * z[2])) / (a.nrm * b.nrm) AS c
              FROM e0 a JOIN e0 b ON a.blk = b.blk AND a.vec_id < b.vec_id
              WHERE a.nrm > 0 AND b.nrm > 0),
            blocked AS (
              SELECT 'blocked' AS method, doc_id1, doc_id2, round(c, 4) AS cosine
              FROM p0 WHERE c >= 0.2),
            e AS (
              SELECT vec_id, embedding,
                     sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x))) AS nrm
              FROM embeddings),
            planes(p) AS (SELECT {_hyperplanes_sql(16, 64, 42)}),
            bits AS (
              SELECT e.vec_id,
                     list_transform(range(1, 17), j ->
                       CASE WHEN list_sum(list_transform(
                              list_zip(e.embedding, p[j]),
                              z -> z[1]::DOUBLE * z[2])) >= 0
                            THEN '1' ELSE '0' END) AS bt
              FROM e CROSS JOIN planes),
            bb AS (
              SELECT vec_id,
                     unnest(list_transform(range(0, 4), b ->
                       md5(concat(b::VARCHAR, ':',
                         list_aggregate(list_slice(bt, b * 4 + 1, b * 4 + 4),
                                        'string_agg', ''))))) AS band
              FROM bits),
            cand AS (
              SELECT DISTINCT a.vec_id AS doc_id1, b2.vec_id AS doc_id2
              FROM bb a JOIN bb b2 ON a.band = b2.band AND a.vec_id < b2.vec_id),
            p2 AS (
              SELECT doc_id1, doc_id2,
                     list_sum(list_transform(list_zip(e1.embedding, e2.embedding),
                              z -> z[1]::DOUBLE * z[2])) / (e1.nrm * e2.nrm) AS c
              FROM cand
              JOIN e e1 ON e1.vec_id = cand.doc_id1
              JOIN e e2 ON e2.vec_id = cand.doc_id2
              WHERE e1.nrm > 0 AND e2.nrm > 0)
            SELECT * FROM blocked
            UNION ALL
            SELECT 'lsh' AS method, doc_id1, doc_id2, round(c, 4) AS cosine
            FROM p2 WHERE c >= 0.3
        """,
        "ann_bruteforce_topk": """
            WITH e AS (
              SELECT vec_id, embedding,
                     sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x))) AS nrm
              FROM embeddings),
            q AS (SELECT * FROM e WHERE vec_id < 5),
            s AS (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     list_sum(list_transform(list_zip(q.embedding, e.embedding),
                              z -> z[1]::DOUBLE * z[2])) / (q.nrm * e.nrm) AS c
              FROM q JOIN e ON q.vec_id <> e.vec_id
              WHERE q.nrm > 0 AND e.nrm > 0),
            r AS (
              SELECT query_id, neighbor_id, c,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY c DESC, neighbor_id ASC) AS rank
              FROM s)
            SELECT query_id, neighbor_id, round(c, 4) AS cosine, rank
            FROM r WHERE rank <= 10
        """,
        "cc_components": """
            WITH m AS (
              SELECT doc_id, (doc_id // 5) * 5 AS bucket FROM documents),
            counts AS (
              SELECT bucket, count(*) AS n,
                     count(CASE WHEN doc_id <> bucket THEN 1 END) AS n_nonhub,
                     min(doc_id) AS mn
              FROM m GROUP BY bucket),
            nodes AS (
              -- CC sees hub ids as nodes even when absent from the table;
              -- every doc contributes itself plus its bucket hub
              SELECT DISTINCT doc_id AS node, bucket FROM m WHERE doc_id <> bucket
              UNION
              SELECT DISTINCT bucket AS node, bucket FROM m WHERE doc_id <> bucket)
            SELECT n.node, least(c.mn, n.bucket) AS component
            FROM nodes n JOIN counts c ON n.bucket = c.bucket
        """,
        "multimodal_mime": """
            SELECT doc_id AS id,
                   CASE
                     WHEN doc_id % 3 = 0 THEN 'image/png'
                     WHEN doc_id % 3 = 1 THEN 'image/jpeg'
                     WHEN lower(text) LIKE '<html%' OR lower(text) LIKE '<!doc%' THEN 'text/html'
                     WHEN lower(text) LIKE 'gif8%' THEN 'image/gif'
                     WHEN lower(text) LIKE 'riff%' THEN 'audio/wav'
                     WHEN lower(text) LIKE 'id3%' THEN 'audio/mp3'
                     ELSE 'application/octet-stream'
                   END AS mime,
                   octet_length(encode(text))
                     + CASE WHEN doc_id % 3 = 0 THEN 4
                            WHEN doc_id % 3 = 1 THEN 3 ELSE 0 END AS n_bytes
            FROM documents
        """,
        # md5-rebased sketches: DuckDB replays the identical sketch via the
        # shared 60-bit md5 primitive ('0x'||substr(md5(x),1,15))::BIGINT
        "dedup_minhash_lsh": f"""
            SELECT doc_id1, doc_id2, round(est, 6) AS est_jaccard
            FROM ({_minhash_pairs_sql(norm, 0.5)})
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE
            -- MATERIALIZED is load-bearing: without it DuckDB re-inlines the
            -- full MinHash sweep into every recursion step of `reach`
            pairs AS MATERIALIZED ({_minhash_pairs_sql(norm, 0.5)}),
            edges AS MATERIALIZED (
              SELECT doc_id1 AS a, doc_id2 AS b FROM pairs
              UNION ALL
              SELECT doc_id2, doc_id1 FROM pairs),
            reach(node, r) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node),
            lab AS (SELECT node AS doc_id, min(r) AS keep_id
                    FROM reach GROUP BY node)
            SELECT l.doc_id, l.keep_id, c.cluster_size
            FROM lab l JOIN (SELECT keep_id, count(*) AS cluster_size
                             FROM lab GROUP BY keep_id) c USING (keep_id)
        """,
        "dedup_simhash": f"""
            WITH d0 AS (SELECT doc_id, lower({norm}) AS nt FROM documents),
            d AS (
              SELECT doc_id,
                     CASE WHEN nt = '' THEN []::BIGINT[]
                          ELSE list_transform(str_split(nt, ' '), s ->
                               ('0x' || substr(md5(s), 1, 15))::BIGINT) END AS hs
              FROM d0),
            s AS (
              SELECT doc_id,
                     list_sum(list_transform(range(0, 60), i ->
                       CASE WHEN 2 * len(list_filter(hs, h -> (h >> i) & 1 = 1)) > len(hs)
                            THEN (1::BIGINT << i) ELSE 0::BIGINT END))::BIGINT AS simhash
              FROM d),
            b AS (
              SELECT doc_id, simhash,
                     unnest(list_transform(range(0, 4), bb ->
                       bb * 32768 + ((simhash >> (15 * bb)) & 32767))) AS band
              FROM s),
            p AS (
              SELECT DISTINCT a.doc_id AS doc_id1, b2.doc_id AS doc_id2,
                     bit_count(xor(a.simhash, b2.simhash))::INT AS hamming
              FROM b a JOIN b b2 ON a.band = b2.band AND a.doc_id < b2.doc_id)
            SELECT doc_id1, doc_id2, hamming FROM p WHERE hamming <= 12
        """,
        "text_fingerprints": f"""
            WITH d0 AS (SELECT doc_id, {norm} AS nt FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN length(nt) = 0 THEN []::VARCHAR[]
                          WHEN length(nt) <= 8 THEN [nt]
                          ELSE list_transform(range(1, length(nt) - 8 + 2),
                               i -> substr(nt, i, 8)) END AS grams
              FROM d0),
            h AS (
              SELECT doc_id, list_transform(grams, gg ->
                       ('0x' || substr(md5(gg), 1, 15))::BIGINT) AS hs
              FROM g),
            w AS (
              SELECT doc_id, hs,
                     CASE WHEN len(hs) = 0 THEN []::BIGINT[]
                          WHEN len(hs) <= 8 THEN [list_min(hs)]
                          ELSE list_transform(range(1, len(hs) - 8 + 2),
                               j -> list_min(list_slice(hs, j, j + 7))) END AS wmins
              FROM h)
            SELECT doc_id, list_min(hs) AS fingerprint,
                   len(list_distinct(wmins))::BIGINT AS n_winnowed
            FROM w
        """,
        "ann_ivf_topk": """
            WITH e AS (
              SELECT vec_id, embedding,
                     sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x))) AS nrm
              FROM embeddings),
            en AS (SELECT * FROM e WHERE nrm > 0),
            c0 AS (
              SELECT vec_id AS cid, embedding AS cv, nrm AS cn0,
                     md5(vec_id::VARCHAR) AS h
              FROM en ORDER BY h, cid LIMIT 8),
            c AS (SELECT cv, cn0, row_number() OVER (ORDER BY h, cid) AS cidx FROM c0),
            asg0 AS (
              SELECT en.vec_id, c.cidx AS cell,
                     list_sum(list_transform(list_zip(en.embedding, c.cv),
                              z -> z[1]::DOUBLE * z[2])) / (en.nrm * c.cn0) AS csim
              FROM en CROSS JOIN c),
            asg AS (
              SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY csim DESC, cell ASC) AS rn
                FROM asg0) WHERE rn = 1),
            cc AS (
              SELECT en.vec_id AS neighbor_id, en.embedding AS cv, en.nrm AS cn, asg.cell
              FROM en JOIN asg USING (vec_id)),
            q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
                  FROM en WHERE vec_id < 5),
            qp0 AS (
              SELECT q.query_id, c.cidx AS cell,
                     list_sum(list_transform(list_zip(q.qv, c.cv),
                              z -> z[1]::DOUBLE * z[2])) / (q.qn * c.cn0) AS csim
              FROM q CROSS JOIN c),
            qp AS (
              SELECT query_id, cell FROM (
                SELECT query_id, cell,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY csim DESC, cell ASC) AS rn
                FROM qp0) WHERE rn <= 4),
            cand AS (
              SELECT q.query_id, cc.neighbor_id,
                     list_sum(list_transform(list_zip(q.qv, cc.cv),
                              z -> z[1]::DOUBLE * z[2])) / (q.qn * cc.cn) AS cs
              FROM qp JOIN q USING (query_id) JOIN cc USING (cell)
              WHERE q.query_id <> cc.neighbor_id),
            r AS (
              SELECT query_id, neighbor_id, cs,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cs DESC, neighbor_id ASC) AS rank
              FROM cand)
            SELECT query_id, neighbor_id, round(cs, 4) AS cosine, rank
            FROM r WHERE rank <= 10
        """,
    }
