"""Physical-plan shape assertions (.explain audits as regression tests).

The north_rule grades 100 TB plan quality, not just values: filters must
reach the parquet scan, small dims must broadcast, scalar pipelines must be
whole-stage-codegen'd, and shuffle keys must be the 8-byte hashes — these
tests pin each property so a refactor can't silently regress the plan.
"""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def _plan(df, mode="formatted") -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_filter_and_projection_pushdown(spark):
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("doc_id") < 10)
        .select("doc_id", "lang")
    )
    plan = _plan(d)
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan
    # column pruning: the scan must read only the two projected columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema, "scan reads pruned column"


def test_dim_join_broadcasts(spark):
    import __spark_entry__ as em

    plan = _plan(em.queries()["w3_largest_groups"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_scalar_pipeline_whole_stage_codegen(spark):
    import __spark_entry__ as em

    plan = _plan(em.queries()["f6_interactions"](spark, SF))
    # formatted mode marks whole-stage-codegen operators with a codegen id
    assert "[codegen id :" in plan


def test_blocking_selfjoin_uses_hashed_key(spark):
    """The candidate-pair self-join must shuffle on xxhash64(key), not the
    long key string (8-byte shuffle keys)."""
    from entity_resolution_pipeline_spark.operators.blocking import candidate_pairs

    keys = spark.createDataFrame([("u1", "k1"), ("u2", "k1")], "url string, key string")
    pairs, _ = candidate_pairs(keys, max_block_size=10)
    assert "xxhash64" in _plan(pairs)


def test_exact_dedup_shuffles_hash_not_text(spark):
    from entity_resolution_pipeline_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(exact_dedup(docs))
    # round 3: the shuffle key is the FULL 128-bit md5 (16-byte binary),
    # not a 64-bit hash whose birthday collisions would merge distinct
    # docs at trillion-doc scale — and never the document text itself
    assert "unhex(md5(" in plan
    # the aggregate's exchange partitions on tkey (the 16-byte hash)
    assert "hashpartitioning(tkey" in plan


def test_score_arrow_is_single_pass_no_shuffle(spark):
    """The arrow scoring strategy must add NO exchange beyond its input:
    one ArrowEvalPython/mapInPandas over the pair rows."""
    import json

    from entity_resolution_pipeline_spark.operators import pairs as P
    from entity_resolution_pipeline_spark.operators.classify import LRModel
    import numpy as np

    model = LRModel(
        weights=np.zeros(18), intercept=0.0, means=np.zeros(18),
        stds=np.ones(18), feature_names=list(P.FEATURE_NAMES),
    ).to_dict()
    rows = [tuple(["pk"] + ["s"] * 10 + [False] * 5 + [0.5, False])]
    schema = ("pair_key string, " + ", ".join(
        c + (" double" if c == "person_lev" else
             " boolean" if c.endswith(("_eq", "pf_false")) else " string")
        for c in P.PAIR_SIDE_COLS))
    df = spark.createDataFrame(rows, schema)
    plan = _plan(P.score(df, model, strategy="arrow"), mode="simple")
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_fused_blocking_keys_single_python_stage(spark):
    """all_blocking_keys must run exactly ONE Python (Arrow) evaluation for
    the name+LSH families — the fused kernel — with host keys staying
    JVM-side; a refactor that splits them back into two kernel passes
    doubles the record serialization at 100 TB."""
    from entity_resolution_pipeline_spark.operators.blocking import (
        all_blocking_keys,
    )

    records = spark.createDataFrame(
        [(f"http://h{i}.com/p", f"Smith, John {i}", f"john smith {i} text")
         for i in range(20)],
        "url string, person string, composite string",
    )
    plan = _plan(all_blocking_keys(records), mode="simple")
    n_python = plan.count("MapInPandas")
    assert n_python == 1, plan


def test_candidate_pairs_reuses_sized_cache(spark):
    """With caller-owned caching, the self-join sides and the hot branch
    must read the SAME InMemoryRelation of size-annotated key rows — not
    re-run the count window per consumer."""
    from entity_resolution_pipeline_spark.operators.blocking import (
        candidate_pairs,
    )

    keys = spark.createDataFrame(
        [(f"u{i}", "k1") for i in range(5)] + [(f"u{i}", f"s{i}") for i in range(5)],
        "url string, key string",
    )
    handles = []
    pairs, oversized = candidate_pairs(keys, max_block_size=64,
                                       cache_handles=handles)
    plan = _plan(pairs, mode="simple")
    assert "InMemoryTableScan" in plan, plan
    # stateless default: once the caller releases its handles, a fresh
    # call must NOT leave (or pick up) any cached relation — Spark's
    # CacheManager would otherwise substitute a still-registered
    # fragment into the logically-identical new plan
    for h in handles:
        h.unpersist()
    pairs2, _ = candidate_pairs(keys, max_block_size=64)
    assert "InMemoryTableScan" not in _plan(pairs2, mode="simple")
