"""Per-round benchmark harness.

Prints ONE JSON line:
    {"metric": "candidate_pairs_scored_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ..., "er": {...},
     "scaling": {...local[8] vs local[32]...}}

Phases:
1. operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR (default
   sf0.1) on local[$SPARK_GRAFT_CPUS] — per-query wall seconds (noop write =
   full materialization).
2. ER pipeline bench on the synthetic web-pages corpus: preprocess ->
   blocking -> pairs once, then time the scoring stage; headline value =
   candidate-pairs-scored/sec.
3. scaling evidence (north_rule): the same scoring job at local[8] vs
   local[32] in fresh subprocesses (separate JVMs) over the same materialized
   pair-fields parquet; efficiency = thr_32 / (4 * thr_8).

Usage: python bench.py            # full run, one JSON line on stdout
       python bench.py --scale-worker <cores> <pairs_dir> <model_json>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    "a1_unique_strings",
    "a10_cluster_stats",
    "w1_topk_per_group",
    "j1_blocking_selfjoin",
    "j2_dim_lookup_join",
    "f3_levenshtein_pairs",
    "f6_interactions",
    "f12_sigmoid_threshold",
    "text_quality",
    "text_langid",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "cc_components",
]

N_ENTITIES = int(os.environ.get("SPARK_GRAFT_ER_ENTITIES", "3000"))
SCALE_ENTITIES = int(os.environ.get("SPARK_GRAFT_SCALE_ENTITIES", "2000"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_queries(spark, sf_dir):
    import __spark_entry__ as em

    qs = em.queries()
    out = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _noop(qs[name](spark, sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def build_pair_fields(spark, n_entities, out_dir):
    """records + blocking + candidate pairs + attached fields -> parquet."""
    from pyspark.sql import functions as F  # noqa: N812

    from entity_resolution_pipeline_spark.operators import blocking as B  # noqa: N812
    from entity_resolution_pipeline_spark.operators import pairs as P  # noqa: N812
    from entity_resolution_pipeline_spark.operators.preprocess import preprocess_records
    from entity_resolution_pipeline_spark.sources.webpages import web_pages_df

    timings = {}
    t0 = time.time()
    wp = web_pages_df(spark, n_entities)
    records = preprocess_records(wp)
    records.persist()
    n_pages = records.count()
    timings["preprocess_s"] = round(time.time() - t0, 3)

    t0 = time.time()
    keys = B.all_blocking_keys(records)
    pairs, oversized = B.candidate_pairs(keys, max_block_size=64)
    pair_fields = P.with_pair_key(P.attach_pair_fields(pairs, records))
    pair_fields.write.mode("overwrite").parquet(out_dir)
    timings["blocking_pairs_s"] = round(time.time() - t0, 3)
    n_over = oversized.count()
    records.unpersist()
    return n_pages, timings, n_over


def train_model(spark, n_entities, records=None):
    from entity_resolution_pipeline_spark.plans.pipeline import ERPipeline
    from entity_resolution_pipeline_spark.operators.preprocess import preprocess_records
    from entity_resolution_pipeline_spark.sources.webpages import (
        labeled_pairs_pdf,
        web_pages_df,
    )

    import tempfile

    wh = tempfile.mkdtemp(prefix="bench_wh_")
    pipe = ERPipeline(spark, wh)
    n_lab = min(600, n_entities)
    recs = records if records is not None else preprocess_records(web_pages_df(spark, n_lab))
    lp = spark.createDataFrame(labeled_pairs_pdf(n_lab, 1500))
    model = pipe.train(recs, lp)
    return model


def score_job(spark, pairs_dir, model_dict):
    """Time the scoring stage over the materialized pair-fields parquet."""
    from entity_resolution_pipeline_spark.operators import pairs as P  # noqa: N812

    pf = spark.read.parquet(pairs_dir)
    n_pairs = pf.count()
    distinct_tuples = pf.select("pair_key", *P.PAIR_SIDE_COLS).dropDuplicates(["pair_key"])
    t0 = time.time()
    scored = P.score(distinct_tuples, model_dict)
    joined = pf.select("url1", "url2", "pair_key").join(scored, "pair_key")
    _noop(joined)
    wall = time.time() - t0
    return n_pairs, wall


def scale_worker(cores, pairs_dir, model_path):
    from entity_resolution_pipeline_spark.session import build_spark

    spark = build_spark(
        app_name=f"bench-scale-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=int(cores) * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    with open(model_path) as f:
        model_dict = json.load(f)
    # warm-up (JVM/Arrow init) on a slice, then measured run
    n_pairs, _ = score_job(spark, pairs_dir, model_dict)
    n_pairs, wall = score_job(spark, pairs_dir, model_dict)
    print(json.dumps({"cores": int(cores), "pairs": int(n_pairs), "wall_s": wall}))
    spark.stop()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-worker":
        scale_worker(sys.argv[2], sys.argv[3], sys.argv[4])
        return

    from entity_resolution_pipeline_spark.session import build_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    queries = run_queries(spark, sf_dir)

    # --- ER scoring throughput (headline) ---
    import tempfile

    pairs_dir = os.path.join(tempfile.mkdtemp(prefix="bench_pairs_"), "pair_fields")
    n_pages, er_timings, n_over = build_pair_fields(spark, N_ENTITIES, pairs_dir)
    model = train_model(spark, N_ENTITIES)
    model_path = os.path.join(os.path.dirname(pairs_dir), "model.json")
    with open(model_path, "w") as f:
        json.dump(model.to_dict(), f)

    n_pairs, score_wall = score_job(spark, pairs_dir, model.to_dict())
    headline = n_pairs / score_wall if score_wall > 0 else 0.0
    er = {
        "n_entities": N_ENTITIES,
        "n_pages": int(n_pages),
        "candidate_pairs": int(n_pairs),
        "score_wall_s": round(score_wall, 3),
        "oversized_blocks": int(n_over),
        **er_timings,
    }
    spark.stop()

    # --- scaling: fresh JVMs at local[8] and local[32] ---
    scaling = {}
    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        results = {}
        for cores in (8, 32):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-worker",
                 str(cores), pairs_dir, model_path],
                capture_output=True, text=True, timeout=1800,
                env={**os.environ, "PYTHONPATH": REPO},
            )
            line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
            results[cores] = json.loads(line)
        thr8 = results[8]["pairs"] / results[8]["wall_s"]
        thr32 = results[32]["pairs"] / results[32]["wall_s"]
        scaling = {
            "pairs": results[8]["pairs"],
            "wall_s_local8": round(results[8]["wall_s"], 3),
            "wall_s_local32": round(results[32]["wall_s"], 3),
            "pairs_per_sec_local8": round(thr8, 1),
            "pairs_per_sec_local32": round(thr32, 1),
            "efficiency_8_to_32": round(thr32 / (4 * thr8), 4),
        }

    print(json.dumps({
        "metric": "candidate_pairs_scored_per_sec",
        "value": round(headline, 1),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "er": er,
        "scaling": scaling,
    }))


if __name__ == "__main__":
    main()
