"""Full ER DAG at Nx bench scale — the scale-up regression probe.

Usage: python tools/scale_smoke.py [n_entities]
  (default 20000 -> ~100k pages = 5x bench; 40000 -> ~200k pages = 10x)

Runs the complete pipeline (preprocess -> blocking -> pairs -> score ->
edges -> cluster -> evaluate) on the deterministic synthetic corpus and
prints one JSON line with total AND per-stage walls (from the checkpoint
manifest), pair counts, and the blocked-pairs F1 — the same gate the
driver checks, at Nx the bench corpus. The stage split is the evidence
trail for "the wall grows with the data, not superlinearly in one stage".
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_resolution_pipeline_spark.session import build_spark
from entity_resolution_pipeline_spark.plans.pipeline import ERConfig, ERPipeline
from entity_resolution_pipeline_spark.sources.webpages import (
    labeled_pairs_pdf,
    web_pages_df,
)


def main():
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    wh = tempfile.mkdtemp(prefix="smoke_wh_")
    spark = build_spark(app_name="scale-smoke", master="local[32]",
                        shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    wp = web_pages_df(spark, n_entities)
    lp = spark.createDataFrame(labeled_pairs_pdf(n_entities, 4000))
    t0 = time.time()
    pipe = ERPipeline(spark, wh, ERConfig())
    res = pipe.run(wp, lp)
    wall = time.time() - t0
    ev = res["evaluation"]["blocked_pairs"]
    # per-stage walls from the manifest (max wall_ms per stage = the
    # stage's driver-side build+write time; partition rows share it)
    from pyspark.sql import functions as F  # noqa: N812

    stage_walls = {
        r["stage"]: round(r["w"] / 1000.0, 1)
        for r in pipe.manifest.read()
        .where(F.col("status") == "ok")
        .groupBy("stage").agg(F.max("wall_ms").alias("w"))
        .collect()
    }
    print(json.dumps({
        "n_entities": n_entities,
        "n_pages": res["n_pages"],
        "candidate_pairs": res["candidate_pairs"],
        "n_clusters": res["n_clusters"],
        "blocked_f1": round(ev["f1"], 4),
        "blocked_precision": round(ev["precision"], 4),
        "total_wall_s": round(wall, 1),
        "score_wall_s": round(pipe.metrics.get("score_wall_s", -1), 1),
        "score_dup_ratio": pipe.metrics.get("score_dup_ratio"),
        "oversized_blocks": pipe.metrics.get("oversized_blocks_count"),
        "stage_walls_s": stage_walls,
    }))
    shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
