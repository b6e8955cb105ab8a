"""A/B blocking LSH fan-out: (perm=64,bands=16) vs (perm=32,bands=8).

Measures e2e F1 (blocked + all) at two corpus scales plus the blocking
wall at bench scale (4000 entities).
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from entity_resolution_pipeline_spark.plans.pipeline import ERConfig, ERPipeline
    from entity_resolution_pipeline_spark.sources.webpages import (
        labeled_pairs_pdf,
        web_pages_df,
    )

    for n_ent, n_pairs in [(200, 800), (1000, 3000)]:
        for perm, bands in [(64, 16), (32, 8)]:
            wh = tempfile.mkdtemp(prefix=f"ab_{perm}_{bands}_")
            wp = web_pages_df(spark, n_ent)
            lp = spark.createDataFrame(labeled_pairs_pdf(n_ent, n_pairs))
            cfg = ERConfig(lsh_num_perm=perm, lsh_bands=bands)
            pipe = ERPipeline(spark, wh, cfg)
            t0 = time.time()
            result = pipe.run(wp, lp)
            wall = time.time() - t0
            ev = result["evaluation"]
            print(
                f"n_ent={n_ent} perm={perm} bands={bands}: "
                f"blocked F1={ev['blocked_pairs']['f1']:.4f} "
                f"P={ev['blocked_pairs']['precision']:.4f} "
                f"R={ev['blocked_pairs']['recall']:.4f} | "
                f"all F1={ev['all_pairs']['f1']:.4f} "
                f"R={ev['all_pairs']['recall']:.4f} "
                f"pairs={result.get('candidate_pairs')} wall={wall:.1f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
