"""Profile the blocking+pairs stage (bench.py's blocking_pairs_s) split by
sub-stage, at the bench's sf0.1-equivalent synthetic corpus (4000 entities).

Usage: PB_BANDS=8 PB_PERM=32 python tools/profile_blocking.py [n_entities]
(band/perm config via env vars only; defaults = the package defaults)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    from entity_resolution_pipeline_spark.operators.blocking import (
        DEFAULT_BANDS,
        DEFAULT_NUM_PERM,
    )

    bands = int(os.environ.get("PB_BANDS", str(DEFAULT_BANDS)))
    perm = int(os.environ.get("PB_PERM", str(DEFAULT_NUM_PERM)))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from entity_resolution_pipeline_spark.operators import blocking as B
    from entity_resolution_pipeline_spark.operators import pairs as P
    from entity_resolution_pipeline_spark.operators.preprocess import preprocess_records
    from entity_resolution_pipeline_spark.sources.webpages import web_pages_df

    wp = web_pages_df(spark, n_entities)
    records = preprocess_records(wp)
    records.persist()
    n = records.count()
    print(f"pages={n}", flush=True)

    out_dir = "/tmp/pb_pairs"
    for rep in range(2):
        t_all = time.time()
        t0 = time.time()
        keys = B.all_blocking_keys(records, num_perm=perm, bands=bands).persist()
        nk = keys.count()
        t_keys = time.time() - t0

        t0 = time.time()
        pairs, oversized = B.candidate_pairs(keys, max_block_size=64)
        pairs = pairs.persist()
        np_ = pairs.count()
        t_pairs = time.time() - t0

        t0 = time.time()
        pf = P.with_pair_key(P.attach_pair_fields(pairs, records))
        pf.write.mode("overwrite").parquet(out_dir)
        t_attach = time.time() - t0
        t_total = time.time() - t_all
        print(
            f"rep{rep} bands={bands} perm={perm}: keys={t_keys:.2f}s (n={nk}) "
            f"pairs={t_pairs:.2f}s (n={np_}) attach+write={t_attach:.2f}s "
            f"TOTAL={t_total:.2f}s",
            flush=True,
        )
        keys.unpersist()
        pairs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
