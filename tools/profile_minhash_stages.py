"""In-Spark sub-stage isolation of dedup_minhash_lsh (guide §1.4).

Times, with the noop sink and labeled jobs:
  1. raw scan + repartition of (doc_id, text)
  2. minhash_signatures
  3. + band explode
  4. + bucket groupBy (collect_list) + size filter
  5. + verify kernel (pairs)
  6. full query (+ final groupBy min)

Usage: python tools/profile_minhash_stages.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402,N812

from entity_resolution_pipeline_spark.session import build_spark  # noqa: E402
from entity_resolution_pipeline_spark.operators import dedup as dd  # noqa: E402
from entity_resolution_pipeline_spark.operators.util import ensure_parallelism  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/data/sf1b"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        app_name="minhash-iso", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timeit(name, mk):
        walls = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            noop(mk())
            walls.append(round(time.time() - t0, 3))
        print(f"{name:34s} min={min(walls):7.3f} walls={walls}", flush=True)

    # warm workers
    noop(dd.minhash_signatures(docs))

    timeit("scan+spread", lambda: ensure_parallelism(docs.select("doc_id", "text")))
    timeit("signatures", lambda: dd.minhash_signatures(docs))

    num_perm, bands = 32, 8

    def banded():
        sb = dd._minhash_sig_bands(docs, "text", num_perm, bands, 5)
        return sb.select("doc_id", "sig", F.explode("bands").alias("band"))

    timeit("sig+banding (fused)", banded)

    def buckets():
        return (
            banded()
            .groupBy("band")
            .agg(F.collect_list(F.struct("doc_id", "sig")).alias("ms"))
            .where((F.size("ms") >= 2) & (F.size("ms") <= 128 * 1024))
        )

    timeit("sig+band+bucketagg", buckets)
    timeit("full pairs (verify)", lambda: dd.minhash_lsh_pairs(docs))

    b = buckets()
    n_buckets = b.count()
    stats = b.select(F.sum(F.size("ms")), F.max(F.size("ms"))).first()
    print(f"buckets>=2: {n_buckets}, total members {stats[0]}, max bucket {stats[1]}")


if __name__ == "__main__":
    main()
