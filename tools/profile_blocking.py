"""Fine-grained timing of the blocking+pairs stage (bench.py build_pair_fields).

Usage: python tools/profile_blocking.py [n_entities] [--detail]

Default mode reproduces bench.py's timing EXACTLY (keys persist+count, then
one write job over candidate_pairs + attach + with_pair_key), which is the
`blocking_pairs_s` number the driver records. --detail adds per-component
timings (each triggers extra computations, so the total differs from bench).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_resolution_pipeline_spark.session import build_spark
from entity_resolution_pipeline_spark.operators import blocking as B
from entity_resolution_pipeline_spark.operators import pairs as P
from entity_resolution_pipeline_spark.operators.preprocess import preprocess_records
from entity_resolution_pipeline_spark.sources.webpages import web_pages_df


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_entities = int(pos[0]) if pos else 4000
    detail = "--detail" in sys.argv
    spark = build_spark(app_name="profile-blocking", master="local[32]",
                        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    wp = web_pages_df(spark, n_entities)
    records = preprocess_records(wp)
    records.persist()
    n = records.count()
    print(f"pages={n}", flush=True)

    if detail:
        t = {}
        for name, fn in (("name_keys", B.name_keys), ("host_keys", B.host_keys),
                         ("lsh_keys", B.lsh_keys)):
            t0 = time.time()
            c = fn(records).count()
            t[name] = time.time() - t0
            print(f"{name}: {c} rows {t[name]:.2f}s", flush=True)

    # ---- bench-faithful timing (what BENCH records as blocking_pairs_s) ----
    out_dir = os.path.join(tempfile.mkdtemp(prefix="profile_blk_"), "pair_fields")
    t0 = time.time()
    keys = B.all_blocking_keys(records).persist()
    keys.count()
    t_keys = time.time() - t0
    pairs, oversized = B.candidate_pairs(keys, max_block_size=64)
    pair_fields = P.with_pair_key(P.attach_pair_fields(pairs, records))
    pair_fields.write.mode("overwrite").parquet(out_dir)
    total = time.time() - t0
    print(f"keys_persist_s={t_keys:.2f}", flush=True)
    print(f"blocking_pairs_s={total:.2f}  (bench-faithful)", flush=True)
    n_over = oversized.count()
    print(f"oversized={n_over}", flush=True)
    n_pairs = spark.read.parquet(out_dir).count()
    print(f"pairs={n_pairs}", flush=True)
    keys.unpersist()
    records.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
