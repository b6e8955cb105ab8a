"""Run ONLY bench.py's ER section (build_pair_fields + score) under the
same conditions bench.py uses — for quiet-window blocking_pairs_s
evidence without the 6-minute full bench."""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import bench
    from entity_resolution_pipeline_spark.session import build_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else bench.N_ENTITIES
    reps = int(os.environ.get("BER_REPS", "2"))
    spark = build_spark(app_name="bench-er-only", master="local[32]",
                        shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's queries phase warms the JVM + python workers first; emulate
    # with one cheap kernel-bearing query
    import __spark_entry__ as em

    bench._noop(em.queries()["dedup_exact"](spark, "/root/testdata/sf0.1"))
    for rep in range(reps):
        out = tempfile.mkdtemp(prefix="ber_pairs_")
        t0 = time.time()
        n_pages, timings, n_over = bench.build_pair_fields(spark, n, out)
        print(json.dumps({"rep": rep, "n_pages": n_pages,
                          "oversized": n_over, **timings,
                          "total_s": round(time.time() - t0, 3)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
