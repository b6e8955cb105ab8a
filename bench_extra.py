"""Extra benchmarks for optimization work (guide §1.4): isolate individual
declared queries with the noop sink, label jobs, and capture
``explain("formatted")`` plans.

Does NOT replace bench.py (which is frozen for driver measurement); numbers
from here are cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py q1 q2 ...         # time the named queries (noop)
    python bench_extra.py --reps 3 q1       # min/median over reps
    python bench_extra.py --explain q1      # also write plans/<q>.txt
    python bench_extra.py --all             # the full bench.py query list

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's last
measured scale), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from entity_resolution_pipeline_spark.session import build_spark

    spark = build_spark(
        app_name="bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    names = list(qs) if args.all else args.queries
    import bench as _b

    if args.all:
        names = _b.BENCH_QUERIES

    # warm the session like bench.py does
    _b._noop(qs[names[0]](spark, sf_dir))

    results = {}
    for name in names:
        walls = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            _b._noop(qs[name](spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = walls
        print(f"{name:28s} min={min(walls):7.3f}  walls={walls}", flush=True)
    if args.explain:
        out_dir = args.explain_dir or os.path.join(REPO, "plans", "r06")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {out_dir}/{name}.txt")
    total = sum(min(w) for w in results.values())
    print(f"TOTAL(min) {total:.3f}s over {len(results)} queries")


if __name__ == "__main__":
    main()
