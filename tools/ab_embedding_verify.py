"""A/B evidence for the exact-cosine verify designs at representative scale.

Round-4 VERDICT flagged the interpreted `aggregate(zip_with(...))` verify
as the one perf-weak component. This measures THREE designs over the same
blocked corpus (default 50k vectors x 256 dims, ~1M candidate pairs):

1. interpreted  — JVM self-join + per-pair higher-order-lambda cosine
                  (the r4 implementation);
2. arrow_pairs  — JVM self-join + per-pair vectorized Arrow verify
                  (2*P*dim floats through serde — transfer-bound);
3. gram         — the shipped design (_block_gram_pairs): vectors shuffle
                  once per block, BLAS gram matrix per block, no join.

Run on a quiet box:

    PYTHONPATH=/root/repo python tools/ab_embedding_verify.py [n] [dim]

Prints one JSON line with min-of-2 walls per design.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F  # noqa: N812


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from entity_resolution_pipeline_spark.operators.dedup import (
        _cosine_verify_arrow,
        embedding_cosine_pairs,
    )
    from entity_resolution_pipeline_spark.session import build_spark

    spark = build_spark(app_name="ab-embedding-verify", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic pseudo-random vectors (xxhash64 -> uniform [-1, 1));
    # ~40 rows per block -> ~780 candidate pairs per block
    emb = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            (F.col("id") % (n // 40)).alias("blk"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(10007)) / 5003.5)
                - 1.0,
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    emb.count()

    def joined_pairs():
        a, b = emb.alias("a"), emb.alias("b")
        return (
            a.join(b, "blk")
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("doc_id1"),
                F.col("b.vec_id").alias("doc_id2"),
                F.col("a.embedding").alias("v1"),
                F.col("b.embedding").alias("v2"),
            )
        )

    def interpreted():
        dot = F.aggregate(
            F.zip_with(F.col("v1"), F.col("v2"), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm = lambda c: F.sqrt(  # noqa: E731
            F.aggregate(c, F.lit(0.0), lambda a, x: a + x.cast("double") * x)
        )
        return (
            joined_pairs()
            .select(
                "doc_id1",
                "doc_id2",
                (dot / (nrm(F.col("v1")) * nrm(F.col("v2")))).alias("cosine"),
            )
            .where(F.col("cosine") >= 0.5)
        )

    designs = {
        "gram": lambda: embedding_cosine_pairs(emb, threshold=0.5, block_col="blk"),
        "interpreted": interpreted,
        "arrow_pairs": lambda: _cosine_verify_arrow(joined_pairs(), 0.5),
    }

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    n_pairs = designs["gram"]().count()  # also warms python workers
    for fn in designs.values():
        noop(fn())  # warm each path untimed

    walls = {}
    for tag, fn in designs.items():
        ws = []
        for _ in range(2):
            t0 = time.time()
            noop(fn())
            ws.append(round(time.time() - t0, 3))
        walls[tag] = {"min": min(ws), "walls": ws}

    print(
        json.dumps(
            {
                "n_vectors": n,
                "dim": dim,
                "surviving_pairs": int(n_pairs),
                "verify_wall_s": walls,
                "speedup_gram_vs_interpreted": round(
                    walls["interpreted"]["min"] / walls["gram"]["min"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
