"""Streaming ingest: availableNow catch-up equals the batch aggregation."""

import os

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.streaming.ingest import (
    run_catchup,
    windowed_counts,
)


def test_availablenow_catchup_matches_batch(spark, tmp_warehouse):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = os.path.join(tmp_warehouse, "src")
    out = os.path.join(tmp_warehouse, "out")
    ckpt = os.path.join(tmp_warehouse, "ckpt")
    events.write.parquet(src)

    run_catchup(spark, src, out, ckpt)
    got = spark.read.parquet(out)

    # append mode emits a window only once the watermark passes its end:
    # windows within <watermark> of max(ts) stay in state (correct
    # late-data semantics) — compare against the batch agg restricted to
    # watermark-closed windows
    max_ts = events.agg(F.max("ts").alias("m")).collect()[0]["m"]
    expect = windowed_counts(events).where(
        F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    )
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in expect.collect()}
    assert g == e
    assert len(g) > 0


def test_catchup_is_incremental(spark, tmp_warehouse):
    """A second availableNow run over the same files must add nothing."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = os.path.join(tmp_warehouse, "src")
    out = os.path.join(tmp_warehouse, "out")
    ckpt = os.path.join(tmp_warehouse, "ckpt")
    events.write.parquet(src)
    run_catchup(spark, src, out, ckpt)
    n1 = spark.read.parquet(out).count()
    run_catchup(spark, src, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2
