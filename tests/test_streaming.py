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
    expect = windowed_counts(events)

    # append-mode with availableNow flushes every window at termination;
    # compare as sets of rows
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
