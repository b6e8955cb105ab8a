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


def test_stream_dedup_matches_batch(spark, tmp_warehouse):
    """Streaming exact dedup (state within watermark) keeps one row per
    distinct normalized text — same distinct keys as the batch path."""
    from entity_resolution_pipeline_spark.streaming.ingest import dedup_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", F.col("props").alias("text")
    )
    src = os.path.join(tmp_warehouse, "dsrc")
    out = os.path.join(tmp_warehouse, "dout")
    ckpt = os.path.join(tmp_warehouse, "dckpt")
    events.write.parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, text string"
    ).parquet(src)
    q = (
        dedup_stream(stream).writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    batch_keys = {r["tkey"] for r in dedup_stream(events).select("tkey").collect()}
    got_keys = [r["tkey"] for r in got.select("tkey").collect()]
    assert sorted(got_keys) == sorted(set(got_keys)), "stream emitted a dup key"
    assert set(got_keys) == batch_keys


def test_curate_stream_matches_batch(spark, tmp_warehouse):
    """Quality gate + dedup composed on a stream == the same composition on
    the static frame: same surviving keys, quality columns attached, and
    short/punct-heavy rows never reach dedup state."""
    from entity_resolution_pipeline_spark.streaming.ingest import curate_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", F.col("props").alias("text")
    )
    src = os.path.join(tmp_warehouse, "csrc")
    out = os.path.join(tmp_warehouse, "cout")
    ckpt = os.path.join(tmp_warehouse, "cckpt")
    events.write.parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, text string"
    ).parquet(src)
    # props are ~8-9 char JSON snippets ('{"k": 87}'): punct ratio 5/8=0.625
    # for 1-digit k, 5/9=0.556 for 2 digits — a 0.6 cap drops the former
    # and keeps the latter, so the gate provably rejects AND passes rows
    q = (
        curate_stream(stream, min_chars=5, max_punct_ratio=0.6)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    batch = curate_stream(events, min_chars=5, max_punct_ratio=0.6)
    assert set(r["tkey"] for r in got.collect()) == set(
        r["tkey"] for r in batch.collect()
    )
    assert got.where(F.col("punct_ratio") > 0.6).count() == 0
    assert {"n_chars_norm", "punct_ratio"} <= set(got.columns)
    assert got.count() > 0
    # the gate genuinely rejected something: unfiltered dedup has more keys
    from entity_resolution_pipeline_spark.streaming.ingest import dedup_stream

    assert dedup_stream(events).count() > got.count()


def test_stateful_user_totals(spark, tmp_warehouse):
    """applyInPandasWithState running totals: after one availableNow batch,
    the latest emitted row per user equals the batch aggregate."""
    from entity_resolution_pipeline_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        stateful_user_totals,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").where(
        F.col("user_id") < 20
    )
    src = os.path.join(tmp_warehouse, "ssrc")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        stateful_user_totals(stream).writeStream.outputMode("update")
        .format("memory").queryName("user_totals")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # availableNow may process several micro-batches; the running total is
    # monotone in n_events, so the latest emission per user is its max
    got = {}
    for r in spark.table("user_totals").collect():
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got[r["user_id"]] = (r["n_events"], round(r["sum_value"], 6))
    expect = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expect
    assert len(got) > 0


def test_sessionize_batch_semantics(spark):
    """Gap chaining, the exactly-gap boundary (end-exclusive: a new
    session), per-user isolation, end = last event + gap."""
    from datetime import datetime, timedelta

    from entity_resolution_pipeline_spark.streaming.ingest import sessionize

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    gap = timedelta(minutes=17)
    rows = [
        # user 1: chain of 2 (10 min apart), an EXACTLY-gap event (merges:
        # Spark's boundary is inclusive), then gap+1s (breaks)
        (1, t0, 1.0),
        (1, t0 + timedelta(minutes=10), 2.0),
        (1, t0 + timedelta(minutes=10) + gap, 4.0),
        (1, t0 + timedelta(minutes=10) + gap + gap + timedelta(seconds=1), 16.0),
        # user 2: one lone event
        (2, t0, 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(
        ((r["user_id"], r["session_start"], r["session_end"], r["n_events"],
          r["sum_value"]) for r in sessionize(df, gap="17 minutes").collect()),
    )
    assert len(out) == 3
    u1a, u1b, u2 = out[0], out[1], out[2]
    assert u1a[3] == 3 and u1a[4] == 7.0  # exactly-gap event merged in
    assert u1a[2] == t0 + timedelta(minutes=10) + gap + gap  # end = last + gap
    assert u1b[3] == 1 and u1b[4] == 16.0  # gap+1s broke the chain
    assert u2[0] == 2 and u2[3] == 1


def test_sessionize_stream_matches_batch(spark, tmp_warehouse):
    """availableNow sessionization emits exactly the watermark-closed
    sessions the batch path computes."""
    from entity_resolution_pipeline_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        sessionize,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").where(
        F.col("user_id") < 30
    )
    src = os.path.join(tmp_warehouse, "sessrc")
    out = os.path.join(tmp_warehouse, "sessout")
    ckpt = os.path.join(tmp_warehouse, "sessckpt")
    events.write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        sessionize(stream).writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    max_ts = events.agg(F.max("ts").alias("m")).collect()[0]["m"]
    expect = {
        tuple(r)
        for r in sessionize(events).where(
            F.col("session_end") <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_asof_join_semantics(spark):
    """<= matching, per-key isolation, NULLs before any right row, equal-ts
    inclusion, and tolerance nulling."""
    from datetime import datetime, timedelta

    from entity_resolution_pipeline_spark.operators.asof import asof_join

    t0 = datetime(2026, 1, 1, 9, 0, 0)
    m = timedelta(minutes=1)
    left = spark.createDataFrame(
        [
            (1, 1, t0 + 5 * m, 100.0),   # after r@2 -> 20.0
            (2, 1, t0 + 0 * m, 101.0),   # before any right -> NULL
            (3, 1, t0 + 2 * m, 102.0),   # EXACTLY at r@2 -> 20.0
            (4, 2, t0 + 9 * m, 103.0),   # other key: r@1 -> 7.0
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (1, t0 + 1 * m, 10.0),
            (1, t0 + 2 * m, 20.0),
            (2, t0 + 1 * m, 7.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {r["event_id"]: r for r in
           asof_join(left, right, right_cols=["value"]).collect()}
    assert out[1]["value_asof"] == 20.0 and out[1]["ts_asof"] == t0 + 2 * m
    assert out[2]["value_asof"] is None and out[2]["ts_asof"] is None
    assert out[3]["value_asof"] == 20.0  # <= includes the equal timestamp
    assert out[4]["value_asof"] == 7.0
    assert out[1]["value"] == 100.0  # left payload untouched

    # tolerance: the 3-minute-old match for event 1 is nulled at '2 minutes'
    out_tol = {r["event_id"]: r for r in
               asof_join(left, right, right_cols=["value"],
                         tolerance="2 minutes").collect()}
    assert out_tol[1]["value_asof"] is None
    assert out_tol[3]["value_asof"] == 20.0  # 0-age match survives


def test_asof_join_null_payload_is_not_backfilled(spark):
    """A NULL in the newest right row's payload must surface as NULL (the
    whole right row matches atomically) — per-column forward-fill would
    smuggle in an older row's value under the newer row's timestamp."""
    from datetime import datetime, timedelta

    from entity_resolution_pipeline_spark.operators.asof import asof_join

    t0 = datetime(2026, 1, 1, 9, 0, 0)
    m = timedelta(minutes=1)
    left = spark.createDataFrame(
        [(1, 1, t0 + 3 * m)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t0 + 1 * m, 5.0), (1, t0 + 2 * m, None)],
        "user_id long, ts timestamp, value double",
    )
    r = asof_join(left, right, right_cols=["value"]).collect()[0]
    assert r["ts_asof"] == t0 + 2 * m
    assert r["value_asof"] is None  # the newest row's NULL, not 5.0


def test_range_join_semantics(spark):
    """[start, end) boundaries, per-key isolation, multi-bucket intervals,
    and no duplicate matches when an interval spans many buckets."""
    from datetime import datetime, timedelta

    from entity_resolution_pipeline_spark.operators.asof import range_join

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    h = timedelta(hours=1)
    pts = spark.createDataFrame(
        [
            (1, 1, t0 + h),                      # inside the long interval
            (2, 1, t0 + 5 * h),                  # exactly at END -> excluded
            (3, 1, t0),                          # exactly at START -> included
            (4, 2, t0 + h),                      # other key, no interval
            (5, 1, t0 + 10 * h),                 # after everything
        ],
        "event_id long, user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(1, t0, t0 + 5 * h)],  # spans 5 one-hour buckets
        "user_id long, session_start timestamp, session_end timestamp",
    )
    got = sorted(r["event_id"] for r in range_join(pts, iv).collect())
    assert got == [1, 3]
    # one row per match even though the interval overlaps many buckets
    assert range_join(pts, iv).count() == 2


def test_range_join_every_event_in_its_session(spark):
    """Composing range_join with sessionize: every event lands in exactly
    one of its user's sessions."""
    from entity_resolution_pipeline_spark.operators.asof import range_join
    from entity_resolution_pipeline_spark.streaming.ingest import sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").where(
        F.col("user_id") < 40
    )
    sessions = sessionize(ev, gap="17 minutes")
    joined = range_join(ev.select("event_id", "user_id", "ts"), sessions)
    assert joined.count() == ev.count()
    assert joined.select("event_id").distinct().count() == ev.count()


def test_time_rollup_grains_consistent(spark):
    """The day grain must be an exact rollup of the hour grain (sums and
    counts aggregate up), and hour buckets align to the clock hour."""
    from entity_resolution_pipeline_spark.streaming.ingest import time_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    r = time_rollup(ev)
    hour = r.where(F.col("grain") == "1 hour")
    day = r.where(F.col("grain") == "1 day")
    # counts per event_type agree across grains and with the raw table
    per_type_h = {(x["event_type"]): x["n"] for x in
                  hour.groupBy("event_type").agg(F.sum("n_events").alias("n")).collect()}
    per_type_d = {(x["event_type"]): x["n"] for x in
                  day.groupBy("event_type").agg(F.sum("n_events").alias("n")).collect()}
    per_type_raw = {(x["event_type"]): x["n"] for x in
                    ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_type_h == per_type_d == per_type_raw
    # bucket starts sit on exact hour boundaries
    assert hour.where(
        (F.minute("bucket_start") != 0) | (F.second("bucket_start") != 0)
    ).count() == 0


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


def test_asof_join_bucketed_equivalence_random(spark):
    """asof_join_bucketed == asof_join value-for-value on a random corpus
    spanning many keys and buckets (incl. tolerance), with a tiny bucket
    width so carry-in crosses many empty buckets."""
    import random
    from datetime import datetime, timedelta

    from entity_resolution_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    rng = random.Random(7)
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    s = timedelta(seconds=1)
    left_rows = [
        (i, rng.randrange(5), t0 + rng.randrange(0, 50_000) * s)
        for i in range(400)
    ]
    right_rows = [
        (rng.randrange(5), t0 + rng.randrange(0, 50_000) * s, float(i))
        for i in range(300)
    ]
    # distinct (key, ts) on the right: equal-ts dup rows are documented
    # ambiguous on both paths
    seen = set()
    right_rows = [r for r in right_rows
                  if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        right_rows, "user_id long, ts timestamp, value double"
    )
    for tol in (None, "300 seconds"):
        a = {tuple(r) for r in asof_join(
            left, right, right_cols=["value"], tolerance=tol).collect()}
        b = {tuple(r) for r in asof_join_bucketed(
            left, right, right_cols=["value"], tolerance=tol,
            bucket_seconds=600).collect()}
        assert a == b and len(a) == 400


def test_asof_join_bucketed_megakey_multitask(spark):
    """One mega-key: the bucketed plan partitions the exact pass by
    (key, bucket) — the hot key's sort spreads over many buckets/tasks —
    and the output still equals the plain path."""
    from datetime import datetime, timedelta

    from entity_resolution_pipeline_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    s = timedelta(seconds=1)
    left = spark.createDataFrame(
        [(i, 1, t0 + (i * 37) * s) for i in range(2000)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t0 + (i * 91) * s, float(i)) for i in range(800)],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join_bucketed(left, right, right_cols=["value"],
                             bucket_seconds=3600)
    # the exact-pass exchange must hash on (user_id, _bkt), not user_id
    # alone — that is what splits the mega-key across tasks
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan and "hashpartitioning" in plan
    n_buckets = (2000 * 37) // 3600 + 1
    assert n_buckets > 10  # the mega-key really spans many partitions
    a = {tuple(r) for r in asof_join(left, right, right_cols=["value"]).collect()}
    b = {tuple(r) for r in out.collect()}
    assert a == b and len(a) == 2000


def test_near_dup_pairs_stream_matches_batch(spark, tmp_warehouse):
    """Streaming MinHash-LSH near-dup alerts == the batch operator's pair
    set (same sketch math, same banding, same threshold) after an
    availableNow catch-up — state persists across micro-batches, so the
    equivalence holds however the files split into batches."""
    import os as _os

    from entity_resolution_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from entity_resolution_pipeline_spark.streaming.ingest import (
        near_dup_pairs_stream,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .withColumn("ts", F.lit("2026-01-01 09:00:00").cast("timestamp"))
    )
    src = _os.path.join(tmp_warehouse, "ndsrc")
    out = _os.path.join(tmp_warehouse, "ndout")
    ckpt = _os.path.join(tmp_warehouse, "ndckpt")
    # two files -> the availableNow run may split into micro-batches
    docs.where(F.col("doc_id") % 2 == 0).write.parquet(src)
    docs.where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    q = (
        near_dup_pairs_stream(stream, threshold=0.5, num_perm=32, bands=8)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got_rows = spark.read.parquet(out).collect()
    got = {(r["doc_id1"], r["doc_id2"], round(r["est_jaccard"], 6))
           for r in got_rows}
    expect = {
        (r["doc_id1"], r["doc_id2"], round(r["est_jaccard"], 6))
        for r in minhash_lsh_pairs(
            docs, threshold=0.5, num_perm=32, bands=8
        ).collect()
    }
    assert got == expect
    assert len(got) > 0


def test_near_dup_stream_fifo_state_bound(spark, tmp_warehouse):
    """max_bucket_state bounds per-bucket state: with a cap of 2 and five
    identical docs arriving in doc_id order, each doc can only pair with
    the <=2 most recent residents — 2n-3 pairs instead of n(n-1)/2 (the
    explicit state-bytes bound a firehose needs)."""
    import os as _os

    from entity_resolution_pipeline_spark.streaming.ingest import (
        near_dup_pairs_stream,
    )

    docs = spark.createDataFrame(
        [(i, "exactly the same body of text for everyone", "2026-01-01 09:00:00")
         for i in range(5)],
        "doc_id long, text string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    src = _os.path.join(tmp_warehouse, "fsrc")
    out = _os.path.join(tmp_warehouse, "fout")
    ckpt = _os.path.join(tmp_warehouse, "fckpt")
    docs.write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    q = (
        near_dup_pairs_stream(stream, threshold=0.9, max_bucket_state=2)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    pairs = {(r["doc_id1"], r["doc_id2"])
             for r in spark.read.parquet(out).collect()}
    # doc i pairs with i-1 and i-2 only (per bucket; identical docs share
    # every bucket, the pair set is the union = still the chain)
    expect = {(i - 1, i) for i in range(1, 5)} | {(i - 2, i) for i in range(2, 5)}
    assert pairs == expect


def test_near_dup_stream_rejects_batch(spark):
    """ADVICE r4: applyInPandasWithState needs a streaming input; a batch
    frame must fail fast with a clear ValueError, not an opaque engine
    error deep in execution."""
    import pytest as _pytest

    from entity_resolution_pipeline_spark.streaming.ingest import (
        near_dup_pairs_stream,
    )

    docs = spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string"
    ).withColumn("ts", F.current_timestamp())
    with _pytest.raises(ValueError, match="streaming"):
        near_dup_pairs_stream(docs)
