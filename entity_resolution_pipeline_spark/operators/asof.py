"""As-of join — the point-in-time lookup Spark's join zoo lacks.

For every left row, attach the LATEST right row with ``right.ts <=
left.ts`` for the same key (market-data / feature-store semantics: "what
was the most recent known value when this event happened").

Spark-first construction (no range-join explosion, no per-row Python):
tag both sides, union them, and forward-fill the right-side payload with
``last(..., ignorenulls=True)`` over a (key, ts)-ordered window — ONE
shuffle + sort per key, O(n log n) per partition, the same work a sorted
merge would do. At equal timestamps the right row sorts first, so a right
row AT the left timestamp matches (<= semantics, same as DuckDB's native
ASOF JOIN, which the driver oracle uses to validate this operator value
for value).

Skew note: the window partitions by key; a pathologically hot key is one
task's sort — the same profile as any per-key window. For that regime use
``asof_join_bucketed``: partitioning moves to (key, time-bucket) so a hot
key spreads over as many tasks as it spans buckets, with a per-bucket
carry-in row computed over the (tiny) bucket-summary table — value-
identical to ``asof_join`` (pytest-pinned). Right-side payloads ride
through the shuffle once either way; pre-aggregate the right side if it
carries duplicate (key, ts) rows (the match would otherwise be ambiguous
on BOTH engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join ([start, end) semantics) without a
    nested-loop: each interval explodes into the fixed-width time buckets
    it overlaps, each point maps to its single bucket, and the match is an
    EQUI-join on (key, bucket) plus the exact range filter.

    Work is O(points + intervals * buckets_per_interval) instead of the
    O(points * intervals_per_key) a BroadcastNestedLoopJoin pays; pick
    ``bucket_seconds`` near the typical interval length so most intervals
    explode into 1-2 buckets. A point has exactly one bucket, so no
    dedup pass is needed — each (point, interval) match appears once.
    """
    # exact integer epoch-microsecond bucketing (unix_timestamp truncates
    # fractional seconds; doubles round): works for both TIMESTAMP and
    # TIMESTAMP_NTZ inputs — the NTZ->LTZ cast shifts points and intervals
    # identically, so bucket co-location is preserved. The interval
    # explodes into the SUPERSET [floor(start/w), floor(end/w)] of
    # overlapped buckets — possibly one harmless empty bucket past an
    # exclusive end, cleaned by the exact filter, never a missed bucket.
    w = F.lit(int(bucket_seconds) * 1_000_000)

    def _bkt(c):
        return F.floor(F.unix_micros(c.cast("timestamp")) / w)

    # Join strategy pinned to SHUFFLED HASH on (key, _bkt), build =
    # intervals (guide §3 "pick deliberately"): Catalyst's size estimates
    # here sit near the broadcast threshold, so the unhinted pick flapped
    # with column pruning between broadcasting the intervals (leaving the
    # whole points scan as ONE serial probe task — measured 2.07 s at 1M
    # points) and broadcasting the POINTS side (fast locally at 1.3 s but
    # a driver-OOM shape the moment points outgrow the threshold). The
    # hinted SHJ is as fast as the lucky broadcast (1.29 s), needs no
    # points-side pre-spread (the join's own Exchange distributes the
    # probe work), and scales: both sides partition by (key, bucket), the
    # per-partition build side is the interval subset (<< points by
    # contract), and AQE skew-join splitting handles hot buckets.
    p = points.withColumn("_bkt", _bkt(F.col(ts_col)))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(_bkt(F.col(start_col)), _bkt(F.col(end_col)))),
    ).hint("shuffle_hash")
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return p.join(iv, [key, "_bkt"]).where(cond).drop("_bkt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """left rows + latest right payload as of each left timestamp.

    ``right_cols``: payload columns from ``right`` (default: everything
    except the key and timestamp), emitted as ``<col><suffix>``; the
    matched right timestamp is emitted as ``<ts_col><suffix>``. Rows with
    no preceding right row get NULLs. ``tolerance`` (an INTERVAL string,
    e.g. ``'1 hour'``) additionally nulls matches older than
    ``left.ts - tolerance``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts_col)]

    # the right row forward-fills as ONE struct, never per column: filling
    # each payload column independently would let a NULL payload inherit
    # the value of an OLDER right row — a mixed tuple corresponding to no
    # real right row (DuckDB's ASOF JOIN returns the newest row's NULL).
    # The struct's ts field is non-null on every right row, so last(...,
    # ignorenulls) always picks the newest whole row.
    row_struct = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    l_tag = left.withColumn("_is_left", F.lit(1))
    r_tag = right.select(
        F.col(on),
        F.col(ts_col),
        row_struct.alias("_asof_row"),
        F.lit(0).alias("_is_left"),
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    from pyspark.sql import Window

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof_row", F.last("_asof_row", ignorenulls=True).over(w))

    matched = F.col("_asof_row")
    if tolerance is not None:
        stale = matched["_ts"] < F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
        matched = F.when(stale, F.lit(None)).otherwise(F.col("_asof_row"))
    return (
        u.where(F.col("_is_left") == 1)
        .withColumn("_m", matched)
        .select(
            *[c for c in left.columns],
            *[F.col("_m")[c].alias(c + suffix) for c in right_cols],
            F.col("_m")["_ts"].alias(ts_col + suffix),
        )
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_asof",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Hot-key as-of join: value-identical to ``asof_join`` (pytest-pinned
    on random corpora and on a single mega-key), but partitioned by
    (key, time-bucket) instead of key alone, so one pathologically hot key
    spreads over as many tasks as it spans buckets instead of serializing
    into one task's sort.

    Construction (all relational, no per-row Python):

    1. per-(key, bucket) LAST right row — a groupBy ``max(struct)`` whose
       first field is the timestamp (deterministic lexicographic max);
       this bucket-summary table is ~|right| / bucket_occupancy rows;
    2. per left bucket, the CARRY-IN row (newest right row from any
       strictly-earlier bucket) via one ordered window over the summary
       table — per-key work is O(#buckets), not O(#rows);
    3. exact within-bucket pass: left and right rows of the same
       (key, bucket) forward-fill exactly like ``asof_join`` but inside
       the bucket partition; the final match coalesces to the carry-in.

    Per-task sort is bounded by bucket occupancy; pick ``bucket_seconds``
    so typical buckets hold thousands of rows. NULL timestamps match
    nothing here (they sort into no bucket); keep them off the scale path.
    """
    from pyspark.sql import Window

    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts_col)]

    w_us = F.lit(int(bucket_seconds) * 1_000_000)

    def _bkt(c):
        return F.floor(F.unix_micros(c.cast("timestamp")) / w_us)

    row_struct = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )

    # 1. bucket summary: newest right row per (key, bucket)
    rb = (
        right.withColumn("_bkt", _bkt(F.col(ts_col)))
        .groupBy(on, "_bkt")
        .agg(F.max(row_struct).alias("_blast"))
    )

    # 2. carry-in per LEFT bucket: newest _blast among strictly-earlier
    # buckets. Left buckets sort BEFORE the same bucket's summary row
    # (_src 0 < 1), so a left bucket never sees its own bucket's rows here
    # — those are matched exactly in step 3.
    lb = (
        left.select(on, _bkt(F.col(ts_col)).alias("_bkt"))
        .distinct()
        .withColumn("_src", F.lit(0))
        .withColumn("_blast", F.lit(None).cast(rb.schema["_blast"].dataType))
    )
    rbt = rb.select(on, "_bkt", F.lit(1).alias("_src"), "_blast")
    wcarry = (
        Window.partitionBy(on)
        .orderBy(F.col("_bkt").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        lb.unionByName(rbt)
        .withColumn("_carry", F.last("_blast", ignorenulls=True).over(wcarry))
        .where(F.col("_src") == 0)
        .select(on, "_bkt", "_carry")
    )

    # 3. exact within-bucket forward-fill, partitioned by (key, bucket)
    l_tag = (
        left.withColumn("_bkt", _bkt(F.col(ts_col)))
        .join(carry, [on, "_bkt"], "left")
        .withColumn("_is_left", F.lit(1))
    )
    r_tag = right.select(
        F.col(on),
        F.col(ts_col),
        _bkt(F.col(ts_col)).alias("_bkt"),
        row_struct.alias("_asof_row"),
        F.lit(0).alias("_is_left"),
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    wb = (
        Window.partitionBy(on, "_bkt")
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(
        "_m0",
        F.coalesce(
            F.last("_asof_row", ignorenulls=True).over(wb), F.col("_carry")
        ),
    )

    matched = F.col("_m0")
    if tolerance is not None:
        stale = matched["_ts"] < F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
        matched = F.when(stale, F.lit(None)).otherwise(F.col("_m0"))
    return (
        u.where(F.col("_is_left") == 1)
        .withColumn("_m", matched)
        .select(
            *[c for c in left.columns],
            *[F.col("_m")[c].alias(c + suffix) for c in right_cols],
            F.col("_m")["_ts"].alias(ts_col + suffix),
        )
    )
