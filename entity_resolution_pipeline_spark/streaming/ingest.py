"""Streaming ingest: file-source events -> watermarked windowed aggregates.

Batch-equivalent semantics are used by the tests: the same aggregation run
as a static DataFrame must equal the streaming result after an
``availableNow`` catch-up run (late rows beyond the watermark dropped).

At production scale the source would be Kafka/Kinesis and the sink an
Iceberg table with exactly-once semantics via checkpointLocation; the query
shape (event-time window + watermark + per-key counts) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed per-type counts + value sums."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_events_from_dir(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def run_catchup(spark: SparkSession, src_dir: str, out_dir: str,
                checkpoint_dir: str, window: str = "1 hour",
                watermark: str = "2 hours") -> None:
    """availableNow catch-up: process all files now, then stop (testable)."""
    agg = windowed_counts(stream_events_from_dir(spark, src_dir), window, watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
