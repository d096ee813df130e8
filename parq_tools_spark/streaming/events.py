"""Structured Streaming operators over the events schema.

The reference has no streaming surface (SURVEY §2.8); this module is
the beyond-parity extension: the same windowed/sessionized aggregations
exposed in batch form by ``__spark_entry__`` (events_hourly,
events_sessionize), expressed as Structured Streaming plans with
watermarks, so the identical logic runs incrementally over a file
(or Kafka) source at scale.

Batch/stream parity is by construction: ``hourly_counts`` and
``sessionize`` accept either a batch or a streaming DataFrame — the
transformations are identical; only the source/sink differ. Tests
drive them with the file source against testdata partitions.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "hourly_counts",
    "sessionize",
    "start_to_memory",
]

# ts arrives as long nanoseconds (Spark's parquet reader cannot decode
# TIMESTAMP(NANOS); the batch path uses the same nanosAsLong contract)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream of events parquet (one dir = one stream).

    ``maxFilesPerTrigger`` bounds per-microbatch work; on a real
    deployment swap for the Kafka source — every transformation
    downstream is source-agnostic.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    )


def hourly_counts(
    events: DataFrame,
    watermark: str = "2 hours",
    window_duration: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window counts + sums with a watermark.

    Late rows beyond the watermark are dropped and window state is
    evicted — bounded state at any scale. Works on batch DataFrames
    too (watermark is a no-op there), giving batch/stream parity with
    ``__spark_entry__.q_events_hourly``.
    """
    with_wm = (
        events.withWatermark("event_time", watermark)
        if events.isStreaming
        else events
    )
    return (
        with_wm.groupBy(
            F.window("event_time", window_duration).alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based) — Spark's native session
    window operator, the streaming analogue of the batch lag/cumsum
    sessionization."""
    with_wm = (
        events.withWatermark("event_time", watermark)
        if events.isStreaming
        else events
    )
    return (
        with_wm.groupBy(
            F.session_window("event_time", gap).alias("sess"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def start_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
):
    """Run a streaming plan into an in-memory table (tests/demos)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
