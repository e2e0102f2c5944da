"""Structured Streaming: event-time windowed aggregation with watermark.

The streaming analog of operators/relational.window_sessionize — same
1-hour tumbling semantics, expressed over ``readStream`` so the identical
logical plan runs incrementally with state cleanup driven by the
watermark. The reference is batch-only (whole file in memory,
README.md:320); this is the designed-for-scale upgrade (SURVEY.md §7
phase E): at 100 TB/day the same code runs against Kafka by swapping the
source.

Batch/stream parity is tested by running this on the events parquet via
the file source with ``availableNow`` and comparing to the batch
operator (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clusterforge_spark.sources.readers import TABLE_SCHEMAS


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema pinned; the
    ns-epoch ts converted exactly as the batch reader does)."""
    # the file source requires a directory; glob-filter to the events file
    raw = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_user_counts(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour per-user aggregate with late-data watermark.

    State per (user, hour) is dropped once the watermark passes the
    window end — bounded memory under unbounded input.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("user_id"))
        .agg(
            F.count("*").alias("events_in_hour"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_in_hour"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("win.start")).alias("hour_start_us"),
            "events_in_hour",
            "value_in_hour",
        )
    )


def run_sessionize_batchlike(
    spark: SparkSession, sf_dir: str, timeout_s: int = 120
) -> DataFrame:
    """Run the streaming aggregation to completion over the static
    parquet (availableNow trigger + memory sink) and return the result
    as a batch DataFrame — used by tests to prove stream/batch parity.
    """
    stream = hourly_user_counts(read_events_stream(spark, sf_dir))
    # complete mode: append would hold back windows the final watermark
    # hasn't passed (everything within 2h of max ts) — for a finite file
    # replay we want every window emitted.
    query = (
        stream.writeStream.format("memory")
        .queryName("sessionize_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_s)
    return spark.table("sessionize_out")
