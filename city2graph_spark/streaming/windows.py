"""Structured Streaming operators for the event/ingest side of the pipeline.

The reference has no streaming surface (SURVEY.md §2.9 — resumability comes
from snapshot checkpoints, see ``checkpoint.py``); these operators cover the
training-data-pipeline side: continuous document/event ingestion with
watermarked windowed aggregation and session windows.  File-source streams
over the same parquet layout the batch engine reads ⇒ one code path for
backfill + live."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      schema: str = EVENTS_SCHEMA) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4).parquet(path))


def windowed_event_counts(events: DataFrame, *, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type counts/sums with late-data watermark."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("value_sum"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "value_sum"))


def session_windows(events: DataFrame, *, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based), the sessionization primitive."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("value_sum"))
            .select(F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "user_id", "n_events", "value_sum"))


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         *, mode: str = "complete"):
    """Drive a streaming query to a memory sink and drain all available
    input (test/backfill helper)."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode).start())
    q.processAllAvailable()
    return q
