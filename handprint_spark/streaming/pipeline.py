"""Structured Streaming ingest for the extraction engine.

The reference is a one-shot batch CLI (SURVEY.md §2.10 — no streaming
operators exist), so nothing here mirrors reference semantics; this is
the new engine's continuous-ingestion surface:

  * ``stream_documents``: file-source stream of documents parquet →
    the same spanify + extract stages (the batch pipeline is pure
    per-row, so it lifts to streaming unchanged) → sink via
    foreachBatch into the same results/lineage tables the batch
    checkpoint protocol uses. maxFilesPerTrigger is the streaming
    analog of the reference's per-service rate caps (X7).
  * ``stream_event_counts``: event-time windowed aggregation with
    watermarking — the late-data-correct rollup shape (10-minute
    tumbling windows, 15-minute watermark).

Both run on any sink; tests drive them with in-memory sinks and
``availableNow`` triggers so they terminate deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import spanify
from ..operators.extract import extract_documents


def stream_documents(
    spark: SparkSession,
    source_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
):
    """readStream over a documents parquet directory → extracted
    results stream. Returns an unstarted streaming DataFrame."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return extract_documents(spanify(stream))


def stream_event_counts(spark: SparkSession, events_stream: DataFrame) -> DataFrame:
    """Event-time tumbling-window counts with a watermark: the
    windowed-aggregation + late-data shape over the events table's
    schema (ts, event_type, value)."""
    # parquet TIMESTAMP_NTZ -> session-tz TIMESTAMP (watermarks require
    # an event-time zone; the session runs UTC)
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", "15 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
