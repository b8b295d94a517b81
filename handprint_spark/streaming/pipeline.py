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
from pyspark.sql import types as T

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


def stream_to_results(
    spark: SparkSession,
    source_dir: str,
    results_dir: str,
    lineage_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
):
    """Continuous ingestion into the SAME results/lineage tables the
    batch protocol writes: every micro-batch runs the full
    ``checkpoints.run_batch`` path (anti-join → spanify → extract →
    append results → append lineage), so batch and streaming writers
    are interchangeable consumers of one sink. Exactly-once lands on
    two independent guards: Structured Streaming's checkpointLocation
    (no re-delivered files after restart) and the doc_id anti-join
    (a replayed micro-batch re-selects zero documents) — either alone
    suffices, together a crashed stream resumes exactly like a crashed
    batch run. Returns an unstarted DataStreamWriter; callers pick the
    trigger (tests use availableNow)."""
    from ..sources.checkpoints import run_batch

    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def process(batch_df, batch_id: int):
        run_batch(spark, spanify(batch_df), results_dir, lineage_dir, batch_id=batch_id)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def stream_first_seen(documents_stream: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): exact
    streaming dedup keyed by content hash. The first document carrying
    a given md5(text) is emitted; every later duplicate increments the
    keyed state and is suppressed. This is the streaming form of the
    batch ``dd_exact`` groupBy — state = one long per distinct hash,
    partitioned by the hash key exactly like the batch shuffle.

    Input: a streaming DataFrame with (doc_id, text). Output:
    (h, doc_id, n_chars) rows, one per first-seen hash.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("h", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.LongType())])

    def dedup(key, pdf_iter, state: GroupState):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        already_emitted = seen > 0
        # Deterministic first: the smallest doc_id across ALL Arrow
        # chunks of this batch's group (a group can span chunk
        # boundaries — arrow maxRecordsPerBatch — so a per-chunk min
        # would depend on chunking). Order key (len, str) sorts digit
        # ids numerically and any other ids deterministically.
        best = None
        for pdf in pdf_iter:
            if not already_emitted:
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    d = str(doc_id)
                    k = (len(d), d)
                    if best is None or k < best[0]:
                        best = (k, d, int(len(text)))
            seen += len(pdf)
        state.update((seen,))
        first_rows = (
            [{"h": key[0], "doc_id": best[1], "n_chars": best[2]}]
            if best is not None
            else []
        )
        yield pd.DataFrame(first_rows, columns=["h", "doc_id", "n_chars"])

    keyed = documents_stream.select(
        F.md5(F.col("text").cast("binary")).alias("h"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("text"),
    )
    return keyed.groupBy("h").applyInPandasWithState(
        dedup, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


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
