"""Structured Streaming surface: streaming extraction equals the batch
pipeline on the same input; watermarked windowed aggregation equals
the batch groupBy."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from handprint_spark.corpus import load_documents_spans
from handprint_spark.operators.extract import extract_documents
from handprint_spark.streaming.pipeline import stream_documents, stream_event_counts


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="hp_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_extract_equals_batch(spark, sf_tiny, tmpdir):
    # stage the source as several files so multiple triggers fire
    src = f"{tmpdir}/src"
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").limit(60)
    docs.repartition(3).write.parquet(src)

    stream = stream_documents(spark, src, max_files_per_trigger=1)
    q = (
        stream.selectExpr("doc_id", "to_json(spans) AS spans_json", "n_media", "n_errors")
        .writeStream.format("memory")
        .queryName("stream_results")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.spans_json, r.n_media, r.n_errors)
        for r in spark.sql("select * from stream_results").collect()
    }
    batch = extract_documents(
        spark.createDataFrame(docs.rdd, docs.schema).transform(
            lambda df: __import__("handprint_spark.corpus", fromlist=["spanify"]).spanify(df)
        )
    )
    expected = {
        r.doc_id: (r.spans_json, r.n_media, r.n_errors)
        for r in batch.selectExpr(
            "doc_id", "to_json(spans) AS spans_json", "n_media", "n_errors"
        ).collect()
    }
    assert got == expected


def test_windowed_counts_with_watermark(spark, sf_tiny, tmpdir):
    src = f"{tmpdir}/events"
    events = spark.read.parquet(f"{sf_tiny}/events.parquet")
    events.repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_event_counts(spark, stream)
        .writeStream.format("memory")
        .queryName("stream_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmpdir}/ckpt2")
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("select * from stream_windows").collect()
    }
    expected = {
        (r.ws, r.event_type): (r.n_events, r.total_value)
        for r in events.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .selectExpr("w.start AS ws", "event_type", "n_events", "total_value")
        .collect()
    }
    assert got == expected
