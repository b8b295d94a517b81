"""The registered Structured Streaming drain queries
(streaming/queries.py) equal their batch twins row-for-row — the
stream/batch parity contract the driver's oracle rows certify at
sf0.01, pinned here at sf0.001 against the batch callables directly
(no SQL in the loop, so a future oracle edit cannot mask a drift).
"""

from handprint_spark.streaming.queries import (
    q_st_extract,
    q_st_main_content,
    q_st_normalize,
    q_st_quality_gate,
)


def _sym_diff(a, b):
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_st_quality_gate_equals_batch(spark, sf_tiny):
    from handprint_spark.operators.text_analysis import q_ta_quality

    got = q_st_quality_gate(spark, sf_tiny)
    exp = q_ta_quality(spark, sf_tiny)
    assert got.count() == exp.count() > 0
    assert _sym_diff(got, exp) == 0


def test_st_normalize_equals_batch(spark, sf_tiny):
    from handprint_spark.operators.text_analysis import q_ta_normalize

    got = q_st_normalize(spark, sf_tiny)
    exp = q_ta_normalize(spark, sf_tiny)
    assert got.count() == exp.count() > 0
    assert _sym_diff(got, exp) == 0


def test_st_main_content_equals_batch(spark, sf_tiny):
    from handprint_spark.operators.html_extract import q_hx_main_content

    got = q_st_main_content(spark, sf_tiny)
    exp = q_hx_main_content(spark, sf_tiny)
    assert got.count() == exp.count() > 0
    assert _sym_diff(got, exp) == 0


def test_st_extract_equals_batch_flagship(spark, sf_tiny):
    """The full streaming extraction (checkpoint/lineage protocol per
    micro-batch) lands rows indistinguishable from the batch flagship
    path — including the skew-replicated and corrupt-slice docs."""
    from handprint_spark.operators.service_fanout import q_flagship_skew_aware

    got = q_st_extract(spark, sf_tiny)
    exp = q_flagship_skew_aware(spark, sf_tiny)
    assert got.count() == exp.count() > 0
    assert _sym_diff(got, exp) == 0


def test_st_extract_writes_lineage(spark, sf_tiny, tmp_path):
    """stream_to_results' foreachBatch runs the resumable-batch
    protocol, so the lineage sink must carry per-partition rows whose
    doc total equals the results row count."""
    import os

    from pyspark.sql import functions as F

    from handprint_spark.sources import table_sink
    from handprint_spark.streaming.pipeline import stream_to_results
    from handprint_spark.streaming.queries import _stage_documents

    d = _stage_documents(sf_tiny, "lineagetest")
    results_dir = os.path.join(d, "results")
    lineage_dir = os.path.join(d, "lineage")
    writer = stream_to_results(
        spark, os.path.join(d, "src"), results_dir, lineage_dir, os.path.join(d, "ckpt")
    )
    writer.trigger(availableNow=True).start().awaitTermination()
    results = table_sink.load(spark, results_dir)
    lineage = table_sink.load(spark, lineage_dir)
    assert lineage is not None
    total = lineage.agg(F.sum("n_docs").alias("s")).collect()[0]["s"]
    assert total == results.count() > 0
