"""Checkpoint/lineage resume protocol (SURVEY §2.1 S8 / §2.3 J3):
kill-and-restart must converge to the same table a single run makes."""

import shutil
import tempfile

import pytest

from handprint_spark.corpus import load_documents_spans
from handprint_spark.operators.extract import extract_documents
from handprint_spark.sources.checkpoints import pending_work, run_batch


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="hp_resume_")
    yield f"{d}/results", f"{d}/lineage"
    shutil.rmtree(d, ignore_errors=True)


def _spans(spark, sf_tiny):
    return load_documents_spans(spark, sf_tiny).limit(120).cache()


def test_partial_then_resume_equals_single_run(spark, sf_tiny, dirs):
    results_dir, lineage_dir = dirs
    spans = _spans(spark, sf_tiny)

    # "crashed" first run: only 50 docs got through
    partial = spans.limit(50)
    m1 = run_batch(spark, partial, results_dir, lineage_dir, batch_id=0)
    assert m1["docs"] == 50

    # resume over the full input: only the missing docs are processed
    assert pending_work(spark, spans, results_dir).count() == spans.count() - 50
    m2 = run_batch(spark, spans, results_dir, lineage_dir, batch_id=1)
    assert m2["docs"] == spans.count() - 50

    # idempotence: a third run finds nothing to do
    m3 = run_batch(spark, spans, results_dir, lineage_dir, batch_id=2)
    assert m3["docs"] == 0

    # resumed table == fresh single-run table, span for span
    resumed = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in spark.read.parquet(results_dir).collect()
    }
    fresh = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in extract_documents(spans).collect()
    }
    assert resumed == fresh


def test_lineage_metrics(spark, sf_tiny, dirs):
    results_dir, lineage_dir = dirs
    spans = _spans(spark, sf_tiny)
    run_batch(spark, spans, results_dir, lineage_dir, batch_id=7)
    lineage = spark.read.parquet(lineage_dir).collect()
    assert lineage
    assert all(r.batch_id == 7 for r in lineage)
    assert sum(r.n_docs for r in lineage) == spans.count()
    res = spark.read.parquet(results_dir)
    total_media = res.groupBy().sum("n_media").collect()[0][0]
    assert sum(r.n_media for r in lineage) == total_media
    # per-partition rows carry doc ranges for audit
    assert all(r.min_doc <= r.max_doc for r in lineage)
