"""Comparison subsystem on Spark: TSV byte-equality with the kernel
(reference-golden-tested) path, totals consistency, and alignment
behavior on the corrupt-media slice (missing HTR lines)."""

import duckdb
import pytest

from handprint_spark.corpus import is_corrupt, split_lines
from handprint_spark.kernels.textcmp import text_comparison
from handprint_spark.operators.compare import (
    compare_to_ground_truth,
    comparison_totals,
    comparison_tsv,
    ground_truth,
    q_cmp_lines,
)


@pytest.fixture(scope="module")
def htr_and_gt(spark, sf_tiny):
    from handprint_spark.corpus import load_documents_spans
    from handprint_spark.operators.extract import extract_documents, extracted_text

    results = extract_documents(load_documents_spans(spark, sf_tiny).limit(150))
    htr = extracted_text(results, kinds=("ocr",)).select("doc_id", "text").cache()
    gt = ground_truth(spark, sf_tiny).cache()
    return htr, gt


def test_tsv_matches_kernel_exactly(spark, sf_tiny, htr_and_gt):
    htr, gt = htr_and_gt
    spark_tsv = {r.doc_id: r.report for r in comparison_tsv(htr, gt).collect()}
    htr_rows = {r.doc_id: r.text for r in htr.collect()}
    gt_rows = {r.doc_id: r.gt_text for r in gt.collect()}
    assert spark_tsv
    for doc_id, report in spark_tsv.items():
        assert report == text_comparison(htr_rows[doc_id], gt_rows.get(doc_id, ""))


def test_clean_docs_have_zero_errors(htr_and_gt):
    htr, gt = htr_and_gt
    totals = {r.doc_id: r.total_errors for r in comparison_totals(htr, gt).collect()}
    clean = {d: e for d, e in totals.items() if not is_corrupt(d)}
    assert clean and all(e == 0 for e in clean.values())


def test_corrupt_docs_show_missing_lines(htr_and_gt):
    """Corrupt line-0 media -> the extracted text has an empty line 0;
    the empty gt line 0 aligns but later lines still match."""
    htr, gt = htr_and_gt
    lines = compare_to_ground_truth(htr, gt).collect()
    corrupt = [r for r in lines if is_corrupt(r.doc_id)]
    assert corrupt
    assert any(r.distance > 0 for r in corrupt)
    clean = [r for r in lines if not is_corrupt(r.doc_id)]
    assert all(r.distance == 0 and r.cer == "0.00" for r in clean)


def test_ground_truth_matches_corpus_rule(spark, sf_tiny):
    gt = {r.doc_id: r.gt_text for r in ground_truth(spark, sf_tiny).limit(50).collect()}
    docs = duckdb.sql(
        f"select doc_id, text from '{sf_tiny}/documents.parquet' limit 50"
    ).fetchall()
    for doc_id, text in docs:
        if str(doc_id) in gt:
            assert gt[str(doc_id)] == "\n".join(split_lines(text))
