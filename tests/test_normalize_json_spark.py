"""Parity: the Catalyst from_json pipelines (X1-X5 JVM-side) must
produce exactly the same (text, boxes) as the pure normalizers — which
themselves byte-match the reference's sample-output goldens. This
closes the chain: reference goldens == kernels == Spark plans.

Fixtures: deterministic service-shape emissions of decoded synthetic
pages (FIXTURES.md §4), including the F6 edge cases (incomplete
vertices) and reversed Microsoft line order (W1 must re-sort)."""

import json

import pytest

from handprint_spark.kernels import normalizers as N
from handprint_spark.kernels.decoder import decode_page
from handprint_spark.operators import normalize_json as NJ

PAGES = [
    "zeta alpha\nbeta gamma delta\nomega",
    "one two three four\nfive six",
    "single",
    "",  # empty page: no boxes, empty text
]
W, H = 400, 120

SERVICES = ["amazon-textract", "amazon-rekognition", "google", "microsoft"]


def _emit(service, tr):
    if service == "amazon-textract":
        return N.emit_textract(tr, W, H)
    if service == "amazon-rekognition":
        return N.emit_rekognition(tr, W, H)
    if service == "google":
        return N.emit_google(tr)
    return N.emit_microsoft(tr, shuffle=True)


def _normalize_pure(service, raw):
    return N.NORMALIZERS[service](raw, W, H)


@pytest.fixture(scope="module")
def raw_df(spark):
    rows = []
    for i, page in enumerate(PAGES):
        tr = decode_page(page)
        for svc in SERVICES:
            rows.append((f"doc-{i}", svc, json.dumps(_emit(svc, tr)), W, H))
    return spark.createDataFrame(
        rows, "doc_id string, service string, raw_json string, width int, height int"
    ).cache()


@pytest.mark.parametrize("service", SERVICES)
def test_spark_parse_equals_pure_normalizer(spark, raw_df, service):
    df = raw_df.filter(raw_df.service == service)
    parsed = NJ.PARSERS[service](df, "raw_json", "width", "height")
    got = {
        r.doc_id: (r.text, [(b.kind, list(b.bb), b.text, round(b.score, 9)) for b in r.boxes])
        for r in parsed.select("doc_id", "text", "boxes").collect()
    }
    for i, page in enumerate(PAGES):
        raw = _emit(service, decode_page(page))
        pure = _normalize_pure(service, raw)
        exp_boxes = [(b.kind, list(b.bb), b.text, round(b.score, 9)) for b in pure.boxes]
        assert got[f"doc-{i}"][0] == pure.text, f"text mismatch doc-{i}"
        assert got[f"doc-{i}"][1] == exp_boxes, f"boxes mismatch doc-{i}"


def test_amazon_vertex_guard_in_spark(spark):
    raw = json.dumps({"Blocks": [
        {"BlockType": "LINE", "Text": "t", "Confidence": 50.0,
         "Geometry": {"Polygon": [{"X": 0.1}, {"X": 0.2, "Y": 0.1},
                                   {"X": 0.2, "Y": 0.2}, {"X": 0.1, "Y": 0.2}]}},
    ]})
    df = spark.createDataFrame([("d", raw, 100, 100)], "doc_id string, raw_json string, width int, height int")
    out = NJ.parse_amazon(df, "raw_json", "width", "height", "textract").collect()[0]
    assert list(out.boxes) == []
    assert out.text == "t\n"


def test_google_vertex_guard_in_spark(spark):
    raw = json.dumps({
        "full_text_annotation": {
            "text": "hi",
            "pages": [{"blocks": [{"paragraphs": [{
                "confidence": 0.9,
                "bounding_box": {"vertices": [{"x": 0, "y": 0}] * 4},
                "words": [
                    {"bounding_box": {"vertices": [{"x": 1}, {"x": 2, "y": 1},
                                                   {"x": 2, "y": 3}, {"x": 1, "y": 3}]},
                     "symbols": [{"text": "h"}, {"text": "i"}]},
                ],
            }]}]}],
        }
    })
    df = spark.createDataFrame([("d", raw)], "doc_id string, raw_json string")
    out = NJ.parse_google(df, "raw_json").collect()[0]
    assert [b.kind for b in out.boxes] == ["para"]


def test_microsoft_reading_order_w1(spark):
    """Out-of-order lines (same y different x, and different y) are
    sorted (y, x) for full_text, while boxes keep service order."""
    raw = json.dumps({"analyzeResult": {"readResults": [{"lines": [
        {"boundingBox": [50, 30, 90, 30, 90, 40, 50, 40], "text": "right-low", "words": []},
        {"boundingBox": [10, 30, 40, 30, 40, 40, 10, 40], "text": "left-low", "words": []},
        {"boundingBox": [10, 5, 40, 5, 40, 15, 10, 15], "text": "top", "words": []},
    ]}]}})
    df = spark.createDataFrame([("d", raw)], "doc_id string, raw_json string")
    out = NJ.parse_microsoft(df, "raw_json").collect()[0]
    assert out.text == "top\nleft-low\nright-low"
    assert [b.text for b in out.boxes] == ["", "", ""]  # line boxes, service order
    assert [b.score for b in out.boxes] == [1.0, 1.0, 1.0]


def test_empty_and_malformed_json(spark):
    df = spark.createDataFrame(
        [("a", "{}", 10, 10), ("b", "not json", 10, 10), ("c", None, 10, 10)],
        "doc_id string, raw_json string, width int, height int",
    )
    for svc in SERVICES:
        out = NJ.PARSERS[svc](df, "raw_json", "width", "height").collect()
        for r in out:
            assert r.text == ""
            assert list(r.boxes) == []


def test_xsvc_fanout_all_services_agree_on_box_counts(spark, sf_tiny):
    """The (doc x service) fan-out: every doc yields exactly four
    service rows, and all four normalizers see the same box population
    (n_boxes identical across services for a given doc — the emitters
    project the same decode)."""
    from pyspark.sql import functions as F

    from handprint_spark.operators.service_fanout import SERVICES, q_xsvc_results

    out = q_xsvc_results(spark, sf_tiny)
    agg = out.groupBy("doc_id").agg(
        F.count("*").alias("n_services"),
        F.countDistinct("n_boxes").alias("distinct_counts"),
        F.countDistinct("service").alias("distinct_services"),
    )
    rows = agg.collect()
    assert rows and all(r.n_services == len(SERVICES) for r in rows)
    assert all(r.distinct_counts == 1 for r in rows)
    assert all(r.distinct_services == len(SERVICES) for r in rows)


def test_null_words_does_not_null_boxes_google(spark):
    """flatten() null-propagates: one paragraph without 'words' (or
    one block without 'paragraphs') must not null the whole boxes
    column — the Python normalizer keeps every other box."""
    raw = json.dumps({
        "full_text_annotation": {
            "text": "hi",
            "pages": [{"blocks": [
                {"paragraphs": [{
                    "confidence": 0.9,
                    "bounding_box": {"vertices": [{"x": 0, "y": 0}, {"x": 5, "y": 0},
                                                  {"x": 5, "y": 5}, {"x": 0, "y": 5}]},
                    # no "words" key at all
                }]},
                {},  # no "paragraphs" key at all
                {"paragraphs": [{
                    "confidence": 0.8,
                    "bounding_box": {"vertices": [{"x": 1, "y": 1}, {"x": 6, "y": 1},
                                                  {"x": 6, "y": 6}, {"x": 1, "y": 6}]},
                    "words": [{"bounding_box": {"vertices": [{"x": 1, "y": 1}, {"x": 2, "y": 1},
                                                             {"x": 2, "y": 2}, {"x": 1, "y": 2}]},
                               "symbols": [{"text": "h"}, {"text": "i"}]}],
                }]},
            ]}],
        }
    })
    df = spark.createDataFrame([("d", raw)], "doc_id string, raw_json string")
    out = NJ.parse_google(df, "raw_json").collect()[0]
    assert out.boxes is not None
    assert [b.kind for b in out.boxes] == ["para", "para", "word"]
    assert [b.text for b in out.boxes] == ["", "", "hi"]


def test_null_words_does_not_null_boxes_microsoft(spark):
    raw = json.dumps({"analyzeResult": {"readResults": [{"lines": [
        {"boundingBox": [10, 5, 40, 5, 40, 15, 10, 15], "text": "top"},  # no words
        {"boundingBox": [10, 30, 40, 30, 40, 40, 10, 40], "text": "low",
         "words": [{"boundingBox": [11, 31, 20, 31, 20, 39, 11, 39],
                    "text": "low", "confidence": 0.7}]},
    ]}]}})
    df = spark.createDataFrame([("d", raw)], "doc_id string, raw_json string")
    out = NJ.parse_microsoft(df, "raw_json").collect()[0]
    assert out.boxes is not None
    assert [(b.kind, b.text) for b in out.boxes] == [
        ("line", ""), ("line", ""), ("word", "low")]
    assert out.text == "top\nlow"


def test_textless_line_block_emits_empty_full_text(spark):
    """A LINE block with no Text contributes nothing (reference
    amazon.py:149-153): a document whose only LINE lacks Text gets
    full_text '' — not a bare newline."""
    raw = json.dumps({"Blocks": [
        {"BlockType": "LINE", "Confidence": 50.0,
         "Geometry": {"Polygon": [{"X": 0.1, "Y": 0.1}, {"X": 0.2, "Y": 0.1},
                                   {"X": 0.2, "Y": 0.2}, {"X": 0.1, "Y": 0.2}]}},
    ]})
    df = spark.createDataFrame([("d", raw, 100, 100)],
                               "doc_id string, raw_json string, width int, height int")
    out = NJ.parse_amazon(df, "raw_json", "width", "height", "textract").collect()[0]
    assert out.text == ""
