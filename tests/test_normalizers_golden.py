"""X1–X5 normalizers vs the reference's end-to-end golden fixtures.

The reference ships, for one real scanned page, the raw JSON each
cloud service returned and the text it extracted from it
(/root/reference/dev/services/sample-output/
dag-304-DAG_1_1_8_0029.handprint-<service>.{json,txt}). Feeding the
same raw JSON through our pure normalizers must reproduce the .txt
byte-for-byte — this proves the parse+reading-order logic (X1-X5 + W1)
without any network or image decode.

Also round-trips our synthetic service-shape emitters through the
normalizers (emit(decode(text)) -> normalize -> same text), which is
how the Spark-side from_json pipelines get known-by-construction
fixtures.
"""

import json
import os

import pytest

from handprint_spark.kernels import normalizers as N
from handprint_spark.kernels.decoder import decode_page

GOLDEN_DIR = "/root/reference/dev/services/sample-output"
GOLDEN_BASE = os.path.join(GOLDEN_DIR, "dag-304-DAG_1_1_8_0029.handprint-")

CASES = [
    ("microsoft", lambda raw: N.normalize_microsoft(raw)),
    ("google", lambda raw: N.normalize_google(raw)),
    # Amazon full_text does not depend on image dims; boxes do. The jp2
    # dims are irrelevant to the text golden, so any dims work here.
    ("amazon-textract", lambda raw: N.normalize_textract(raw, 1000, 1000)),
    ("amazon-rekognition", lambda raw: N.normalize_rekognition(raw, 1000, 1000)),
]


@pytest.mark.skipif(not os.path.isdir(GOLDEN_DIR), reason="reference fixtures absent")
@pytest.mark.parametrize("service,fn", CASES, ids=[c[0] for c in CASES])
def test_golden_text_byte_exact(service, fn):
    with open(GOLDEN_BASE + service + ".json") as f:
        raw = json.load(f)
    with open(GOLDEN_BASE + service + ".txt") as f:
        expected = f.read()
    tr = fn(raw)
    assert tr.error is None
    assert tr.text == expected  # byte-for-byte, trailing newline included
    assert len(tr.boxes) > 0
    assert all(b.kind in ("word", "line", "para") for b in tr.boxes)
    assert all(0.0 <= b.score <= 1.0 for b in tr.boxes)


@pytest.mark.skipif(not os.path.isdir(GOLDEN_DIR), reason="reference fixtures absent")
def test_golden_box_conventions():
    """Box-shape invariants of the unified model (reference base.py:37-43):
    flat 8-int corner lists; Amazon scores rescaled /100; Microsoft line
    boxes carry empty text and score 1.0."""
    with open(GOLDEN_BASE + "microsoft.json") as f:
        ms = N.normalize_microsoft(json.load(f))
    line_boxes = [b for b in ms.boxes if b.kind == "line"]
    assert line_boxes and all(b.text == "" and b.score == 1.0 for b in line_boxes)
    assert all(len(b.bb) == 8 for b in ms.boxes)

    with open(GOLDEN_BASE + "amazon-textract.json") as f:
        az = N.normalize_textract(json.load(f), 1000, 1000)
    assert all(0.0 <= b.score <= 1.0 for b in az.boxes)
    assert all(len(b.bb) == 8 and all(isinstance(v, int) for v in b.bb) for b in az.boxes)


@pytest.mark.parametrize("service", ["amazon-textract", "amazon-rekognition", "google", "microsoft"])
def test_emitter_normalizer_roundtrip(service):
    """emit(decode(text)) -> normalize == reading-order text again."""
    text = "zeta alpha\nbeta gamma delta\nomega"
    tr = decode_page(text)
    w, h = 400, 100
    if service == "amazon-textract":
        raw = N.emit_textract(tr, w, h)
        out = N.normalize_textract(raw, w, h)
        assert out.text == text + "\n"  # Amazon appends trailing newline (A3)
    elif service == "amazon-rekognition":
        raw = N.emit_rekognition(tr, w, h)
        out = N.normalize_rekognition(raw, w, h)
        assert out.text == text + "\n"
    elif service == "google":
        raw = N.emit_google(tr)
        out = N.normalize_google(raw)
        assert out.text == text  # google passes through the provided text
        # google quirk: word score == paragraph's confidence
        para_scores = [b.score for b in out.boxes if b.kind == "para"]
        word_scores = [b.score for b in out.boxes if b.kind == "word"]
        assert set(word_scores) <= set(para_scores)
    else:
        raw = N.emit_microsoft(tr, shuffle=True)
        out = N.normalize_microsoft(raw)
        # lines were emitted reversed; the (y, x) sort restores reading order
        assert out.text == text


def test_google_incomplete_vertex_guard():
    # FIXTURES.md: a word with a vertex missing 'y' must be skipped.
    raw = {
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
    }
    out = N.normalize_google(raw)
    assert [b.kind for b in out.boxes] == ["para"]  # word dropped, para kept


def test_amazon_missing_xy_guard():
    # amazon.py:224-229: any corner lacking X/Y -> empty list -> box dropped
    raw = {"Blocks": [
        {"BlockType": "LINE", "Text": "t", "Confidence": 50.0,
         "Geometry": {"Polygon": [{"X": 0.1}, {"X": 0.2, "Y": 0.1},
                                   {"X": 0.2, "Y": 0.2}, {"X": 0.1, "Y": 0.2}]}},
    ]}
    out = N.normalize_textract(raw, 100, 100)
    assert out.boxes == []
    assert out.text == "t\n"  # full text still accumulates (amazon.py:149-153)
