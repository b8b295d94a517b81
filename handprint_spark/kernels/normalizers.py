"""X1–X5 — per-service raw-result normalizers (pure functions).

Each function takes a service-shaped raw dict (the ``TRResult.data``
payload of the reference) and produces the unified ``(text, boxes)``
shape, mirroring the reference adapters' parse logic exactly:

  * amazon (shared Textract/Rekognition): reference amazon.py:131-155,
    218-230 — WORD/LINE blocks only, percent coords scaled by image
    dims with Python ``round()``, confidence /100, full_text = LINE
    texts joined with '\\n' **with a trailing newline**.
  * google: reference google.py:156-202 — page 1 only, 'para' box per
    paragraph (unconditionally, even with an empty corner list), word
    boxes only when corners are complete, word text = symbol concat,
    word score = the *paragraph's* confidence (a reference quirk we
    preserve), full_text = the service-provided text.
  * microsoft: reference microsoft.py:107-133 — page 1 only, full_text
    = line texts sorted by (boundingBox[1], boundingBox[0]) i.e.
    top-to-bottom then left-to-right ("reading order", W1), joined
    with '\\n' and **no trailing newline**; line boxes carry empty text
    and score 1.0, word boxes carry word confidences; box order is the
    service's original line order, not the sorted order.

Also provides deterministic *emitters* that project the X9 decoder's
unified result into each service's raw JSON shape — the synthetic
analog of dev/services/sample-output fixtures, so the normalizers are
exercised against known-by-construction inputs.

This module also documents one divergence: the reference's Google
``corner_list`` (google.py:192-202) guards only ``len(vertices) < 4``
but its own comment (google.py:187-190) says incomplete vertices
(missing 'x'/'y') occur in practice and must be rejected; indexing
them would raise KeyError. We implement the documented intent: any
vertex missing 'x' or 'y' yields an empty corner list.
"""

from __future__ import annotations

from typing import Optional

from .decoder import Box, TRResult


# --- corner-list helpers -------------------------------------------------

def amazon_corner_list(polygon: list, width: int, height: int) -> list:
    """Percent coords -> pixel flat list (reference amazon.py:218-230).
    Python round() (banker's) kept deliberately — see SURVEY.md §7."""
    corners = []
    for pc in polygon:
        if "X" in pc and "Y" in pc:
            corners.append(int(round(pc["X"] * width)))
            corners.append(int(round(pc["Y"] * height)))
        else:
            return []
    return corners


def google_corner_list(vertices: list) -> list:
    """Flatten Google vertices (reference google.py:192-202 + its
    documented intent for incomplete vertices)."""
    if len(vertices) < 4:
        return []
    corners = []
    for v in vertices:
        if "x" not in v or "y" not in v:
            return []
        corners.append(v["x"])
        corners.append(v["y"])
    return corners


# --- normalizers (X1-X5) --------------------------------------------------

def normalize_amazon(
    raw: dict, width: int, height: int, result_key: str, value_key: str, block_key: str
) -> TRResult:
    """Shared Textract/Rekognition parse (reference amazon.py:131-155)."""
    full_text = ""
    boxes: list[Box] = []
    for block in raw.get(result_key, []):
        if value_key not in block:
            continue
        kind = block[value_key].lower()
        if kind in ("word", "line"):
            text = block.get(block_key, "")
            corners = amazon_corner_list(block["Geometry"]["Polygon"], width, height)
            if corners:
                boxes.append(Box(kind, corners, text, block["Confidence"] / 100))
        if kind == "line":
            if "Text" in block:
                full_text += block["Text"] + "\n"
            elif "DetectedText" in block:
                full_text += block["DetectedText"] + "\n"
    return TRResult(full_text, boxes, None)


def normalize_textract(raw: dict, width: int, height: int) -> TRResult:
    return normalize_amazon(raw, width, height, "Blocks", "BlockType", "Text")


def normalize_rekognition(raw: dict, width: int, height: int) -> TRResult:
    return normalize_amazon(raw, width, height, "TextDetections", "Type", "DetectedText")


def normalize_google(raw: dict) -> TRResult:
    """Google Vision parse (reference google.py:156-181)."""
    boxes: list[Box] = []
    fta = raw.get("full_text_annotation") or {}
    pages = fta.get("pages") or []
    if pages:
        for block in pages[0].get("blocks", []):
            for para in block.get("paragraphs", []):
                corners = google_corner_list(para["bounding_box"]["vertices"])
                boxes.append(Box("para", corners, "", para["confidence"]))
                for word in para.get("words", []):
                    text = "".join(s["text"] for s in word.get("symbols", []))
                    corners = google_corner_list(word["bounding_box"]["vertices"])
                    if corners:
                        boxes.append(Box("word", corners, text, para["confidence"]))
    return TRResult(fta.get("text", ""), boxes, None)


def normalize_microsoft(raw: dict) -> TRResult:
    """Azure Read parse (reference microsoft.py:107-133), incl. the W1
    reading-order sort for full_text."""
    lines = []
    full_text = ""
    analysis = raw.get("analyzeResult")
    if analysis and "readResults" in analysis and analysis["readResults"]:
        lines = analysis["readResults"][0]["lines"]
        sorted_lines = sorted(lines, key=lambda x: (x["boundingBox"][1], x["boundingBox"][0]))
        full_text = "\n".join(x["text"] for x in sorted_lines)
    boxes: list[Box] = []
    for line in lines:
        boxes.append(Box("line", line["boundingBox"], "", 1.0))
        for word in line["words"]:
            boxes.append(Box("word", word["boundingBox"], word["text"], word["confidence"]))
    return TRResult(full_text, boxes, None)


NORMALIZERS = {
    "amazon-textract": lambda raw, w, h: normalize_textract(raw, w, h),
    "amazon-rekognition": lambda raw, w, h: normalize_rekognition(raw, w, h),
    "google": lambda raw, w, h: normalize_google(raw),
    "microsoft": lambda raw, w, h: normalize_microsoft(raw),
}


# --- service-shape emitters (synthetic raw fixtures) -----------------------

def _poly_pct(bb: list, width: int, height: int) -> list:
    return [
        {"X": bb[i] / width, "Y": bb[i + 1] / height} for i in range(0, 8, 2)
    ]


def _vertices(bb: list) -> list:
    return [{"x": bb[i], "y": bb[i + 1]} for i in range(0, 8, 2)]


def emit_amazon(
    tr: TRResult, width: int, height: int, result_key: str, value_key: str, block_key: str
) -> dict:
    """Project a unified decode into the flat Amazon block shape."""
    blocks = [{value_key: "PAGE"}]
    for b in tr.boxes:
        if b.kind == "para":
            continue
        blocks.append(
            {
                value_key: b.kind.upper(),
                block_key: b.text,
                "Confidence": round(b.score * 100, 4),
                "Geometry": {"Polygon": _poly_pct(b.bb, width, height)},
            }
        )
    return {result_key: blocks}


def emit_textract(tr: TRResult, width: int, height: int) -> dict:
    return emit_amazon(tr, width, height, "Blocks", "BlockType", "Text")


def emit_rekognition(tr: TRResult, width: int, height: int) -> dict:
    return emit_amazon(tr, width, height, "TextDetections", "Type", "DetectedText")


def emit_google(tr: TRResult) -> dict:
    """Project a unified decode into Google's nested shape: one
    paragraph per decoded line, words with per-character symbols."""
    paragraphs = []
    current: Optional[dict] = None
    for b in tr.boxes:
        if b.kind == "line":
            current = {
                "confidence": b.score,
                "bounding_box": {"vertices": _vertices(b.bb)},
                "words": [],
            }
            paragraphs.append(current)
        elif b.kind == "word" and current is not None:
            current["words"].append(
                {
                    "bounding_box": {"vertices": _vertices(b.bb)},
                    "symbols": [{"text": ch} for ch in b.text],
                }
            )
    return {
        "full_text_annotation": {
            "text": tr.text,
            "pages": [{"blocks": [{"paragraphs": paragraphs}]}],
        }
    }


def emit_microsoft(tr: TRResult, shuffle: bool = True) -> dict:
    """Project a unified decode into Azure Read shape. ``shuffle``
    reverses line order so the W1 (y, x) sort is actually exercised."""
    ms_lines = []
    current: Optional[dict] = None
    for b in tr.boxes:
        if b.kind == "line":
            current = {"boundingBox": list(b.bb), "text": b.text, "words": []}
            ms_lines.append(current)
        elif b.kind == "word" and current is not None:
            current["words"].append(
                {"boundingBox": list(b.bb), "text": b.text, "confidence": b.score}
            )
    if shuffle:
        ms_lines = list(reversed(ms_lines))
    return {"analyzeResult": {"readResults": [{"lines": ms_lines}]}}
