"""Ground-truth comparison kernels.

Re-implements, from public behavior only, the line-alignment +
Levenshtein/CER comparison of the reference
(/root/reference/handprint/comparison.py:47-188): LCSSEQ-similarity
monotone line alignment with forward search for transposed/missing
lines, re-insertion of extra HTR lines, per-line Levenshtein distance
and CER, and the exact TSV report format (byte-compatible with the
reference's tests/test_comparison.py goldens).

The reference uses the `textdistance` (lcsseq.normalized_similarity)
and `stringdist` (levenshtein) packages; neither is available here, so
both metrics are implemented from their public definitions:

  * levenshtein(a, b): classic unit-cost edit distance.
  * lcsseq normalized similarity: len(LCS(a, b)) / max(len(a), len(b)),
    defined as 1.0 when both strings are empty (textdistance's
    normalized_distance returns 0 when the maximum length is 0).

All functions are pure and deterministic — they run identically on the
driver (for oracle construction) and inside Arrow-batched UDFs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

SIMILARITY_THRESHOLD = 0.5  # reference comparison.py:39
_PUNCTUATION_REMOVER = str.maketrans("", "", ".,:;")  # comparison.py:41


class Line(NamedTuple):
    """One aligned comparison line (reference comparison.py:26-33)."""

    number: Optional[int]  # HTR line number; None = missing from HTR
    distance: int  # Levenshtein distance
    cer: str  # '%.2f'-formatted CER; '100.00' when expected empty
    gt_text: str
    htr_text: str


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (insert/delete/substitute)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    # Two-row DP; O(len(a)*len(b)) time, O(len(b)) space.
    prev = list(range(len(b) + 1))
    cur = [0] * (len(b) + 1)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        for j, cb in enumerate(b, 1):
            cost = 0 if ca == cb else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return prev[len(b)]


def lcs_length(a: str, b: str) -> int:
    """Length of the longest common subsequence of two strings."""
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        best = 0
        for j, cb in enumerate(b, 1):
            if ca == cb:
                v = prev[j - 1] + 1
            else:
                v = prev[j] if prev[j] >= cur[j - 1] else cur[j - 1]
            cur.append(v)
        prev = cur
    return prev[len(b)]


def lcsseq_similarity(a: str, b: str) -> float:
    """Normalized LCSSEQ similarity: lcs / max(len); 1.0 for two empties."""
    maximum = max(len(a), len(b))
    if maximum == 0:
        return 1.0
    return lcs_length(a, b) / maximum


def squeeze_ws(s: str) -> str:
    """Trim + collapse whitespace runs (reference comparison.py:176-178)."""
    return " ".join(s.split())


def relax(s: str) -> str:
    """Relaxed-mode normalize: lowercase + strip ``.,:;``
    (reference comparison.py:115-119)."""
    return s.lower().translate(_PUNCTUATION_REMOVER)


def line_data(gt_line: str, htr_line: str, htr_index: Optional[int]) -> Line:
    """Build one comparison Line (reference comparison.py:175-188)."""
    expected = squeeze_ws(gt_line)
    obtained = squeeze_ws(htr_line)
    distance = levenshtein(expected, obtained)
    if len(expected) > 0:
        cer = "{:.2f}".format(100 * float(distance) / len(expected))
    else:
        cer = "100.00"
    return Line(htr_index, distance, cer, expected, obtained)


def align_lines(htr_text: str, gt_text: str, relaxed: bool = False) -> list[Line]:
    """LCSSEQ monotone alignment of ground-truth lines to HTR lines.

    Mirrors the reference algorithm (comparison.py:110-157): a cursor
    advances through HTR lines; a gt line whose similarity to the
    cursor line is below 0.5 triggers a forward scan; unmatched gt
    lines become (None, ...) rows; HTR lines never matched are
    re-inserted before the first matched line with a larger number.

    One divergence, documented: the reference indexes
    ``htr_lines[htr_index]`` unguarded and would raise IndexError when
    HTR has fewer usable lines than ground truth; here an exhausted
    cursor is treated as "no candidate" (empty string never reaches the
    0.5 threshold against a non-empty gt line, and an empty gt line
    aligned at the exhausted cursor is recorded as missing).
    """
    gt_lines = gt_text.strip().splitlines()
    htr_lines = htr_text.strip().splitlines()
    if relaxed:
        gt_lines = [relax(t) for t in gt_lines]
        htr_lines = [relax(t) for t in htr_lines]

    htr_index = 0
    results: list[Line] = []
    for gt_line in gt_lines:
        in_range = htr_index < len(htr_lines)
        htr_line = htr_lines[htr_index] if in_range else ""
        if in_range and lcsseq_similarity(gt_line, htr_line) >= SIMILARITY_THRESHOLD:
            results.append(line_data(gt_line, htr_line, htr_index))
            htr_index += 1
        else:
            for other_index, other_line in enumerate(htr_lines[htr_index + 1 :], 1):
                if lcsseq_similarity(gt_line, other_line) >= SIMILARITY_THRESHOLD:
                    htr_index += other_index
                    results.append(line_data(gt_line, other_line, htr_index))
                    break
            else:
                results.append(line_data(gt_line, "", None))

    # Extra HTR lines after the last gt-matched position (comparison.py:142-144).
    if len(htr_lines) - (htr_index + 1) > 0:
        for index, line in enumerate(htr_lines[htr_index + 1 :], htr_index + 1):
            results.append(line_data("", line, index))

    # Extra HTR lines at the beginning / middle (comparison.py:149-157).
    matched = [ln.number for ln in results if ln.gt_text != ""]
    extra = [i for i in range(0, len(htr_lines)) if i not in matched]
    for index in extra:
        for pos, ln in enumerate(results):
            if ln.number is not None and index < ln.number:
                results.insert(pos, line_data("", htr_lines[index], index))
                break
    return results


def text_comparison(htr_text: str, gt_text: str, relaxed: bool = False) -> str:
    """Full TSV comparison report, byte-compatible with the reference
    (comparison.py:160-169; goldens in reference tests/test_comparison.py)."""
    results = align_lines(htr_text, gt_text, relaxed)
    output = ["Errors\tCER (%)\tExpected text\tReceived text"]
    total_errors = 0
    for ln in results:
        total_errors += ln.distance
        output.append("{}\t{}\t{}\t{}".format(ln.distance, ln.cer, ln.gt_text, ln.htr_text))
    output.append("Total errors\t\t\t")
    output.append(str(total_errors) + "\t\t\t")
    return "\n".join(output)
