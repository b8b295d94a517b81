"""Kernel tests for the comparison subsystem.

Golden strings come from the reference's own unit tests
(/root/reference/tests/test_comparison.py:18-22) and its worked
example (comparison.py:71-85).
"""

from handprint_spark.kernels.textcmp import (
    align_lines,
    lcs_length,
    lcsseq_similarity,
    levenshtein,
    relax,
    squeeze_ws,
    text_comparison,
)


def test_text_comparison_identical_golden():
    # reference tests/test_comparison.py:19-20 (byte-exact)
    assert text_comparison("a", "a") == (
        "Errors\tCER (%)\tExpected text\tReceived text\n"
        "0\t0.00\ta\ta\n"
        "Total errors\t\t\t\n"
        "0\t\t\t"
    )


def test_text_comparison_mismatch_golden():
    # reference tests/test_comparison.py:21-22 (byte-exact)
    assert text_comparison("a", "b") == (
        "Errors\tCER (%)\tExpected text\tReceived text\n"
        "1\t100.00\tb\t\n"
        "Total errors\t\t\t\n"
        "1\t\t\t"
    )


def test_levenshtein_basic():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2


def test_lcsseq_similarity():
    assert lcs_length("abcde", "ace") == 3
    assert lcsseq_similarity("", "") == 1.0
    assert lcsseq_similarity("abc", "") == 0.0
    assert lcsseq_similarity("abcd", "abcd") == 1.0
    assert abs(lcsseq_similarity("abcd", "abxd") - 0.75) < 1e-12


def test_squeeze_and_relax():
    # reference comparison.py:176-178 and :115-119 semantics
    assert squeeze_ws("  a   b\tc  ") == "a b c"
    assert relax("Hello, World: yes;no.") == "hello world yesno"


def test_alignment_worked_example():
    """The reference docstring example (comparison.py:71-85): extra HTR
    lines at start and end, one gt line missing from HTR."""
    gt = "April 25, 2019\nMy darling,\nwhat a wonderful\nday today was."
    htr = "doc 01\nAvril 25, 2019\nMy darling,\nbay today vas.\nrooujjlh"
    rows = align_lines(htr, gt)
    got = [(r.number, r.gt_text, r.htr_text) for r in rows]
    assert got == [
        (0, "", "doc 01"),
        (1, "April 25, 2019", "Avril 25, 2019"),
        (2, "My darling,", "My darling,"),
        (None, "what a wonderful", ""),
        (3, "day today was.", "bay today vas."),
        (4, "", "rooujjlh"),
    ]


def test_alignment_transposed_lines():
    gt = "alpha beta gamma\ndelta epsilon zeta"
    htr = "delta epsilon zeta\nalpha beta gamma"
    rows = align_lines(htr, gt)
    # gt line 1 matches htr line 1 via forward scan; cursor jumps past
    # htr line 0, which is re-inserted as an extra line.
    numbers = [r.number for r in rows]
    assert 1 in numbers
    assert any(r.gt_text == "" and r.htr_text == "delta epsilon zeta" for r in rows)


def test_relaxed_mode():
    out = text_comparison("HELLO, world.", "hello world", relaxed=True)
    assert "\n0\t0.00\thello world\thello world\n" in out


def test_empty_expected_cer_is_100():
    # reference comparison.py:184-188: empty expected line => '100.00'
    rows = align_lines("extra", "")
    assert rows == [] or all(r.cer == "100.00" for r in rows if r.gt_text == "")


def test_gt_longer_than_htr_does_not_crash():
    # The reference would IndexError here (comparison.py:122); we
    # document and test the guarded behavior instead.
    rows = align_lines("line one", "line one\nline two\nline three")
    assert rows[0].number == 0
    assert [r.number for r in rows[1:]] == [None, None]
