"""Semantic tests for the Gopher quality-rule bundle
(`ta_gopher_rules`): handcrafted documents with hand-computed rule
values, plus the gate verdict on clean vs degenerate inputs.
"""

import pandas as pd
import pytest

from handprint_spark.operators.text_analysis import q_ta_gopher_rules


def _write_docs(tmp_path, texts):
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


@pytest.fixture(scope="module")
def sf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gopher")
    clean = "the and " + " ".join(f"w{i:02d}" for i in range(58))  # 60 words
    spam = " ".join(["spam"] * 60)
    short = " ".join(f"u{i}" for i in range(10))
    filler = [f"f{i:02d}" for i in range(48)]
    dup5 = " ".join(
        filler[:24] + ["pp", "qq", "rr", "ss", "tt"]
        + filler[24:] + ["pp", "qq", "rr", "ss", "tt"]
    )  # 58 words, the 5-gram (pp qq rr ss tt) appears exactly twice
    return _write_docs(tmp, [clean, spam, short, dup5])


@pytest.fixture(scope="module")
def rows(spark, sf):
    return {r.doc_id: r for r in q_ta_gopher_rules(spark, sf).collect()}


def test_clean_doc_passes_all_gates(rows):
    r = rows[1]
    assert r.n_words == 60
    assert r.mean_word_len == 3.0
    assert r.frac_alpha_words == 1.0
    assert r.stop_hits == 2
    # all 2-grams distinct: top2 = one occurrence of a 6-char gram / 180
    assert r.top2_frac == round(6 / 180, 4)
    assert r.dup5_frac == 0.0 and r.dup10_frac == 0.0
    assert r.passes_gopher is True


def test_repetitious_doc_fails_repetition_gates(rows):
    r = rows[2]
    # every 2-gram identical: 59 occurrences x 8 chars / 240 total
    assert r.top2_frac == round(59 * 8 / 240, 4)
    assert r.dup5_frac == 1.0 and r.dup10_frac == 1.0
    assert r.passes_gopher is False


def test_short_doc_fails_word_count_gate(rows):
    r = rows[3]
    assert r.n_words == 10
    # exactly one 10-gram position: occurs once, not a duplicate
    assert r.dup10_frac == 0.0
    assert r.passes_gopher is False


def test_duplicate_5gram_position_fraction(rows):
    r = rows[4]
    assert r.n_words == 58
    ng = 58 - 5 + 1
    assert r.dup5_frac == round(2 / ng, 4)
    # the duplicated run spans 2-grams too: each interior pair (e.g.
    # "pp qq", 4 chars) occurs twice -> product 8, beating every
    # unique 6-char filler pair's product of 6
    total_chars = 48 * 3 + 10 * 2
    assert r.top2_frac == round(2 * 4 / total_chars, 4)
    assert r.passes_gopher is False  # mean word len 2.9 < 3 and dup5 gate

# --- posting-list (scale) form of the duplicate-5-gram rule -------------------


def test_dup_posting_matches_array_form_on_planted_docs(spark, sf, rows):
    """The explode→groupBy posting form computes the identical dup5
    fraction as the in-row O(L²) array form on every planted doc —
    including the short doc (n_words < 5), which must keep its row
    with (0, 0, 0.0) rather than disappear into the explode."""
    from handprint_spark.operators.text_analysis import q_ta_gopher_dup_posting

    posting = {r.doc_id: r for r in q_ta_gopher_dup_posting(spark, sf).collect()}
    assert set(posting) == set(rows)
    for doc_id, r in rows.items():
        p = posting[doc_id]
        assert p.dup5_frac == r.dup5_frac, doc_id
        expect_positions = max(r.n_words - 5 + 1, 0) if r.n_words >= 5 else 0
        assert p.n_positions == expect_positions, doc_id
    # the planted duplicate run: exactly the 2 positions holding
    # "pp qq rr ss tt" are duplicated out of 54
    assert posting[4].n_dup_positions == 2


def test_dup_posting_keeps_short_doc_rows(spark, tmp_path):
    """Docs below the gram width (n_words < 5) must keep their row via
    explode_outer's null gram — (0, 0, 0.0), not a vanished doc_id —
    matching the array form's CASE WHEN n_words < 5 THEN 0.0 branch."""
    from handprint_spark.operators.text_analysis import q_ta_gopher_dup_posting

    sf = _write_docs(tmp_path, ["one two", "a b c d e a b c d e a b c d"])
    posting = {r.doc_id: r for r in q_ta_gopher_dup_posting(spark, sf).collect()}
    assert posting[1].n_positions == 0
    assert posting[1].n_dup_positions == 0
    assert posting[1].dup5_frac == 0.0
    # 14 words -> 10 positions; "a b c d e" twice and every 5-gram in
    # the overlap region repeats: positions 1..5 match 6..10 pairwise
    assert posting[2].n_positions == 10
    assert posting[2].n_dup_positions == 10
    assert posting[2].dup5_frac == 1.0


def test_dup_posting_matches_array_form_on_corpus(spark, sf_tiny):
    """Whole-corpus identity on the sf0.001 documents table: the two
    plan shapes are interchangeable answers to the same rule."""
    from handprint_spark.operators.text_analysis import (
        q_ta_gopher_dup_posting,
        q_ta_gopher_rules,
    )

    array_form = {
        r.doc_id: r.dup5_frac
        for r in q_ta_gopher_rules(spark, sf_tiny).select("doc_id", "dup5_frac").collect()
    }
    posting_form = {
        r.doc_id: r.dup5_frac
        for r in q_ta_gopher_dup_posting(spark, sf_tiny).collect()
    }
    assert posting_form == array_form
