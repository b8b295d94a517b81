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
def rows(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gopher")
    clean = "the and " + " ".join(f"w{i:02d}" for i in range(58))  # 60 words
    spam = " ".join(["spam"] * 60)
    short = " ".join(f"u{i}" for i in range(10))
    filler = [f"f{i:02d}" for i in range(48)]
    dup5 = " ".join(
        filler[:24] + ["pp", "qq", "rr", "ss", "tt"]
        + filler[24:] + ["pp", "qq", "rr", "ss", "tt"]
    )  # 58 words, the 5-gram (pp qq rr ss tt) appears exactly twice
    sf = _write_docs(tmp, [clean, spam, short, dup5])
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
