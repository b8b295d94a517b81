"""BPE tokenizer training + encode: closed-form checks on planted
corpora where the merge sequence is known analytically, plus the
greedy left-to-right non-overlapping merge contract."""

from __future__ import annotations

import pandas as pd


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_bpe_train_closed_form(spark, tmp_path):
    """Corpus: 'abab' x2 + 'ab' x3 (as word occurrences).
    Round 0 pair counts: (a,b) = 2*2 + 3 = 7, (b,a) = 2 -> merge ab.
    Round 1: 'abab' segments to [ab, ab] -> (ab, ab) = 2 -> merge abab.
    Round 2: no pairs remain -> training stops early."""
    from handprint_spark.operators.text_analysis import bpe_train

    sf = _write_docs(tmp_path, ["abab ab ab", "abab ab"])
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    merges, vocab = bpe_train(docs, n_merges=5)
    assert merges == [(0, "a", "b", "ab", 7), (1, "ab", "ab", "abab", 2)]
    segs = {r.word: r.toks for r in vocab.collect()}
    assert segs == {"abab": ["abab"], "ab": ["ab"]}


def test_bpe_greedy_ltr_overlap(spark, tmp_path):
    """(a,a) on 'aaa' merges greedily left-to-right non-overlapping:
    [aa, a], then (aa, a) merges next round — the classic run case."""
    from handprint_spark.operators.text_analysis import bpe_train

    sf = _write_docs(tmp_path, ["aaa aaa"])
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    merges, vocab = bpe_train(docs, n_merges=4)
    assert merges == [(0, "a", "a", "aa", 4), (1, "aa", "a", "aaa", 2)]
    assert {r.word: r.toks for r in vocab.collect()} == {"aaa": ["aaa"]}


def test_bpe_tiebreak_is_lexicographic(spark, tmp_path):
    """Equal-count pairs resolve (lhs asc, rhs asc) — the rule both
    engines share via ASCII binary collation."""
    from handprint_spark.operators.text_analysis import bpe_train

    # 'cd' and 'ab' each appear twice: (a,b)=2 and (c,d)=2 tie -> (a,b)
    sf = _write_docs(tmp_path, ["ab cd", "cd ab"])
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    merges, _ = bpe_train(docs, n_merges=1)
    assert merges == [(0, "a", "b", "ab", 2)]


def test_bpe_encode_counts(spark, tmp_path):
    """Encode = explode + equi-join against the trained segmentation:
    per-doc BPE token counts close against hand computation."""
    from handprint_spark.operators.text_analysis import q_ta_bpe_encode

    # trained on this corpus, 'abab'/'ab' fully merge (see closed-form
    # test); 'xy' never merges at 6 rounds?? it may — xy pair count 1.
    sf = _write_docs(tmp_path, ["abab ab ab", "abab ab xy"])
    out = {r.doc_id: r for r in q_ta_bpe_encode(spark, sf).collect()}
    assert out[0].n_words == 3
    assert out[0].n_bpe_tokens == 3  # abab + ab + ab, all single symbols
    assert out[1].n_words == 3
    # 'xy' merges too once its pair tops the remaining queue, so the
    # whole tiny corpus collapses to one symbol per word
    assert out[1].n_bpe_tokens == 3
