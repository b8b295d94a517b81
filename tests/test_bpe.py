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


def test_bpe_symbol_docs_order_and_reconstruction(spark, tmp_path):
    """The per-doc symbol sequence reconstructs the document: flatten
    over (pos-sorted) word segmentations concatenates back to the text
    with spaces removed, and word ORDER is preserved (posexplode +
    array_sort over (pos, toks) structs — collect_list alone is
    unordered). Words are chosen so any order swap changes the
    reconstruction."""
    from handprint_spark.operators.text_analysis import bpe_symbol_docs

    texts = ["abab cd ef abab", "ef cd abab", "zq abab cd"]
    sf = _write_docs(tmp_path, texts)
    seqs = {r.doc_id: r.toks for r in bpe_symbol_docs(spark, sf).collect()}
    assert set(seqs) == {0, 1, 2}
    for doc_id, text in enumerate(texts):
        assert "".join(seqs[doc_id]) == text.replace(" ", "")


def test_ct_chunk_bpe_window_algebra(spark, tmp_path):
    """ct_chunk_bpe runs the SAME chunk_array core as ct_chunk_tokens
    but over BPE symbols: windows tile the symbol sequence with full
    coverage, interior chunks are full width, and chunk_text
    round-trips the symbol slice."""
    from handprint_spark.operators.html_extract import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        q_ct_chunk_bpe,
    )
    from handprint_spark.operators.text_analysis import bpe_symbol_docs

    # one long doc: 60 words -> >= 60 symbols, guaranteed > CHUNK_TOKENS
    words = ["abab" if i % 3 == 0 else ("cd" if i % 3 == 1 else "ef") for i in range(60)]
    sf = _write_docs(tmp_path, [" ".join(words)])
    toks = bpe_symbol_docs(spark, sf).collect()[0].toks
    n = len(toks)
    assert n > CHUNK_TOKENS

    chunks = q_ct_chunk_bpe(spark, sf).orderBy("chunk_id").collect()
    import math

    assert len(chunks) == 1 + math.ceil((n - CHUNK_TOKENS) / CHUNK_STRIDE)
    covered = set()
    for c in chunks:
        assert c.n_tokens <= CHUNK_TOKENS
        covered.update(range(c.begin_tok, c.begin_tok + c.n_tokens))
        # chunk text round-trips the symbol slice (1-indexed begin_tok)
        assert c.chunk_text == " ".join(toks[c.begin_tok - 1 : c.begin_tok - 1 + c.n_tokens])
    assert covered == set(range(1, n + 1))
    for a, b in zip(chunks, chunks[1:]):
        assert a.begin_tok + CHUNK_STRIDE == b.begin_tok
        assert a.n_tokens == CHUNK_TOKENS


def test_bpe_symbols_with_quotes_and_backslashes(spark, tmp_path):
    """Merge symbols are corpus-derived and spliced into F.expr —
    they MUST be escaped, or the first apostrophe in real text (don't)
    is a ParseException / SQL injection. Corpus of a'b and a\\b words:
    training completes and every word still segments to symbols that
    reconstruct it."""
    from handprint_spark.operators.text_analysis import bpe_train

    sf = _write_docs(tmp_path, ["a'b a'b a\\b", "a'b a\\b don't"])
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    merges, vocab = bpe_train(docs, n_merges=8)
    assert merges  # training ran past quoted-symbol rounds
    assert any("'" in m[3] or "\\" in m[3] for m in merges)
    segs = {r.word: r.toks for r in vocab.collect()}
    for word, toks in segs.items():
        assert "".join(toks) == word


def test_bpe_train_corpus_is_memoized(spark, tmp_path):
    """bpe_train_corpus caches per (session, corpus content, merges):
    two calls return the identical objects; rewriting the corpus at
    the same path drops the memo (content fingerprint in the key)."""
    import time

    from handprint_spark.operators.text_analysis import bpe_train_corpus

    sf = _write_docs(tmp_path, ["abab ab ab"])
    first = bpe_train_corpus(spark, sf)
    again = bpe_train_corpus(spark, sf)
    assert again[0] is first[0] and again[1] is first[1]

    time.sleep(0.01)  # ensure a distinct mtime_ns on the rewrite
    _write_docs(tmp_path, ["xy xy xy"])
    retrained = bpe_train_corpus(spark, sf)
    assert retrained[0] != first[0]
    assert retrained[0][0][1:4] == ("x", "y", "xy")


def test_bpe_fertility_closed_form(spark, tmp_path):
    """Planted bilingual corpus where fertility is known analytically:
    en has SIX distinct 2-char words with counts 10..5 — they consume
    all BPE_MERGES=6 merge rounds (every count beats (x,y)=3), so
    every en word segments to 1 symbol (fertility 1.0) while zz's
    'xy' never merges and stays [x, y] (fertility 2.0). The per-lang
    aggregate must report exactly those ratios and the integer totals
    behind them."""
    from handprint_spark.operators.text_analysis import q_ta_bpe_fertility

    en0 = " ".join(["ab"] * 10 + ["cd"] * 9 + ["ef"] * 8)
    en1 = " ".join(["gh"] * 7 + ["ij"] * 6 + ["kl"] * 5)
    zz = "xy xy xy"
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [en0, en1, zz],
            "lang": ["en", "en", "zz"],
            "source": ["s"] * 3,
            "n_chars": [len(en0), len(en1), len(zz)],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {r.lang: r for r in q_ta_bpe_fertility(spark, str(tmp_path)).collect()}
    assert set(rows) == {"en", "zz"}
    en, z = rows["en"], rows["zz"]
    assert (en.n_words, en.n_bpe_tokens, en.fertility) == (45, 45, 1.0)
    assert (z.n_words, z.n_bpe_tokens, z.fertility) == (3, 6, 2.0)


def test_bpe_fertility_consistent_with_encode(spark, sf_tiny):
    """Cross-operator pin on the real corpus: lang totals fold to the
    same grand totals as the per-doc encode — one segmentation, two
    aggregations, no drift."""
    from handprint_spark.operators.text_analysis import (
        q_ta_bpe_encode,
        q_ta_bpe_fertility,
    )

    fert = q_ta_bpe_fertility(spark, sf_tiny).collect()
    enc = q_ta_bpe_encode(spark, sf_tiny).collect()
    assert sum(r.n_words for r in fert) == sum(r.n_words for r in enc)
    assert sum(r.n_bpe_tokens for r in fert) == sum(r.n_bpe_tokens for r in enc)
    for r in fert:
        assert r.fertility >= 1.0  # a word is never fewer than 1 symbol
