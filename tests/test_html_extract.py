"""Semantics of the DOM-heuristic main-content extractor and the
token-window chunker (operators/html_extract.py).

The oracle parity for all four registered queries runs in
test_oracles.py; these tests pin the *behavioral* contract: what the
extractor keeps, what it strips, and the chunker's coverage/overlap
algebra — including on hand-written HTML that does NOT come from the
synthetic generator (the heuristics must be generic line-mode DOM
logic, not an inverse of htmlized()).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from handprint_spark.operators.html_extract import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_tokens,
    htmlized,
    main_content,
    q_hx_main_content,
    q_hx_outlinks,
    q_hx_parse_blocks,
)


def _one_doc(spark, text, doc_id=7, lang="en", source="srcX"):
    return spark.createDataFrame(
        [Row(doc_id=doc_id, text=text, lang=lang, source=source, n_chars=len(text))]
    )


def test_main_content_strips_chrome_keeps_paragraphs(spark):
    words = ["w%02d" % i for i in range(24)]  # 24 5-char words: both halves > 40 chars
    doc = _one_doc(spark, " ".join(words))
    row = main_content(htmlized(doc)).collect()[0]
    # both paragraph halves survive, in order, newline-joined
    assert row.main_text.startswith(" ".join(words[:12]))
    assert "\n" in row.main_text
    assert " ".join(words[12:]) in row.main_text
    # inline anchor text inside a content <p> is *visible text* — kept
    assert "related docs" in row.main_text
    # chrome never leaks: nav links, share bar, footer, ad, script body
    for leaked in ("home", "tweet this", "share", "(c) 2026", "sponsored", "var x=1"):
        assert leaked not in row.main_text
    # the <h1> is 3 short words -> below MIN_CONTENT_CHARS -> dropped
    assert row.n_content_blocks == 2
    assert row.n_blocks == 10
    assert row.boiler_ratio == 0.8


def test_main_content_short_doc_all_boiler(spark):
    row = main_content(htmlized(_one_doc(spark, "tiny text"))).collect()[0]
    assert row.n_content_blocks == 0
    assert row.main_text == ""
    assert row.boiler_ratio == 1.0


def test_extractor_is_generic_not_synthesis_inverse(spark):
    """Hand-written HTML (different tags, order, and chrome than the
    synthetic generator) classifies by the same line-mode rules."""
    html = "\n".join(
        [
            "<header><a href='/'>Logo</a></header>",
            "<article>This hand-written sentence is long enough to clear the floor.</article>",
            "<ul><a href='/a'>one</a> <a href='/b'>two</a> <a href='/c'>three</a></ul>",
            "<section>Another long enough content sentence that should clearly survive.</section>",
            "<style>.x{color:red}</style>",
        ]
    )
    df = spark.createDataFrame([Row(doc_id=1, html=html)])
    row = main_content(df).collect()[0]
    assert "hand-written sentence" in row.main_text
    assert "should clearly survive" in row.main_text
    assert "Logo" not in row.main_text  # header chrome tag
    assert "one" not in row.main_text.split()  # link rail: density 1.0
    assert row.n_content_blocks == 2


def test_parse_blocks_classification_detail(spark, sf_tiny):
    rows = q_hx_parse_blocks(spark, sf_tiny).where("doc_id = 0").orderBy("line_no").collect()
    assert [r.tag for r in rows] == [
        "html", "head", "nav", "h1", "p", "p", "aside", "div", "footer", "",
    ]
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r.tag, r)
    # the share-bar <div> is boiler by link density despite a content tag
    assert by_tag["div"].is_boiler and by_tag["div"].link_density > 0.35
    # chrome tags are boiler regardless of text
    assert by_tag["nav"].is_boiler and by_tag["footer"].is_boiler
    # anchors contribute to visible text but scripts do not
    assert by_tag["head"].text == "doc 0"  # title visible, script body stripped
    assert by_tag["nav"].link_len > 0


def test_outlinks_counts(spark, sf_tiny):
    n_docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").count()
    rows = {r.href: r for r in q_hx_outlinks(spark, sf_tiny).collect()}
    # every page links home, to the share endpoints, and to itself-ish chrome
    for fixed in ("/", "/s/t", "/s/f"):
        assert rows[fixed].n_refs == n_docs and rows[fixed].n_docs == n_docs
    # ad slots partition docs by doc_id % 7
    assert sum(rows[f"/ad/{k}"].n_docs for k in range(7) if f"/ad/{k}" in rows) == n_docs


# --- chunker algebra ----------------------------------------------------------

def test_chunk_tokens_coverage_and_overlap(spark):
    n = 100
    words = [f"t{i}" for i in range(n)]
    chunks = chunk_tokens(_one_doc(spark, " ".join(words))).orderBy("chunk_id").collect()
    # count formula: 1 + ceil((n - CHUNK) / STRIDE)
    import math

    assert len(chunks) == 1 + math.ceil((n - CHUNK_TOKENS) / CHUNK_STRIDE)
    # full coverage: union of [begin, begin + n_tokens) is exactly [1, n]
    covered = set()
    for c in chunks:
        covered.update(range(c.begin_tok, c.begin_tok + c.n_tokens))
    assert covered == set(range(1, n + 1))
    # interior chunks are full width and overlap by CHUNK - STRIDE
    for a, b in zip(chunks, chunks[1:]):
        assert a.begin_tok + CHUNK_STRIDE == b.begin_tok
        if a.chunk_id < chunks[-1].chunk_id:
            assert a.n_tokens == CHUNK_TOKENS
    # chunk text round-trips the token slice
    first = chunks[0]
    assert first.chunk_text == " ".join(words[:CHUNK_TOKENS])


def test_chunk_tokens_short_doc_single_chunk(spark):
    chunks = chunk_tokens(_one_doc(spark, "a b c")).collect()
    assert len(chunks) == 1
    assert chunks[0].n_tokens == 3 and chunks[0].begin_tok == 1
    assert chunks[0].chunk_text == "a b c"


def test_chunk_tokens_exact_boundary(spark):
    """n == CHUNK_TOKENS yields exactly one chunk (no empty tail)."""
    words = [str(i) for i in range(CHUNK_TOKENS)]
    chunks = chunk_tokens(_one_doc(spark, " ".join(words))).collect()
    assert len(chunks) == 1 and chunks[0].n_tokens == CHUNK_TOKENS


def test_custom_chunk_params(spark):
    """chunk/stride are parameters, not baked constants: stride ==
    chunk gives non-overlapping windows that reconstruct the text."""
    words = [f"x{i}" for i in range(50)]
    doc = _one_doc(spark, " ".join(words))
    chunks = chunk_tokens(doc, chunk=16, stride=16).orderBy("chunk_id").collect()
    assert " ".join(c.chunk_text for c in chunks) == " ".join(words)


def test_main_content_matches_parse_blocks(spark, sf_tiny):
    """The zero-shuffle HOF path and the exploded diagnostic view
    agree: content blocks per doc are identical."""
    hof = {
        r.doc_id: r.n_content_blocks
        for r in q_hx_main_content(spark, sf_tiny).collect()
    }
    exploded = {
        r.doc_id: r.n
        for r in q_hx_parse_blocks(spark, sf_tiny)
        .where(~F.col("is_boiler"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for d, n in hof.items():
        assert exploded.get(d, 0) == n


# --- URL canonicalization -----------------------------------------------------

def test_canonical_url_rules(spark):
    from handprint_spark.operators.html_extract import canonical_url

    cases = {
        "HTTPS://WWW.Example.COM:443/doc/9?utm_source=feed&ref=x#frag":
            "https://example.com/doc/9",
        "https://www.example.com/doc/9/": "https://example.com/doc/9",
        "http://Example.com:80/doc/9?id=9&utm_campaign=y":
            "http://example.com/doc/9?id=9",
        # non-default port and meaningful params survive
        "https://example.com:8443/a?page=2": "https://example.com:8443/a?page=2",
        # tracking strip keeps following meaningful params intact
        "https://example.com/a?utm_source=x&page=2": "https://example.com/a?page=2",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r.url: r.canon for r in df.select("url", canonical_url(F.col("url")).alias("canon")).collect()}
    for raw, want in cases.items():
        assert got[raw] == want, f"{raw} -> {got[raw]} (want {want})"


def test_url_dedup_groups(spark, sf_tiny):
    from handprint_spark.operators.html_extract import q_hx_url_canonicalize

    rows = q_hx_url_canonicalize(spark, sf_tiny).collect()
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canon_url, []).append(r)
    for canon, group in by_canon.items():
        keepers = [r for r in group if r.is_keeper]
        assert len(keepers) == 1  # exactly one keeper per canonical group
        assert keepers[0].doc_id == min(r.doc_id for r in group)
        assert all(r.n_variants == len(group) for r in group)
    # variants 0/1/3 of a full quad collapse to one page, variant 2 differs
    full_pages = [g for g in by_canon.values() if len(g) == 3]
    assert full_pages, "expected 3-way canonical groups from variants 0/1/3"


def test_url_revisit_latest_wins(spark, sf_tiny):
    """Latest-fetch-wins semantics: exactly one is_latest row per
    canonical group, it carries the group-max fetch_epoch, every
    row's staleness is the gap to that max (0 on the keeper), and
    n_revisits counts the OTHER snapshots. Variants 0/1/3 of a quad
    share a canonical URL — the synthesized epoch makes variant 3 the
    freshest of the trio — while variant 2 (meaningful ?id= param) is
    a singleton with n_revisits = 0."""
    from handprint_spark.operators.html_extract import q_hx_url_revisit

    rows = q_hx_url_revisit(spark, sf_tiny).collect()
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canon_url, []).append(r)
    assert any(len(g) == 3 for g in by_canon.values())
    assert any(len(g) == 1 for g in by_canon.values())
    for group in by_canon.values():
        latest = [r for r in group if r.is_latest]
        assert len(latest) == 1
        mx = max(r.fetch_epoch for r in group)
        assert latest[0].fetch_epoch == mx
        assert latest[0].staleness_s == 0
        for r in group:
            assert r.n_revisits == len(group) - 1
            assert r.staleness_s == mx - r.fetch_epoch
        if len(group) == 3:  # freshest of the 0/1/3 trio is variant 3
            assert latest[0].doc_id % 4 == 3


def test_bpe_pairs_handcrafted(spark, monkeypatch, tmp_path):
    """Top pair on a handcrafted corpus is the known most frequent
    adjacent pair, and the ranking tie-break is the pair string."""
    import pandas as pd

    from handprint_spark.operators.text_analysis import q_ta_bpe_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b a b a b", "a b c d", "x"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [11, 7, 1],
        }
    )
    d = tmp_path / "documents.parquet"
    docs.to_parquet(d)
    rows = q_ta_bpe_pairs(spark, str(tmp_path)).collect()
    assert rows[0].pair == "a b" and rows[0].n_pairs == 4
    # the 1-token doc contributes nothing (no descending-sequence bug)
    assert all(" " in r.pair for r in rows)
    counts = [r.n_pairs for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_pagerank_closed_form_on_planted_graph(spark, tmp_path):
    """3-doc corpus with ids {0, 1, 2}: the synthetic html links
    doc_id -> doc_id*7 % 1000, so 0 links to itself and 1, 2 link to
    absent ids (their mass drops at the corpus join). Closed form with
    the operator's own integer arithmetic: node 0 compounds
    r <- teleport + (85*r)//100 each round; nodes 1 and 2 sit at the
    teleport floor."""
    import pandas as pd

    from handprint_spark.operators.html_extract import (
        PR_ITERS,
        PR_MICRO,
        q_hx_pagerank,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["one two three four", "five six seven eight", "nine ten more words"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [18, 20, 19],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = {r.doc_id: r.pr_micro for r in q_hx_pagerank(spark, str(tmp_path)).collect()}

    teleport = (15 * PR_MICRO // 100) // 3
    expect0 = PR_MICRO // 3
    for _ in range(PR_ITERS):
        expect0 = teleport + (85 * expect0) // 100
    assert rows == {0: expect0, 1: teleport, 2: teleport}


def test_pagerank_corpus_invariants(spark, sf_tiny):
    """Teleport floor, mass conservation (integer truncation + dropped
    out-of-corpus mass only ever LOSE mass), and in-link mass showing
    up above the floor somewhere."""
    from handprint_spark.operators.html_extract import PR_MICRO, q_hx_pagerank

    rows = q_hx_pagerank(spark, sf_tiny).collect()
    n = len(rows)
    teleport = (15 * PR_MICRO // 100) // n
    prs = [r.pr_micro for r in rows]
    assert min(prs) >= teleport
    assert sum(prs) <= PR_MICRO
    assert max(prs) > teleport


def test_bigram_logprob_closed_form(spark, tmp_path):
    """Hand-computed bigram MLE on a 3-doc corpus, and the <2-token
    doc drops out (no bigram positions, mirrored by the oracle)."""
    import math

    import pandas as pd

    from handprint_spark.operators.text_analysis import q_ta_bigram_logprob

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["x y z", "x z", "solo"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [5, 3, 4],
        }
    )
    (tmp_path / "documents.parquet").write_bytes(b"")
    docs.to_parquet(tmp_path / "documents.parquet")
    rows = {r.doc_id: r for r in q_ta_bigram_logprob(spark, str(tmp_path)).collect()}
    # corpus bigrams: (x,y) (y,z) (x,z); c(x.)=2 c(y.)=1
    # doc1: -ln(1/2) + -ln(1/1) over 2 positions; doc2: -ln(1/2)
    assert set(rows) == {1, 2}
    assert rows[1].n_bigrams == 2
    assert abs(rows[1].avg_neg_logprob - round(math.log(2) / 2, 6)) < 1e-9
    assert abs(rows[2].avg_neg_logprob - round(math.log(2), 6)) < 1e-9


def test_anchor_text_pairs_consistent_with_outlinks(spark, sf_tiny):
    """(href, anchor) extraction pairs text with the SAME tag's href:
    the fixed chrome anchors carry their known texts, and per-href
    totals agree with hx_outlinks' edge counts."""
    from handprint_spark.operators.html_extract import q_hx_anchor_text

    anchors = q_hx_anchor_text(spark, sf_tiny)
    by_pair = {(r.href, r.anchor): r.n_refs for r in anchors.collect()}
    n_docs = q_hx_outlinks(spark, sf_tiny).agg(F.max("n_docs")).collect()[0][0]
    # chrome anchors appear once per page with fixed text
    assert by_pair[("/", "home")] == n_docs
    assert by_pair[("/s/t", "tweet this")] == n_docs
    assert by_pair[("/s/f", "share")] == n_docs
    # per-href totals match the outlink edge counts exactly
    out_counts = {r.href: r.n_refs for r in q_hx_outlinks(spark, sf_tiny).collect()}
    agg = (
        anchors.groupBy("href")
        .agg(F.sum("n_refs").alias("n"))
        .collect()
    )
    assert {r.href: r.n for r in agg} == out_counts


def test_canonical_url_idempotent(spark, sf_tiny):
    """canonical_url is a normal form: applying it to its own output
    is the identity. A frontier that re-canonicalizes already-canonical
    URLs (every recrawl does) must not drift keys."""
    from handprint_spark.operators.html_extract import _messy_urls, canonical_url

    from handprint_spark.operators.html_extract import _docs

    urls = _messy_urls(_docs(spark, sf_tiny))
    once = urls.select(canonical_url(F.col("url")).alias("c1"))
    twice = once.select("c1", canonical_url(F.col("c1")).alias("c2"))
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


def test_tables_grid_recovery(spark, tmp_path):
    """Cell extraction binds cells to their OWN row: a 7-word doc
    fills the 2x3 grid row-major from its leading words; a 2-word doc
    pads the remaining cells with '-'; every doc yields exactly
    rows*cols cells with dense coordinates."""
    import pandas as pd

    from handprint_spark.operators.html_extract import TBL_COLS, TBL_ROWS, q_hx_tables

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c d e f g", "x y"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [13, 3],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    out = q_hx_tables(spark, str(tmp_path)).collect()
    grid = {(r.doc_id, r.row_idx, r.col_idx): r.cell for r in out}
    assert len(out) == 2 * TBL_ROWS * TBL_COLS
    assert [grid[(1, 0, c)] for c in range(TBL_COLS)] == ["a", "b", "c"]
    assert [grid[(1, 1, c)] for c in range(TBL_COLS)] == ["d", "e", "f"]
    assert [grid[(2, 0, c)] for c in range(TBL_COLS)] == ["x", "y", "-"]
    assert [grid[(2, 1, c)] for c in range(TBL_COLS)] == ["-", "-", "-"]


def test_canonical_url_tracking_strip_is_param_anchored(spark):
    """The tracking strip fires only on whole param NAMES: params
    merely ending in 'ref' (pref, href, xref) survive intact, while
    adjacent utm_*/ref params are all removed (the three-pass form —
    a single consuming pass eats the '&' the next match needs, so
    each pass strips alternate members of an adjacent run; three
    passes cover runs up to 7, past the full 5-member utm set)."""
    from pyspark.sql import functions as F

    from handprint_spark.operators.html_extract import canonical_url

    full_utm = (
        "utm_source=a&utm_medium=b&utm_campaign=c&utm_term=d&utm_content=e"
    )
    cases = {
        "https://e.com/p?pref=abc&x=1": "https://e.com/p?pref=abc&x=1",
        "https://e.com/p?href=u&xref=v": "https://e.com/p?href=u&xref=v",
        "https://e.com/p?utm_source=f&ref=x&id=1": "https://e.com/p?id=1",
        "https://e.com/p?utm_a=1&utm_b=2&utm_c=3": "https://e.com/p",
        "https://e.com/p?ref=x": "https://e.com/p",
        # the common full-5 utm set, adjacent — two passes left residue
        f"https://e.com/p?{full_utm}": "https://e.com/p",
        f"https://e.com/p?{full_utm}&id=7": "https://e.com/p?id=7",
        # 7 adjacent tracking params: the documented three-pass bound
        f"https://e.com/p?{full_utm}&ref=r&utm_id=z": "https://e.com/p",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    out = {r.url: r.c for r in df.select("url", canonical_url(F.col("url")).alias("c")).collect()}
    for url, want in cases.items():
        assert out[url] == want, (url, out[url])
    # idempotence at the boundary: re-canonicalizing the stripped
    # forms changes nothing
    again = {
        r.c: r.c2
        for r in df.select(canonical_url(F.col("url")).alias("c"))
        .select("c", canonical_url(F.col("c")).alias("c2"))
        .collect()
    }
    assert all(c == c2 for c, c2 in again.items()), again
