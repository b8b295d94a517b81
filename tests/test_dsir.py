"""DSIR importance selection (cur_dsir_select): target-slice
enrichment, exact top-K selection rule, and score direction."""

from handprint_spark.operators.curation import (
    DSIR_K,
    DSIR_TARGET_LANG,
    q_cur_dsir_select,
)


def test_dsir_selects_exactly_k_and_matches_rank_rule(spark, sf_tiny):
    rows = q_cur_dsir_select(spark, sf_tiny).collect()
    sel = {r.doc_id for r in rows if r.selected}
    assert len(sel) == DSIR_K
    # the selected set IS the top-K under (imp desc, doc_id asc) —
    # recomputed from the returned scores, so a rank/tie drift in the
    # window expression cannot hide
    order = sorted(rows, key=lambda r: (-r.imp_micro, r.doc_id))
    assert {r.doc_id for r in order[:DSIR_K]} == sel


def test_dsir_enriches_target_lang(spark, sf_tiny):
    """The selected set is heavily enriched in target-lang docs vs the
    base rate (measured 2.0-2.3x at both sandbox SFs), and the target
    slice's mean importance exceeds the rest's — the selector finds
    the distribution it was pointed at."""
    rows = q_cur_dsir_select(spark, sf_tiny).collect()
    base = sum(1 for r in rows if r.lang == DSIR_TARGET_LANG) / len(rows)
    sel = [r for r in rows if r.selected]
    sel_rate = sum(1 for r in sel if r.lang == DSIR_TARGET_LANG) / len(sel)
    assert sel_rate >= 1.5 * base
    t = [r.imp_micro for r in rows if r.lang == DSIR_TARGET_LANG]
    o = [r.imp_micro for r in rows if r.lang != DSIR_TARGET_LANG]
    assert sum(t) / len(t) > sum(o) / len(o)
