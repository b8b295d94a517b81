"""Incremental (batch-vs-index) dedup: the continuous-ingest protocol.

Covers the three contracts that make ``incremental_dedup`` more than a
one-shot query: planted duplicates are caught against an existing
index, the index is APPEND-ONLY across ingest batches (a batch-3 copy
of a batch-2 doc is caught only because batch 2's accepted bands were
appended), and the incremental verdict agrees exactly with the batch
``minhash_lsh_pairs`` candidate rule on a real corpus split.
"""

import pandas as pd

from handprint_spark.operators.dedup import (
    incremental_dedup,
    minhash_band_posting,
    minhash_lsh_pairs,
)

LOREM = "alpha beta gamma delta epsilon zeta eta theta"
NOVEL2 = "quick brown foxes jump over seven lazy rivers"
NOVEL3 = "nine silver clouds drift past quiet mountain lakes"


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    )


def test_incremental_catches_planted_dup(spark):
    batch1 = _df(spark, [(0, LOREM), (2, NOVEL3)])
    batch2 = _df(spark, [(1, LOREM), (3, NOVEL2)])
    verdicts = {
        r.doc_id: r.dup_of_index
        for r in incremental_dedup(batch2, minhash_band_posting(batch1)).collect()
    }
    assert verdicts == {1: True, 3: False}


def test_incremental_index_append_lifecycle(spark, tmp_path):
    """Batch 3 contains a copy of a BATCH-2 doc: it is flagged only
    because batch 2's accepted bands were appended to the index after
    its own probe — the per-ingest protocol a continuous pipeline
    runs (probe → accept non-dups → append their bands)."""
    idx_dir = str(tmp_path / "band_index")
    batch1 = _df(spark, [(0, LOREM)])
    batch2 = _df(spark, [(10, NOVEL2), (11, LOREM)])
    batch3 = _df(spark, [(20, NOVEL2), (21, NOVEL3)])

    minhash_band_posting(batch1).write.parquet(idx_dir)

    v2 = {
        r.doc_id: r.dup_of_index
        for r in incremental_dedup(batch2, spark.read.parquet(idx_dir)).collect()
    }
    assert v2 == {10: False, 11: True}  # the LOREM copy is caught, NOVEL2 accepted

    accepted = batch2.filter(batch2.doc_id.isin([d for d, dup in v2.items() if not dup]))
    minhash_band_posting(accepted).write.mode("append").parquet(idx_dir)

    v3 = {
        r.doc_id: r.dup_of_index
        for r in incremental_dedup(batch3, spark.read.parquet(idx_dir)).collect()
    }
    # 20 duplicates batch 2's accepted NOVEL2 — catchable only via the append
    assert v3 == {20: True, 21: False}


def test_incremental_agrees_with_batch_candidate_rule(spark, sf_tiny):
    """On the registered even/odd corpus split, an odd doc is
    dup_of_index EXACTLY when the batch LSH self-join emits a
    cross-parity candidate pair containing it — one banding, one
    candidate rule, two execution shapes."""
    from handprint_spark.operators.dedup import _docs, q_dd_incremental

    pairs = minhash_lsh_pairs(_docs(spark, sf_tiny)).collect()
    expected_dups = {
        (p.d1 if p.d1 % 2 == 1 else p.d2)
        for p in pairs
        if (p.d1 % 2) != (p.d2 % 2)
    }
    verdicts = {
        r.doc_id: r.dup_of_index for r in q_dd_incremental(spark, sf_tiny).collect()
    }
    flagged = {d for d, dup in verdicts.items() if dup}
    assert flagged == expected_dups
    assert all(d % 2 == 1 for d in verdicts)  # only the new batch gets verdicts


def test_incremental_probe_at_production_banding(spark, sf_tiny):
    """The probe accepts (k, bands) and MUST be run at the banding the
    index was built with: at the matching production banding an exact
    re-ingest is caught; the demo-banded probe of a production index
    finds nothing (the silent-miss mode the parameter exists to
    avoid)."""
    from pyspark.sql import functions as F

    from handprint_spark.operators.dedup import (
        MINHASH_BANDS_PROD,
        MINHASH_K_PROD,
        _docs,
        incremental_dedup,
        minhash_band_posting,
    )

    import pytest

    docs = _docs(spark, sf_tiny).limit(50).cache()
    idx = minhash_band_posting(docs, MINHASH_K_PROD, MINHASH_BANDS_PROD)
    verdicts = {
        r.doc_id: r.dup_of_index
        for r in incremental_dedup(docs, idx, MINHASH_K_PROD, MINHASH_BANDS_PROD).collect()
    }
    assert all(verdicts.values())  # every doc is its own exact dup
    # demo-banded probe of a production index: structural validation
    # RAISES instead of silently reporting zero duplicates
    with pytest.raises(ValueError, match="does not match the index"):
        incremental_dedup(docs, idx).agg(
            F.sum(F.col("dup_of_index").cast("int")).alias("n")
        ).collect()
    # ... and the unvalidated form still demonstrates the silent-miss
    # mode the check exists for
    mismatched = incremental_dedup(docs, idx, validate_banding=False).agg(
        F.sum(F.col("dup_of_index").cast("int")).alias("n")
    ).collect()[0].n
    assert mismatched == 0  # demo keys never match production keys
    docs.unpersist()
