"""SemDeDup (dd_semdedup): within-trained-cluster exact integer
epsilon-ball pruning — independent numpy replay of the full verdict
table, verdict-shape invariants, and non-triviality."""

import numpy as np

from handprint_spark.operators.dedup import SEMDEDUP_TAU, q_dd_semdedup
from handprint_spark.operators.similarity import (
    CENTROID_IDS,
    CENTROID_SCALE,
    KMEANS_ITERS,
)


def _replay(spark, sf_dir):
    """Pure-numpy replay of kmeans_train + the epsilon-ball verdict,
    sharing NOTHING with the Spark path but the published constants —
    the same independence standard as the classifier GD replay."""
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    M = np.floor(np.array([r.embedding for r in rows], dtype=np.float64) * CENTROID_SCALE).astype(np.int64)
    cids = np.arange(len(CENTROID_IDS), dtype=np.int64)
    Cm = M[np.isin(ids, CENTROID_IDS)]
    for _ in range(KMEANS_ITERS):
        d2 = (M * M).sum(1)[:, None] + (Cm * Cm).sum(1)[None, :] - 2 * (M @ Cm.T)
        a = cids[np.argmin(d2, 1)]
        new = np.unique(a)
        Cm = np.array(
            [np.floor(M[a == c].sum(0) / (a == c).sum()).astype(np.int64) for c in new]
        )
        cids = new
    d2 = (M * M).sum(1)[:, None] + (Cm * Cm).sum(1)[None, :] - 2 * (M @ Cm.T)
    assign = cids[np.argmin(d2, 1)]
    verdict = {}
    for k, vid in enumerate(ids):
        same = np.where((assign == assign[k]) & (ids < vid))[0]
        if len(same):
            d = ((M[same] - M[k]) ** 2).sum(1)
            near = same[d <= SEMDEDUP_TAU]
        else:
            near = []
        dup_of = int(ids[near].min()) if len(near) else None
        verdict[int(vid)] = (int(assign[k]), dup_of)
    return verdict


def test_semdedup_matches_numpy_replay(spark, sf_tiny):
    got = {r.vec_id: (r.cid, r.dup_of) for r in q_dd_semdedup(spark, sf_tiny).collect()}
    assert got == _replay(spark, sf_tiny)


def test_semdedup_verdict_shape(spark, sf_tiny):
    rows = q_dd_semdedup(spark, sf_tiny).collect()
    cid = {r.vec_id: r.cid for r in rows}
    n_dup = 0
    for r in rows:
        assert r.keep == (r.dup_of is None)
        if r.dup_of is not None:
            n_dup += 1
            assert r.dup_of < r.vec_id  # keeper rule: lowest id survives
            assert cid[r.dup_of] == r.cid  # ball never crosses clusters
    # non-trivial at the calibrated TAU: some pruned, most kept
    assert 0 < n_dup < len(rows) / 2
