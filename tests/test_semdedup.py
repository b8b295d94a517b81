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


def test_semdedup_stats_match_assignment_replay(spark, sf_tiny):
    """The pre-join cost gate's cells equal a direct tally over the
    numpy-replayed assignment: member counts, n(n-1)/2 candidate
    pairs, and exact integer radius stats per cluster."""
    from handprint_spark.operators.dedup import q_dd_semdedup_stats
    from handprint_spark.operators.similarity import CENTROID_IDS

    replay = _replay(spark, sf_tiny)  # {vec_id: (cid, dup_of)}
    # rebuild per-cluster d2 from the same replay machinery
    rows = (
        spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    M = np.floor(
        np.array([r.embedding for r in rows], dtype=np.float64) * 1_000_000
    ).astype(np.int64)
    cids = np.arange(len(CENTROID_IDS), dtype=np.int64)
    Cm = M[np.isin(ids, list(CENTROID_IDS))]
    from handprint_spark.operators.similarity import KMEANS_ITERS

    for _ in range(KMEANS_ITERS):
        d2 = (M * M).sum(1)[:, None] + (Cm * Cm).sum(1)[None, :] - 2 * (M @ Cm.T)
        a = cids[np.argmin(d2, 1)]
        new = np.unique(a)
        Cm = np.array(
            [np.floor(M[a == c].sum(0) / (a == c).sum()).astype(np.int64) for c in new]
        )
        cids = new
    d2 = (M * M).sum(1)[:, None] + (Cm * Cm).sum(1)[None, :] - 2 * (M @ Cm.T)
    j = np.argmin(d2, 1)
    assign, dmin = cids[j], d2[np.arange(len(j)), j]
    got = {r.cid: r for r in q_dd_semdedup_stats(spark, sf_tiny).collect()}
    assert set(got) == set(int(c) for c in np.unique(assign))
    for c in np.unique(assign):
        sel = assign == c
        n = int(sel.sum())
        r = got[int(c)]
        assert (r.n_members, r.cand_pairs) == (n, n * (n - 1) // 2)
        assert r.max_d2 == int(dmin[sel].max())
        assert r.sum_d2 == int(dmin[sel].sum())
        # cross-check vs the verdict replay: same membership
        assert n == sum(1 for v, (cc, _) in replay.items() if cc == c)
