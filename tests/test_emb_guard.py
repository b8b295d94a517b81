"""Oversized-bucket guard for the embedding-LSH near-dup path.

The round-4 hazard: a hot (band, key) bucket made the in-bucket
n x n matmul quadratic on one task. The guard salts buckets larger
than ``max_bucket`` into hash chunks, bounding per-task work at
~max_bucket^2 and total in-bucket work at O(nb * max_bucket), at the
documented cost of cross-chunk recall inside oversized buckets only.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _degenerate_emb(spark, n=120, dim=64):
    """n near-identical vectors: dominant first component + a tiny
    deterministic perturbation, so every vector lands in the SAME
    (band, key) bucket in every band (all pairwise cosines ~1.0)."""
    rows = []
    for i in range(n):
        v = [0.0] * dim
        v[0] = 1.0
        v[1] = 1e-4 * (i % 7)
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id bigint, v array<double>")


def _pairs(df):
    return {(r.v1, r.v2) for r in df.collect()}


def test_degenerate_bucket_is_salted_not_scored_quadratically(spark):
    """With max_bucket=10 a 120-vector degenerate bucket must be
    scored in hash chunks: the output is exactly the within-chunk
    pair set (recomputed here from the same xxhash64 salt), a strict
    subset of the exact all-pairs result — never the full n^2."""
    from handprint_spark.operators.dedup import embedding_neardup

    emb = _degenerate_emb(spark)
    n = 120
    max_bucket = 10
    exact = _pairs(embedding_neardup(emb, max_bucket=10**9))
    assert len(exact) == n * (n - 1) // 2  # all pairs collide and pass

    guarded = _pairs(embedding_neardup(emb, max_bucket=max_bucket))
    assert guarded  # still finds near-dups
    assert guarded < exact  # strict subset: cross-chunk pairs dropped

    # recompute the expected within-chunk pair set from the SAME salt
    n_salts = -(-n // max_bucket)  # ceil(nb / max_bucket)
    salts = {
        r.vec_id: r.s
        for r in emb.select(
            "vec_id", F.pmod(F.xxhash64("vec_id"), F.lit(n_salts)).cast("int").alias("s")
        ).collect()
    }
    expected = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if salts[a] == salts[b]
    }
    assert guarded == expected
    # chunk sizes are hash-spread around max_bucket: the largest chunk
    # stays a small multiple of the target, so per-task matmul work is
    # bounded by ~max_bucket^2, not n^2
    from collections import Counter

    sizes = Counter(salts.values())
    assert max(sizes.values()) <= 3 * max_bucket
    assert sum(sizes.values()) == n


def test_unsalted_path_is_untouched_when_buckets_fit(spark):
    """max_bucket above every bucket size => the exact first-band plan
    (no salt column, no distinct) — identical pairs at two thresholds
    of 'fits'."""
    from handprint_spark.operators.dedup import embedding_neardup

    emb = _degenerate_emb(spark, n=30)
    a = _pairs(embedding_neardup(emb, max_bucket=10**9))
    b = _pairs(embedding_neardup(emb, max_bucket=30))  # == largest bucket
    assert a == b == {(i, j) for i in range(30) for j in range(i + 1, 30)}


def test_banding_parameters_plumb_through(spark):
    """(bands, bits) reach the key UDF: 2x6 banding yields exactly 2
    keys per vector, each in [0, 2^6)."""
    from handprint_spark.operators.dedup import _band_keys_udf

    emb = _degenerate_emb(spark, n=8)
    keys = emb.select(_band_keys_udf(2, 6)(F.col("v")).alias("k")).collect()
    for r in keys:
        assert len(r.k) == 2
        assert all(0 <= k < 64 for k in r.k)


def test_salted_scores_match_exact_scores(spark):
    """Chunked scoring changes WHICH pairs are scored, never the
    score: every surviving pair carries the same rounded cosine as in
    the exact run."""
    from handprint_spark.operators.dedup import embedding_neardup

    emb = _degenerate_emb(spark, n=40)
    exact = {(r.v1, r.v2): r.cos for r in embedding_neardup(emb, max_bucket=10**9).collect()}
    guarded = {(r.v1, r.v2): r.cos for r in embedding_neardup(emb, max_bucket=8).collect()}
    for pair, cos in guarded.items():
        assert exact[pair] == cos


def test_blockwise_scoring_matches_single_block(spark, monkeypatch):
    """Scoring runs in row blocks (EMB_SCORE_BLOCK) so a max_bucket-
    sized group never allocates O(n^2) temporaries; the emitted pair
    set and cosines must be IDENTICAL at any block width. Shrinking
    the block to 7 forces the multi-block path over the 120-vector
    degenerate bucket (18 blocks) on both the exact and salted
    plans."""
    from handprint_spark.operators import dedup

    emb = _degenerate_emb(spark)
    wide = {(r.v1, r.v2, r.cos) for r in dedup.embedding_neardup(emb, max_bucket=10**9).collect()}
    salted = {(r.v1, r.v2, r.cos) for r in dedup.embedding_neardup(emb, max_bucket=10).collect()}
    monkeypatch.setattr(dedup, "EMB_SCORE_BLOCK", 7)
    wide7 = {(r.v1, r.v2, r.cos) for r in dedup.embedding_neardup(emb, max_bucket=10**9).collect()}
    salted7 = {(r.v1, r.v2, r.cos) for r in dedup.embedding_neardup(emb, max_bucket=10).collect()}
    assert wide7 == wide and len(wide) == 120 * 119 // 2
    assert salted7 == salted


def test_emb_lsh_stats_parameterized_matches_join_banding(spark, sf_tiny):
    """The cost gate must report at the banding the join will RUN:
    at (2 bands x 6 bits) the stats frame has exactly the wide
    join's band ids, bucket populations summing to the corpus, and a
    small max_bucket marks oversized buckets the guard would salt."""
    from handprint_spark.operators.dedup import emb_lsh_stats
    from handprint_spark.operators.similarity import _emb

    emb = _emb(spark, sf_tiny)
    n_vecs = emb.count()
    rows = {r.band: r for r in emb_lsh_stats(emb, bands=2, bits=6).collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r.n_vecs == n_vecs
        assert r.n_buckets <= 64  # 2^6 keys per band
        assert r.n_oversized == 0  # sandbox buckets sit far under the guard
    tight = {r.band: r for r in emb_lsh_stats(emb, bands=2, bits=6, max_bucket=1).collect()}
    for b, r in tight.items():
        # every bucket with >= 2 vectors is oversized at max_bucket=1
        assert r.n_oversized > 0
        assert r.max_bucket == rows[b].max_bucket  # population unchanged
