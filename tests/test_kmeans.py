"""Distributed Lloyd's k-means (IVF/PQ index training): closed-form
convergence on a planted two-cluster set, plus the exactness contracts
(integer distances, floor-mean centroids, lowest-id tiebreak) the
engine-matched oracle relies on."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _planted(tmp_path, spark):
    """20 vectors in two tight clusters around +e0 and -e0; seed rows
    CENTROID_IDS exist but only ids 3 and 10 matter here (we call the
    internals directly with 2 seeds)."""
    rows = []
    for i in range(20):
        v = [0.0] * 64
        v[0] = 1.0 if i < 10 else -1.0
        v[1] = 0.01 * (i % 5)
        rows.append((i, v, i % 3))
    pd.DataFrame({"vec_id": [r[0] for r in rows],
                  "embedding": [r[1] for r in rows],
                  "label": [r[2] for r in rows]}).to_parquet(tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_kmeans_two_cluster_closed_form(spark, tmp_path):
    """With seeds inside each planted cluster, one Lloyd's update
    moves each centroid to its cluster's floor-mean and every vector
    assigns to its own side — recomputed here exactly in numpy."""
    from handprint_spark.operators.similarity import (
        CENTROID_SCALE,
        _kmeans_assign_udf,
        _micro_expr,
    )

    sf = _planted(tmp_path, spark)
    emb = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("m", _micro_expr())
    )
    M = np.asarray(
        [r.m for r in emb.orderBy("vec_id").collect()], dtype=np.int64
    )
    # seeds: vectors 0 (cluster +) and 10 (cluster -), cids 0 and 1
    Cm = M[[0, 10]]
    ids = np.arange(2, dtype=np.int64)
    assign = _kmeans_assign_udf(ids, Cm)
    got = {
        r.vec_id: (r.a.cid, r.a.d2)
        for r in emb.select("vec_id", assign("m").alias("a")).collect()
    }
    # numpy replay of the exact integer rule
    d2 = ((M[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
    for i in range(20):
        j = int(np.argmin(d2[i]))
        assert got[i] == (j, int(d2[i, j]))
    assert all(got[i][0] == 0 for i in range(10))
    assert all(got[i][0] == 1 for i in range(10, 20))
    # centroid update: floor-mean in micro units, per cluster
    for cid in (0, 1):
        members = M[[i for i in range(20) if got[i][0] == cid]]
        want = np.floor(members.sum(axis=0).astype(np.float64) / len(members)).astype(
            np.int64
        )
        # dim 0 ~ +-CENTROID_SCALE, dim 1 = mean of the planted jitter
        assert abs(int(want[0])) == CENTROID_SCALE
    # full trained query is oracle-checked at sf0.01 by the driver;
    # here the kernel pieces agree with the closed form


def test_kmeans_tiebreak_lowest_cid(spark):
    """A vector equidistant from two centroids assigns to the LOWER
    cluster id (argmin-first == row_number cid ASC in the oracle)."""
    from handprint_spark.operators.similarity import _kmeans_assign_udf

    Cm = np.zeros((2, 64), dtype=np.int64)
    Cm[0, 0] = 2_000_000
    Cm[1, 0] = -2_000_000
    ids = np.arange(2, dtype=np.int64)
    assign = _kmeans_assign_udf(ids, Cm)
    df = spark.createDataFrame([(0, [0] * 64)], "vec_id bigint, m array<bigint>")
    r = df.select(assign("m").alias("a")).collect()[0]
    assert r.a.cid == 0


def test_pq_train_preserves_encode_shape(spark, sf_tiny):
    """pq_train returns PQ_M per-subspace codebooks; the trained
    encoder still yields one code per subspace with codes drawn from
    the surviving id sets."""
    from handprint_spark.operators.similarity import (
        PQ_M,
        _pq_assign_udf,
        pq_train,
    )

    sub_ids, sub_C, emb = pq_train(spark, sf_tiny, iters=1)
    assert len(sub_ids) == PQ_M and len(sub_C) == PQ_M
    enc = _pq_assign_udf(sub_ids, sub_C)
    rows = emb.select(enc("mv").alias("codes")).limit(20).collect()
    for r in rows:
        assert len(r.codes) == PQ_M
        for s, c in enumerate(r.codes):
            assert c in set(int(x) for x in sub_ids[s])


def test_training_is_memoized_per_corpus_content(spark, sf_tiny):
    """kmeans_train/pq_train memoize per (session, corpus content,
    iters): the three IVF consumers and the two PQ consumers share one
    training each instead of re-running Lloyd's per registered query."""
    from handprint_spark.operators.similarity import kmeans_train, pq_train

    k1 = kmeans_train(spark, sf_tiny)
    k2 = kmeans_train(spark, sf_tiny)
    assert k1[0] is k2[0] and k1[1] is k2[1] and k1[2] is k2[2]

    p1 = pq_train(spark, sf_tiny)
    p2 = pq_train(spark, sf_tiny)
    assert p1[0] is p2[0] and p1[1] is p2[1] and p1[2] is p2[2]
