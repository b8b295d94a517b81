"""Similarity edge cases + plan shapes added in round 4: zero-norm
vectors must score 0.0 (never NaN — Spark sorts NaN as the LARGEST
double, so an unguarded zero vector would rank FIRST in every top-k),
and the kNN join must be a partial top-k (no full-corpus shuffle onto
|queries| keys)."""

import math

from pyspark.sql import functions as F


def plan_str(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_zero_vector_scores_zero_in_all_cos_kernels(spark):
    from handprint_spark.operators.similarity import (
        cos_query_udf,
        pair_cos_udf,
        quantize_query,
        quantized_cos_udf,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])],
        "vec_id bigint, v array<double>",
    )
    cos = cos_query_udf([1.0, 0.0, 0.0, 0.0])
    got = {r.vec_id: r.c for r in df.select("vec_id", cos("v").alias("c")).collect()}
    assert got[1] == 0.0 and not math.isnan(got[1])
    assert got[2] == 1.0

    pair = pair_cos_udf()
    got = {
        r.vec_id: r.c
        for r in df.select(
            "vec_id", pair("v", F.array(*[F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)])).alias("c")
        ).collect()
    }
    assert got[1] == 0.0 and got[2] == 1.0

    # quantized path: an all-zero embedding quantizes to all-zero int8
    qcos = quantized_cos_udf(quantize_query([1.0, 0.0, 0.0, 0.0]))
    qdf = spark.createDataFrame(
        [(1, [0, 0, 0, 0]), (2, [127, 0, 0, 0])], "vec_id bigint, q array<int>"
    )
    got = {r.vec_id: r.c for r in qdf.select("vec_id", qcos("q").alias("c")).collect()}
    assert got[1] == 0.0 and got[2] == 1.0

    # zero-norm QUERY vector: every score is 0.0, nothing is NaN
    zq = quantized_cos_udf(quantize_query([0.0, 0.0, 0.0, 0.0]))
    got = {r.vec_id: r.c for r in qdf.select("vec_id", zq("q").alias("c")).collect()}
    assert got == {1: 0.0, 2: 0.0}


def test_zero_vector_never_ranks_first(spark):
    """Ranking regression for the ADVICE finding: insert a degenerate
    zero vector and assert it sorts LAST (score 0.0), not first."""
    from handprint_spark.operators.similarity import cos_query_udf

    rows = [(i, [float(i), 1.0, 0.0]) for i in range(1, 4)] + [(99, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    cos = cos_query_udf([1.0, 1.0, 0.0])
    top = (
        df.select("vec_id", cos("v").alias("c"))
        .orderBy(F.col("c").desc(), F.col("vec_id"))
        .collect()
    )
    assert top[0].vec_id != 99
    assert top[-1].vec_id == 99 and top[-1].c == 0.0


def test_knn_join_is_partial_topk(spark, sf_small):
    """The kNN plan must reduce per-partition BEFORE any exchange: one
    MapInPandas local top-k, exactly one Exchange (the window over the
    merged <= partitions x |queries| x K rows), and no join of the
    corpus against the query set at all."""
    from handprint_spark.operators.similarity import q_sim_knn_join

    plan = plan_str(q_sim_knn_join(spark, sf_small), "simple")
    assert "MapInPandas" in plan
    assert plan.count("Exchange") == 1
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct", "Join"):
        assert bad not in plan, bad


def test_unigram_logprob_single_documents_scan(spark, sf_small):
    """ta_unigram_logprob's final plan tokenizes documents ONCE (the
    lookup side); the vocab side reads the checkpointed counts, and the
    corpus token total rides a 1-row broadcast — no second full
    tokenize+count of the corpus."""
    from handprint_spark.operators.text_analysis import q_ta_unigram_logprob

    plan = plan_str(q_ta_unigram_logprob(spark, sf_small), "simple")
    assert plan.count("Scan parquet") == 1, plan


def test_pq_adc_equals_reconstruction_dot(spark, sf_tiny):
    """The PQ contract that IS exact: the ADC LUT-sum score equals
    dot(q, reconstruction(v)) for every vector (algebraic identity of
    product quantization), and the encode is the per-subspace argmin
    against the codebook. Recall vs exact top-k is intentionally NOT
    pinned here — see q_sim_pq_topk's docstring for the measured
    fidelity limits on this isotropic synthetic corpus."""
    import numpy as np

    from handprint_spark.operators.similarity import (
        PQ_KS,
        PQ_M,
        PQ_SUB,
        _pq_codebook,
        _query_vec,
        q_sim_pq_encode,
        q_sim_pq_topk,
    )

    B = _pq_codebook(spark, sf_tiny)
    assert B.shape == (PQ_KS, PQ_M * PQ_SUB)
    q = np.asarray(_query_vec(spark, sf_tiny, 0), dtype=np.float64)

    codes = {}
    for r in q_sim_pq_encode(spark, sf_tiny).collect():
        codes.setdefault(r.vec_id, {})[r.m] = r.code
    emb = {
        r.vec_id: np.asarray(list(r.embedding), dtype=np.float64)
        for r in spark.read.parquet(f"{sf_tiny}/embeddings.parquet").collect()
    }
    assert set(codes) == set(emb)

    # encode == per-subspace argmin (ties to lowest code)
    for vid in list(codes)[:50]:
        v = emb[vid]
        for m in range(PQ_M):
            sub = v[m * PQ_SUB : (m + 1) * PQ_SUB]
            cb = B[:, m * PQ_SUB : (m + 1) * PQ_SUB]
            d = np.round(((cb - sub[None, :]) ** 2).sum(axis=1), 4)
            assert codes[vid][m] == int(np.argmin(d)), (vid, m)

    # ADC score == dot(q, reconstruction)
    for r in q_sim_pq_topk(spark, sf_tiny).collect():
        recon = np.concatenate(
            [
                B[codes[r.vec_id][m], m * PQ_SUB : (m + 1) * PQ_SUB]
                for m in range(PQ_M)
            ]
        )
        assert abs(r.score_adc - round(float(np.dot(q, recon)), 4)) <= 1e-9, r
