"""Physical-plan shape assertions: the plans we'd want at 100 TB, not
just plans that pass. Verifies predicate pushdown reaches the parquet
scan, small dims broadcast, the extraction pipeline is shuffle-free,
and skew-aware extraction returns identical results."""

import pytest
from pyspark.sql import functions as F

from handprint_spark.corpus import load_documents_spans
from handprint_spark.operators.extract import extract_documents
from handprint_spark.operators.relational import (
    q_j1_broadcast_join,
    q_s2_whitelist_filter,
)
from handprint_spark.plans.partitioning import extract_skew_aware


def plan_str(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_filter_pushdown_reaches_scan(spark, sf_small):
    plan = plan_str(q_s2_whitelist_filter(spark, sf_small))
    assert "PushedFilters" in plan
    assert "p_size" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/lineitem.parquet").select("l_orderkey")
    plan = plan_str(df)
    rs = plan.split("ReadSchema")[1][:120]
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_broadcast_join_used(spark, sf_small):
    plan = plan_str(q_j1_broadcast_join(spark, sf_small))
    assert "BroadcastHashJoin" in plan


def test_extraction_pipeline_is_shuffle_free(spark, sf_tiny):
    df = extract_documents(load_documents_spans(spark, sf_tiny))
    plan = plan_str(df, "simple")
    assert "Exchange" not in plan  # scan -> project/UDF -> done


def test_whole_stage_codegen_and_partial_agg(spark, sf_small):
    df = q_s2_whitelist_filter(spark, sf_small)
    df.collect()  # materialize so AQE finalizes the plan
    plan = plan_str(df, "simple")
    # map-side combine (partial_ aggregate) before the exchange
    assert "partial_count" in plan or "partial_min" in plan
    # executed plan runs inside whole-stage codegen
    assert "WholeStageCodegen" in plan or "*(1)" in plan or "isFinalPlan=true" in plan


def test_skew_aware_equals_plain(spark, sf_tiny):
    spans = load_documents_spans(spark, sf_tiny).limit(250).cache()
    plain = {
        r.doc_id: ([(s.kind, s.text, s.media_ref, s.offset) for s in r.spans],
                   r.n_media, r.n_errors)
        for r in extract_documents(spans).collect()
    }
    skew = {
        r.doc_id: ([(s.kind, s.text, s.media_ref, s.offset) for s in r.spans],
                   r.n_media, r.n_errors)
        for r in extract_skew_aware(spans, media_per_chunk=16, skew_threshold=40).collect()
    }
    assert plain == skew
    spans.unpersist()


def test_skew_split_actually_triggers(spark, sf_tiny):
    """The corpus skew slice (doc_id % 211 == 0) must exceed the
    threshold used above, so the chunk path is exercised."""
    spans = load_documents_spans(spark, sf_tiny)
    heavy = spans.filter(F.size("media") > 40).count()
    assert heavy >= 1


def test_minhash_sigs_single_exchange(spark, sf_small):
    """Pre-explode doc_id partitioning: the shingle explode + signature
    groupBy must reuse one exchange — the exploded fan-out (the big
    data) never shuffles."""
    from handprint_spark.operators.dedup import _docs, _minhash_sigs

    plan = plan_str(_minhash_sigs(_docs(spark, sf_small, spread=True)), "simple")
    assert plan.count("Exchange") == 1


def test_ivf_probes_broadcast(spark, sf_small):
    """IVF probe join must broadcast the tiny probe/centroid side."""
    from handprint_spark.operators.similarity import q_sim_ivf_ann

    plan = plan_str(q_sim_ivf_ann(spark, sf_small))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
