"""Registry-wide plan lint: structural anti-pattern gates enforced
over EVERY registered query, not just the hand-picked plan tests.

Two properties must hold for a 10^12-row deployment of any query in
the registry, so they are enforced as an invariant of registration
itself (a future query that violates them fails here before it ever
reaches a driver run):

- no quadratic join: `CartesianProduct` never appears, and
  `BroadcastNestedLoopJoin` only where the build side is a 1-row
  scalar attach or a deliberate constant-size fan-out (allowlist).
- no row-at-a-time Python: `BatchEvalPython` (pickled per-row UDF
  eval) never appears — every Python crossing must be Arrow-batched
  (`ArrowEvalPython` / `MapInPandas` / `FlatMapGroupsInPandas`).

Also lints the driver-compare contract: no duplicate column names
(the driver's value-hash sorts columns by name, so duplicates would
make the comparison ill-defined).
"""

import pytest

import __spark_entry__ as entry_mod

# BroadcastNestedLoopJoin is acceptable ONLY where the build side is
# constant-size by construction:
# - ta_tfidf_topk / ta_unigram_logprob / ta_source_kl: 1-row
#   corpus-total scalar attached via broadcast cross join (the
#   single-pass total fold).
# - j2_cross_fanout: the reference's documents x services fan-out —
#   services is a 5-row constant dim (SURVEY J2).
# - cur_dsir_select: 1-row (t_t, t_s, V) totals scalar attached via
#   broadcast cross join onto the vocabulary-sized weight table.
BNLJ_ALLOWED = {
    "ta_tfidf_topk",
    "ta_unigram_logprob",
    "ta_source_kl",
    "j2_cross_fanout",
    "cur_dsir_select",
}

_QUERIES = entry_mod.queries()


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_registry_plan_lint(spark, sf_small, name):
    df = _QUERIES[name](spark, sf_small)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, f"{name}: unconstrained cartesian join"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join outside the constant-build-side allowlist"
        )
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    cols = df.columns
    assert len(cols) == len(set(cols)), f"{name}: duplicate column names {cols}"
    # Scan-amplification gate: a query whose final plan scans the
    # documents table 3+ times is re-running a derivation subtree that
    # should be checkpointed (session-5 audit: only ta_tfidf_topk
    # violated this — fixed by materializing tf once). Two scans stay
    # legal: deliberate two-branch shapes (eval/train splits,
    # posting + totals, skew split) whose second scan is column-pruned.
    assert plan.count("documents.parquet") <= 2, (
        f"{name}: {plan.count('documents.parquet')} documents scans — "
        "checkpoint the shared subtree"
    )


def test_bnlj_allowlist_is_tight(spark, sf_small):
    """Every allowlisted query actually still needs its exemption —
    prune the list when a rewrite removes the nested-loop join."""
    for name in BNLJ_ALLOWED:
        plan = _plan(_QUERIES[name](spark, sf_small))
        assert "BroadcastNestedLoopJoin" in plan, (
            f"{name}: allowlisted but plan no longer contains a nested-loop join"
        )
