"""Fifth-continuation-session operators: C4 cleaning rules,
perplexity-tercile bucketing, Zipf fit, cohort retention, and the
streaming PII drain.

Each test pins semantics against an INDEPENDENT recomputation (pure
Python / pandas over the same parquet), not against the DuckDB oracle
— the oracle equivalence is the driver's job; these prove the rules
mean what their docstrings say.
"""

import math
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from handprint_spark.operators.relational import q_ev_retention
from handprint_spark.operators.text_analysis import (
    _C4_KEEP_LINE,
    BP_WORDS_PER_LINE,
    C4_BRACE_MOD,
    C4_LOREM_MOD,
    C4_MIN_KEPT_LINES,
    C4_MIN_LINE_WORDS,
    ZIPF_TOP_R,
    q_ta_c4_rules,
    q_ta_pii_redact,
    q_ta_ppl_buckets,
    q_ta_zipf_fit,
)


def _c4_py(doc_id: int, text: str):
    """Pure-Python replay of the C4 verdict (line synthesis + rules)."""
    ws = text.split(" ")
    w = BP_WORDS_PER_LINE
    lines = []
    for i in range(math.ceil(len(ws) / w)):
        line = " ".join(ws[i * w : (i + 1) * w])
        h = (doc_id * 31 + i) % 7
        if h == 3:
            line = line + " javascript."
        elif h != 0:
            line = line + "."
        if i == 0 and doc_id % C4_LOREM_MOD == 0:
            line = "lorem ipsum " + line
        if i == 0 and doc_id % C4_BRACE_MOD == 0:
            line = line + " {"
        lines.append(line)
    kept = [
        l
        for l in lines
        if l.endswith(".")
        and len(l.split(" ")) >= C4_MIN_LINE_WORDS
        and "javascript" not in l
    ]
    brace = any("{" in l for l in lines)
    lorem = any("lorem ipsum" in l for l in lines)
    return (
        len(lines),
        len(kept),
        brace,
        lorem,
        (not brace and not lorem and len(kept) >= C4_MIN_KEPT_LINES),
    )


def test_c4_rules_match_python_replay(spark, sf_tiny):
    docs = pd.read_parquet(f"{sf_tiny}/documents.parquet")
    want = {
        int(r.doc_id): _c4_py(int(r.doc_id), r.text) for r in docs.itertuples()
    }
    got = {
        r["doc_id"]: (
            r["n_lines"],
            r["n_kept"],
            r["has_brace"],
            r["has_lorem"],
            r["c4_keep"],
        )
        for r in q_ta_c4_rules(spark, sf_tiny).collect()
    }
    assert got == want
    verdicts = {v[4] for v in want.values()}
    assert verdicts == {True, False}, "fixture must exercise both outcomes"


def test_c4_line_predicate_on_natural_text(spark):
    """The keep-line predicate is the real C4 rule — proven on
    hand-written English, not just the synthetic corpus."""
    rows = [
        ("This sentence is long enough and ends properly.", 1),
        ("Too short.", 0),  # < 5 words
        ("Please enable javascript to view this page.", 0),  # boilerplate
        ("no terminal punctuation on this line at all", 0),
        ("Function bodies look like this {", 0),  # no terminal '.'
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "l string")
    got = df.select(
        F.size(F.expr(f"filter(array(l), {_C4_KEEP_LINE})")).alias("k")
    ).collect()
    assert [r["k"] for r in got] == [want for _, want in rows]


def test_ppl_buckets_tercile_structure(spark, sf_tiny):
    rows = q_ta_ppl_buckets(spark, sf_tiny).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["bucket"], r["lp_micro"]))
    assert len(by_lang) >= 2
    for lang, pairs in by_lang.items():
        buckets = {b for b, _ in pairs}
        assert buckets == {"head", "middle", "tail"}, (lang, buckets)
        hi_head = max(lp for b, lp in pairs if b == "head")
        lo_mid = min(lp for b, lp in pairs if b == "middle")
        hi_mid = max(lp for b, lp in pairs if b == "middle")
        lo_tail = min(lp for b, lp in pairs if b == "tail")
        # bucket is a pure function of lp_micro vs the cutoffs, so the
        # value ranges must be strictly ordered head < middle < tail
        assert hi_head < lo_mid <= hi_mid < lo_tail, lang
        n = len(pairs)
        n_head = sum(1 for b, _ in pairs if b == "head")
        # terciles: each bucket holds roughly a third (ties can shift
        # the boundary, never by more than the tie mass; the synthetic
        # lp_micro values are near-unique so the slack is small)
        assert abs(n_head - n / 3) <= max(2, 0.1 * n), (lang, n_head, n)


def test_zipf_fit_matches_integer_replay(spark, sf_tiny):
    docs = pd.read_parquet(f"{sf_tiny}/documents.parquet")
    want = {}
    for lang, grp in docs.groupby("lang"):
        tf = Counter()
        for t in grp.text:
            tf.update(t.split(" "))
        top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP_R]
        xs = [round(math.log(r + 1) * 1e6) for r in range(len(top))]
        ys = [round(math.log(c) * 1e6) for _, c in top]
        n = len(top)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        num = n * sxy - sx * sy
        den_x = n * sxx - sx * sx
        den_y = n * syy - sy * sy
        want[lang] = (
            n,
            round(num / den_x, 6),
            round((float(num) * float(num)) / (float(den_x) * float(den_y)), 6),
        )
    got = {
        r["lang"]: (r["n_terms"], r["zipf_slope"], r["zipf_r2"])
        for r in q_ta_zipf_fit(spark, sf_tiny).collect()
    }
    assert got == want
    for lang, (_, slope, r2) in got.items():
        assert slope < 0, (lang, slope)  # frequency falls with rank
        assert 0.0 < r2 <= 1.0, (lang, r2)


def test_retention_matches_pandas_replay(spark, sf_tiny):
    ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
    first = ev.groupby("user_id")["ts"].min()
    cohort = (
        first.dt.normalize() - pd.to_timedelta(first.dt.weekday, unit="D")
    ).rename("cohort")
    j = ev.join(cohort, on="user_id")
    j["week_offset"] = (j["ts"].dt.normalize() - j["cohort"]).dt.days // 7
    want = {
        (k[0].date(), int(k[1])): (int(g["user_id"].nunique()), int(len(g)))
        for k, g in j.groupby(["cohort", "week_offset"])
    }
    got = {
        (r["cohort_week"], r["week_offset"]): (r["n_users"], r["n_events"])
        for r in q_ev_retention(spark, sf_tiny).collect()
    }
    assert got == want
    # every offset is non-negative, and since each user's first event
    # lands at offset 0 of their own cohort, the offset-0 user counts
    # across cohorts sum to exactly the distinct-user total
    assert all(off >= 0 for _, off in got)
    assert sum(n for (_, off), (n, _) in got.items() if off == 0) == len(
        set(ev["user_id"])
    )


def test_stream_pii_redact_batch_parity(spark, sf_tiny):
    from handprint_spark.streaming.queries import q_st_pii_redact

    batch = {tuple(r) for r in q_ta_pii_redact(spark, sf_tiny).collect()}
    stream = {tuple(r) for r in q_st_pii_redact(spark, sf_tiny).collect()}
    assert stream == batch
    assert any(r[2] for r in batch), "fixture must contain PII rows"
