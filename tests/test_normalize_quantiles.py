"""Unicode normalization head + approx-quantile sketch form."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_normalize_generic_mojibake(spark):
    """The normalizer is generic, not fixture-shaped: hand-written
    damage (decomposed accents, BOM, zero-widths, NBSP, controls,
    tab/newline runs) all canonicalize to the obvious clean form."""
    from handprint_spark.operators.text_analysis import normalize_text_col

    cases = {
        "Café au lait": "Café au lait",
        "﻿hello​world": "helloworld",
        "a b": "a b",
        "x\x07y\x1fz": "xyz",
        "  a\t\tb\nc  ": "a b c",
        "clean text": "clean text",
    }
    df = spark.createDataFrame([(k,) for k in cases], "raw string")
    out = {
        r.raw: r.norm
        for r in df.select("raw", normalize_text_col(F.col("raw")).alias("norm")).collect()
    }
    for raw, want in cases.items():
        assert out[raw] == want, (repr(raw), repr(out[raw]))


def test_normalization_makes_curation_invariant(spark, tmp_path):
    """The reason the stage exists: keep-list verdicts computed on
    normalized mojibake equal verdicts on the clean text — invisible
    codepoints can no longer split exact-dedup keys or skew quality
    stats."""
    from handprint_spark.operators.text_analysis import (
        normalize_text_col,
        quality_verdicts,
    )

    base = "the quick brown fox jumps over the lazy dog " * 3  # 27 words
    clean = base.strip()
    mojibake = "﻿" + clean.replace(" ", "  ", 3) + "​"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [clean, mojibake],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [len(clean), len(mojibake)],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    raw = spark.read.parquet(str(tmp_path / "documents.parquet"))
    normed = raw.withColumn("text", normalize_text_col(F.col("text")))
    # after normalization both docs carry identical text: same exact-
    # dedup key and identical quality verdicts
    texts = {r.doc_id: r.text for r in normed.collect()}
    assert texts[1] == texts[2] == clean
    v = {r.doc_id: r.passes_quality for r in quality_verdicts(normed).collect()}
    assert v[1] == v[2]
    # without normalization the mojibake doc's dedup key differs
    hashes = raw.select(F.md5("text").alias("h")).distinct().count()
    assert hashes == 2
    hashes_norm = normed.select(F.md5("text").alias("h")).distinct().count()
    assert hashes_norm == 1


def test_approx_quantiles_within_tolerance(spark, sf_tiny):
    """|approx - exact| bounded: with GK accuracy 1000 and per-lang
    groups of ~100 docs the sketch is rank-exact, so each approx pick
    must be an actual sample between the exact interpolated neighbors
    (within one observed length step of the exact value)."""
    from handprint_spark.operators.text_analysis import (
        q_ta_len_quantiles,
        q_ta_len_quantiles_approx,
    )

    exact = {r.lang: r for r in q_ta_len_quantiles(spark, sf_tiny).collect()}
    approx = {r.lang: r for r in q_ta_len_quantiles_approx(spark, sf_tiny).collect()}
    assert set(exact) == set(approx)
    # tolerance: the corpus token lengths step by ~6 (line width); an
    # exact-rank element pick sits within one step of the interpolated
    # exact percentile
    TOL = 8.0
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n_docs == e.n_docs
        assert a.mean_tokens == e.mean_tokens
        for col in ("p50", "p90", "p99"):
            assert abs(getattr(a, col) - getattr(e, col)) <= TOL, (lang, col)


def test_normalize_chain_runs_once_per_row(spark, sf_tiny):
    """norm_text is computed ONCE as a named column; deriving changed
    and n_chars_norm from it keeps exactly one Arrow NFC crossing and
    one regexp chain in the plan (three inline chains were 3x the
    head-stage cost — distinct pandas-UDF instances cannot be CSE'd)."""
    from handprint_spark.operators.text_analysis import normalize_verdicts

    df = normalize_verdicts(spark.read.parquet(f"{sf_tiny}/documents.parquet"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert plan.count("ArrowEvalPython") == 1
    assert plan.count("nfc(") == 1
