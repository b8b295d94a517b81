"""Duplicate-cluster resolution + curation keep-list composition."""

from pyspark.sql import functions as F

from handprint_spark.operators.dedup import duplicate_clusters


import pytest


@pytest.fixture(params=[0, None], ids=["distributed", "adaptive-local"])
def cc_local_bound(request):
    """Run each CC labeling test through BOTH execution paths: the
    iterative distributed loop (local_max_edges=0) and the adaptive
    driver union-find (default bound). Labels must be identical."""
    return request.param


def test_duplicate_clusters_components(spark, cc_local_bound):
    """Chain a-b-c, triangle x-y-z (+ redundant edge), isolated pair
    p-q: every component resolves to its min id with one keeper."""
    pairs = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"),            # chain
            ("x", "y"), ("y", "z"), ("x", "z"),  # triangle
            ("p", "q"),                          # pair
        ],
        "d1 string, d2 string",
    )
    out = {
        r.doc_id: (r.cluster, r.is_keeper)
        for r in duplicate_clusters(pairs, local_max_edges=cc_local_bound).collect()
    }
    assert out == {
        "a": ("a", True), "b": ("a", False), "c": ("a", False),
        "x": ("x", True), "y": ("x", False), "z": ("x", False),
        "p": ("p", True), "q": ("p", False),
    }


def test_duplicate_clusters_long_chain_converges(spark, cc_local_bound):
    """A 12-node path needs multiple propagation rounds; the fixpoint
    loop must converge to a single component."""
    ids = [f"n{i:02d}" for i in range(12)]
    pairs = spark.createDataFrame(
        list(zip(ids, ids[1:])), "d1 string, d2 string"
    )
    rows = duplicate_clusters(pairs, local_max_edges=cc_local_bound).collect()
    assert {r.cluster for r in rows} == {"n00"}
    assert sum(r.is_keeper for r in rows) == 1 and len(rows) == 12


def test_cc_local_and_distributed_agree_on_numeric_ids(spark, sf_small):
    """Path equivalence on a REAL pair graph (embedding near-dups at
    sf0.01, bigint vec_ids): the adaptive union-find and the
    distributed min-label loop must return identical rows AND identical
    schema (types preserved through the local path)."""
    from pyspark.sql import functions as F

    from handprint_spark.operators.dedup import q_dd_embedding_neardup

    pairs = q_dd_embedding_neardup(spark, sf_small).select(
        F.col("v1").alias("d1"), F.col("v2").alias("d2")
    )
    local = duplicate_clusters(pairs)
    dist = duplicate_clusters(pairs, local_max_edges=0)
    assert local.schema == dist.schema
    assert sorted(map(tuple, local.collect())) == sorted(map(tuple, dist.collect()))


def test_duplicate_clusters_reliable_checkpoint(spark):
    """reliable=True routes round state through reliable checkpoint()
    (durable against executor loss on a real cluster) and must produce
    the same labeling."""
    ids = [f"m{i}" for i in range(6)]
    pairs = spark.createDataFrame(list(zip(ids, ids[1:])), "d1 string, d2 string")
    rows = duplicate_clusters(pairs, reliable=True, local_max_edges=0).collect()
    assert {r.cluster for r in rows} == {"m0"}
    assert sum(r.is_keeper for r in rows) == 1 and len(rows) == 6


def test_cc_width_scales_with_edges_floor_and_cap():
    """Round width derives from edge count: CC_PARTITIONS floor for
    tiny graphs, ~CC_EDGE_ROWS_PER_PARTITION edges per partition in the
    middle, capped at 4x session parallelism — a 10^9-edge graph must
    not be squeezed into the sandbox's 8 partitions."""
    from handprint_spark.operators.dedup import (
        CC_EDGE_ROWS_PER_PARTITION,
        CC_PARTITIONS,
        _cc_width,
    )

    assert _cc_width(500, 32) == CC_PARTITIONS  # sandbox graph -> floor
    assert _cc_width(0, 32) == CC_PARTITIONS
    mid = 40 * CC_EDGE_ROWS_PER_PARTITION
    assert _cc_width(mid, 32) == 40  # data-derived, under the cap
    assert _cc_width(10**9, 32) == 32 * 4  # capped at 4x parallelism
    assert _cc_width(10**12, 2000) == 2000 * 4  # big cluster, big cap


def test_duplicate_clusters_round_width_follows_num_partitions(spark):
    """The round frames are repartitioned to the derived/overridden
    width — pass an explicit num_partitions and assert the labeling is
    unchanged (the width is a physical knob, never a semantic one)."""
    ids = [f"w{i}" for i in range(8)]
    pairs = spark.createDataFrame(list(zip(ids, ids[1:])), "d1 string, d2 string")
    rows = duplicate_clusters(pairs, num_partitions=16, local_max_edges=0).collect()
    assert {r.cluster for r in rows} == {"w0"}
    assert sum(r.is_keeper for r in rows) == 1 and len(rows) == 8


def test_duplicate_clusters_reliable_from_session_conf(spark, tmp_path):
    """reliable=None reads handprint.cc.reliable: with the conf set the
    rounds go through the durable checkpoint dir (files appear), and
    the labeling matches the localCheckpoint path."""
    from handprint_spark.operators.dedup import CC_RELIABLE_CONF

    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "cc_ckpt"))
    spark.conf.set(CC_RELIABLE_CONF, "true")
    try:
        ids = [f"r{i}" for i in range(6)]
        pairs = spark.createDataFrame(list(zip(ids, ids[1:])), "d1 string, d2 string")
        rows = duplicate_clusters(pairs, local_max_edges=0).collect()
        assert {r.cluster for r in rows} == {"r0"}
        ckpt_files = list((tmp_path / "cc_ckpt").rglob("*"))
        assert ckpt_files, "reliable path must write durable checkpoint state"
    finally:
        spark.conf.unset(CC_RELIABLE_CONF)


def test_dup_clusters_query_leaves_session_conf_untouched(spark, sf_small):
    """Building (and running) q_dd_dup_clusters must not mutate global
    session conf — round-2's save/restore of shuffle.partitions was
    racy under concurrent queries."""
    from handprint_spark.operators.dedup import q_dd_dup_clusters

    before = spark.conf.get("spark.sql.shuffle.partitions")
    df = q_dd_dup_clusters(spark, sf_small)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert df.count() > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_minhash_production_width(spark):
    """The parameterized MinHash path at the production banding
    (K=128, 16 bands x 8 rows, numeric multiply-mod-prime family):
    exact duplicates collide in EVERY band (all 128 mins equal),
    shingle-disjoint docs collide in none, and the signature plan
    stays the single-exchange shape regardless of width."""
    from handprint_spark.operators.dedup import (
        MINHASH_BANDS_PROD,
        MINHASH_K_PROD,
        _minhash_sigs,
        minhash_lsh_pairs,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, dup),
            (2, dup),  # exact duplicate of 1 -> must be a candidate
            (3, "completely unrelated legal boilerplate text here"),
            (4, "yet another disjoint document about spark shuffles"),
        ],
        "doc_id bigint, text string",
    )
    sigs = _minhash_sigs(docs, k=MINHASH_K_PROD)
    assert len(sigs.columns) == MINHASH_K_PROD + 1

    plan = sigs._sc._jvm.PythonSQLUtils.explainString(
        sigs._jdf.queryExecution(), "simple"
    )
    # width-independent plan: one shuffle for the signature aggregate
    assert plan.count("Exchange") <= 2

    pairs = {
        (r.d1, r.d2)
        for r in minhash_lsh_pairs(
            docs, k=MINHASH_K_PROD, bands=MINHASH_BANDS_PROD
        ).collect()
    }
    assert (1, 2) in pairs
    assert pairs == {(1, 2)}  # disjoint docs never share a band key


def test_minhash_lsh_pairs_rejects_nondivisible_banding(spark):
    import pytest as _pytest

    from handprint_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with _pytest.raises(ValueError):
        minhash_lsh_pairs(docs, k=10, bands=4)


def test_keep_list_members_pass_all_gates(spark, sf_small):
    from handprint_spark.operators.curation import q_cur_keep_list
    from handprint_spark.operators.dedup import q_dd_exact
    from handprint_spark.operators.text_analysis import q_ta_quality

    keep = {r.doc_id for r in q_cur_keep_list(spark, sf_small).collect()}
    assert keep
    quality_pass = {
        r.doc_id for r in q_ta_quality(spark, sf_small).filter(F.col("passes_quality")).collect()
    }
    keepers = {r.keeper for r in q_dd_exact(spark, sf_small).collect()}
    assert keep == quality_pass & keepers


def test_rep_2gram_short_doc_guard(spark):
    """Spark sequence(1, 0) is DESCENDING — 0/1-word docs must produce
    zero 2-grams (and a row, via the left join), not a bogus gram."""
    import pandas as pd

    from handprint_spark.operators.text_analysis import q_ta_rep_2gram

    class _FakeReader:
        def __init__(self, df):
            self._df = df

        def parquet(self, _):
            return self._df

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["", "one", "a a a a"], "lang": ["en"] * 3}
        )
    )
    real_read = spark.read

    class _SparkProxy:
        def __getattr__(self, item):
            return getattr(spark, item)

        @property
        def read(self):
            return _FakeReader(docs)

    out = {
        r["doc_id"]: r.asDict()
        for r in q_ta_rep_2gram(_SparkProxy(), "ignored").collect()
    }
    assert out[1]["n_2grams"] == 0 and out[1]["dup_frac"] == 0.0
    assert out[2]["n_2grams"] == 0
    assert out[3]["n_2grams"] == 3 and out[3]["n_distinct"] == 1
    assert out[3]["top_gram_n"] == 3 and abs(out[3]["dup_frac"] - 0.6667) < 1e-9


def test_pii_redact_scrubs_and_counts(spark, sf_small):
    """Docs in the synthetic-PII slice are fully scrubbed (n_pii > 0,
    and re-scanning the clean text finds no pattern hits); docs outside
    the slices report zero."""
    from handprint_spark.operators.text_analysis import (
        PII_EMAIL_MOD,
        PII_IP_MOD,
        PII_PATTERNS,
        PII_TOKEN,
        _pii_text,
        q_ta_pii_redact,
    )

    rows = {r.doc_id: r for r in q_ta_pii_redact(spark, sf_small).collect()}
    assert any(r.has_pii for r in rows.values())
    for doc_id, r in rows.items():
        in_slice = doc_id % PII_EMAIL_MOD == 0 or doc_id % PII_IP_MOD == 0
        assert r.has_pii == in_slice, doc_id
        assert (r.n_pii > 0) == in_slice, doc_id

    # independently re-derive one slice doc's clean text and assert no
    # residual pattern matches
    import re

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    sample = (
        docs.filter(F.col("doc_id") % PII_EMAIL_MOD == 0)
        .select("doc_id", _pii_text().alias("t"))
        .first()
    )
    clean = sample.t
    for _name, pat in PII_PATTERNS:
        clean = re.sub(pat, PII_TOKEN, clean)
    for _name, pat in PII_PATTERNS:
        assert re.search(pat, clean) is None
    assert rows[sample.doc_id].clean_len == len(clean)


def test_substring_dup_detects_exact_copies(spark):
    """Two docs sharing a verbatim 8-word run are flagged; a doc with
    wholly unique text is not; a doc shorter than the window width
    reports zero windows."""
    from handprint_spark.operators import dedup as dd

    base = "alpha beta gamma delta epsilon zeta eta theta"  # exactly W words
    df = spark.createDataFrame(
        [
            (1, f"unique one {base} tail words here"),
            (2, f"other prefix {base} different ending"),
            (3, "completely disjoint vocabulary with no shared window at all"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    import tempfile, os

    d = tempfile.mkdtemp(prefix="substr_dup_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in dd.q_dd_substring_dup(spark, d).collect()}
    assert out[1].n_dup_windows >= 1 and out[2].n_dup_windows >= 1
    assert out[3].n_dup_windows == 0
    assert out[4].n_windows == 0 and out[4].dup_frac == 0.0


def test_contamination_eval_slice_excluded(spark, sf_small):
    """Decontamination output contains only train docs, and every
    contam_frac is within [0, 1]."""
    from handprint_spark.operators.dedup import CONTAM_EVAL_MOD, q_dd_contamination

    rows = q_dd_contamination(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.doc_id % CONTAM_EVAL_MOD != 0
        assert 0.0 <= r.contam_frac <= 1.0
    assert any(r.contaminated for r in rows)


def test_cur_report_composition(spark, sf_small):
    """Report cells tie out against independent per-cell recomputation
    on a sample stratum."""
    from handprint_spark.operators.curation import q_cur_report

    rep = {(r.lang, r.source): r for r in q_cur_report(spark, sf_small).collect()}
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    lang, source = next(iter(rep))
    cell = docs.filter((F.col("lang") == lang) & (F.col("source") == source))
    n = cell.count()
    uniq = cell.select(F.md5(F.col("text").cast("binary"))).distinct().count()
    r = rep[(lang, source)]
    assert r.n_docs == n and r.n_unique == uniq
    assert abs(r.dup_rate - round(1 - uniq / n, 4)) < 1e-9
    assert 0.0 <= r.quality_rate <= 1.0


def test_boilerplate_strip_removes_recurring_lines(spark):
    """Lines recurring across >= BP_MIN_DOCS same-source docs are
    stripped; unique lines survive in original order; other-source
    recurrence does not count."""
    from handprint_spark.operators.text_analysis import q_ta_boilerplate_strip

    chrome = "copyright footer nav menu home link"  # 6 words = one line
    df = spark.createDataFrame(
        [
            (1, f"{chrome} unique alpha words for doc one", "s1"),
            (2, f"{chrome} other beta words for doc two x", "s1"),
            (3, f"{chrome} gamma text entirely different here", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    import os, tempfile

    d = tempfile.mkdtemp(prefix="boiler_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in q_ta_boilerplate_strip(spark, d).collect()}
    # chrome line shared by docs 1+2 (source s1) -> stripped there
    assert out[1].n_boiler == 1 and out[1].clean_text.startswith("unique alpha")
    assert out[2].n_boiler == 1 and out[2].clean_text.startswith("other beta")
    # doc 3 is the only s2 doc -> nothing stripped
    assert out[3].n_boiler == 0 and out[3].clean_text.startswith(chrome)


def test_cur_shard_pack_layout(spark, sf_tiny):
    """Shard = content hash mod N_SHARDS; start_tok is the exact
    running token offset in doc_id order within the shard; pack_bin
    is the start offset's budget stripe."""
    from handprint_spark.corpus import doc_slice_hash
    from handprint_spark.operators.curation import (
        N_SHARDS,
        PACK_BUDGET,
        q_cur_shard_pack,
    )

    rows = q_cur_shard_pack(spark, sf_tiny).collect()
    assert rows
    by_shard = {}
    for r in rows:
        assert r.shard == doc_slice_hash(str(r.doc_id)) % N_SHARDS
        assert r.pack_bin == r.start_tok // PACK_BUDGET
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in shard_rows:
            assert r.start_tok == off
            off += r.n_tokens


def test_domain_mix_rates_and_caps(spark, sf_tiny):
    """Each source keeps ~rate x its docs where rate = min(1,
    T x w x SHRINK / (10^6 x tok_s)); heavy sources (id % 7 == 0,
    weight 500 per-mille) are over-budget at 20 uniform sources and
    keep EVERY doc; the keep set is the exact md5-bucket prefix."""
    from handprint_spark.operators.curation import (
        MIX_BASE_W,
        MIX_HEAVY_W,
        MIX_SHRINK,
        SAMPLE_BUCKETS,
        q_cur_domain_mix,
    )
    import hashlib

    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").collect()
    tok = {}
    for r in docs:
        tok[r.source] = tok.get(r.source, 0) + len(r.text.split(" "))
    total = sum(tok.values())
    kept = q_cur_domain_mix(spark, sf_tiny).collect()
    kept_ids = {r.doc_id for r in kept}
    for r in docs:
        n = int(r.source.replace("src", ""))
        w = MIX_HEAVY_W if n % 7 == 0 else MIX_BASE_W + (n % 7) * 10
        bucket = (
            int(hashlib.md5(f"dmix:{r.doc_id}".encode()).hexdigest()[:8], 16)
            % SAMPLE_BUCKETS
        )
        expect = bucket * tok[r.source] * 1000 < total * w * MIX_SHRINK
        assert (r.doc_id in kept_ids) == expect, (r.doc_id, r.source)
    heavy_docs = [r.doc_id for r in docs if int(r.source.replace("src", "")) % 7 == 0]
    assert set(heavy_docs) <= kept_ids  # over-budget sources keep all


def test_neardup_keep_partitions_corpus(spark, sf_tiny):
    """dd_neardup_keep's survivors are exactly the corpus minus the
    non-keeper cluster members: every cluster keeps exactly one doc
    (its min doc_id), unclustered docs all survive, and the survivor
    set plus the clusters' dropped members partition the corpus."""
    from handprint_spark.operators.dedup import (
        q_dd_dup_clusters,
        q_dd_neardup_keep,
    )

    docs = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_tiny}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    clusters = q_dd_dup_clusters(spark, sf_tiny).collect()
    dropped = {r.doc_id for r in clusters if not r.is_keeper}
    keepers = {r.doc_id for r in clusters if r.is_keeper}
    assert keepers == {
        min(m.doc_id for m in clusters if m.cluster == c)
        for c in {r.cluster for r in clusters}
    }
    survivors = {r.doc_id for r in q_dd_neardup_keep(spark, sf_tiny).collect()}
    assert survivors == docs - dropped
    assert keepers <= survivors


def test_full_pipeline_verdicts_consistent(spark, sf_tiny):
    """cur_full_pipeline emits one row per doc; kept is the exact
    conjunction of the three stage verdicts, and each stage verdict
    matches the standalone operator it composes."""
    from pyspark.sql import functions as F

    from handprint_spark.operators.curation import q_cur_full_pipeline
    from handprint_spark.operators.dedup import q_dd_dup_clusters, q_dd_exact
    from handprint_spark.operators.text_analysis import q_ta_quality

    rows = q_cur_full_pipeline(spark, sf_tiny).collect()
    n_docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.kept == (r.exact_keep and r.neardup_keep and r.quality_keep)
    exact_keepers = {
        r.keeper for r in q_dd_exact(spark, sf_tiny).collect()
    }
    nd = {r.doc_id: r.is_keeper for r in q_dd_dup_clusters(spark, sf_tiny).collect()}
    quality = {
        r.doc_id: r.passes_quality for r in q_ta_quality(spark, sf_tiny).collect()
    }
    for r in rows:
        assert r.exact_keep == (r.doc_id in exact_keepers), r.doc_id
        assert r.neardup_keep == nd.get(r.doc_id, True), r.doc_id
        assert r.quality_keep == quality[r.doc_id], r.doc_id


def test_train_split_deterministic_disjoint_and_salted(spark, sf_small):
    """Every doc lands in exactly one split, re-runs reproduce the
    assignment byte-for-byte, expected fractions hold loosely at 500
    docs, and the salted key decorrelates the split from the
    stratified-sampling hash (reusing one hash would make val a biased
    subsample of the sampling rejects)."""
    from handprint_spark.operators.curation import (
        SAMPLE_BUCKETS,
        q_cur_sample_strat,
        q_cur_train_split,
    )

    a = q_cur_train_split(spark, sf_small).collect()
    b = q_cur_train_split(spark, sf_small).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    splits = {}
    for r in a:
        assert r.split in ("train", "val", "test")
        assert 0 <= r.bucket < 1000
        splits[r.split] = splits.get(r.split, 0) + 1
    n = len(a)
    assert n == 500 and splits["train"] > 0.9 * n
    assert 0 < splits.get("val", 0) < 0.1 * n
    assert 0 < splits.get("test", 0) < 0.1 * n
    # salted bucket != sampling bucket for the overwhelming majority
    sample_buckets = {
        r.doc_id: r.bucket for r in q_cur_sample_strat(spark, sf_small).collect()
    }
    same = sum(1 for r in a if sample_buckets.get(r.doc_id) == r.bucket)
    assert same < 0.05 * len(sample_buckets)


def test_source_kl_nonnegative_and_zero_on_self(spark, sf_small, tmp_path):
    """KL(q_source ‖ p_corpus) is >= 0 for every source (Gibbs), and a
    single-source corpus scores exactly 0 (its distribution IS the
    corpus distribution)."""
    import pandas as pd

    from handprint_spark.operators.text_analysis import q_ta_source_kl

    rows = q_ta_source_kl(spark, sf_small).collect()
    assert len(rows) > 1
    assert all(r.kl_vs_corpus >= 0.0 for r in rows)
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c", "a a d"],
            "lang": ["en"] * 2,
            "source": ["only"] * 2,
            "n_chars": [5, 5],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    solo = q_ta_source_kl(spark, str(tmp_path)).collect()
    assert len(solo) == 1
    assert solo[0].n_tokens == 6
    assert solo[0].kl_vs_corpus == 0.0


def test_temperature_mix_sqrt_damping(spark, sf_small):
    """α=1/2 temperature: expected kept tokens per source are
    sqrt(tok_s · tok_min) — the smallest source is kept (near) whole,
    larger sources are damped toward it; kept fractions are loose at
    500 docs but the ordering and the sqrt target must hold."""
    import math

    from handprint_spark.operators.curation import q_cur_temperature_mix

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "source", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    tok_s = {r.source: r.t for r in docs.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()}
    tok_min = min(tok_s.values())
    kept = {
        r.source: r.t
        for r in q_cur_temperature_mix(spark, "/root/testdata/sf0.01")
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    for s, total in tok_s.items():
        target = math.sqrt(total * tok_min)
        # sampling noise at ~25 docs/source: accept a 2x band
        assert kept.get(s, 0) < 2.2 * target, (s, kept.get(s), target)
        assert kept.get(s, 0) > 0.35 * target, (s, kept.get(s), target)
    # the smallest source keeps (nearly) everything
    smallest = min(tok_s, key=tok_s.get)
    assert kept[smallest] >= 0.9 * tok_s[smallest]


def test_split_oov_bounds_and_train_consistency(spark, sf_small):
    """OOV audit: only held-out splits appear, rates live in [0, 1],
    and every reported token count matches the split assignment's own
    token totals (the audit must not re-tokenize differently)."""
    from handprint_spark.operators.curation import q_cur_split_oov, q_cur_train_split

    rows = {r.split: r for r in q_cur_split_oov(spark, sf_small).collect()}
    assert set(rows) <= {"val", "test"} and rows
    for r in rows.values():
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0
    split_docs = q_cur_train_split(spark, sf_small)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    toks = {
        r.split: r.t
        for r in split_docs.join(docs, "doc_id")
        .groupBy("split")
        .agg(F.sum(F.size(F.split(F.col("text"), " "))).alias("t"))
        .collect()
    }
    for s, r in rows.items():
        assert r.n_tokens == toks[s], (s, r.n_tokens, toks[s])


def test_paragraph_dedup_keeps_global_first_occurrence(spark):
    """A paragraph survives only at its globally-first (doc_id, pos):
    cross-doc copies drop, a repeat within the keeper doc drops at its
    later position, a doc made entirely of seen paragraphs reassembles
    to '', and a short tail paragraph is a paragraph of its own."""
    import os
    import tempfile

    from handprint_spark.operators import dedup as dd

    a = "a1 a2 a3 a4 a5 a6"
    b = "b1 b2 b3 b4 b5 b6"
    c = "c1 c2 c3 c4 c5 c6"
    x = "x1 x2 x3 x4 x5 x6"
    df = spark.createDataFrame(
        [
            (0, f"{x} {x}"),          # keeper doc with an internal repeat
            (1, f"{a} {b}"),
            (2, f"{c} {a}"),          # second occurrence of a -> drops
            (3, b),                   # wholly duplicate -> clean_text ''
            (4, f"{a} {a}"),          # both paras already seen
            (5, "z1 z2 z3"),          # sub-width tail is still a paragraph
        ],
        "doc_id long, text string",
    )
    d = tempfile.mkdtemp(prefix="para_dedup_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in dd.q_dd_paragraph_dedup(spark, d).collect()}
    assert (out[0].n_paras, out[0].n_dropped, out[0].clean_text) == (2, 1, x)
    assert (out[1].n_paras, out[1].n_dropped, out[1].clean_text) == (2, 0, f"{a} {b}")
    assert (out[2].n_paras, out[2].n_dropped, out[2].clean_text) == (2, 1, c)
    assert (out[3].n_paras, out[3].n_dropped, out[3].clean_text) == (1, 1, "")
    assert (out[4].n_paras, out[4].n_dropped, out[4].clean_text) == (2, 2, "")
    assert (out[5].n_paras, out[5].n_dropped, out[5].clean_text) == (1, 0, "z1 z2 z3")


def test_fuzzy_contamination_flags_eval_copies(spark):
    """A train doc byte-identical to an eval doc collides in EVERY
    band; a disjoint-vocabulary train doc collides in none; a doc too
    short to shingle has no signature and hence no fuzzy verdict; no
    eval doc appears in the output."""
    import os
    import tempfile

    from handprint_spark.operators import dedup as dd

    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [
            (0, eval_text),  # 0 % 37 == 0 -> eval slice
            (1, eval_text),  # exact leak -> all bands collide
            (2, "completely disjoint vocabulary sentence with other words"),
            (3, "short"),    # 1 word -> no shingles -> absent
        ],
        "doc_id long, text string",
    )
    d = tempfile.mkdtemp(prefix="fuzzy_contam_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in dd.q_dd_fuzzy_contamination(spark, d).collect()}
    assert set(out) == {1, 2}
    assert out[1].flagged and out[1].n_bands_hit == dd.MINHASH_BANDS
    assert not out[2].flagged and out[2].n_bands_hit == 0


def test_contam_purge_composes_gates(spark, sf_tiny):
    """Purge output = keep-list ∩ train slice; each verdict column
    matches its underlying gate run standalone; shippable is their
    conjunction; absent fuzzy verdicts default clean."""
    from handprint_spark.operators.curation import q_cur_contam_purge, q_cur_keep_list
    from handprint_spark.operators.dedup import (
        CONTAM_EVAL_MOD,
        q_dd_contamination,
        q_dd_fuzzy_contamination,
    )

    out = {r.doc_id: r for r in q_cur_contam_purge(spark, sf_tiny).collect()}
    keep = {
        r.doc_id
        for r in q_cur_keep_list(spark, sf_tiny).collect()
        if r.doc_id % CONTAM_EVAL_MOD != 0
    }
    assert set(out) == keep
    exact = {r.doc_id: not r.contaminated for r in q_dd_contamination(spark, sf_tiny).collect()}
    fuzzy = {r.doc_id: not r.flagged for r in q_dd_fuzzy_contamination(spark, sf_tiny).collect()}
    for d, r in out.items():
        assert r.exact_clean == exact[d], d
        assert r.fuzzy_clean == fuzzy.get(d, True), d
        assert r.shippable == (r.exact_clean and r.fuzzy_clean), d


def test_minhash_est_endpoints_and_band_floor(spark):
    """Identical docs estimate 1.0; a disjoint-vocabulary doc is never
    a candidate; every candidate estimates >= rows/K (a band collision
    already fixes a full band of equal signature components)."""
    import os
    import tempfile

    from handprint_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "an entirely different sentence about unrelated topics here"),
        ],
        "doc_id long, text string",
    )
    d = tempfile.mkdtemp(prefix="mh_est_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {(r.d1, r.d2): r.est_jaccard for r in dd.q_dd_minhash_est(spark, d).collect()}
    assert rows[(1, 2)] == 1.0
    assert not any(3 in p for p in rows)
    floor = (dd.MINHASH_K // dd.MINHASH_BANDS) / dd.MINHASH_K
    assert all(v >= floor for v in rows.values())


def test_funnel_ordered_steps(spark, tmp_path):
    """Funnel semantics are ORDER-aware: a purchase before the first
    view does not convert; the path breaks at the first missing step
    (a purchase after view with no intervening click stays NULL);
    users who never view are absent."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)

    def ev(i, user, typ, minutes):
        rows.append((i, t0 + dt.timedelta(minutes=minutes), user, typ, 1.0, "{}"))

    ev(0, 1, "view", 0); ev(1, 1, "click", 10); ev(2, 1, "purchase", 20)  # full path
    ev(3, 2, "purchase", 0); ev(4, 2, "view", 10)        # purchase precedes view
    ev(5, 3, "view", 0); ev(6, 3, "purchase", 5)         # no click: path breaks
    ev(7, 4, "click", 0); ev(8, 4, "purchase", 5)        # never views: absent
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from handprint_spark.operators.relational import q_ev_funnel

    out = {r.user_id: r for r in q_ev_funnel(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].steps_reached == 3 and out[1].t_purchase is not None
    assert out[2].steps_reached == 1 and out[2].t_click is None and out[2].t_purchase is None
    assert out[3].steps_reached == 1 and out[3].t_purchase is None


def test_cc_reliable_round_cache_is_freed(spark):
    """_cc_persist(reliable=True) returns the pre-checkpoint cache
    handle EXPLICITLY, and _cc_unpersist frees THOSE blocks —
    unpersisting the checkpointed frame itself was a no-op (the cache
    belongs to the pre-checkpoint frame), and an attribute stashed on
    the frame was silently lost by any derived `.drop()`/`.select()`."""
    from handprint_spark.operators.dedup import _cc_persist, _cc_unpersist

    df = spark.range(100).withColumnRenamed("id", "node")
    out, handle = _cc_persist(df, reliable=True)
    out.count()  # materialize cache + checkpoint
    assert handle is not None
    assert handle.storageLevel.useMemory or handle.storageLevel.useDisk
    _cc_unpersist(handle)
    assert not (handle.storageLevel.useMemory or handle.storageLevel.useDisk)
    # localCheckpoint path: nothing to free, and None is accepted
    out2, handle2 = _cc_persist(df, reliable=False)
    assert handle2 is None
    _cc_unpersist(handle2)
