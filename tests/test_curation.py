"""Duplicate-cluster resolution + curation keep-list composition."""

from pyspark.sql import functions as F

from handprint_spark.operators.dedup import duplicate_clusters


def test_duplicate_clusters_components(spark):
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
    out = {r.doc_id: (r.cluster, r.is_keeper) for r in duplicate_clusters(pairs).collect()}
    assert out == {
        "a": ("a", True), "b": ("a", False), "c": ("a", False),
        "x": ("x", True), "y": ("x", False), "z": ("x", False),
        "p": ("p", True), "q": ("p", False),
    }


def test_duplicate_clusters_long_chain_converges(spark):
    """A 12-node path needs multiple propagation rounds; the fixpoint
    loop must converge to a single component."""
    ids = [f"n{i:02d}" for i in range(12)]
    pairs = spark.createDataFrame(
        list(zip(ids, ids[1:])), "d1 string, d2 string"
    )
    rows = duplicate_clusters(pairs).collect()
    assert {r.cluster for r in rows} == {"n00"}
    assert sum(r.is_keeper for r in rows) == 1 and len(rows) == 12


def test_duplicate_clusters_reliable_checkpoint(spark):
    """reliable=True routes round state through reliable checkpoint()
    (durable against executor loss on a real cluster) and must produce
    the same labeling."""
    ids = [f"m{i}" for i in range(6)]
    pairs = spark.createDataFrame(list(zip(ids, ids[1:])), "d1 string, d2 string")
    rows = duplicate_clusters(pairs, reliable=True).collect()
    assert {r.cluster for r in rows} == {"m0"}
    assert sum(r.is_keeper for r in rows) == 1 and len(rows) == 6


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
