"""Semantic tests for the per-host crawl budget: the deliberately
skewed host synthesis (seven 1/16 hosts, one 9/16 heavy host) must cap
at HOST_BUDGET pages per host with exact (n_chars desc, doc_id) order.
"""

from collections import Counter

from handprint_spark.operators.html_extract import HOST_BUDGET, q_hx_host_budget


def test_budget_caps_and_ranks(spark, sf_tiny):
    rows = q_hx_host_budget(spark, sf_tiny).collect()
    by_host = Counter(r.host for r in rows)
    n_docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").count()
    # every host keeps min(budget, its page count)
    for host, kept in by_host.items():
        host_pages = {r.host_pages for r in rows if r.host == host}.pop()
        assert kept == min(HOST_BUDGET, host_pages)
    # the heavy host (doc_id % 16 in {7..15}) holds 9/16 of the corpus
    heavy = {r.host_pages for r in rows if r.host == "site7.com"}.pop()
    assert heavy == sum(1 for d in range(n_docs) if d % 16 >= 7)
    # ranks are exactly 1..kept and ordered by (n_chars desc, doc_id)
    for host in by_host:
        page = sorted(
            ((r.page_rank, r.n_chars, r.doc_id) for r in rows if r.host == host)
        )
        assert [p[0] for p in page] == list(range(1, len(page) + 1))
        keys = [(-n, d) for _, n, d in page]
        assert keys == sorted(keys)
