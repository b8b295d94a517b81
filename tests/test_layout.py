"""Semantic tests for the XY-cut layout queries: hand-computed column
extents and column-major reading order on known doc_ids.

Box model (service_queries._lay_boxes): 12 word boxes on a 40 px x
grid (width 30), y = (j % 4) * 15; docs with doc_id % 3 != 0 are
two-column with the split at word doc_id % 5 + 4 (gutter 90 px).
"""

from handprint_spark.operators.service_queries import (
    q_lay_columns,
    q_lay_reading_order,
)


def test_single_column_page(spark, sf_tiny):
    rows = [r for r in q_lay_columns(spark, sf_tiny).collect() if r.doc_id == 0]
    assert len(rows) == 1
    r = rows[0]
    assert (r.col_id, r.n_words, r.x_left, r.x_right) == (0, 12, 0, 11 * 40 + 30)


def test_two_column_page_extents(spark, sf_tiny):
    # doc_id=1: split at 1 % 5 + 4 = 5 -> col0 = words 0-4, col1 = 5-11
    rows = sorted(
        (r for r in q_lay_columns(spark, sf_tiny).collect() if r.doc_id == 1),
        key=lambda r: r.col_id,
    )
    assert [(r.col_id, r.n_words, r.x_left, r.x_right) for r in rows] == [
        (0, 5, 0, 4 * 40 + 30),
        (1, 7, 5 * 40 + 80, 11 * 40 + 80 + 30),
    ]


def test_reading_order_is_column_major(spark, sf_tiny):
    rows = {
        r.word_id: r
        for r in q_lay_reading_order(spark, sf_tiny).collect()
        if r.doc_id == 1
    }
    # col 0 (words 0-4) ordered by (y, x): 0, 4, 1, 2, 3
    # col 1 (words 5-11) ordered by (y, x): 8, 5, 9, 6, 10, 7, 11
    expect = [0, 4, 1, 2, 3, 8, 5, 9, 6, 10, 7, 11]
    got = sorted(rows, key=lambda w: rows[w].read_rank)
    # a naive (y, x) sort would interleave the columns (word 8, col 1
    # y=0, before word 1, col 0 y=15); column-major must not
    assert got == expect
    assert all(rows[w].col_id == (0 if w < 5 else 1) for w in rows)
