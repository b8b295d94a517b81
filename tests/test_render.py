"""Annotation + grid render kernels and Spark stages."""

import numpy as np
import pytest

from handprint_spark.kernels import codec
from handprint_spark.kernels.decoder import decode_page
from handprint_spark.kernels.render import annotate, decode_pixels, make_grid


def _page(text="alpha beta\ngamma", w=160, h=64):
    return codec.encode_media(text, width=w, height=h)


def test_annotate_draws_outlines_deterministically():
    data = _page()
    boxes = [b._asdict() for b in decode_page("alpha beta\ngamma").boxes]
    out1 = annotate(data, boxes)
    out2 = annotate(data, boxes)
    assert out1 == out2
    px = decode_pixels(out1)
    base = codec.render_pixels("alpha beta\ngamma", 160, 64)
    assert (px != base).any()  # something was drawn
    # word box of 'alpha': x in [4,44], y in [4,20] -> border intensity 255
    assert px[4, 4] == 255 and px[20, 44] == 255


def test_annotate_f1_threshold_and_f2_kinds():
    data = _page()
    boxes = [b._asdict() for b in decode_page("alpha beta\ngamma").boxes]
    none_drawn = annotate(data, boxes, score_threshold=1.1)
    base = codec.render_pixels("alpha beta\ngamma", 160, 64)
    assert (decode_pixels(none_drawn) == base).all()
    only_para = annotate(data, boxes, kinds=("para",))
    px = decode_pixels(only_para)
    vals = set(np.unique(px[px != base]).tolist()) if (px != base).any() else set()
    assert vals <= {64}  # para intensity only


def test_grid_geometry():
    tiles = [_page(f"x{i}", w=20 + 10 * i, h=30) for i in range(5)]
    grid = make_grid(tiles, max_horizontal=4)
    px = decode_pixels(grid)
    # 5 images -> ceil(sqrt(5)) = 3 cols, 2 rows
    # col widths = max over rows per column: [max(20,50)=50, max(30,60)=60, 40]
    assert px.shape[1] == 50 + 60 + 40
    assert px.shape[0] == 30 + 30


def test_grid_empty_and_single():
    assert decode_pixels(make_grid([])).shape == (1, 1)
    one = _page("only", w=40, h=20)
    assert decode_pixels(make_grid([one])).shape == (20, 40)


def test_spark_annotated_and_grids(spark, sf_tiny):
    from handprint_spark.corpus import load_documents_spans
    from handprint_spark.operators.render import annotated_media, doc_grids

    spans = load_documents_spans(spark, sf_tiny).limit(30)
    ann = annotated_media(spans, score_threshold=0.0).cache()
    rows = ann.collect()
    assert rows
    ok = [r for r in rows if r.error is None]
    corrupt = [r for r in rows if r.error is not None]
    assert ok and all(r.annotated is not None and r.n_boxes > 0 for r in ok)
    from handprint_spark.corpus import is_corrupt
    assert all(is_corrupt(r.doc_id) for r in corrupt)  # only corrupt slice errors

    grids = {r.doc_id: r for r in doc_grids(ann).collect()}
    assert grids
    some = next(iter(grids.values()))
    px = decode_pixels(bytes(some.grid))
    assert px.size > 0 and some.n_tiles >= 1
    ann.unpersist()
