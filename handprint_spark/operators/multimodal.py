"""Multimodal column plumbing: typed metadata + feature extraction
over opaque binary media columns.

The pattern a 100 TB multimodal pipeline needs: media as
``binary`` columns with typed metadata beside them, decode/feature
stages as Arrow-batched ``mapInPandas`` with explicit output schemas,
and partition-preserving plumbing (no shuffle to featurize).

The HPM1 codec stands in for image decode (this container has no
image libraries); ``frame_sample`` below shows the video-style stage
shape with the decode STUBBED — the Spark-side schema, batching, and
partitioning are real and tested, the pixel work raises
NotImplementedError exactly where a codec plug-in would go.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import codec

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("byte_size", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def media_features(spans_with_media: DataFrame) -> DataFrame:
    """Explode the inline media of a documents_spans table into a
    per-media feature row: header metadata + mean pixel intensity.
    Narrow plan: the explode is per-row; no shuffle."""
    exploded = spans_with_media.select(
        "doc_id", F.explode("media").alias("m")
    ).select("doc_id", F.col("m.media_ref").alias("media_ref"), F.col("m.content").alias("content"))

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, ref, content in zip(pdf["doc_id"], pdf["media_ref"], pdf["content"]):
                try:
                    info = codec.decode_media(bytes(content))
                    px = codec.render_pixels(
                        info.text, info.width, info.height,
                        bool(info.flags & codec.FLAG_BINARIZED),
                    )
                    rows.append(
                        (doc_id, ref, info.fmt, info.width, info.height,
                         info.npages, len(content), round(float(np.mean(px)), 4), None)
                    )
                except codec.MediaError as exc:
                    rows.append((doc_id, ref, None, None, None, None, len(content), None, str(exc)))
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields])

    return exploded.mapInPandas(run, MEDIA_FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(spans_with_media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-style frame sampling stage — STUB. The Spark plumbing
    (schema, Arrow batching, fan-out of one media row to N frame rows)
    is real; the actual frame decode is NotImplementedError because no
    video codec exists in this environment. Multi-page HPM1 objects
    stand in: each page is 'a frame'."""
    exploded = spans_with_media.select(
        "doc_id", F.explode("media").alias("m")
    ).select("doc_id", F.col("m.media_ref").alias("media_ref"), F.col("m.content").alias("content"))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, ref, content in zip(pdf["doc_id"], pdf["media_ref"], pdf["content"]):
                try:
                    info = codec.decode_media(bytes(content))
                except codec.MediaError:
                    continue
                if info.npages <= 1:
                    # single-frame media: pass through frame 0
                    rows.append((doc_id, ref, 0, bytes(content)))
                    continue
                for i, page in enumerate(info.pages[::every_n]):
                    raise NotImplementedError(
                        "video/frame decode requires a codec plug-in; "
                        "HPM1 multi-page stand-in reaches here only when a "
                        "corpus with real multi-page media is wired up"
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return exploded.mapInPandas(run, FRAME_SCHEMA)


def q_mm_media_features(spark, sf_dir):
    from ..corpus import load_documents_spans

    return media_features(load_documents_spans(spark, sf_dir))


QUERIES = {"mm_media_features": q_mm_media_features}
ORACLES: dict[str, str] = {}  # codec decode is not SQL-expressible: rows-only
