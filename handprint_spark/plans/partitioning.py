"""Partitioning and skew machinery (SURVEY.md §4, north_rule).

The extraction pipeline is narrow (per-row), so classic join-skew
tools don't apply to it; its skew failure mode is different: one
multi-page document (the corpus's SKEW_MOD slice carries 25x the
median span count; real corpora have 1000x outliers) pins one task
while its 10^3 media spans decode serially.

``extract_skew_aware`` fixes that by *splitting heavy rows*: documents
whose media count exceeds a threshold are chunked into one row per
media-slice (a salted explode), extracted in parallel, and reassembled
with a groupBy over only the skewed subset. The normal path stays
shuffle-free; the shuffle touches only the heavy tail.

``repartition_by_doc`` / ``salted_repartition`` are the generic
explicit-partitioning entry points (hash(doc_id), optionally salted)
the north_rule names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import SPAN_TYPE
from ..operators.extract import extract_documents


def repartition_by_doc(df: DataFrame, partitions: int) -> DataFrame:
    return df.repartition(partitions, F.hash("doc_id"))


def salted_repartition(df: DataFrame, partitions: int, salt_buckets: int = 8) -> DataFrame:
    """Spread hot doc_id hash buckets with a deterministic salt column
    derived from a second hash (no RNG — resume-safe)."""
    salt = F.pmod(F.hash("doc_id", F.lit(0x5A17)), F.lit(salt_buckets))
    return df.repartition(partitions, F.hash("doc_id"), salt)


def extract_skew_aware(
    spans_with_media: DataFrame,
    media_per_chunk: int = 64,
    skew_threshold: int = 256,
    **extract_kwargs,
) -> DataFrame:
    """Extraction with heavy-document splitting.

    Rows with <= skew_threshold media run the plain narrow path.
    Heavier rows are split into ceil(n/media_per_chunk) chunk rows
    (spans + their media sliced together), extracted chunk-wise in
    parallel, then reassembled per doc_id (array_sort by offset keeps
    span order canonical). Output schema == extract_documents.
    """
    n_media = F.size("media")
    normal = spans_with_media.filter(n_media <= skew_threshold)
    heavy = spans_with_media.filter(n_media > skew_threshold)

    n_chunks = F.ceil(n_media / F.lit(media_per_chunk)).cast("int")
    # chunk c takes media[c*k, (c+1)*k) and the spans that reference
    # that media range or are text spans interleaved with them; spans
    # are 2 per line (text + media), media 1 per line, so the span
    # slice for chunk c is exactly 2x the media slice.
    k = media_per_chunk
    chunked = (
        heavy.withColumn("chunk", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn("media", F.slice("media", F.col("chunk") * k + 1, k))
        .withColumn("spans", F.slice("spans", F.col("chunk") * 2 * k + 1, 2 * k))
        .drop("chunk")
    )

    extracted_normal = extract_documents(normal, **extract_kwargs)
    extracted_chunks = extract_documents(chunked, **extract_kwargs)

    reassembled = (
        extracted_chunks.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.flatten(F.collect_list("spans")),
                lambda a, b: F.when(a["offset"] < b["offset"], -1)
                .when(a["offset"] > b["offset"], 1)
                .otherwise(0),
            ).cast(SPAN_TYPE).alias("spans"),
            F.sum("n_media").cast("int").alias("n_media"),
            F.sum("n_errors").cast("int").alias("n_errors"),
        )
    )
    return extracted_normal.unionByName(reassembled)
