"""Ground-truth comparison subsystem (reference entry point 2,
``handprint -c``: SURVEY.md §3).

Dataflow: results ⋈ ground_truth on doc_id (J1) → per-doc LCSSEQ line
alignment (J4) → per-line Levenshtein + CER (C4/C5) → per-doc totals
(A2) → TSV report (K4).

Spark shape notes:
  * The alignment is *order-dependent sequential* per document
    (monotone cursor, SURVEY §2.3 J4) — but since one document is one
    row, it needs no applyInPandas/groupBy at all: a scalar
    Arrow-batched pandas UDF maps (htr_text, gt_text) -> array of
    aligned-line structs, then ``explode``. Zero shuffles beyond the
    J1 join itself.
  * The J1 join keys both sides on doc_id; at scale both tables are
    bucketed by doc_id so it is a co-partitioned join. Here the gt
    side derives from the same scan.
  * Totals (A2) aggregate the aligned array *before* exploding — a
    per-row F.aggregate, not a groupBy: the shuffle the reference's
    Σdistance implies is simply absent.

The line kernels are the reference-golden-tested functions in
kernels/textcmp.py; the TSV output is byte-compatible with
tests/test_comparison.py of the reference.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus import split_lines
from ..kernels.textcmp import align_lines, text_comparison

LINE_STRUCT = T.StructType(
    [
        T.StructField("line_no", T.IntegerType()),  # nullable: None = missing in HTR
        T.StructField("distance", T.IntegerType()),
        T.StructField("cer", T.StringType()),
        T.StructField("gt_line", T.StringType()),
        T.StructField("htr_line", T.StringType()),
    ]
)


def ground_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ground_truth(doc_id, gt_text): the by-construction truth — the
    same deterministic line split the corpus derivation uses, joined
    with newlines (analog of <base>.gt.txt files, manager.py:327-333)."""

    @F.pandas_udf(T.StringType())
    def gt_text(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: "\n".join(split_lines(t)))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), gt_text("text").alias("gt_text")
    )


def _align_udf(relaxed: bool):
    @F.pandas_udf(T.ArrayType(LINE_STRUCT))
    def align(htr: pd.Series, gt: pd.Series) -> pd.Series:
        out = []
        for h, g in zip(htr, gt):
            rows = align_lines(h or "", g or "", relaxed)
            out.append(
                [
                    {"line_no": r.number, "distance": r.distance, "cer": r.cer,
                     "gt_line": r.gt_text, "htr_line": r.htr_text}
                    for r in rows
                ]
            )
        return pd.Series(out)

    return align


def compare_to_ground_truth(
    htr_df: DataFrame, gt_df: DataFrame, relaxed: bool = False
) -> DataFrame:
    """(doc_id, text) ⋈ (doc_id, gt_text) -> aligned lines table:
    comparisons(doc_id, line_no, distance, cer, gt_line, htr_line)."""
    align = _align_udf(relaxed)
    joined = htr_df.join(gt_df, "doc_id", "left").fillna({"gt_text": ""})
    aligned = joined.select("doc_id", align("text", "gt_text").alias("lines"))
    return aligned.select("doc_id", F.explode("lines").alias("ln")).select(
        "doc_id",
        F.col("ln.line_no").alias("line_no"),
        F.col("ln.distance").alias("distance"),
        F.col("ln.cer").alias("cer"),
        F.col("ln.gt_line").alias("gt_line"),
        F.col("ln.htr_line").alias("htr_line"),
    )


def comparison_totals(htr_df: DataFrame, gt_df: DataFrame, relaxed: bool = False) -> DataFrame:
    """A2 per-doc total errors — aggregated inside the row (no shuffle)."""
    align = _align_udf(relaxed)
    joined = htr_df.join(gt_df, "doc_id", "left").fillna({"gt_text": ""})
    lines = align("text", "gt_text")
    return joined.select(
        "doc_id",
        F.aggregate(
            lines, F.lit(0), lambda acc, ln: acc + ln["distance"]
        ).alias("total_errors"),
        F.size(lines).alias("n_lines"),
    )


def comparison_tsv(htr_df: DataFrame, gt_df: DataFrame, relaxed: bool = False) -> DataFrame:
    """K4: the byte-exact TSV report per document."""

    @F.pandas_udf(T.StringType())
    def tsv(htr: pd.Series, gt: pd.Series) -> pd.Series:
        return pd.Series(
            [text_comparison(h or "", g or "", relaxed) for h, g in zip(htr, gt)]
        )

    joined = htr_df.join(gt_df, "doc_id", "left").fillna({"gt_text": ""})
    return joined.select("doc_id", tsv("text", "gt_text").alias("report"))


# --- registered queries (rows-only: LCSSEQ alignment is not SQL) -----------

def _htr(spark, sf_dir):
    from ..corpus import load_documents_spans
    from .extract import extract_documents, extracted_text

    results = extract_documents(load_documents_spans(spark, sf_dir))
    # HTR side = recognized (ocr) spans only — the TRResult.text analog
    return extracted_text(results, kinds=("ocr",)).select("doc_id", "text")


def q_cmp_lines(spark, sf_dir):
    return compare_to_ground_truth(_htr(spark, sf_dir), ground_truth(spark, sf_dir))


def q_cmp_totals(spark, sf_dir):
    return comparison_totals(_htr(spark, sf_dir), ground_truth(spark, sf_dir))


def q_cmp_tsv(spark, sf_dir):
    return comparison_tsv(_htr(spark, sf_dir), ground_truth(spark, sf_dir))


QUERIES = {
    "cmp_lines": q_cmp_lines,
    "cmp_totals": q_cmp_totals,
    "cmp_tsv": q_cmp_tsv,
}

ORACLES: dict[str, str] = {}  # sequential LCSSEQ alignment: rows-only checks
