"""Checkpoint / lineage protocol — resumable extraction runs.

The reference's ``-j`` mode reuses prior per-(doc,service) JSON files
instead of re-calling services (manager.py:281-285, SURVEY.md §2.1 S8,
§2.3 J3). At cluster scale that becomes:

    work list  =  input spans table  ANTI JOIN  results table (doc_id)
    lineage    =  per-(batch, partition) row counts + metrics

so a re-run after any failure processes exactly the missing documents
and appends — no partial-document state is possible because one doc is
one row end-to-end (the pipeline is a pure per-row function).

On a real cluster both writes are a single Iceberg transaction
(results append + lineage append committed atomically; a crashed batch
leaves no committed rows and the anti-join re-selects its docs). The
parquet stand-in here writes results first, lineage second; the
anti-join is against *results*, so a crash between the two writes can
only lose lineage rows, never duplicate results.

Determinism makes resume exact: a re-extracted doc produces
byte-identical spans (X9 purity), so resumed-and-restarted tables are
equal as sets — asserted by tests/test_resume.py.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.extract import extract_documents


def _existing(spark: SparkSession, path: str) -> Optional[DataFrame]:
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def pending_work(spark: SparkSession, spans_df: DataFrame, results_dir: str) -> DataFrame:
    """J3: input minus already-extracted doc_ids (left anti join)."""
    done = _existing(spark, results_dir)
    if done is None:
        return spans_df
    return spans_df.join(done.select("doc_id").distinct(), "doc_id", "left_anti")


def run_batch(
    spark: SparkSession,
    spans_df: DataFrame,
    results_dir: str,
    lineage_dir: str,
    batch_id: int,
    **extract_kwargs,
) -> dict:
    """One resumable batch: anti-join → extract → append results →
    append per-partition lineage. Returns batch metrics."""
    todo = pending_work(spark, spans_df, results_dir)
    results = (
        extract_documents(todo, **extract_kwargs)
        .withColumn("batch_id", F.lit(batch_id))
        .withColumn("partition_id", F.spark_partition_id())
    )
    results.write.mode("append").parquet(results_dir)

    written = spark.read.parquet(results_dir).filter(F.col("batch_id") == batch_id)
    lineage = written.groupBy("batch_id", "partition_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_media").alias("n_media"),
        F.sum("n_errors").alias("n_errors"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    lineage.write.mode("append").parquet(lineage_dir)

    row = written.agg(
        F.count("*").alias("docs"),
        F.coalesce(F.sum("n_media"), F.lit(0)).alias("media"),
        F.coalesce(F.sum("n_errors"), F.lit(0)).alias("errors"),
    ).collect()[0]
    return {"batch_id": batch_id, "docs": row["docs"], "media": row["media"],
            "errors": row["errors"]}
