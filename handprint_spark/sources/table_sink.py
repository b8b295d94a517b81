"""Table sink abstraction: catalog tables when a catalog is there,
parquet paths otherwise.

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jars, so the sink routes by target *shape*:

  * a path (contains ``/`` or a URI scheme) → parquet append — the
    sandbox stand-in;
  * a catalog identifier (``db.results``, ``iceberg.prod.results``) →
    the DataFrameWriterV2 (``df.writeTo``) path. Against an Iceberg
    catalog this is a snapshot-committing append; the checkpoint
    protocol's "results + lineage committed atomically" story
    (checkpoints.py) becomes real by wrapping the two appends in one
    Iceberg transaction on a cluster. Against the built-in session
    catalog (tested here) it creates/appends a managed parquet table —
    same API surface, weaker commit semantics.

Only the writer changes per target; every operator upstream is
unchanged (they produce DataFrames, the sink decides durability).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def is_path(target: str) -> bool:
    return "/" in target or target.startswith(("file:", "s3:", "s3a:", "hdfs:"))


def append(df: DataFrame, target: str) -> None:
    """Append ``df`` to a parquet path or a catalog table (created on
    first append; an Iceberg catalog supplies its own table format)."""
    if is_path(target):
        df.write.mode("append").parquet(target)
        return
    if not df.sparkSession.catalog.tableExists(target):
        df.writeTo(target).using("parquet").create()
        return
    try:
        # V2 writer: on an Iceberg table this is a snapshot commit
        df.writeTo(target).append()
    except AnalysisException:
        # the built-in session catalog's V1 tables lack the V2 batch
        # append capability — same append through the V1 writer
        df.write.mode("append").saveAsTable(target)


def load(spark: SparkSession, target: str) -> Optional[DataFrame]:
    """Read the sink target; None when it does not exist yet."""
    try:
        if is_path(target):
            return spark.read.parquet(target)
        return spark.read.table(target)
    except AnalysisException:
        return None
