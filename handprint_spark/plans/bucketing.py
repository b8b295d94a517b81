"""Bucketed table layout: co-located joins without a shuffle.

At 10^12 rows the J1 ground-truth join (and any other doc_id-keyed
join: results ⋈ gt, results ⋈ keep-list, spans ⋈ checkpoint state)
shuffles BOTH sides on doc_id every run unless the tables are laid
out for the join. Writing the tables bucketed (and sorted) by doc_id
makes every such join a zero-exchange sort-merge join: each task
reads bucket i of both sides, already hash-partitioned and sorted on
the key — the physical plan contains no Exchange at all (asserted by
tests/test_plans.py::test_bucketed_join_is_shuffle_free).

This is the parquet/`saveAsTable` form of the same layout an Iceberg
deployment gets from a bucket partition transform
(``PARTITIONED BY (bucket(N, doc_id))``) plus a sorted write order.
The bucket count is fixed at write time and both sides must agree on
(count, key) for the exchange elision to apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 16,
    key: str = "doc_id",
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a parquet table bucketed (and sorted) by
    ``key``. Joins between tables sharing (buckets, key) skip the
    exchange on both sides."""
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "doc_id", how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
