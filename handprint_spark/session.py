"""SparkSession factory with the engine's tuned configuration.

Scale posture (SURVEY.md §4/§7): everything here is chosen for a
multi-executor cluster reading ~100 TB and only *tested* on local[N]:

  * AQE on (runtime coalesce + skew-join splitting);
  * Arrow on for every pandas UDF boundary, with a bounded
    ``maxRecordsPerBatch`` so batches of media BLOBs can't blow
    executor memory (media rows are KB-to-MB sized);
  * shuffle partitions sized by caller (tests use 8-32; a real
    cluster would use 2-3x total cores);
  * 128 MiB scan splits — the parquet/Iceberg sweet spot.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Media blobs are ~0.1-6 MB per row; 64 rows bounds an Arrow batch at
# tens of MB AND gives each task enough batches that the JVM feeder
# and the Python worker pipeline (measured: 64-row batches beat
# 256-row by ~15% on the extraction flagship — with ~2 batches/task
# the worker idles during the first fill).
ARROW_BATCH_ROWS = 64


def get_spark(
    app_name: str = "handprint-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus if cpus.isdigit() else "32"
    ))
    builder = SparkSession.builder.appName(app_name)
    if master != "inherit":
        # "inherit": do NOT set a master — builder.master() overrides
        # the spark.master the launcher (spark-submit) already put in
        # the JVM conf, silently turning a cluster run into local[N].
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # BLOB-table guard: the vectorized parquet reader's default
        # 4096-row batch is sized for scalar columns; with media rows
        # of ~0.1-6 MB, 4096-row batches x n_cores OOM the heap. 128
        # rows bounds a batch at tens of MB regardless of blob size.
        .config("spark.sql.parquet.columnarReaderBatchSize", "128")
        # Off-heap column vectors: the OnHeapColumnVector long-array
        # copies SIGSEGV on this host's JIT stubs (hs_err in
        # jlong_disjoint_arraycopy under 16+ threads); off-heap
        # vectors bypass those stubs and are also the right choice for
        # BLOB scans (no GC pressure from multi-MB rows).
        .config("spark.sql.columnVector.offheap.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # This sandbox's virtualized CPU advertises AVX-512 but the
        # JIT'd avx3 arraycopy stubs SIGSEGV under load (observed:
        # hs_err crashes in jlong_disjoint_arraycopy_avx3 at 16+
        # threads). Cap the JIT at AVX2.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:UseAVX=2 " + os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", ""),
        )
        .config("spark.executor.extraJavaOptions", "-XX:UseAVX=2")
    )
    return builder.getOrCreate()
