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

ARROW_BATCH_ROWS = 256  # media blobs ~0.1-2 MB each → ≤ ~0.5 GB per Arrow batch


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
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
