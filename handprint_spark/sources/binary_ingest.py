"""Raw-file ingestion: the reference's target enumeration as a Spark
source (SURVEY.md §2.1 S1-S4).

`MainBody.targets_from_arguments` (reference main_body.py:143-180)
expands files/dirs into targets, filters by the accepted-format
whitelist (services/__init__.py:21-22), drops prior `.handprint`
artifacts (main_body.py:165), and when both `x.png` and `x.tif` exist
keeps only the canonical-format one (main_body.py:171-180). Here the
same rules are one declarative plan over the `binaryFile` source:

    scan (Catalyst pathGlobFilter prunes at listing time)
    → format whitelist (IN predicate on the parsed extension)
    → artifact exclusion (NOT contains)
    → duplicate-basename dedup (row_number window by format priority)

At 10^12 files the scan is a listing-parallel metadata operation and
every filter is evaluated before content bytes are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# accepted extensions (reference services/__init__.py:21-22)
ACCEPTED_FORMATS = ("jpg", "jpeg", "jp2", "pdf", "png", "gif", "bmp", "tif", "tiff")

# dedup priority: canonical output format wins (main_body.py:171-180
# keeps the .png when both x.png and x.tif are present)
_FMT_PRIORITY = {fmt: i for i, fmt in enumerate(("png", "jpeg", "jpg", *ACCEPTED_FORMATS))}


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S1: `binaryFile` scan of a directory tree. Returns
    (path, file_name, base_name, ext, length, content)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    file_name = F.element_at(F.split(F.col("path"), "/"), -1)
    return df.select(
        "path",
        file_name.alias("file_name"),
        F.regexp_extract(file_name, r"^(.*)\.[^.]+$", 1).alias("base_name"),
        F.lower(F.regexp_extract(file_name, r"\.([^.]+)$", 1)).alias("ext"),
        "length",
        "content",
    )


def enumerate_targets(files: DataFrame) -> DataFrame:
    """S2 + S3 + S4 over a `read_binary_dir` frame: whitelist the
    extension, drop `.handprint` artifacts, and keep one file per
    base name by format priority (then path, for a total order)."""
    prio = F.create_map(
        *[x for fmt, i in _FMT_PRIORITY.items() for x in (F.lit(fmt), F.lit(i))]
    )
    w = Window.partitionBy("base_name").orderBy(
        prio[F.col("ext")].asc(), F.col("path").asc()
    )
    return (
        files.filter(F.col("ext").isin(list(ACCEPTED_FORMATS)))  # S2
        .filter(~F.col("file_name").contains(".handprint"))  # S3
        .filter(F.col("length") > 0)  # S7 zero-length guard
        .withColumn("rn", F.row_number().over(w))  # S4
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
