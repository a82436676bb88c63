"""File corpus sources — S1 (glob discovery) and S5 (JSON sidecar join).

Reference: glob + normalize in run.ipynb cell 27a76d5d; sidecar probe at
lib/pipeline_runner.py:85-91 / lib/ocr_utils.py:129-142.

At 100 TB the corpus scan IS the bottleneck if done wrong:
- ``binaryFile`` with ``pathGlobFilter`` prunes at the *listing* level —
  files never open.
- date-partitioned directories (``data/2023-nc-d1/<date>_nc_d1/``) surface
  as a partition column via ``regexp_extract(input_file_name())`` so
  downstream date predicates prune whole directories.
- content is only materialized for rows that survive the extension filter
  (Spark's binaryFile source reads lazily per row group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.functions.scalars import path_ext, path_stem

SUPPORTED_EXTS = ("pdf", "jpg", "jpeg", "png")


def scan_corpus(
    spark: SparkSession,
    root: str,
    glob: str = "*",
    with_content: bool = True,
) -> DataFrame:
    """S1: recursive binary-file scan → (path, modificationTime, length,
    content?, ext, stem, letting_date?)."""
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
    )
    df = reader.load(root)
    if not with_content:
        df = df.drop("content")
    df = (
        df.withColumn("ext", path_ext(F.col("path")))
        .withColumn("stem", path_stem(F.col("path")))
        # hive-style-ish letting-date partition from the directory name
        .withColumn(
            "letting_date",
            F.try_to_timestamp(
                F.regexp_extract(F.col("path"), r"/(\d{4}-\d{2}-\d{2})[^/]*/", 1),
                F.lit("yyyy-MM-dd"),
            ).cast("date"),
        )
        .filter(F.col("ext").isin(*SUPPORTED_EXTS))
    )
    return df


def read_entity_sidecars(spark: SparkSession, root: str) -> DataFrame:
    """S5: ``<stem>.json`` ground-truth sidecars → (stem, company, address,
    date, total); joined to image rows on the filename stem."""
    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.json")  # never parse the images as JSON
        .json(root, schema="company string, address string, date string, total string")
        .withColumn("stem", path_stem(F.input_file_name()))
    )
    return raw.select("stem", "company", "address", "date", "total")


def join_sidecars(images: DataFrame, sidecars: DataFrame) -> DataFrame:
    """J2: image row ↔ its sidecar by stem (broadcast — sidecars are tiny
    relative to image bytes)."""
    return images.join(F.broadcast(sidecars), "stem", "left")
