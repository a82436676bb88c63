"""Partitioned table sink with dynamic partition overwrite (S15,
beyond-reference) — the standard idempotent-backfill shape for a
date-partitioned 100 TB table.

Production tables are laid out as ``table/day=YYYY-MM-DD/part-*.parquet``
so that (a) day-ranged queries prune at the LISTING level — a 1-day query
on a 3-year table touches 1/1000th of the files before any footer or row
is read — and (b) a late backfill rewrites ONLY the affected day.
Spark's static overwrite mode would truncate the whole table on
``mode("overwrite")``; the op every pipeline actually needs is DYNAMIC
partition overwrite (``spark.sql.sources.partitionOverwriteMode=dynamic``),
which replaces exactly the partitions present in the incoming batch and
leaves every other partition byte-identical. That makes re-running a
day's job idempotent — the foundation of retry-safe orchestration.

Scale notes: the partition column must be LOW cardinality (days, not
user_ids — a 10M-value partition column is the classic small-files
disaster: one directory + tiny files per value); rows are repartitioned
by the partition column before the write so each day's files are written
by tasks holding only that day (no 200-files-per-partition spray), at the
cost of skew if one day dominates — compose with AQE or add a second
repartition key (operators/compaction.py handles post-hoc cleanup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_col: str, mode: str = "overwrite") -> None:
    """Initial partitioned write: one directory per partition value."""
    (
        df.repartition(F.col(partition_col))
        .write.partitionBy(partition_col)
        .mode(mode)
        .parquet(path)
    )


def overwrite_partitions(batch: DataFrame, path: str, partition_col: str) -> None:
    """Dynamic partition overwrite: replace exactly the partitions present
    in ``batch``; every other partition is untouched (pinned by test).
    Restores the session's previous overwrite mode on exit."""
    spark = batch.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            batch.repartition(F.col(partition_col))
            .write.partitionBy(partition_col)
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_day(spark: SparkSession, path: str, partition_col: str, value: str) -> DataFrame:
    """Partition-pruned read: the filter on the partition column must show
    up as PartitionFilters (listing-level pruning), not as a row filter."""
    return spark.read.parquet(path).filter(F.col(partition_col) == value)
