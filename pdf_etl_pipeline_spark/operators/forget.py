"""Targeted key deletion over a partitioned table (S17,
beyond-reference) — the right-to-be-forgotten / tombstone-propagation
op: "remove user X from a 100 TB event log" without rewriting the
table.

Composition of two primitives this repo already ships:

1. FIND the affected partitions with a pruned scan — read only the
   partition column + key column (column pruning), aggregate the
   distinct partition values that contain any target key. At cluster
   scale this is a metadata-light pass; with bucketing or a key index it
   drops to listing work.
2. REWRITE only those partitions: read them back (listing-level
   PartitionFilters pruning), anti-join the tombstone keys (broadcast —
   deletion lists are small), and write with DYNAMIC partition
   overwrite (operators/partitioned_sink.py), which replaces exactly
   the affected day directories and leaves every other file
   byte-identical.

Cost scales with the data that actually contains the keys, not the
table: a user active 3 days costs 3 partition rewrites out of 1000.
The test pins untouched partitions by file mtime, full disappearance of
the keys, and row conservation for everyone else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.operators.partitioned_sink import overwrite_partitions


def affected_partitions(
    spark: SparkSession, path: str, partition_col: str, key_col: str, keys: list
) -> list:
    """Partition values containing any of ``keys`` — pruned scan reading
    only (partition_col, key_col)."""
    rows = (
        spark.read.parquet(path)
        .select(partition_col, key_col)
        .filter(F.col(key_col).isin(keys))
        .select(partition_col)
        .distinct()
        .collect()
    )
    return [r[0] for r in rows]


def forget_keys(
    spark: SparkSession, path: str, partition_col: str, key_col: str, keys: list
) -> list:
    """Delete every row whose ``key_col`` is in ``keys``; rewrites ONLY
    the partitions that contain them. Returns the rewritten partition
    values (empty = nothing to do)."""
    import os
    import shutil

    parts = affected_partitions(spark, path, partition_col, key_col, keys)
    if not parts:
        return []
    remaining = (
        spark.read.parquet(path)
        .filter(F.col(partition_col).isin(parts))  # listing-level pruning
        # NULL-keyed rows (e.g. anonymous events) are NOT targets and must
        # survive: plain `~isin` evaluates to NULL for them (NULL NOT IN
        # semantics) and would silently destroy every such row
        .filter(~F.col(key_col).isin(keys) | F.col(key_col).isNull())
    )
    still_present = {
        r[0] for r in remaining.select(partition_col).distinct().collect()
    }
    if still_present:
        overwrite_partitions(
            remaining.filter(F.col(partition_col).isin(list(still_present))),
            path,
            partition_col,
        )
    # dynamic overwrite only replaces partitions PRESENT in the batch — a
    # partition whose every row was deleted would silently survive, so
    # drop its directory explicitly (a table format does this inside the
    # same transaction at cluster scale)
    for p in set(parts) - still_present:
        d = os.path.join(path, f"{partition_col}={p}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    return sorted(parts)
