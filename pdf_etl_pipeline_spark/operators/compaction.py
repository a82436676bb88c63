"""Small-files compaction (S14, beyond-reference).

A 100 TB table ingested by streaming micro-batches (st7's index, the
foreachBatch sinks) accretes thousands of KB-sized parquet files; every
subsequent scan then pays one task + one footer-read + one open per file,
and the NameNode/listing layer pays for all of them. Compaction rewrites
a directory into size-targeted files — the maintenance operator every
table format (Iceberg/Delta `OPTIMIZE`) ships, expressed Spark-first:

- target file count = ceil(input_bytes / target_bytes), measured from the
  filesystem, not guessed;
- `repartition(n)` (round-robin) balances rows across output files —
  an optional cluster key turns it into `repartitionByRange` + in-file
  sort so min/max row-group stats become selective for range predicates
  (poor man's clustering);
- rewrite lands in a sibling temp dir and swaps in atomically-enough for
  a local run (rename); a cluster deployment does this under a table
  format's transaction instead.

The reader-visible relation is IDENTICAL before and after (pinned by
test) — compaction is pure physical-layout maintenance.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet") and not f.startswith("."))
    return n


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    cluster_by: str | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(bytes/target_bytes)`` files; returns the output file count.
    ``cluster_by`` additionally range-partitions + sorts so each output
    file covers a tight range of that column (stats-friendly)."""
    n_files = max(1, math.ceil(_dir_bytes(path) / target_bytes))
    df = spark.read.parquet(path)
    if cluster_by is not None:
        df = df.repartitionByRange(n_files, F.col(cluster_by)).sortWithinPartitions(cluster_by)
    else:
        df = df.repartition(n_files)
    tmp = path.rstrip("/") + "._compact_tmp"
    df.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return data_file_count(path)
