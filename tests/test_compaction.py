"""S14 small-files compaction: physical-layout maintenance, logical no-op."""

import os

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.operators.compaction import (
    compact_parquet_dir,
    data_file_count,
)
from pdf_etl_pipeline_spark.session import load_table


def _fingerprint(df):
    return sorted(map(tuple, df.collect()))


def test_compaction_shrinks_files_preserves_relation(spark, sf_dir, tmp_path):
    p = str(tmp_path / "shattered")
    events = load_table(spark, sf_dir, "events")
    # simulate a micro-batch-accreted table: 64 tiny files
    events.repartition(64).write.parquet(p)
    assert data_file_count(p) == 64
    before = _fingerprint(spark.read.parquet(p))

    total = sum(
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    )
    target = total // 4 + 1  # aim for ~4 files
    n = compact_parquet_dir(spark, p, target_bytes=target)
    assert n == data_file_count(p)
    assert n <= 6  # ceil(bytes/target) with per-file overhead slack
    assert _fingerprint(spark.read.parquet(p)) == before


def test_compaction_cluster_by_tightens_file_ranges(spark, sf_dir, tmp_path):
    """cluster_by range-partitions the rewrite: each output file covers a
    disjoint ts range (file-level min/max become selective), and the
    relation is unchanged."""
    p = str(tmp_path / "clustered")
    events = load_table(spark, sf_dir, "events")
    events.repartition(32).write.parquet(p)
    before = _fingerprint(spark.read.parquet(p))

    compact_parquet_dir(spark, p, target_bytes=1 << 40, cluster_by="ts")
    # one giant target -> a single file; redo with a small target for ranges
    compact_parquet_dir(spark, p, target_bytes=_quarter(p), cluster_by="ts")
    files = [
        os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
    ]
    assert len(files) >= 2
    ranges = []
    for f in files:
        mm = (
            spark.read.parquet(f)
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
            .first()
        )
        ranges.append((mm.lo, mm.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint ts ranges across files
    assert _fingerprint(spark.read.parquet(p)) == before


def _quarter(p: str) -> int:
    total = sum(
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    )
    return total // 4 + 1
