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


# --- S15: dynamic partition overwrite ------------------------------------------
def test_dynamic_partition_overwrite_touches_only_its_partitions(spark, tmp_path):
    """S15: a backfill batch replaces exactly its own day-partitions;
    untouched days keep their FILES (not just their rows) — and the
    partition-column filter prunes at listing level (PartitionFilters)."""
    import os

    from pyspark.sql import functions as F2

    from pdf_etl_pipeline_spark.operators.partitioned_sink import (
        overwrite_partitions,
        read_day,
        write_partitioned,
    )
    from pdf_etl_pipeline_spark.session import load_events

    path = str(tmp_path / "events_by_day")
    ev = load_events(spark, "/root/testdata/sf0.001").withColumn(
        "day", F2.date_format("ts", "yyyy-MM-dd")
    )
    write_partitioned(ev, path, "day")
    days = sorted(d.split("=")[1] for d in os.listdir(path) if d.startswith("day="))
    assert len(days) >= 2
    target, untouched = days[0], days[1]

    def files_of(day):
        d = os.path.join(path, f"day={day}")
        return sorted((f, os.path.getmtime(os.path.join(d, f))) for f in os.listdir(d) if f.endswith(".parquet"))

    before_untouched = files_of(untouched)
    before_total = spark.read.parquet(path).count()
    n_target_before = read_day(spark, path, "day", target).count()

    # backfill: day[0] rewritten with values doubled and HALF the rows dropped
    batch = (
        ev.filter(F2.col("day") == target)
        .filter(F2.col("event_id") % 2 == 0)
        .withColumn("value", F2.col("value") * 2)
    )
    n_batch = batch.count()
    overwrite_partitions(batch, path, "day")

    # untouched partition: identical files (names AND mtimes)
    assert files_of(untouched) == before_untouched
    # target partition: exactly the batch rows
    assert read_day(spark, path, "day", target).count() == n_batch
    assert n_batch < n_target_before
    assert spark.read.parquet(path).count() == before_total - n_target_before + n_batch
    # static overwrite would have truncated: all other days must still exist
    assert sorted(d.split("=")[1] for d in os.listdir(path) if d.startswith("day=")) == days

    # listing-level pruning: the day filter appears in PartitionFilters
    plan = read_day(spark, path, "day", target)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and f"isnotnull(day" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "day" in pf and "=" in pf  # the equality reached the listing layer
