"""Bucketed tables + shuffle-free co-located joins (S12, beyond-reference).

The single biggest cost at 100 TB is the shuffle a fact-fact join forces:
both sides hash-exchange on the join key before the join can run. Bucketing
pre-materializes that partitioning ON DISK — ``bucketBy(n, key)`` writes one
file family per ``hash(key) % n`` — so two tables bucketed the same way join
with NO exchange at read time: Spark trusts the on-disk ``HashPartitioning``
and goes straight to the (sort-merge) join. The exchange disappears from the
plan, which is exactly what ``tests/test_bucketed.py`` asserts.

This is the on-disk counterpart of the reference's implicit "dedup key
lookup" table layout (db_connection.py:41-47 keeps an indexed key column);
in Spark the layout IS the optimization: the metastore records the bucket
spec and Catalyst consumes it as a physical-property guarantee.

Scale notes: pick bucket counts so one bucket of the LARGER table is a few
hundred MB (here 8 for test data; thousands at 100 TB). Both sides must
bucket on the same key with the same count (or an integer multiple, which
Spark coalesces). Bucketed writes shuffle ONCE at write time — the point is
amortization: every subsequent join/aggregation on the bucket key is
exchange-free, which is why warehouse fact tables bucket on their join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Save ``df`` as a bucketed (+ sorted within buckets) table. ``path``
    makes it external — the data lands there instead of the session
    warehouse dir; the metastore still records the bucket spec."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. With matching
    bucket specs the physical plan has NO Exchange above either scan — the
    on-disk layout satisfies the join's distribution requirement."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
