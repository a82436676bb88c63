"""Range (interval) join — SURVEY §2.3 lists range/interval joins among
the families the reference lacks; Spark's only native plan for
``value BETWEEN lo AND hi`` is BroadcastNestedLoopJoin (fine for a small
band table) or a cartesian product (never fine).

The scale path implemented here is bucketization: pick a bucket width,
explode each interval into the buckets it overlaps, equi-join fact rows on
``floor(value / width)``, then re-apply the exact range predicate. The
equi-join shuffles on the bucket key — hash-joinable at any scale — and the
residual filter is exact, so semantics equal the theta join.

Bucket width trades duplication (wide intervals → many buckets) against
join selectivity (narrow buckets → fewer false candidates); pick ≈ the
median interval width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketized(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 50.0,
) -> DataFrame:
    """Inner join: fact rows to every interval with lo ≤ value < hi."""
    n_buckets = (
        (F.floor(F.col(hi_col) / bucket_width) - F.floor(F.col(lo_col) / bucket_width) + 1)
        .cast("int")
        .alias("_n")
    )
    exploded = intervals.withColumn("_n", n_buckets).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ).alias("_bucket"),
    ).drop("_n")
    keyed = facts.withColumn("_bucket", F.floor(F.col(value_col) / bucket_width).cast("long"))
    return (
        keyed.join(exploded, "_bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("_bucket")
    )
