"""Z-order (Morton) clustering for multi-dimensional data skipping (S16,
beyond-reference) — the layout trick behind Delta/Iceberg ``ZORDER BY``,
expressed Spark-first in pure codegen bit arithmetic.

Why: parquet readers skip files/row-groups whose column min/max don't
intersect the predicate. A 1-D sort makes stats selective for ONE
column; a query filtering on a second column still touches every file.
Interleaving the bits of two (bucketized) columns into a Morton code and
range-partitioning + sorting by it gives every file a small min/max BOX
in both dimensions, so 2-D box predicates prune on both — the classic
locality property of the Z space-filling curve.

The bit-spread is the standard mask cascade (x | x<<8 & ..., down to
alternating bits), all Spark bitwise Column ops — no UDF, runs inside
whole-stage codegen. ``tests/test_compaction.py`` MEASURES the benefit
from the written files' real footer statistics: a 2-D box query must
touch strictly fewer files under Z-order than under a 1-D sort of the
same data into the same file count.

Scale notes: bucketize each dimension to ~16 bits first (here: modulo or
range buckets) — Z-order on raw 64-bit values wastes interleaved bits on
noise. Clustering composes with partitioning (S15): partition by day,
Z-order within each day. Rewrites are maintenance ops like compaction
(S14) — same temp-dir + swap discipline at production scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread16(c: Column) -> Column:
    """16-bit int -> 32-bit with a zero between consecutive bits."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z_value(a: Column, b: Column) -> Column:
    """Morton interleave of two 16-bit bucketized columns (a gets the even
    bits, b the odd bits)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 16
) -> None:
    """Cluster ``df`` by the Morton code of (col_a, col_b) into ``n_files``
    range partitions, sorted within each, and write parquet — every file's
    (col_a, col_b) min/max becomes a small 2-D box."""
    z = z_value(F.col(col_a), F.col(col_b)).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_linear(df: DataFrame, path: str, col_a: str, n_files: int = 16) -> None:
    """The 1-D baseline: same data, same file count, sorted by col_a only."""
    (
        df.repartitionByRange(n_files, F.col(col_a))
        .sortWithinPartitions(col_a)
        .write.mode("overwrite")
        .parquet(path)
    )
