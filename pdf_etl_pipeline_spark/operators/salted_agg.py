"""Salted two-phase aggregation — the explicit skew strategy (SCALE.md).

A single hot key makes one reduce task the straggler. Salting splits each
key into ``n_salts`` sub-keys for the first (heavy) aggregation, then a
second cheap aggregation over at most ``n_salts`` rows per key merges the
partials. Correct for any commutative-associative aggregate; the result is
identical to the direct groupBy (the catalog oracle checks exactly that).
AQE's skew handling covers sort-merge joins; salting is the lever for
aggregations and for deterministic plans without AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value: Column,
    out_name: str,
    n_salts: int = 16,
) -> DataFrame:
    """SUM(value) GROUP BY key via salt → partial → merge (decimal-exact,
    so the two-phase result is bit-identical to the one-phase one)."""
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.concat_ws("|", *key_cols)) + F.spark_partition_id(), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value.cast("decimal(27,6)")).alias("_part")
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("_part").cast("double").alias(out_name))
    )
