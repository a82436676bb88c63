"""One-scan dataset profiling (DP1, beyond-reference) — the ANALYZE
TABLE / data-quality pass every ingestion pipeline runs before trusting
a new drop: per-column null counts, distinct cardinality, and min/max,
computed in a SINGLE aggregation over a single scan.

Shape for scale: all per-column statistics ride one global aggregate —
count/min/max combine map-side so only a handful of values per task
reach the final reduce. The exact COUNT(DISTINCT) is the one expensive
piece: Spark plans multiple distinct aggregates via Expand (one
replicated stream per distinct column), so at 100 TB you swap
``exact_distinct=False`` to approx_count_distinct (HLL, also one pass,
mergeable) — the profile stays one scan either way; exact mode is kept
default here because the oracle hash-checks it.

Min/max are computed on the NATIVE column type (numeric/date ordering,
not lexicographic) and only cast to string afterwards for the uniform
report schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str], exact_distinct: bool = True) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_str, max_str) per column."""
    nd = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            nd(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col("n_rows").alias("n_rows"),
                    (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
                    F.col(f"nd_{c}").alias("n_distinct"),
                    F.col(f"mn_{c}").alias("min_str"),
                    F.col(f"mx_{c}").alias("max_str"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return one.select(per_col).select("p.*").orderBy("col_name")


def profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle for :func:`profile` (exact mode): one SELECT per
    column, unioned — semantically the same statistics."""
    parts = [
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_str,
       CAST(MAX({c}) AS VARCHAR) AS max_str
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"
