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

from pyspark.sql import Column, DataFrame
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


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """DP2: pairwise Pearson correlation over numeric columns — the
    column-relationship half of dataset profiling (dp1 covers per-column
    stats). ONE aggregation over ONE scan computes every sufficient
    statistic (n, Σx, Σx² per column, Σxy per pair) with map-side partial
    combine — nothing but O(|cols|²) doubles ever shuffles, the ml1
    sufficient-statistics contract applied to all pairs at once.

    Rows with a null in ANY profiled column are excluded (listwise
    completeness, so every pair shares the same n). Zero-variance columns
    yield null correlations. Determinism: decimal-exact sums
    (order-independent), then double arithmetic + round(6) — identical in
    any engine.
    """
    from pdf_etl_pipeline_spark.functions.scalars import dec_sum

    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    rows = df.filter(cond).select(*[F.col(c).cast("double").alias(c) for c in cols])
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            dec_sum(c).alias(f"s_{c}"),
            dec_sum(F.col(c) * F.col(c)).alias(f"ss_{c}"),
        ]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(dec_sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    one = rows.agg(*aggs)

    def corr_struct(a: str, b: str) -> Column:
        n = F.col("n")
        cov = n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        var_a = n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        var_b = n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        return F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            n.alias("n"),
            F.round(cov / F.nullif(F.sqrt(var_a * var_b), F.lit(0.0)), 6).alias("corr"),
        )

    exploded = one.select(
        F.explode(F.array(*[corr_struct(a, b) for a, b in pairs])).alias("p")
    )
    return exploded.select("p.*").orderBy("col_a", "col_b")


def correlation_matrix_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle for :func:`correlation_matrix` — identical sufficient
    statistics and closed form (NOT DuckDB's corr(), whose float summation
    is order-dependent)."""
    from pdf_etl_pipeline_spark.functions.scalars import dec_sum_sql

    where = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    sums = ["COUNT(*) AS n"]
    for c in cols:
        sums += [
            f"{dec_sum_sql(f'CAST({c} AS DOUBLE)')} AS s_{c}",
            f"{dec_sum_sql(f'CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE)')} AS ss_{c}",
        ]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        sums.append(
            f"{dec_sum_sql(f'CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE)')} AS sp_{a}_{b}"
        )
    selects = [
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b, n,
       round((n * sp_{a}_{b} - s_{a} * s_{b})
             / nullif(sqrt((n * ss_{a} - s_{a} * s_{a}) * (n * ss_{b} - s_{b} * s_{b})), 0.0), 6) AS corr
FROM stats"""
        for a, b in pairs
    ]
    return (
        f"WITH stats AS (\n  SELECT {', '.join(sums)} FROM {table} WHERE {where}\n)\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY col_a, col_b"
    )
