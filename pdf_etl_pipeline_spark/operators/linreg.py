"""Grouped ordinary-least-squares fit via sufficient statistics (ML1,
beyond-reference) — ML-on-Spark without MLlib: a closed-form model fit
expressed as ONE keyed aggregation.

This is the pattern that makes classic ML tractable at 100 TB: the fit
needs only the 5 sufficient statistics (n, Σx, Σy, Σx², Σxy) [+ Σy² for
R²], which partial aggregation combines map-side — the data is read
once, nothing but a handful of doubles per group ever shuffles, and the
"training" is O(groups) driver-free arithmetic in the projection. The
same shape carries any exponential-family closed form (Naive Bayes
counts, normal equations for small feature counts).

Determinism contract: each statistic runs through the decimal-exact sum
(order-independent), and all post-aggregate arithmetic is double ops on
those exact sums — identical in any engine; outputs rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.functions.scalars import dec_sum, dec_sum_sql


def suffstats(df: DataFrame, group_col: str, x: Column, y: Column) -> DataFrame:
    """The 6 sufficient statistics per group — a MERGEABLE sketch (counts
    and exact decimal sums combine associatively), so this same expression
    runs unchanged as an INCREMENTAL streaming aggregation: feed it a
    streaming DataFrame and the state per group is six numbers
    (streamed-equals-batch pinned in tests/test_streaming.py)."""
    rows = df.select(
        F.col(group_col), x.alias("x"), y.alias("y")
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    return rows.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("x").alias("sx"),
        dec_sum("y").alias("sy"),
        dec_sum(F.col("x") * F.col("x")).alias("sxx"),
        dec_sum(F.col("x") * F.col("y")).alias("sxy"),
        dec_sum(F.col("y") * F.col("y")).alias("syy"),
    )


def fit_from_stats(stats: DataFrame, group_col: str) -> DataFrame:
    """Closed-form OLS from a sufficient-statistics relation — pure
    projection arithmetic, O(groups)."""
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cov / F.nullif(varx, F.lit(0.0))
    return stats.select(
        group_col,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
        F.round(
            (cov * cov) / F.nullif(varx * vary, F.lit(0.0)), 6
        ).alias("r2"),
    ).orderBy(group_col)


def linreg(df: DataFrame, group_col: str, x: Column, y: Column) -> DataFrame:
    """Per-group OLS fit of y = slope·x + intercept, with R².

    Null x or y rows are excluded (the SQL-standard regr_* convention).
    Degenerate groups (zero x-variance) yield null slope/intercept/r2.
    """
    return fit_from_stats(suffstats(df, group_col, x, y), group_col)


def linreg_sql(table: str, group_col: str, x_expr: str, y_expr: str) -> str:
    """DuckDB oracle for :func:`linreg` — identical closed-form arithmetic
    (NOT DuckDB's regr_slope, whose float summation is order-dependent)."""
    return f"""
WITH rows_ AS (
  SELECT {group_col}, {x_expr} AS x, {y_expr} AS y FROM {table}
  WHERE {x_expr} IS NOT NULL AND {y_expr} IS NOT NULL
),
stats AS (
  SELECT {group_col}, COUNT(*) AS n,
         {dec_sum_sql('x')} AS sx, {dec_sum_sql('y')} AS sy,
         {dec_sum_sql('x * x')} AS sxx, {dec_sum_sql('x * y')} AS sxy,
         {dec_sum_sql('y * y')} AS syy
  FROM rows_ GROUP BY 1
)
SELECT {group_col}, n,
       round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)) * sx) / n, 6)
         AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0), 6) AS r2
FROM stats ORDER BY {group_col}"""
