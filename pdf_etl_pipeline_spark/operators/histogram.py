"""Histogram quantile sketch (PC2, beyond-reference) — percentiles whose
cost SHAPE survives 100 TB.

Exact per-group percentiles (pc1) sort every group's values; at corpus
scale that is a full shuffle + sort of the measure column. The sketch
answer is a fixed-width histogram: bin counts are a plain keyed
aggregation (map-side combinable, one shuffle of #groups × #bins rows),
and quantiles interpolate inside the covering bin. Error is bounded by
one bin width of the value range — the knob is ``n_bins``, and the state
per group is ``n_bins`` longs regardless of corpus size (the same
bounded-state argument as the KMV sketch, `operators/sketches.py`).

Unlike t-digest/approx_percentile (mergeable but implementation-defined),
the fixed-bin histogram is DETERMINISTIC and engine-portable: bin edges
come from a first min/max aggregation pass, bin assignment is
``floor((x-lo)/(hi-lo)*n)`` (the same IEEE ops in Spark and DuckDB), so
a DuckDB oracle hash-matches the estimates exactly — an approximation
you can regression-gate, not just eyeball.

Two passes total (min/max, then counts), both single aggregations; the
per-group cumulative scan runs over ≤ ``n_bins`` rows per group — a
bounded window, never a data-sized sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    n_bins: int = 1024,
) -> DataFrame:
    """One row per group: ``q{...}`` estimate columns (floor-rounded to 6
    places with the engine-portable floor(x*1e6+0.5) — see rs3), plus
    ``n_rows``. Estimate = linear interpolation inside the bin covering
    rank q·n of the cumulative bin counts; exact when a bin holds one
    distinct value, within one bin width otherwise."""
    # NULLs are excluded up front: floor(NULL) -> NULL would otherwise
    # slip through least/greatest (which SKIP nulls) into the top bin,
    # silently biasing every quantile upward — in BOTH engines, so the
    # oracle hash could never catch it
    df = df.filter(F.col(value_col).isNotNull())
    span = df.groupBy(group_col).agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    )
    v = F.col(value_col).cast("double")
    binned = (
        df.join(span, group_col)
        .select(
            group_col,
            F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
            .otherwise(
                F.least(
                    F.lit(n_bins - 1).cast("long"),
                    F.floor((v - F.col("lo")) / (F.col("hi") - F.col("lo")) * n_bins),
                )
            )
            .alias("bin"),
        )
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = binned.withColumn("cum", F.sum("c").over(w)).join(
        binned.groupBy(group_col).agg(F.sum("c").alias("n_rows")), group_col
    )
    width = (F.col("hi") - F.col("lo")) / n_bins
    aggs = [F.max("n_rows").alias("n_rows")]
    for q in qs:
        rank = F.lit(q) * F.col("n_rows")
        # first bin whose cumulative count reaches rank; interpolate inside
        est = (
            F.col("lo")
            + F.col("bin") * width
            + ((rank - (F.col("cum") - F.col("c"))) / F.col("c")) * width
        )
        covering = F.when(
            (F.col("cum") >= rank) & ((F.col("cum") - F.col("c")) < rank), est
        )
        name = f"q{str(q).replace('.', '_')}"
        aggs.append(
            (F.floor(F.min(covering) * 1e6 + F.lit(0.5)) / 1e6).alias(name)
        )
    return cum.join(span, group_col).groupBy(group_col).agg(*aggs)


def fixed_histogram_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """(group, bin, c) counts against FIXED bin edges — the mergeable form
    of the sketch. Because bin counts merge by addition, this works
    unchanged on a STREAMING DataFrame: it is a plain streaming
    aggregation whose state per group is ≤ ``n_bins`` longs, updated
    incrementally across micro-batches (the streaming twin of the batch
    two-pass path, which learns edges from min/max; a stream fixes them
    up front — the standard production trade). Out-of-range values clamp
    to the edge bins. NULL values are excluded (same rationale as
    histogram_quantiles — they would land in the top bin)."""
    df = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("double")
    bin_ = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(n_bins - 1).cast("long"),
            F.floor((v - F.lit(float(lo))) / F.lit(float(hi) - float(lo)) * n_bins),
        ),
    )
    return df.select(group_col, bin_.alias("bin")).groupBy(group_col, "bin").agg(
        F.count(F.lit(1)).alias("c")
    )


def quantiles_from_counts(
    counts: DataFrame,
    group_col: str,
    lo: float,
    hi: float,
    qs: list[float],
    n_bins: int = 1024,
) -> DataFrame:
    """Finalize quantile estimates from a (group, bin, c) counts relation
    (from :func:`fixed_histogram_counts`, batch or streaming) — the same
    bounded cumulative window + in-bin interpolation as
    :func:`histogram_quantiles`."""
    w = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # per-group total via an unordered window over the same (bounded)
    # partition — avoids a self-join, which some sources (memory sink
    # tables) cannot resolve attribute-conflict-free
    wt = Window.partitionBy(group_col)
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n_rows", F.sum("c").over(wt)
    )
    width = (float(hi) - float(lo)) / n_bins
    aggs = [F.max("n_rows").alias("n_rows")]
    for q in qs:
        rank = F.lit(q) * F.col("n_rows")
        est = (
            F.lit(float(lo))
            + F.col("bin") * F.lit(width)
            + ((rank - (F.col("cum") - F.col("c"))) / F.col("c")) * F.lit(width)
        )
        covering = F.when(
            (F.col("cum") >= rank) & ((F.col("cum") - F.col("c")) < rank), est
        )
        name = f"q{str(q).replace('.', '_')}"
        aggs.append((F.floor(F.min(covering) * 1e6 + F.lit(0.5)) / 1e6).alias(name))
    return cum.groupBy(group_col).agg(*aggs)


def histogram_quantiles_sql(
    table: str,
    group_col: str,
    value_col: str,
    qs: list[float],
    n_bins: int = 1024,
) -> str:
    """DuckDB oracle — identical two-pass binning and interpolation."""
    sel = ["MAX(n_rows) AS n_rows"]
    for q in qs:
        name = f"q{str(q).replace('.', '_')}"
        est = (
            f"lo + bin * width + (({q} * n_rows - (cum - c)) / c) * width"
        )
        sel.append(
            f"floor(MIN(CASE WHEN cum >= {q} * n_rows AND (cum - c) < {q} * n_rows "
            f"THEN {est} END) * 1000000 + 0.5) / 1000000 AS {name}"
        )
    return f"""
WITH nn AS (SELECT * FROM {table} WHERE {value_col} IS NOT NULL),
span AS (
  SELECT {group_col}, MIN(CAST({value_col} AS DOUBLE)) AS lo,
         MAX(CAST({value_col} AS DOUBLE)) AS hi
  FROM nn GROUP BY 1
),
binned AS (
  SELECT t.{group_col},
         CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
              ELSE least({n_bins - 1},
                         CAST(floor((CAST({value_col} AS DOUBLE) - lo) / (hi - lo) * {n_bins}) AS BIGINT))
         END AS bin,
         COUNT(*) AS c
  FROM nn t JOIN span s USING ({group_col})
  GROUP BY 1, 2
),
cum AS (
  SELECT *, CAST(SUM(c) OVER (PARTITION BY {group_col} ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
            CAST(SUM(c) OVER (PARTITION BY {group_col}) AS BIGINT) AS n_rows
  FROM binned
),
j AS (
  SELECT c.*, s.lo, (s.hi - s.lo) / {n_bins} AS width
  FROM cum c JOIN span s USING ({group_col})
)
SELECT {group_col}, {', '.join(sel)}
FROM j GROUP BY {group_col} ORDER BY {group_col}"""
