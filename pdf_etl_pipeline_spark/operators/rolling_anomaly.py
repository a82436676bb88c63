"""Rolling z-score anomaly detection — the keyed-window monitoring op a
production event pipeline runs continuously: each observation scored
against the trailing W observations of ITS OWN series (never the future,
never the current point), anomalies = |z| > threshold.

Scale shape: one keyed window (partition by series key, order by time) —
the same frame-bounded pattern as rs4's EWMA, so cost is a single keyed
shuffle regardless of history length. No global state, no iteration.

Cross-engine determinism: the rolling moments come from DECIMAL-exact
frame sums (sum and sum-of-squares), so partition/frame evaluation order
cannot flicker the result; the variance closed form is then identical
double arithmetic in both engines, clamped at 0 before sqrt (float
cancellation can produce a tiny negative; clamping keeps NaN out, which
Spark and DuckDB ORDER differently — the one cross-engine trap here).

Warmup contract: a point is scored only after MIN_N prior observations;
a zero-variance window yields NULL z (no anomaly), like dp3's zero-MAD
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

W_ROWS = 32  # trailing window size
MIN_N = 8  # observations required before scoring
THRESHOLD = 3.0


def rolling_anomalies(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    w_rows: int = W_ROWS,
    min_n: int = MIN_N,
    threshold: float = THRESHOLD,
) -> DataFrame:
    """Rows whose value deviates > threshold rolling z-scores from their
    trailing-window mean. Output: key, order cols, value, mean_w, std_w,
    z (all rounded to 6), ordered by the series order."""
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(-w_rows, -1)
    )
    dec = F.col(value).cast("decimal(12,6)")
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum(dec * dec).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    # empty frame: s1 is NULL so mean is NULL (no ANSI error — NULL
    # dividend short-circuits); n = 1 would divide by (n-1) = 0, so the
    # variance is gated on n >= 2 on BOTH engines
    mean = s1 / n
    var = F.when(n >= 2, F.greatest((s2 - s1 * s1 / n) / (n - 1), F.lit(0.0)))
    std = F.sqrt(var)
    scored = df.select(
        key,
        *order,
        F.col(value).alias("value"),
        n.alias("n_w"),
        F.round(mean, 6).alias("mean_w"),
        F.round(std, 6).alias("std_w"),
        F.when(
            (n >= min_n) & (std > 0),
            F.round((F.col(value) - mean) / std, 6),
        ).alias("z"),
    )
    return (
        scored.filter(F.abs("z") > threshold)
        .drop("n_w")
        .orderBy(key, *order)
    )


def rolling_anomalies_sql(
    table: str,
    key: str,
    order: list[str],
    value: str,
    w_rows: int = W_ROWS,
    min_n: int = MIN_N,
    threshold: float = THRESHOLD,
) -> str:
    """DuckDB oracle running the identical decimal-exact arithmetic."""
    ob = ", ".join(order)
    return f"""
WITH framed AS (
  SELECT {key}, {ob}, {value} AS value,
         COUNT(*) OVER w AS n_w,
         CAST(SUM(CAST({value} AS DECIMAL(12,6))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST({value} AS DECIMAL(12,6)) * CAST({value} AS DECIMAL(12,6))) OVER w AS DOUBLE) AS s2
  FROM {table}
  WINDOW w AS (PARTITION BY {key} ORDER BY {ob}
               ROWS BETWEEN {w_rows} PRECEDING AND 1 PRECEDING)
),
vars AS (
  SELECT *, CASE WHEN n_w >= 2
                 THEN sqrt(greatest((s2 - s1 * s1 / n_w) / (n_w - 1), 0.0))
            END AS sd
  FROM framed
),
scored AS (
  SELECT {key}, {ob}, value,
         round(s1 / n_w, 6) AS mean_w,
         round(sd, 6) AS std_w,
         CASE WHEN n_w >= {min_n} AND sd > 0
              THEN round((value - s1 / n_w) / sd, 6)
         END AS z
  FROM vars
)
SELECT * FROM scored WHERE abs(z) > {threshold}
ORDER BY {key}, {ob}"""
