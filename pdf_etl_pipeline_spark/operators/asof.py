"""As-of join — Spark has no native one (pyspark guide: common OLAP
patterns). Implemented as the union + last-value-ignoring-nulls window
trick:

    tag left/right rows → union by key → window ordered by (ts, side)
    → ``last(right_value, ignorenulls=True)`` carries the most recent
    right row forward → keep left rows.

One shuffle on the join key, linear in-partition work — strictly better at
scale than the per-group ``pd.merge_asof`` (no Python, no per-group
materialization). Right rows sort before left rows at equal timestamps, so
the match is inclusive (right.ts ≤ left.ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row: the most recent right row with
    ``right.right_ts <= left.left_ts`` on the same ``key``. Right columns
    come back prefixed ``asof_`` (null when no prior right row)."""
    left_payload = list(left.columns)
    l_rows = left.select(
        F.col(key).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left_payload).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_rows = right.select(
        F.col(key).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_rows.schema["_left"].dataType).alias("_left"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = l_rows.unionByName(r_rows)
    w = (
        Window.partitionBy("_key")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_key",
        "_ts",
        "_side",
        "_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_left.*"), *[f"asof_{c}" for c in right_cols]
    )
    return out
