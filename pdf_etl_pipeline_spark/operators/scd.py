"""Type-2 slowly-changing-dimension history (S13, beyond-reference).

The reference's sink keeps only the latest row per key (SCD-1: its
dedup-insert at db_connection.py:41-47 drops re-extractions, and our
``merge_upsert`` generalizes it to incoming-wins). The other half of
warehouse change tracking is SCD-2: keep EVERY state a key passed
through, as validity intervals — the shape auditors and as-of joins
need ("what was this supplier's status when the order shipped?").

Given a change-event stream, the history is two window passes:

1. **change-point compression** — keep an event only when its tracked
   attribute differs (null-safely) from the previous event of the same
   key; consecutive repeats collapse into the earlier row.
2. **interval stitching** — each kept row's ``valid_to`` is the next kept
   row's ``valid_from`` (lead), open-ended (NULL + ``is_current``) for
   the key's latest state.

Scale notes: both windows partition by the dimension key — bounded
per-key event counts, no global sort, no single-partition window. The
change compression drops the (usually dominant) repeat volume BEFORE the
second window runs. At 100 TB the history table is written partitioned
by a date of ``valid_from`` so point-in-time probes prune; probing it is
exactly the as-of join (`operators/asof.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key: str,
    attr: str,
    order_col: str,
    tiebreak: str,
) -> DataFrame:
    """(key, attr, valid_from, valid_to, is_current) — one row per state
    the key passed through, ordered by (``order_col``, ``tiebreak``).
    ``tiebreak`` must make the ordering total (e.g. an event id), or
    same-timestamp changes would make the history nondeterministic."""
    w = Window.partitionBy(key).orderBy(order_col, tiebreak)
    changed = (
        df.withColumn("_prev", F.lag(attr).over(w))
        .filter(~F.col(attr).eqNullSafe(F.col("_prev")))
        .select(key, attr, F.col(order_col).alias("valid_from"), tiebreak)
    )
    w2 = Window.partitionBy(key).orderBy("valid_from", tiebreak)
    return (
        changed.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, attr, "valid_from", "valid_to", "is_current")
    )


def scd2_history_sql(
    table: str, key: str, attr: str, order_col: str, tiebreak: str
) -> str:
    """DuckDB oracle reproducing ``scd2_history`` exactly (same null-safe
    change detection, same total ordering)."""
    return f"""
WITH ordered AS (
  SELECT {key}, {attr}, {order_col}, {tiebreak},
         lag({attr}) OVER (PARTITION BY {key} ORDER BY {order_col}, {tiebreak}) AS prev
  FROM {table}
),
chg AS (
  SELECT {key}, {attr}, {order_col} AS valid_from, {tiebreak}
  FROM ordered WHERE {attr} IS DISTINCT FROM prev
),
iv AS (
  SELECT {key}, {attr}, valid_from,
         lead(valid_from) OVER (PARTITION BY {key} ORDER BY valid_from, {tiebreak}) AS valid_to
  FROM chg
)
SELECT {key}, {attr}, valid_from, valid_to, valid_to IS NULL AS is_current
FROM iv ORDER BY {key}, valid_from"""
