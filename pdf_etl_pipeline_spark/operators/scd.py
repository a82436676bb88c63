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


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
) -> DataFrame:
    """J6: bitemporal point-in-time join — each fact row picks up the
    dimension state that was VALID at the fact's own timestamp (the
    [valid_from, valid_to) interval containing it), the correctness
    discipline that prevents training-data leakage from future dimension
    states ("the user was 'basic' when they purchased, upgraded later").

    ``history`` is an SCD-2 relation (:func:`scd2_history` output or any
    (key, attr, valid_from, valid_to) tiling). The interval containment
    lives INSIDE the left-join condition (key equality + ``valid_from <=
    ts < valid_to``): Spark plans the equality as the join key and the
    interval test as the join filter — per-key histories are short
    (state changes, not events), so the equi-join dominates and no
    interval bucketization is needed; at extreme history sizes the rj1
    range-bucketing lever applies unchanged. Tiling guarantees at most
    one match per fact; facts before the key's first interval (or with
    no history at all) keep a NULL state — fact cardinality is preserved
    exactly.
    """
    h = history.select(
        F.col(key).alias("_h_key"),
        F.col(attr).alias("state_at_time"),
        "valid_from",
        "valid_to",
    )
    cond = (
        (facts[key] == F.col("_h_key"))
        & (facts[ts_col] >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (facts[ts_col] < F.col("valid_to")))
    )
    return facts.join(h, on=cond, how="left").drop("_h_key", "valid_to")
