"""Ordered-funnel analysis over an event relation (beyond-reference op —
the classic product-analytics sequence query: which users completed step 1,
then step 2 strictly after it, then step 3 …).

Spark-first shape: one keyed aggregation + one keyed join PER STEP, all on
the same ``user_id`` shuffle key (the exchange is reusable across steps;
AQE handles entity skew). No window over a global ordering, no per-user
event arrays collected — state per step is one row per surviving user, so
a 100 TB event log funnels with #steps keyed shuffles whose volume shrinks
monotonically (each step's input is semi-filtered by the previous step's
survivors).

Timestamps flow as epoch-nanosecond BIGINTs (``ts_ns`` from
``session.load_events``) so step comparisons are exact integer arithmetic
and the DuckDB oracle (``epoch_ns(ts)``) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel completion times: column ``t{i}`` holds the first
    time the user performed ``steps[i]`` STRICTLY AFTER completing step
    ``i-1`` (classic ordered-funnel semantics; ``t{i}`` is null from the
    first uncompleted step on). Output has one row per user who completed
    step 0."""
    out: DataFrame | None = None
    for i, etype in enumerate(steps):
        f = events.filter(F.col(type_col) == etype)
        if out is None:
            out = f.groupBy(user_col).agg(F.min(ts_col).alias("t0"))
        else:
            cur = (
                f.join(out.select(user_col, f"t{i - 1}"), user_col)
                .filter(F.col(ts_col) > F.col(f"t{i - 1}"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(f"t{i}"))
            )
            out = out.join(cur, user_col, "left")
    return out
