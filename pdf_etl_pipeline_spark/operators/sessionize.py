"""Gap-based sessionization — SURVEY.md §2.5 W2.

The reference's ``group_ocr_words`` (/root/reference/lib/ocr_utils.py:89-126)
merges consecutive OCR words whose ``y0`` differs by ≤ ``y_tolerance`` into
one visual line — structurally a 1-D session window over a spatial
coordinate. The same pattern sessionizes event streams over time.

Spark shape (the classic): ``lag`` over (partition, order) → gap flag →
running ``sum`` of flags = session id → groupBy(session id). One shuffle on
the partition key; the window and the subsequent groupBy reuse the same
hash partitioning, so Catalyst plans a single exchange.

At 100 TB: sessionization shuffles once on the entity key (user/document).
Skewed entities (one user with millions of events) are the risk — AQE skew
handling splits oversized partitions; for pathological keys pre-salt by
``(user, day)`` and merge sessions crossing the salt boundary in a second
cheap pass. The streaming analog is ``F.session_window`` (see
``streaming/jobs.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_session_id(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    gap_expr,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a 1-based session id per partition.

    ``gap_expr(prev_row_cols, row) -> Column[bool]`` decides whether the
    current row starts a new session given the previous row; it receives the
    lagged order columns (dict name→Column, None-able) so callers express
    "y0 differs by more than 10" or "ts gap exceeds 30 min".
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    lagged = {c: F.lag(c).over(w) for c in order_cols}
    new_session = F.when(
        lagged[order_cols[0]].isNull() | gap_expr(lagged), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*partition_cols).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(running))


def sessionize_events(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    value_col: str = "value",
) -> DataFrame:
    """Time sessionization: new session when the gap to the previous event
    exceeds ``gap_seconds``. Returns one row per session."""

    def gap(lagged: dict) -> Column:
        prev_ts = lagged[ts_col]
        return prev_ts.isNull() | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_seconds
        )

    with_id = with_session_id(df, [user_col], [ts_col, id_col], gap)
    return (
        with_id.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(27,6)")).cast("double").alias("total_value"),
        )
        .orderBy(user_col, "session_id")
    )


def group_ocr_words(
    words: DataFrame,
    filename_col: str = "filename",
    y_tolerance: int = 10,
) -> DataFrame:
    """W2 proper: OCR word boxes → visual lines (reference semantics:
    sort by (y0, x0); adjacent words with |Δy0| ≤ tolerance share a line;
    emit min/max bbox + space-joined text per line).

    Input schema: filename, x0, y0, x2, y2, line (word text) — FIXTURES.md §3.
    """

    def gap(lagged: dict) -> Column:
        prev_y = lagged["y0"]
        return prev_y.isNull() | (F.col("y0") - prev_y > y_tolerance)

    with_id = with_session_id(words, [filename_col], ["y0", "x0"], gap, "line_id")
    # within a visual line, words read left-to-right: aggregate ordered by x0
    ordered = F.array_sort(F.collect_list(F.struct("x0", "line")))
    return (
        with_id.groupBy(filename_col, "line_id")
        .agg(
            F.min("x0").alias("x0"),
            F.min("y0").alias("y0"),
            F.max("x2").alias("x2"),
            F.max("y2").alias("y2"),
            F.array_join(F.transform(ordered, lambda s: s["line"]), " ").alias("line"),
        )
        .orderBy(filename_col, "line_id")
    )
