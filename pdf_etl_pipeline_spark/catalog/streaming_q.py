"""Streaming-operator catalog — batch-mode runs of the §2.9 jobs with
DuckDB oracles (the driver checks them in batch; pytest drives the same
functions through real ``readStream``/``writeStream``).

Window starts are emitted as epoch-second BIGINTs computed with explicit
floor arithmetic so Spark's epoch-aligned windows and the oracle agree
bit-exactly (see catalog/windows.py for the nanos rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.functions.scalars import dec_sum_sql
from pdf_etl_pipeline_spark.session import load_events, tune
from pdf_etl_pipeline_spark.streaming.jobs import session_windows, windowed_counts


# --- ST1: tumbling window aggregation --------------------------------------
@register(
    "st1_tumbling_window",
    oracle=f"""
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600 AS window_start_s,
       event_type,
       COUNT(*) AS n_events,
       {dec_sum_sql('value')} AS total_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="ST1 10-min tumbling event-time window (streaming job run in batch mode)",
)
def st1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    out = windowed_counts(load_events(spark, sf_dir), window="10 minutes")
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start_s", "event_type")


# --- ST2: sliding window ----------------------------------------------------
@register(
    "st2_sliding_window",
    oracle=f"""
WITH offs(k) AS (VALUES (0), (1)),
assigned AS (
  SELECT ((CAST(floor(epoch(ts)) AS BIGINT) - k*300) // 600) * 600 + k*300 AS window_start_s,
         event_type, value
  FROM events, offs
  WHERE ((CAST(floor(epoch(ts)) AS BIGINT) - k*300) // 600) * 600 + k*300
        <= CAST(floor(epoch(ts)) AS BIGINT)
)
SELECT window_start_s, event_type, COUNT(*) AS n_events,
       {dec_sum_sql('value')} AS total_value
FROM assigned GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="ST2 10-min window sliding every 5 min (each event in 2 windows)",
)
def st2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    out = windowed_counts(load_events(spark, sf_dir), window="10 minutes", slide="5 minutes")
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start_s", "event_type")


# --- ST3: session windows ---------------------------------------------------
@register(
    "st3_session_window",
    oracle=f"""
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800.0
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM g
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
       CAST(floor(epoch(MAX(ts))) AS BIGINT) + 1800 AS session_end_s,
       COUNT(*) AS n_events,
       {dec_sum_sql('value')} AS total_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_s""",
    doc="ST3 F.session_window per user (gap 30 min); oracle via lag/cumsum with [start, last+gap) semantics",
)
def st3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    out = session_windows(load_events(spark, sf_dir), gap="30 minutes")
    return out.select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
        F.unix_timestamp(F.col("w.end")).alias("session_end_s"),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_start_s")


# --- ST4: dedup (deterministic batch formulation) ---------------------------
@register(
    "st4_dedup_keyed",
    oracle="""
SELECT user_id, event_type, MIN(event_id) AS first_event_id, COUNT(*) AS n_dups
FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""",
    doc="ST4 keyed dedup (first-event-wins, deterministic min formulation; streaming dropDuplicates covered in tests)",
)
def st4_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        load_events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("n_dups"))
        .orderBy("user_id", "event_type")
    )


# --- ST6: stream-stream interval join (batch-mode check) ---------------------
@register(
    "st6_attribution_join",
    oracle="""
WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT event_id AS view_id, user_id, ts AS v_ts FROM events
      WHERE event_type = 'view')
SELECT purchase_id, user_id,
       CAST(floor(epoch(p_ts)) AS BIGINT) AS purchase_ts_s,
       COUNT(*) AS n_views,
       MAX(view_id) AS max_view_id
FROM p JOIN v USING (user_id)
WHERE v_ts <= p_ts AND v_ts >= p_ts - INTERVAL 10 MINUTE
GROUP BY 1, 2, 3 ORDER BY 1""",
    doc="ST6 attribution: purchases joined to same-user views in the prior 10 min (watermarked stream-stream interval join; batch twin here, real streams in tests)",
)
def st6_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    from pdf_etl_pipeline_spark.streaming.jobs import attribution_join

    j = attribution_join(load_events(spark, sf_dir))
    return (
        j.groupBy("purchase_id", "user_id", "p_ts")
        .agg(F.count(F.lit(1)).alias("n_views"), F.max("view_id").alias("max_view_id"))
        .select(
            "purchase_id",
            "user_id",
            F.unix_timestamp("p_ts").alias("purchase_ts_s"),
            "n_views",
            "max_view_id",
        )
        .orderBy("purchase_id")
    )


# --- ST5: custom stateful operator (batch-mode check) ------------------------
@register(
    "st5_stateful_user_totals",
    oracle=f"""
SELECT user_id, COUNT(*) AS n_events, {dec_sum_sql('value')} AS total_value
FROM events GROUP BY user_id ORDER BY user_id""",
    doc="ST5 applyInPandasWithState running totals (batch-mode equivalence; real state store driven in tests)",
)
def st5_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    from pdf_etl_pipeline_spark.streaming.jobs import stateful_user_totals

    return stateful_user_totals(load_events(spark, sf_dir)).orderBy("user_id")


# --- ST9: stateful rolling-anomaly stream (batch-mode check) ------------------
from pdf_etl_pipeline_spark.operators.rolling_anomaly import rolling_anomalies_sql  # noqa: E402


@register(
    "st9_rolling_anomaly_stream",
    oracle=rolling_anomalies_sql(
        "(SELECT * FROM events WHERE value IS NOT NULL) ev",
        "event_type",
        ["ts", "event_id"],
        "value",
    ),
    doc="ST9 rolling z-score anomaly detection as a custom stateful stream "
    "(applyInPandasWithState; state = trailing W values per series, "
    "decimal-exact sums mirrored step-for-step from the batch plan). "
    "Batch mode delegates to the rs5 window, so this oracle checks the "
    "shared semantics; the REAL streamed run over ordered micro-batches "
    "is pinned bit-identical to batch in tests/test_streaming.py",
)
def st9_rolling_anomaly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    from pdf_etl_pipeline_spark.streaming.jobs import streaming_rolling_anomalies

    return streaming_rolling_anomalies(load_events(spark, sf_dir))
