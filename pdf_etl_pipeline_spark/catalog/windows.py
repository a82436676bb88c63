"""Window / order-dependent operators — SURVEY.md §2.5 (W1–W5 plus the
rank/lead-lag surface the reference lacks).

W2 gap sessionization is the showcase: the reference's OCR line grouping
(/root/reference/lib/ocr_utils.py:89-126) re-expressed as lag→flag→cumsum,
reused for time sessions over ``events``.

Event-time outputs are epoch-second BIGINTs: the events parquet stores
TIMESTAMP(NANOS), which Spark reads as long nanos while DuckDB keeps
nanosecond timestamps — integer seconds are the precision both engines agree
on bit-exactly (see ``session.load_events``).

Scale notes: every window here partitions by a bounded-cardinality key
(user_id, returnflag) — one shuffle, then linear in-partition work. Running
aggregates over money use the decimal cast so in-order accumulation is
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.functions.scalars import dec_sum, dec_sum_sql
from pdf_etl_pipeline_spark.operators.sessionize import sessionize_events
from pdf_etl_pipeline_spark.session import load_events, load_table, tune


# --- W1: ordered ranking (spatial-sort analog) -----------------------------
@register(
    "w1_rank_within_group",
    oracle="""
SELECT c_custkey, c_nationkey,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       row_number() OVER w AS rn
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_nationkey, rn""",
    doc="W1 rank/dense_rank/row_number over (partition, order) — reading-order sort analog",
)
def w1_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .orderBy("c_nationkey", "rn")
    )


# --- W2: gap sessionization (reference: lib/ocr_utils.py:89-126) -----------
@register(
    "w2_sessionize_events",
    oracle=f"""
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
       CAST(floor(epoch(MAX(ts))) AS BIGINT) AS session_end_s,
       COUNT(*) AS n_events, {dec_sum_sql('value')} AS total_value
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    doc="W2 lag→gap-flag→cumsum sessionization (30-min gap) — the OCR line-grouping pattern over time",
)
def w2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    sessions = sessionize_events(load_events(spark, sf_dir), gap_seconds=1800)
    return sessions.select(
        "user_id",
        "session_id",
        F.unix_timestamp("session_start").alias("session_start_s"),
        F.unix_timestamp("session_end").alias("session_end_s"),
        "n_events",
        "total_value",
    ).orderBy("user_id", "session_id")


# --- W3: look-back frame (reference: lib/parse_utils.py:735-761) -----------
@register(
    "w3_lookback_context",
    oracle="""
SELECT event_id, user_id,
       COALESCE(array_to_string(
         list(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '|'), '') AS prev3
FROM events ORDER BY user_id, event_id""",
    doc="W3 collect_list over ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING (6-line look-back analog)",
)
def w3_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, -1)
    return (
        load_events(spark, sf_dir)
        .select(
            "event_id",
            "user_id",
            F.array_join(F.collect_list("event_type").over(w), "|").alias("prev3"),
        )
        .orderBy("user_id", "event_id")
    )


# --- W4: block segmentation (reference: lib/parse_utils.py:1534-1558) ------
@register(
    "w4_block_segmentation",
    oracle=f"""
WITH b AS (
  SELECT user_id, ts, event_id, value,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS block_id
  FROM events
)
SELECT user_id, block_id, COUNT(*) AS n_events, {dec_sum_sql('value')} AS total_value
FROM b GROUP BY user_id, block_id ORDER BY user_id, block_id""",
    doc="W4 sentinel-line block split: running count of markers → block id → per-block agg",
)
def w4_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = load_events(spark, sf_dir).withColumn(
        "block_id", F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0)).over(w)
    )
    return (
        marked.groupBy("user_id", "block_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value").alias("total_value"))
        .orderBy("user_id", "block_id")
    )


# --- W5: top-k per group ----------------------------------------------------
@register(
    "w5_topk_per_group",
    oracle=f"""
WITH rev AS (
  SELECT l_returnflag, l_partkey, {dec_sum_sql('l_extendedprice')} AS revenue
  FROM lineitem GROUP BY l_returnflag, l_partkey
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag
                               ORDER BY revenue DESC, l_partkey) AS rn
  FROM rev
)
SELECT l_returnflag, l_partkey, revenue, rn FROM ranked
WHERE rn <= 3 ORDER BY l_returnflag, rn""",
    doc="W5 top-k per group via row_number window (ordered top-k per partition)",
)
def w5_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_partkey")
        .agg(dec_sum("l_extendedprice").alias("revenue"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("revenue"), "l_partkey")
    return (
        rev.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .orderBy("l_returnflag", "rn")
    )


# --- W6: lead/lag analytics -------------------------------------------------
@register(
    "w6_lead_lag",
    oracle="""
SELECT event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s,
       lead(event_type) OVER w AS next_type
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id""",
    doc="W6 lead/lag inter-event analytics (gap to previous event, next event type)",
)
def w6_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_events(spark, sf_dir)
        .select(
            "event_id",
            "user_id",
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


# --- W7: running total (explicit frame spec) --------------------------------
@register(
    "w7_running_total",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(27,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
FROM events ORDER BY user_id, event_id""",
    doc="W7 running cumulative sum with explicit ROWS frame",
)
def w7_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_events(spark, sf_dir)
        .select(
            "event_id",
            "user_id",
            F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double").alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


# --- W8: distribution ranks (ntile / percent_rank / cume_dist) ---------------
@register(
    "w8_distribution_ranks",
    oracle="""
SELECT event_id, user_id,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
ORDER BY user_id, event_id""",
    doc="W8 distribution ranks per user: quartile bucket, percent_rank, cume_dist (event_id tiebreak keeps both engines deterministic)",
)
def w8_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return (
        load_events(spark, sf_dir)
        .select(
            "event_id",
            "user_id",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("user_id", "event_id")
    )


# --- W9: ordered funnel -------------------------------------------------------
_FUNNEL = ["signup", "view", "click", "purchase"]
_FUNNEL_COLS = ["signup_ns", "view_ns", "click_ns", "purchase_ns"]


def _funnel_oracle() -> str:
    ctes, prev = [], None
    for i, etype in enumerate(_FUNNEL):
        if prev is None:
            ctes.append(
                f"""s0 AS (
  SELECT user_id, MIN(epoch_ns(ts)) AS t0 FROM events
  WHERE event_type = '{etype}' GROUP BY 1)"""
            )
        else:
            ctes.append(
                f"""s{i} AS (
  SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t{i}
  FROM events e JOIN s{i - 1} p ON e.user_id = p.user_id
  WHERE e.event_type = '{etype}' AND epoch_ns(e.ts) > p.t{i - 1}
  GROUP BY 1)"""
            )
        prev = etype
    joins = "".join(
        f"\nLEFT JOIN s{i} USING (user_id)" for i in range(1, len(_FUNNEL))
    )
    sel = ", ".join(f"t{i} AS {c}" for i, c in enumerate(_FUNNEL_COLS))
    return f"WITH {', '.join(ctes)}\nSELECT user_id, {sel} FROM s0{joins} ORDER BY user_id"


@register(
    "w9_funnel_steps",
    oracle=_funnel_oracle(),
    doc="W9 ordered funnel (signup -> view -> click -> purchase): per-user first-completion times, each step strictly after the previous; one keyed agg + join per step, all on the user_id shuffle key",
)
def w9_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    from pdf_etl_pipeline_spark.operators.funnel import funnel_steps

    out = funnel_steps(load_events(spark, sf_dir), _FUNNEL)
    return out.select(
        "user_id", *[F.col(f"t{i}").alias(c) for i, c in enumerate(_FUNNEL_COLS)]
    ).orderBy("user_id")
