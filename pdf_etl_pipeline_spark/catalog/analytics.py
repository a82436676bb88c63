"""A1–A5 analytics workload (reference: /root/reference/analytics.sql:57-100)
plus the aggregation surface the reference lacks (rollup/cube/grouping sets,
approx distinct) — SURVEY.md §2.4, §2.6.

Money aggregates use the decimal-exact path (``dec_sum``): double summation
is partition-order dependent, so SUMs are computed in DECIMAL (exact,
associative — identical no matter how Spark partitions vs how the oracle
scans) and cast back to double. Ordering always carries a deterministic
tiebreak column so LIMIT k selects identical rows in both engines.

Scale notes: every query below is a shuffle-once groupBy over the invoices
view (map-side partial aggregation first — Spark's HashAggregate pair), and
top-k compiles to TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.functions import month_label
from pdf_etl_pipeline_spark.functions.scalars import (
    dec_sum,
    dec_sum_distinct,
    dec_sum_distinct_sql,
    dec_sum_sql,
)
from pdf_etl_pipeline_spark.plans.invoices_view import INVOICES_CTE, invoices_df
from pdf_etl_pipeline_spark.session import load_table, tune


# --- A1: documents processed per invoice (analytics.sql:57-62) -------------
@register(
    "a1_docs_per_invoice",
    oracle=f"""WITH {INVOICES_CTE}
SELECT invoice_number,
       COUNT(DISTINCT invoice_number) AS documents_processed
FROM invoices GROUP BY invoice_number ORDER BY invoice_number""",
    doc="A1 COUNT(DISTINCT)+GROUP BY; preserves the reference's distinct-of-group-key quirk",
)
def a1_docs_per_invoice(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        invoices_df(spark, sf_dir)
        .groupBy("invoice_number")
        .agg(F.count_distinct("invoice_number").alias("documents_processed"))
        .orderBy("invoice_number")
    )


# --- A2: invoice value via SUM(DISTINCT) (analytics.sql:66-71) -------------
@register(
    "a2_invoice_value",
    oracle=f"""WITH {INVOICES_CTE}
SELECT invoice_number,
       {dec_sum_distinct_sql('total_amount')} AS total_value
FROM invoices GROUP BY invoice_number
ORDER BY total_value DESC, invoice_number""",
    doc="A2 SUM(DISTINCT)+GROUP BY+ORDER DESC (decimal-exact)",
)
def a2_invoice_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        invoices_df(spark, sf_dir, spread=True)
        .groupBy("invoice_number")
        .agg(dec_sum_distinct("total_amount").alias("total_value"))
        .orderBy(F.desc("total_value"), "invoice_number")
    )


# --- A3: top-5 suppliers by spend (analytics.sql:75-81) --------------------
@register(
    "a3_top_suppliers",
    oracle=f"""WITH {INVOICES_CTE}
SELECT supplier_name, {dec_sum_sql('total_amount')} AS total_spend
FROM invoices GROUP BY supplier_name
ORDER BY total_spend DESC, supplier_name LIMIT 5""",
    doc="A3 SUM+GROUP BY+top-k (TakeOrderedAndProject)",
)
def a3_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        invoices_df(spark, sf_dir, spread=True)
        .groupBy("supplier_name")
        .agg(dec_sum("total_amount").alias("total_spend"))
        .orderBy(F.desc("total_spend"), "supplier_name")
        .limit(5)
    )


# --- A4: top-5 most common descriptions (analytics.sql:85-91) --------------
@register(
    "a4_top_descriptions",
    oracle=f"""WITH {INVOICES_CTE}
SELECT description, COUNT(*) AS occurrence_count
FROM invoices GROUP BY description
ORDER BY occurrence_count DESC, description LIMIT 5""",
    doc="A4 COUNT(*)+GROUP BY+top-k with deterministic tiebreak",
)
def a4_top_descriptions(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        invoices_df(spark, sf_dir)
        .groupBy("description")
        .agg(F.count(F.lit(1)).alias("occurrence_count"))
        .orderBy(F.desc("occurrence_count"), "description")
        .limit(5)
    )


# --- A5: monthly spend (analytics.sql:95-100) ------------------------------
@register(
    "a5_monthly_spend",
    oracle=f"""WITH {INVOICES_CTE}
SELECT CAST(date_trunc('month', invoice_date) AS DATE) AS month_start,
       strftime(date_trunc('month', invoice_date), '%b %Y') AS month,
       {dec_sum_sql('total_amount')} AS monthly_total
FROM invoices
GROUP BY date_trunc('month', invoice_date)
ORDER BY month_start""",
    doc="A5 time-bucketed SUM; TO_CHAR('Mon YYYY') → date_format('MMM yyyy') (F17)",
)
def a5_monthly_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        invoices_df(spark, sf_dir)
        .groupBy(F.date_trunc("month", "invoice_date").cast("date").alias("month_start"))
        .agg(dec_sum("total_amount").alias("monthly_total"))
        .select("month_start", month_label("month_start").alias("month"), "monthly_total")
        .orderBy("month_start")
    )


# --- A6: ROLLUP (absent in reference — SURVEY §2.4 gap row) ----------------
@register(
    "a6_rollup_region_supplier",
    oracle=f"""WITH {INVOICES_CTE}
SELECT country, supplier_name,
       {dec_sum_sql('total_amount')} AS total_spend,
       COUNT(*) AS n_items
FROM invoices GROUP BY ROLLUP (country, supplier_name)
ORDER BY country NULLS FIRST, supplier_name NULLS FIRST""",
    doc="A6 hierarchical ROLLUP aggregation (country→supplier→grand total)",
)
def a6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        invoices_df(spark, sf_dir)
        .rollup("country", "supplier_name")
        .agg(
            dec_sum("total_amount").alias("total_spend"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.asc_nulls_first("country"), F.asc_nulls_first("supplier_name"))
    )


# --- A7: CUBE over lineitem flags ------------------------------------------
@register(
    "a7_cube_flags",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       {dec_sum_sql('l_quantity', 2)} AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    doc="A7 CUBE aggregation (all flag subtotal combinations)",
)
def a7_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dec_sum("l_quantity", 2).alias("sum_qty"),
        )
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


# --- A8: TPC-H Q1-style pricing summary (flagship bench query) -------------
@register(
    "a8_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dec_sum_sql('l_quantity', 2)} AS sum_qty,
       {dec_sum_sql('l_extendedprice')} AS sum_base_price,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {dec_sum_sql('l_quantity', 2)} / COUNT(l_quantity) AS avg_qty,
       {dec_sum_sql('l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
       {dec_sum_sql('l_discount')} / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    doc="A8 multi-aggregate scan (TPC-H Q1 shape): one shuffle, codegen'd",
)
def a8_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    l = load_table(spark, sf_dir, "lineitem", spread=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", 2).alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(charge).alias("sum_charge"),
            (dec_sum("l_quantity", 2) / F.count("l_quantity")).alias("avg_qty"),
            (dec_sum("l_extendedprice") / F.count("l_extendedprice")).alias("avg_price"),
            (dec_sum("l_discount") / F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- A9: exact distinct per group ------------------------------------------
@register(
    "a9_exact_distinct_parts",
    oracle="""
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="A9 exact COUNT(DISTINCT) per group (approx_count_distinct is the 100TB path; exact kept for the oracle)",
)
def a9_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n_parts"))
        .orderBy("l_returnflag")
    )


# --- A10: TPC-H Q5-shape star join -----------------------------------------
@register(
    "a10_star_join_revenue",
    oracle=f"""
SELECT n_name,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 2)} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name""",
    doc="A10 local-supplier revenue per nation (TPC-H Q5 shape): the 6-table "
    "star join — lineitem->orders->customer on the fact spine, "
    "lineitem->supplier, the c_nationkey = s_nationkey locality filter, and "
    "the fixed-size region->nation pre-join broadcast to prune nations "
    "before any big join. Declared as plain joins + filters so Catalyst "
    "reorders and AQE picks broadcast vs shuffle per side at the actual "
    "scale (customer/supplier broadcast at test SF, shuffle on keys at "
    "100 TB — same declarative plan); decimal-exact revenue sum",
)
def a10_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    # fixed-size dims (5 regions x 25 nations): pre-join and broadcast so
    # the nation filter prunes before any data-scale join
    nations = F.broadcast(
        load_table(spark, sf_dir, "nation").join(
            load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nations, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )
