"""The canonical ``invoices`` relation over the driver's synthetic tables.

The reference's analytics workload (``/root/reference/analytics.sql:13-34``)
runs over one wide denormalized ``invoices`` table. FIXTURES.md §6 maps that
shape onto the TPC-H-ish testdata: supplier_name→supplier, description→part,
total_amount→lineitem extendedprice(+tax), invoice_date→orders orderdate.

Scale notes (100 TB):
- ``lineitem ⋈ orders`` is the fact-fact join: both sides shuffle on
  orderkey. At warehouse scale both tables would be *bucketed* on orderkey so
  this join is co-located (no shuffle); AQE handles residual skew locally.
- ``supplier``/``part``/``nation``/``region`` are dimension-sized →
  explicit ``F.broadcast`` so the fact table never shuffles for them.
- The view is a pure projection+join: Catalyst pushes any downstream filter
  and column pruning through it into the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.session import load_table


def invoices_df(spark: SparkSession, sf_dir: str, spread: bool = False) -> DataFrame:
    """Build the canonical invoices DataFrame (one row per line item).

    ``spread=True`` opts the lineitem scan into the byte-gated spread
    (session.spread_scan): the spread hashes on ``l_orderkey`` with
    exactly ``spark.sql.shuffle.partitions`` partitions, so the
    lineitem⋈orders join REUSES the exchange (no extra shuffle) and the
    scan-side projection runs at session parallelism. Callers whose
    downstream is one cheap aggregate keep the default."""
    l = load_table(spark, sf_dir, "lineitem", spread=spread)
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.lit(1).alias("company_id"),
            F.col("r_name").alias("country"),
            F.col("o_orderdate").cast("date").alias("processed_date"),
            F.col("s_name").alias("supplier_name"),
            F.col("s_suppkey").cast("string").alias("supplier_tin"),
            F.col("o_orderkey").cast("string").alias("invoice_number"),
            F.col("o_orderdate").cast("date").alias("invoice_date"),
            F.col("p_name").alias("description"),
            F.col("l_quantity").alias("qty"),
            F.col("p_retailprice").alias("price"),
            F.col("l_extendedprice").alias("total"),
            (F.col("l_tax") * 100.0).alias("tax_label"),
            (F.col("l_extendedprice") * F.col("l_tax")).alias("tax_amount"),
            (F.col("l_extendedprice") * (F.lit(1.0) + F.col("l_tax"))).alias("total_amount"),
        )
    )


# DuckDB oracle: the *same* relation in ANSI SQL (tables are pre-registered
# views). Expression-for-expression identical with invoices_df so doubles are
# bit-equal before any aggregation.
INVOICES_CTE = """
invoices AS (
  SELECT
    1                                       AS company_id,
    r.r_name                                AS country,
    CAST(o.o_orderdate AS DATE)             AS processed_date,
    s.s_name                                AS supplier_name,
    CAST(s.s_suppkey AS VARCHAR)            AS supplier_tin,
    CAST(o.o_orderkey AS VARCHAR)           AS invoice_number,
    CAST(o.o_orderdate AS DATE)             AS invoice_date,
    p.p_name                                AS description,
    l.l_quantity                            AS qty,
    p.p_retailprice                         AS price,
    l.l_extendedprice                       AS total,
    l.l_tax * 100.0                         AS tax_label,
    l.l_extendedprice * l.l_tax             AS tax_amount,
    l.l_extendedprice * (1.0 + l.l_tax)     AS total_amount
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey  = s.s_suppkey
  JOIN part p     ON l.l_partkey  = p.p_partkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
)
"""
