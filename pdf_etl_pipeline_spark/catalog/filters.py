"""Projections / filters / predicates — SURVEY.md §2.2 (P1–P8) + F13/F14.

Scale notes: every filter here is a Column predicate that Catalyst pushes
into the parquet scan (verify with ``.explain`` → ``PushedFilters``). The
doc-type CASE chain preserves the reference's first-match-wins semantics
declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.functions.scalars import normalize_ocr_chars
from pdf_etl_pipeline_spark.session import load_events, load_table, tune


# --- P1+P2+P3: null / blank / min-length line filters ----------------------
# (reference: lib/pipeline_runner.py:74-77; lib/ocr_utils.py:97-98)
@register(
    "p1_p3_line_filters",
    oracle="""
SELECT doc_id, n_chars
FROM documents
WHERE text IS NOT NULL AND trim(text) <> '' AND length(text) > 3
ORDER BY doc_id""",
    doc="P1-P3 composed line filters (null, blank, min-length) — pushed to scan",
)
def p1_p3_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("text").isNotNull())
        .filter(F.trim(F.col("text")) != "")
        .filter(F.length(F.col("text")) > 3)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


# --- P5: doc-type predicate chain (reference: lib/pipeline_runner.py:4-21) -
@register(
    "p5_doc_type_detect",
    oracle="""
SELECT doc_type, COUNT(*) AS n_docs
FROM (
  SELECT CASE
           WHEN lower(text) LIKE '%award%' THEN 'nc_award_letter'
           WHEN lower(text) LIKE '%scan%'  THEN 'scan_doc'
           WHEN lower(text) LIKE '%merge%' THEN 'merge_doc'
           WHEN lower(text) LIKE '%hash%'  THEN 'hash_doc'
           ELSE 'invoice'
         END AS doc_type
  FROM documents
) GROUP BY doc_type ORDER BY doc_type""",
    doc="P5 first-match-wins doc-type classifier as a WHEN chain",
)
def p5_doc_type_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    d = load_table(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    doc_type = (
        F.when(lower.like("%award%"), "nc_award_letter")
        .when(lower.like("%scan%"), "scan_doc")
        .when(lower.like("%merge%"), "merge_doc")
        .when(lower.like("%hash%"), "hash_doc")
        .otherwise("invoice")
    )
    return (
        d.select(doc_type.alias("doc_type"))
        .groupBy("doc_type")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("doc_type")
    )


# --- P6+P7: noise filter + char-class normalization ------------------------
# (reference: lib/parse_utils.py:322-341, 362-364)
@register(
    "p6_p7_noise_normalize",
    oracle="""
SELECT doc_id,
       regexp_replace(upper(text), '[^A-Za-z0-9 :/().,&-]', '', 'g') AS clean_text
FROM documents
WHERE NOT regexp_matches(upper(text), 'TOTAL|CASH|CHANGE|INVOICE')
  AND doc_id % 10 = 0
ORDER BY doc_id""",
    doc="P6 noise-word rlike filter + P7 char-class strip (duck needs the 'g' flag to match Spark's replace-all)",
)
def p6_p7_noise_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    d = load_table(spark, sf_dir, "documents")
    upper = F.upper(F.col("text"))
    return (
        d.filter(~upper.rlike("TOTAL|CASH|CHANGE|INVOICE"))
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", normalize_ocr_chars(upper).alias("clean_text"))
        .orderBy("doc_id")
    )


# --- P8: null-audit projection (reference: run.ipynb cell 46098531) --------
@register(
    "p8_null_audit",
    oracle="""
WITH joined AS (
  SELECT o.o_orderkey, o.o_totalprice, hi.max_qty
  FROM orders o
  LEFT JOIN (SELECT l_orderkey, MAX(l_quantity) AS max_qty
             FROM lineitem WHERE l_quantity >= 50 GROUP BY l_orderkey) hi
    ON o.o_orderkey = hi.l_orderkey
)
SELECT o_orderkey, o_totalprice, max_qty FROM joined
WHERE o_orderkey IS NULL OR o_totalprice IS NULL OR max_qty IS NULL
ORDER BY o_orderkey""",
    doc="P8 QA view of rows with any null column (df[df.isna().any(axis=1)])",
)
def p8_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    o = load_table(spark, sf_dir, "orders")
    hi = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 50)
        .groupBy("l_orderkey")
        .agg(F.max("l_quantity").alias("max_qty"))
    )
    joined = o.join(hi, o.o_orderkey == hi.l_orderkey, "left").select(
        "o_orderkey", "o_totalprice", "max_qty"
    )
    any_null = F.greatest(*[F.col(c).isNull() for c in joined.columns])
    return joined.filter(any_null).orderBy("o_orderkey")


# --- F13: JSON parse (reference: lib/ocr_utils.py:135-137) -----------------
@register(
    "f13_json_extract",
    oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events ORDER BY event_id""",
    doc="F13 JSON field extraction from the props column",
)
def f13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return (
        load_events(spark, sf_dir)
        .select("event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .orderBy("event_id")
    )
