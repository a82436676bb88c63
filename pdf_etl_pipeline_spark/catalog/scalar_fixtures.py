"""Scalar function layer driven through literal fixtures — SURVEY.md §2.7.

The F1–F17 Column expressions run over an inline VALUES fixture (the same
literal rows in Spark and in the DuckDB oracle), so the oracle is an
*independent* re-implementation of each scalar's semantics in another SQL
dialect — a genuine cross-check, not a copy.

Dialect notes encoded here:
- DuckDB ``regexp_replace`` replaces the FIRST match unless passed the 'g'
  flag; Spark always replaces all.
- DuckDB is RE2: no lookbehind/lookahead — the OCR digit-repair and the
  date digit-boundary guards use consuming capture groups (two-pass
  replace / boundary groups), equivalent to the Spark lookarounds on
  fixture-shaped content (see catalog/_ducksql.py).
- ``try_strptime`` ↔ ``try_to_timestamp`` for null-on-failure parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.catalog._ducksql import d_mined_date
from pdf_etl_pipeline_spark.functions import scalars as S
from pdf_etl_pipeline_spark.session import tune

_MINED = d_mined_date("[line1, line2]")

# (id, money_s, date_s, tax_s, num_s, qty, price, total, sub_d, tax_d, tot_d,
#  line1, line2)
_ROWS = [
    (1, "$1,234.50", "Jan 20, 2021", "GST 8%", "12 345", 1.0, 7400.0, 7400.0,
     19000.0, 1520.0, None, "Invoice Date: 12-03-18 18:05", "TIN: 14122226789"),
    # line1: O's at group boundaries are NOT repaired (reference requires a
    # digit on BOTH sides) → no date; line2: 2O23 repairs to 2023
    (2, " 19,000.00 ", "February 10, 2021", "TAX 6.5 %", "1,23", 2.0, 5300.0,
     10600.0, None, None, 20520.0, "Due O1-O2-21", "pay by 15-06-2O23"),
    (3, "abc", "2021-01-20", "no rate", "", None, 100.0, 300.0, 100.0, None,
     None, "paid 5/6/2021 morning", "also 4/6/2021"),
    (4, "", "20-01-2021", "GST 8％", "99", 4.0, 25.0, 100.0, None, 8.0, None,
     "nothing", "here"),
    (5, "$0.99", "01/20/2021", "5%", "10001", 5.0, 2.0, 9.9, 9.0, 0.9, None,
     "31-12-99 end of century", "1-1-2000 start"),
    (6, None, None, None, None, None, None, None, None, None, None, None, None),
]

_SCHEMA = (
    "id int, money_s string, date_s string, tax_s string, num_s string, "
    "qty double, price double, total double, sub_d double, tax_d double, "
    "tot_d double, line1 string, line2 string"
)


def _values_sql() -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    rows = ",\n    ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in _ROWS)
    return f"""(VALUES
    {rows}
) fx(id, money_s, date_s, tax_s, num_s, qty, price, total, sub_d, tax_d, tot_d, line1, line2)"""


@register(
    "f_scalar_suite",
    oracle=f"""
SELECT id,
       TRY_CAST(nullif(regexp_replace(trim(money_s), '[,$]', '', 'g'), '') AS DOUBLE) AS parsed_float,
       COALESCE(
         CAST(try_strptime(trim(date_s), '%b %d, %Y') AS DATE),
         CAST(try_strptime(trim(date_s), '%B %d, %Y') AS DATE),
         CAST(try_strptime(trim(date_s), '%Y-%m-%d') AS DATE),
         CAST(try_strptime(trim(date_s), '%d-%m-%Y') AS DATE),
         CAST(try_strptime(trim(date_s), '%m/%d/%Y') AS DATE)
       ) AS parsed_date,
       TRY_CAST(nullif(regexp_extract(translate(tax_s, '％°‰', '%%%'),
                                      '([0-9]+\\.?[0-9]*)\\s*%', 1), '') AS DOUBLE) AS tax_rate,
       CASE WHEN v = floor(v) AND v > 10000 THEN v / 100.0 ELSE v END AS normed_num,
       COALESCE(regexp_full_match(money_s, '\\$?[0-9,]+\\.[0-9]{{2}}'), FALSE) AS is_money,
       COALESCE(regexp_full_match(regexp_replace(num_s, ',', '', 'g'), '[0-9]+(\\.[0-9]+)?'), FALSE) AS is_numeric,
       CASE WHEN (qty IS NULL OR abs(qty * price - total) > 0.02)
                 AND ratio IS NOT NULL AND abs(ratio - round(ratio)) < 0.02
                 AND ratio >= 0.5 AND ratio <= 999
            THEN round(ratio) ELSE qty END AS qty_fixed,
       COALESCE(tot_d, COALESCE(sub_d, 0.0) + COALESCE(tax_d, 0.0)) AS total_fixed,
       strftime(COALESCE(
         CAST(try_strptime(trim(date_s), '%b %d, %Y') AS DATE),
         CAST(try_strptime(trim(date_s), '%B %d, %Y') AS DATE),
         CAST(try_strptime(trim(date_s), '%Y-%m-%d') AS DATE),
         CAST(try_strptime(trim(date_s), '%d-%m-%Y') AS DATE),
         CAST(try_strptime(trim(date_s), '%m/%d/%Y') AS DATE)
       ), '%b %Y') AS month_lbl,
       {_MINED} AS mined_date
FROM (
  SELECT *,
         CASE WHEN vv = floor(vv) AND vv > 10000 THEN vv ELSE vv END AS v,
         total / nullif(price, 0) AS ratio
  FROM (
    SELECT *,
           TRY_CAST(nullif(replace(regexp_replace(num_s, '\\s+', '', 'g'), ',', '.'), '') AS DOUBLE) AS vv
    FROM {_values_sql()}
  )
)
ORDER BY id""",
    doc="F1/F2/F4/F5/F6/F7/F8/F16/F17 + F3 date mining over a literal fixture; oracle is an independent DuckDB re-implementation",
)
def f_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    return df.select(
        "id",
        S.parse_float("money_s").alias("parsed_float"),
        S.parse_date("date_s").alias("parsed_date"),
        S.extract_tax_rate("tax_s").alias("tax_rate"),
        S.norm_num("num_s").alias("normed_num"),
        F.coalesce(S.is_money_token("money_s"), F.lit(False)).alias("is_money"),
        F.coalesce(S.is_numeric_token("num_s"), F.lit(False)).alias("is_numeric"),
        S.infer_qty("qty", "price", "total").alias("qty_fixed"),
        S.fix_null_total("tot_d", "sub_d", "tax_d").alias("total_fixed"),
        S.month_label(S.parse_date("date_s")).alias("month_lbl"),
        S.find_dates_in_lines(F.array("line1", "line2")).alias("mined_date"),
    ).orderBy("id")
