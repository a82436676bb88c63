"""Unit tests for the scalar function layer (SURVEY.md §2.7)."""

import datetime

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.functions import scalars as S


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_parse_float(spark):
    assert one(spark, S.parse_float(F.lit("$1,234.50"))) == 1234.5
    assert one(spark, S.parse_float(F.lit(" 19,000.00 "))) == 19000.0
    assert one(spark, S.parse_float(F.lit("abc"))) is None
    assert one(spark, S.parse_float(F.lit(""))) is None


def test_parse_date_formats(spark):
    for s, expect in [
        ("Jan 20, 2021", datetime.date(2021, 1, 20)),
        ("February 10, 2021", datetime.date(2021, 2, 10)),
        ("2021-01-20", datetime.date(2021, 1, 20)),
        ("20-01-2021", datetime.date(2021, 1, 20)),
        ("01/20/2021", datetime.date(2021, 1, 20)),
        ("garbage", None),
    ]:
        assert one(spark, S.parse_date(F.lit(s))) == expect


def test_ocr_digit_repair_and_date_mining(spark):
    # reference repairs only BETWEEN digits: boundary O's stay broken
    got = one(spark, S.find_dates_in_lines(F.array(F.lit("paid O1-O2-21"), F.lit("x"))))
    assert got is None
    got = one(spark, S.find_dates_in_lines(F.array(F.lit("paid 15-06-2O21"), F.lit("x"))))
    assert got == datetime.date(2021, 6, 15)
    # earliest date wins (reference _find_invoice_date)
    got = one(
        spark,
        S.find_dates_in_lines(F.array(F.lit("5/6/2021"), F.lit("4/6/2021"))),
    )
    assert got == datetime.date(2021, 6, 4)
    # _coerce_year: yy <= 30 -> 2000s, else 1900s
    got = one(spark, S.find_dates_in_lines(F.array(F.lit("31-12-99"), F.lit("1-1-05"))))
    assert got == datetime.date(1999, 12, 31)
    # digit-boundary guards: no date mined from inside a longer digit run
    got = one(spark, S.find_dates_in_lines(F.array(F.lit("ref 328-03-19"), F.lit("x"))))
    assert got is None


def test_tax_rate_and_unicode_percent(spark):
    assert one(spark, S.extract_tax_rate(F.lit("GST 8%"))) == 8.0
    assert one(spark, S.extract_tax_rate(F.lit("TAX 6.5 %"))) == 6.5
    assert one(spark, S.extract_tax_rate(F.lit("GST 8％"))) == 8.0
    assert one(spark, S.extract_tax_rate(F.lit("none"))) is None


def test_norm_num_cents_heuristic(spark):
    assert one(spark, S.norm_num(F.lit("12 345"))) == 123.45
    assert one(spark, S.norm_num(F.lit("99"))) == 99.0
    assert one(spark, S.norm_num(F.lit("10001"))) == 100.01


def test_money_numeric_predicates(spark):
    assert one(spark, S.is_money_token(F.lit("$1,234.50")))
    assert one(spark, S.is_money_token(F.lit("4,760.00")))
    assert not one(spark, S.is_money_token(F.lit("4760")))
    assert one(spark, S.is_numeric_token(F.lit("1,234")))
    assert not one(spark, S.is_numeric_token(F.lit("12a")))


def test_infer_qty(spark):
    # missing qty, ratio near-integer → inferred
    assert one(spark, S.infer_qty(F.lit(None).cast("double"), F.lit(100.0), F.lit(300.0))) == 3.0
    # consistent → kept
    assert one(spark, S.infer_qty(F.lit(4.0), F.lit(25.0), F.lit(100.0))) == 4.0
    # inconsistent but implausible ratio → kept
    assert one(spark, S.infer_qty(F.lit(5.0), F.lit(2.0), F.lit(9.9))) == 5.0


def test_fix_null_total(spark):
    assert one(spark, S.fix_null_total(F.lit(None).cast("double"), F.lit(80.0), F.lit(4.8))) == 84.8
    assert one(spark, S.fix_null_total(F.lit(20520.0), F.lit(1.0), F.lit(1.0))) == 20520.0


def test_path_helpers(spark):
    assert one(spark, S.path_ext(F.lit("/a/b/c.PDF"))) == "pdf"
    assert one(spark, S.path_stem(F.lit("/a/b/c.pdf"))) == "c"
    assert one(spark, S.path_stem(F.lit("dir\\x.jpg"))) == "x"


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    for val in ["hello", "a", "Zed 123"]:
        spark_h = one(spark, S.portable_hash32(F.lit(val)))
        duck_h = duckdb.sql("SELECT " + S.portable_hash32_sql(f"'{val}'")).fetchone()[0]
        assert spark_h == duck_h
