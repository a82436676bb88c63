"""S6/S7/S8/S9 against a LIVE database — embedded Derby, which pyspark
bundles in its own jars directory (derby-*.jar), so the reference's entire
load/read-back lifecycle (db_connection.py:27-88, run.ipynb insert cell)
finally executes against a real JDBC engine in-container:

- S9  CREATE TABLE via execute_ddl (DriverManager, like the reference's
      cursor.execute setup)
- S7  write_jdbc_dedup: first insert loads, re-running the identical batch
      is a no-op, an augmented batch inserts only the new keys
- S6  fetch_dataframe: pushed subquery + parallel partitioned range reads
- S8  invoice_exists_jdbc: point probe with predicates pushed to the DB

and the Derby table contents stay frame-identical to the parquet twin
driven through the same dedup-insert sequence (operators/dedup_sink.py).
"""

from __future__ import annotations

import datetime
import uuid

import pytest

# live-Derby lifecycle: correct but slow (JVM driver bring-up per session)
pytestmark = pytest.mark.slow

from pdf_etl_pipeline_spark.operators.dedup_sink import (
    insert_dataframe,
    invoice_exists_jdbc,
    write_jdbc_dedup,
)
from pdf_etl_pipeline_spark.sources.jdbc import execute_ddl, fetch_dataframe

# Derby uppercases unquoted identifiers; VARCHAR (not the dialect-default
# CLOB) keeps the key columns comparable so SELECT DISTINCT works
INVOICES_DDL = """CREATE TABLE invoices (
  company_id INT,
  invoice_number VARCHAR(64),
  supplier_name VARCHAR(128),
  invoice_date DATE,
  total DOUBLE
)"""

ROWS = [
    (1, "100", "J.K. Computers", datetime.date(2024, 1, 5), 20520.0),
    (1, "101", "J.K. Computers", datetime.date(2024, 1, 9), 310.5),
    (2, "A-7", "MR. D.I.Y.", datetime.date(2024, 2, 1), 99.9),
    (2, "A-8", "PYEDRAIN", datetime.date(2024, 2, 3), 1520.0),
]
SCHEMA = (
    "company_id int, invoice_number string, supplier_name string, "
    "invoice_date date, total double"
)


@pytest.fixture()
def derby_url(spark):
    # a fresh in-memory database per test — lives in the (shared) JVM, so
    # a unique name isolates tests from each other
    url = f"jdbc:derby:memory:db{uuid.uuid4().hex};create=true"
    execute_ddl(spark, url, INVOICES_DDL)
    return url


def _normalize(df):
    """Derby reports uppercase column names — compare case-insensitively,
    row-order-independently."""
    out = df.toDF(*[c.lower() for c in df.columns])
    return sorted(
        (r.company_id, r.invoice_number, r.supplier_name, str(r.invoice_date), r.total)
        for r in out.collect()
    )


def test_derby_dedup_insert_idempotent_and_matches_parquet_twin(
    spark, derby_url, tmp_path
):
    batch = spark.createDataFrame(ROWS, SCHEMA)

    # first load inserts everything; the IDENTICAL batch must be a no-op
    # (reference db_connection.py:63 returns 0 when all keys exist)
    assert write_jdbc_dedup(batch, derby_url, "invoices") == 4
    assert write_jdbc_dedup(batch, derby_url, "invoices") == 0

    # an augmented corpus inserts ONLY the new keys — same-batch dup
    # collapses too
    extra = spark.createDataFrame(
        ROWS
        + [
            (3, "Z-1", "ACME", datetime.date(2024, 3, 1), 7.5),
            (3, "Z-1", "ACME", datetime.date(2024, 3, 1), 7.5),
        ],
        SCHEMA,
    )
    assert write_jdbc_dedup(extra, derby_url, "invoices") == 1

    # drive the parquet twin through the same sequence: contents must be
    # frame-identical to the live Derby table
    twin = str(tmp_path / "invoices_twin")
    keys = ("invoice_number", "supplier_name")
    assert insert_dataframe(batch, twin, keys) == 4
    assert insert_dataframe(batch, twin, keys) == 0
    assert insert_dataframe(extra, twin, keys) == 1

    derby_now = spark.read.jdbc(derby_url, "invoices")
    assert _normalize(derby_now) == _normalize(spark.read.parquet(twin))


def test_derby_partitioned_fetch_matches_single_cursor(spark, derby_url):
    batch = spark.createDataFrame(ROWS, SCHEMA)
    write_jdbc_dedup(batch, derby_url, "invoices")

    q = "SELECT company_id, invoice_number, supplier_name, invoice_date, total FROM invoices"
    single = fetch_dataframe(spark, derby_url, q)
    ranged = fetch_dataframe(
        spark,
        derby_url,
        q,
        partition_column="company_id",
        num_partitions=3,
        bounds=(1, 4),
    )
    # the ranged read issues one range-predicated query per partition (the
    # parallel-cursor shape a single pd.read_sql_query can't do) and must
    # return the identical relation
    assert ranged.rdd.getNumPartitions() == 3
    assert _normalize(ranged) == _normalize(single)
    assert len(_normalize(ranged)) == 4


def test_derby_point_probe(spark, derby_url):
    batch = spark.createDataFrame(ROWS, SCHEMA)
    write_jdbc_dedup(batch, derby_url, "invoices")

    assert invoice_exists_jdbc(
        spark, derby_url, "invoices", 1, "100", datetime.date(2024, 1, 5)
    )
    # wrong date, wrong number, wrong company: all miss
    assert not invoice_exists_jdbc(
        spark, derby_url, "invoices", 1, "100", datetime.date(2024, 1, 6)
    )
    assert not invoice_exists_jdbc(
        spark, derby_url, "invoices", 1, "999", datetime.date(2024, 1, 5)
    )
    assert not invoice_exists_jdbc(
        spark, derby_url, "invoices", 9, "100", datetime.date(2024, 1, 5)
    )
