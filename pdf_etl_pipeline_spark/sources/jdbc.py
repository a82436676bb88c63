"""JDBC source/sink — S6 (query read) and the database flavor of S7.

Reference: ``fetch_dataframe`` / ``insert_dataframe`` over psycopg2
(db_connection.py:27-68). Spark shape: ``spark.read.jdbc`` with a pushed
subquery (the database does projection/filter), parallel partitioned reads
via (partitionColumn, lowerBound, upperBound, numPartitions), and
executor-parallel batched writes.

These wrappers run against a REAL database in-container: pyspark bundles
Apache Derby (derby-*.jar in its jars directory), so tests drive the full
lifecycle — DDL, dedup-insert idempotence, partitioned read-back, point
probe — over ``jdbc:derby:memory:`` (tests/test_jdbc_derby.py), alongside
the storage-agnostic parquet twins in operators/dedup_sink.py. Pointing
them at a production warehouse is config only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def fetch_dataframe(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """S6: run ``query`` inside the database, read results in parallel.

    With ``partition_column`` + ``bounds``, Spark issues ``num_partitions``
    range-predicated queries — the 100 TB-side requirement (a single-cursor
    read like the reference's ``pd.read_sql_query`` bottlenecks on one
    connection)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) AS q")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column and bounds:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", bounds[0])
            .option("upperBound", bounds[1])
            .option("numPartitions", num_partitions)
        )
    return reader.load()


def execute_ddl(
    spark: SparkSession, url: str, *statements: str, properties: dict | None = None
) -> None:
    """S9 against a live database: run DDL statements (CREATE TABLE, ...)
    through the JVM's DriverManager — the reference's ``cursor.execute``
    setup path (db_connection.py:27-34 connects; run.ipynb creates the
    invoices table). Data movement never goes through here: reads are
    ``spark.read.jdbc`` (parallel, pushed-down), writes are
    ``df.write.jdbc`` (executor-parallel batched)."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, str(v))
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        st = conn.createStatement()
        try:
            for s in statements:
                st.executeUpdate(s)
        finally:
            st.close()
    finally:
        conn.close()
