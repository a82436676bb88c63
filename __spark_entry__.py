"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented SURVEY.md §2 operator as
    ``(spark, sf_dir) -> DataFrame``, sourced from the package's query
    catalog (``pdf_etl_pipeline_spark.catalog``).
``oracle_sql()`` — DuckDB-equivalent SQL for each SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pdf_etl_pipeline_spark.catalog import load_registry

_REGISTRY = load_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _REGISTRY["a3_top_suppliers"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}
