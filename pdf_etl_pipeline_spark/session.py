"""SparkSession construction and runtime tuning.

The driver harness owns its own SparkSession; everything here must also be
safely applicable to a session we did not build (``tune`` only touches
runtime-settable confs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied defensively to any session we run on.
# - UTC timezone: parquet timestamps must compare bit-identical with the
#   DuckDB oracle (duckdb timestamps are naive/UTC).
# - AQE on: runtime coalescing + skew-join splitting — the local stand-in for
#   what we rely on at cluster scale.
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-owned or ours)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable on this build — keep going
    try:
        # shuffle partitions ≈ cores for a driver-owned vanilla session
        # (its default of 200 over-parallelizes local data; AQE coalesces,
        # but task-launch overhead is real). At cluster scale this would be
        # sized to ~128 MB shuffle blocks instead.
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)),
        )
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "pdf_etl_pipeline_spark", cpus: int | None = None) -> SparkSession:
    """Build a local session sized for this machine.

    ``local[N]`` is a single JVM: ``spark.driver.memory`` is the only memory
    knob. Shuffle partitions ≈ cores — at cluster scale this would instead be
    sized so each task's shuffle block fits executor memory (~128 MB/task).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one synthetic table (TESTDATA.md) as a DataFrame."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str):
    """Read the ``events`` table, normalizing the ``ts`` column's on-disk type.

    The driver has shipped two physical encodings of ``ts`` across testdata
    generations, so the loader is type-aware:

    - TIMESTAMP(NANOS) parquet: Spark has no nanosecond timestamp, so the
      column arrives as raw INT64 nanos (``nanosAsLong``) and is floored to
      microseconds with integer ``div`` — double division would *round* the
      microsecond (observable drift vs the oracle).
    - ``timestamp[us]`` parquet (no tz): Spark reads TIMESTAMP_NTZ; cast to
      session-local TIMESTAMP. The session timezone is pinned to UTC
      (``_RUNTIME_CONFS``), so the wall-clock is preserved bit-exactly and
      matches DuckDB's naive read of the same file.

    Either way the callers see ``ts`` as TIMESTAMP plus ``ts_ns`` (epoch
    nanos, BIGINT) for exact integer arithmetic. Event-time query outputs are
    emitted as epoch-second BIGINTs (not timestamps) so the DuckDB oracle
    hashes identically.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The TIMESTAMP_NTZ->TIMESTAMP cast below is wall-clock-preserving only
    # when the session timezone is UTC; a driver-owned session that hasn't
    # been through tune() may carry a machine-local zone, silently shifting
    # ts/ts_ns. Pin it here, next to the other load-critical conf.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "ts_ns", (F.unix_micros(F.col("ts")) * F.lit(1000)).cast("long")
    )
