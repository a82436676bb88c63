"""Keyed merge-upsert (SCD-1 MERGE) — completes the sink family: the
dedup sink (``dedup_sink.py``) is insert-only (new keys appended, existing
rows frozen); this operator is update-else-insert (incoming rows WIN on key
collision — ``MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
INSERT`` semantics over a parquet table).

Spark-first shape: one full-outer join on the key, coalescing incoming over
existing per column — a single shuffle on the merge key for both the update
and insert halves (two separate joins would shuffle twice). The rewrite is
copy-on-write at partition granularity, the standard open-table-format
strategy (Delta/Iceberg MERGE compiles to the same outer-join plan); at
100 TB the table is partitioned/bucketed by the key so the join co-locates
and only touched partitions rewrite.

Same-batch collisions resolve deterministically BEFORE the merge: max
``version`` wins, row-hash tiebreak — a nondeterministic dropDuplicates
here would make reruns diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merged_relation(
    existing: DataFrame, incoming: DataFrame, keys: tuple[str, ...]
) -> DataFrame:
    """The post-MERGE table contents as one declarative plan.

    Column set is taken from ``existing``; ``incoming`` must carry the same
    columns. Incoming rows win on key collision; existing rows without a
    match pass through unchanged.
    """
    cols = existing.columns
    key_cols = list(keys)
    val_cols = [c for c in cols if c not in key_cols]

    w = Window.partitionBy(*key_cols).orderBy(
        F.desc_nulls_last("version") if "version" in cols else F.desc(F.md5(F.concat_ws("\x1f", *cols))),
        F.md5(F.concat_ws("\x1f", *cols)),
    )
    inc = (
        incoming.select(*cols)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    e = existing.select(*key_cols, *[F.col(c).alias(f"_e_{c}") for c in val_cols])
    i = inc.select(*key_cols, *[F.col(c).alias(f"_i_{c}") for c in val_cols], F.lit(1).alias("_has_i"))
    return (
        e.join(i, key_cols, "full_outer")
        .select(
            *key_cols,
            *[
                F.when(F.col("_has_i").isNotNull(), F.col(f"_i_{c}"))
                .otherwise(F.col(f"_e_{c}"))
                .alias(c)
                for c in val_cols
            ],
        )
    )


def merge_upsert(
    incoming: DataFrame, table_path: str, keys: tuple[str, ...]
) -> None:
    """Materialize the merge into a parquet table (read → merge → overwrite).

    The local overwrite is whole-table (parquet has no transactional
    row-group replace); the partitioned/bucketed layout note in the module
    docstring is the 100 TB path.
    """
    from pdf_etl_pipeline_spark.operators import fsutil

    spark = incoming.sparkSession
    # fsutil.exists, not os.path.isdir: on s3a:// a POSIX probe is always
    # False, which would silently turn merge into a blind overwrite.
    if fsutil.exists(table_path, spark):
        existing = spark.read.parquet(table_path)
        out = merged_relation(existing, incoming, keys)
    else:
        out = incoming
    # localCheckpoint decouples the write from the scan of the same path
    # (overwrite-while-reading is undefined behavior on file sources)
    out.localCheckpoint().write.mode("overwrite").parquet(table_path)
