"""Targeted key deletion over a partitioned table (S17,
beyond-reference) — the right-to-be-forgotten / tombstone-propagation
op: "remove user X from a 100 TB event log" without rewriting the
table.

Composition of two primitives this repo already ships:

1. FIND the affected partitions with a pruned scan — read only the
   partition column + key column (column pruning), aggregate the
   distinct partition values that contain any target key. At cluster
   scale this is a metadata-light pass; with bucketing or a key index it
   drops to listing work.
2. REWRITE only those partitions: read them back (listing-level
   PartitionFilters pruning), anti-join the tombstone keys (broadcast —
   deletion lists are small), and write with DYNAMIC partition
   overwrite (operators/partitioned_sink.py), which replaces exactly
   the affected day directories and leaves every other file
   byte-identical.

Cost scales with the data that actually contains the keys, not the
table: a user active 3 days costs 3 partition rewrites out of 1000.
The test pins untouched partitions by file mtime, full disappearance of
the keys, and row conservation for everyone else.

Partition-value fidelity: directory names are derived with the same
escaping Spark itself uses when writing partition paths
(ExternalCatalogUtils.escapePathName: '%XX' for '/', ':', '=', '#',
control chars, ...) and NULL partition values map to the Hive default
partition directory (__HIVE_DEFAULT_PARTITION__); the partition-match
predicate carries an explicit isNull branch so rows in the NULL
partition are found and rewritten rather than silently skipped by
NULL-propagating `isin`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.operators.partitioned_sink import overwrite_partitions

# Characters Spark escapes in partition directory names (Hive path-name
# escaping, org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils):
# ASCII control chars 0x01-0x1F, 0x7F, and " # % ' * / : = ? \ { [ ] ^
_ESCAPE_CHARS = frozenset(
    {chr(c) for c in range(0x01, 0x20)} | {chr(0x7F)} | set('"#%\'*/:=?\\{[]^')
)
_HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"

# Hard ceiling on how many distinct partition values the find/rewrite
# steps may materialize on the driver. The two collects below are
# metadata-bounded BY INTENT (rows = #distinct partition values touched by
# the deletion), but on a table with millions of partitions "metadata
# scale" is still driver-OOM scale — so the bound is now enforced, not
# assumed: exceeding it raises with guidance instead of silently
# materializing. 100k partition strings ≈ a few MB on the driver — safely
# inside any driver heap while far above sane per-deletion blast radii.
MAX_AFFECTED_PARTITIONS = 100_000


class TooManyPartitionsError(RuntimeError):
    """A forget/rewrite step would touch more partitions than
    ``max_partitions`` — refuse rather than materialize them all on the
    driver."""


def _bounded_collect(df: DataFrame, max_partitions: int, what: str) -> list:
    """Collect a distinct-partition relation with an enforced ceiling:
    fetch ``max_partitions + 1`` rows and raise if the extra row exists.
    The limit is pushed into the plan (CollectLimit), so the driver never
    receives more than the cap + 1 regardless of the true count."""
    rows = df.limit(max_partitions + 1).collect()
    if len(rows) > max_partitions:
        raise TooManyPartitionsError(
            f"{what} touches more than {max_partitions} distinct partitions; "
            "refusing to materialize them on the driver. Narrow the key set, "
            "raise max_partitions explicitly, or rewrite the table through a "
            "full-table anti-join instead of partition-targeted deletion."
        )
    return rows


def _escape_path_name(s: str) -> str:
    """Spark/Hive partition-path escaping: '%XX' (uppercase hex) for each
    special character, everything else verbatim."""
    return "".join(f"%{ord(c):02X}" if c in _ESCAPE_CHARS else c for c in s)


def _partition_dirname(partition_col: str, value_str: str | None) -> str:
    """The directory name Spark writes for this partition value (NULL ->
    __HIVE_DEFAULT_PARTITION__)."""
    enc = _HIVE_DEFAULT_PARTITION if value_str is None else _escape_path_name(value_str)
    return f"{_escape_path_name(partition_col)}={enc}"


def _partition_match(col: Column, parts: list) -> Column:
    """Predicate `col IN parts` with an explicit NULL branch: plain
    `isin` evaluates to NULL (thus false) for NULL partition values, so a
    NULL partition containing target keys would never be rewritten."""
    non_null = [p for p in parts if p is not None]
    cond = F.lit(False)
    if non_null:
        cond = cond | col.isin(non_null)
    if any(p is None for p in parts):
        cond = cond | col.isNull()
    return cond


def _affected_partitions_df(
    spark: SparkSession, path: str, partition_col: str, key_col: str, keys: list
) -> DataFrame:
    """The relation behind the ONLY driver-side collect in the find step:
    a distinct-aggregate of the partition column alone, over a scan pruned
    to (partition_col, key_col). Exposed so tools/explain_audit.py can
    assert the collect input stays metadata-bounded (rows = #distinct
    partition values, never data-scale)."""
    return (
        spark.read.parquet(path)
        .select(partition_col, key_col)
        .filter(F.col(key_col).isin(keys))
        .select(partition_col)
        .distinct()
    )


def affected_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    key_col: str,
    keys: list,
    max_partitions: int = MAX_AFFECTED_PARTITIONS,
) -> list:
    """Partition values containing any of ``keys`` — pruned scan reading
    only (partition_col, key_col). Raises :class:`TooManyPartitionsError`
    above ``max_partitions`` instead of materializing on the driver."""
    rows = _bounded_collect(
        _affected_partitions_df(spark, path, partition_col, key_col, keys),
        max_partitions,
        f"forget_keys find step on {path}",
    )
    return [r[0] for r in rows]


def _distinct_partition_strings_df(df: DataFrame, partition_col: str) -> DataFrame:
    """The relation behind the rewrite step's collect: a distinct of the
    cast-to-string partition column only — same metadata bound as
    _affected_partitions_df, audited the same way."""
    return df.select(F.col(partition_col).cast("string").alias("_p")).distinct()


def _distinct_partition_strings(
    df: DataFrame, partition_col: str, max_partitions: int = MAX_AFFECTED_PARTITIONS
) -> set:
    """Distinct partition values as the strings Spark would write in the
    directory path (cast-to-string; NULL stays None). Bounded by the
    number of distinct partition values — and the bound is enforced via
    :func:`_bounded_collect`, same ceiling as the find step."""
    return {
        r["_p"]
        for r in _bounded_collect(
            _distinct_partition_strings_df(df, partition_col),
            max_partitions,
            "forget_keys rewrite step",
        )
    }


def forget_keys(
    spark: SparkSession,
    path: str,
    partition_col: str,
    key_col: str,
    keys: list,
    max_partitions: int = MAX_AFFECTED_PARTITIONS,
) -> list:
    """Delete every row whose ``key_col`` is in ``keys``; rewrites ONLY
    the partitions that contain them. Returns the rewritten partition
    values as path strings (None = the NULL partition; empty list =
    nothing to do). Raises :class:`TooManyPartitionsError` when the
    deletion would touch more than ``max_partitions`` partitions."""
    import os

    from pdf_etl_pipeline_spark.operators import fsutil

    parts = affected_partitions(
        spark, path, partition_col, key_col, keys, max_partitions=max_partitions
    )
    if not parts:
        return []
    remaining = (
        spark.read.parquet(path)
        .filter(_partition_match(F.col(partition_col), parts))  # listing-level pruning
        # NULL-keyed rows (e.g. anonymous events) are NOT targets and must
        # survive: plain `~isin` evaluates to NULL for them (NULL NOT IN
        # semantics) and would silently destroy every such row
        .filter(~F.col(key_col).isin(keys) | F.col(key_col).isNull())
    )
    # String forms for directory bookkeeping — same cast Spark applies
    # when stringifying partition values into the path.
    part_strs = _distinct_partition_strings(
        spark.read.parquet(path).filter(
            _partition_match(F.col(partition_col), parts)
        ),
        partition_col,
        max_partitions=max_partitions,
    )
    still_present = _distinct_partition_strings(
        remaining, partition_col, max_partitions=max_partitions
    )
    if still_present:
        overwrite_partitions(remaining, path, partition_col)
    # dynamic overwrite only replaces partitions PRESENT in the batch — a
    # partition whose every row was deleted would silently survive, so
    # drop its directory explicitly (a table format does this inside the
    # same transaction at cluster scale), using Spark's own path escaping
    # so special-char / NULL partition values resolve to the real dir.
    # The drop goes through the Hadoop FileSystem API so this maintenance
    # path runs unchanged against HDFS/object-store locations.
    for p in part_strs - still_present:
        d = os.path.join(path, _partition_dirname(partition_col, p))
        if fsutil.exists(d, spark):
            fsutil.delete(d, recursive=True, spark=spark)
    return sorted(part_strs, key=lambda s: (s is None, s or ""))
