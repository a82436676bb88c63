"""Distinct-count sketching (beyond-reference op): KMV (k-minimum-values)
estimation of per-group cardinality.

Why KMV and not HyperLogLog here: Spark's ``approx_count_distinct`` is an
HLL whose register layout no other engine reproduces, so its output can't
be oracle-checked. KMV with the engine-portable md5 hash is just order
statistics — the estimate is a pure function of the k-th smallest distinct
hash value, which DuckDB computes bit-identically — so the approximation
itself sits under the hash-compare gate (the same trick as the
Misra-Gries heavy hitters: deterministic sketch, verifiable output).

Estimator (Bar-Yossef et al. 2002): with distinct values hashed uniformly
into [0, M), and h_(k) the k-th smallest distinct hash in a group,
``est = (k-1) * M / h_(k)``; groups with fewer than k distinct hashes are
exact (their full hash set is known) — the standard small-cardinality
fallback.

Scale shape: (group, hash) pairs are distinct-ed (map-side combined), then
PRE-FILTERED to ``h < M/prune`` before any ordering — only ~1/prune of the
hash space ever reaches the per-group k-min selection, so the row_number
window runs on a tiny survivor relation, not the full cardinality. The
filter is sound because the k smallest hashes are always below M/prune
whenever the group has ≥ k·prune-ish distinct values; the fallback path
covers the rest exactly. At 100 TB, ``prune`` is sized so survivors per
group ≈ a few·k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.functions.scalars import portable_hash32

M_SPACE = 1 << 32  # portable_hash32 range [0, 2^32)
KMV_K = 64
KMV_PRUNE = 8  # keep hashes < M/8 for the k-min selection


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K, prune: int = KMV_PRUNE
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``; exact for
    groups with < k surviving hashes. Output: (group, est_distinct,
    sketch_size) with est_distinct rounded to 6 decimals."""
    thresh = M_SPACE // prune
    hashed = df.select(
        F.col(group_col), portable_hash32(F.col(value_col).cast("string")).alias("h")
    ).dropDuplicates([group_col, "h"])
    # exact distinct-hash count per group rides along for the fallback
    # decision (one extra aggregate over the same shuffle, not a new scan)
    totals = hashed.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_hashes"))
    survivors = hashed.filter(F.col("h") < thresh)
    w = Window.partitionBy(group_col).orderBy("h")
    kth = (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(group_col)
        .agg(F.max("h").alias("h_k"), F.count(F.lit(1)).alias("sketch_size"))
    )
    est = F.when(
        F.col("sketch_size") >= k,
        (F.lit(k - 1) * F.lit(float(M_SPACE))) / F.col("h_k"),
    ).otherwise(F.col("n_hashes").cast("double"))
    return (
        totals.join(kth, group_col, "left")
        .select(
            group_col,
            F.round(
                F.coalesce(est, F.col("n_hashes").cast("double")), 6
            ).alias("est_distinct"),
            F.coalesce(F.col("sketch_size"), F.lit(0)).cast("long").alias("sketch_size"),
        )
    )


def kmv_sql(
    table: str, group_col: str, value_col: str, k: int = KMV_K, prune: int = KMV_PRUNE
) -> str:
    """DuckDB oracle reproducing ``kmv_distinct`` bit-for-bit."""
    from pdf_etl_pipeline_spark.functions.scalars import portable_hash32_sql

    h = portable_hash32_sql(f"CAST({value_col} AS VARCHAR)")
    thresh = M_SPACE // prune
    return f"""
WITH hashed AS (SELECT DISTINCT {group_col}, {h} AS h FROM {table}),
totals AS (SELECT {group_col}, COUNT(*) AS n_hashes FROM hashed GROUP BY 1),
surv AS (
  SELECT {group_col}, h,
         row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn
  FROM hashed WHERE h < {thresh}
),
kth AS (
  SELECT {group_col}, MAX(h) AS h_k, COUNT(*) AS sketch_size
  FROM surv WHERE rn <= {k} GROUP BY 1
)
SELECT t.{group_col},
       round(COALESCE(CASE WHEN k.sketch_size >= {k}
                           THEN ({k - 1} * CAST({float(M_SPACE)} AS DOUBLE)) / k.h_k
                           ELSE CAST(t.n_hashes AS DOUBLE) END,
                      CAST(t.n_hashes AS DOUBLE)), 6) AS est_distinct,
       COALESCE(k.sketch_size, 0) AS sketch_size
FROM totals t LEFT JOIN kth k ON t.{group_col} = k.{group_col}
ORDER BY t.{group_col}"""
