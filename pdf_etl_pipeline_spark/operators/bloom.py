"""Bloom-filter join pruning — the classic shuffle-avoidance pattern for
joining a huge fact table against a selective dimension at 100 TB scale.

Spark's own runtime row-level filtering (``spark.sql.optimizer.
runtimeFilter.bloomFilter.enabled``) injects exactly this plan shape; the
explicit operator here makes the mechanics observable and hash-checkable:

1. build an m-bit / k-hash Bloom filter of the dim keys — represented as
   the DataFrame of DISTINCT SET BIT POSITIONS (at most ``m`` rows, i.e.
   constant-size and mergeable by union+distinct regardless of dim size);
2. probe every distinct fact key: a key survives iff all k of its bit
   probes hit (each probe row matches at most one distinct bit row, so
   ``COUNT(matched) = k`` is the membership test);
3. exact-verify the survivors with the real semi join — the filter only
   PRUNES (no false negatives, by construction), correctness never
   depends on it.

Hashes are the engine-portable md5-based :func:`portable_hash32` so the
identical bit pattern (and hence the identical false-positive count)
reproduces in the DuckDB oracle.

At 100 TB the win: step 2 replaces a full fact-side shuffle with a
broadcast of ≤ m bit positions; only surviving rows enter the exact
join's exchange. The returned stats row quantifies the pruning (rows
passed, false positives, fill ratio, theoretical FPR) so the trade is
measured, not asserted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.functions.scalars import portable_hash32

BLOOM_M = 32768  # bits — size m at ~10 bits per expected dim key (see below)
BLOOM_K = 4  # hash functions

# Sizing rule (standard Bloom math): FPR = (1 - exp(-k*n/m))^k for n dim
# keys. m = 32768 / k = 4 gives FPR ~ 0.9% at n = 3k keys (sf0.1's dim)
# and ~2e-6 at n = 300 (sf0.01's). At deployment, m scales with the dim —
# ~10 bits/key holds FPR ~ 1%; the measured saturation curve for a
# deliberately undersized filter is in SCALE.md (8192 bits at sf0.1:
# fill 0.77, FPR 0.34 — the filter degrades to a no-op, never to wrong
# results, because exact verification rides behind it).


def _bit(i: int, key: Column, m: int) -> Column:
    return portable_hash32(F.concat(F.lit(f"bf{i}_"), key.cast("string"))) % m


def bloom_bits(dim: DataFrame, dim_key: str, m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """The filter itself: distinct set-bit positions (≤ m rows, mergeable)."""
    probes = F.array(*[_bit(i, F.col(dim_key), m) for i in range(k)])
    return dim.select(F.explode(probes).alias("bit")).distinct()


def bloom_candidates(
    facts: DataFrame, fact_key: str, bits: DataFrame, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Distinct fact keys whose k probe bits are ALL set (column ``key``)."""
    fk = facts.select(F.col(fact_key).alias("key")).filter(F.col("key").isNotNull()).distinct()
    probes = fk.select(
        "key", F.explode(F.array(*[_bit(i, F.col("key"), m) for i in range(k)])).alias("bit")
    )
    return (
        probes.join(F.broadcast(bits), "bit")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == k)
        .select("key")
    )


def bloom_semi_stats(
    facts: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """One-row pruning report: key/row pass-through counts, exact-match
    counts, false positives, filter fill ratio and theoretical FPR.

    Every count is an aggregate of a keyed relation; the single-row
    branches combine via broadcast cross joins (1x1 frames)."""
    bits = bloom_bits(dim, dim_key, m, k)
    cand = bloom_candidates(facts, fact_key, bits, m, k)
    fk = facts.select(F.col(fact_key).alias("key")).filter(F.col("key").isNotNull()).distinct()
    dimk = dim.select(F.col(dim_key).alias("key")).distinct()
    true_keys = fk.join(dimk, "key", "left_semi")

    n_fact_keys = fk.agg(F.count(F.lit(1)).alias("n_fact_keys"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_true = true_keys.agg(F.count(F.lit(1)).alias("n_true_match"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    rows_total = facts.filter(F.col(fact_key).isNotNull()).agg(
        F.count(F.lit(1)).alias("rows_total")
    )
    rows_pass = (
        facts.select(F.col(fact_key).alias("key"))
        .join(cand, "key", "left_semi")
        .agg(F.count(F.lit(1)).alias("rows_pass"))
    )
    out = (
        n_fact_keys.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_true))
        .crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(rows_total))
        .crossJoin(F.broadcast(rows_pass))
    )
    return out.select(
        "n_fact_keys",
        "n_candidates",
        "n_true_match",
        (F.col("n_candidates") - F.col("n_true_match")).alias("false_positives"),
        "rows_total",
        "rows_pass",
        "bits_set",
        F.round(F.col("bits_set").cast("double") / m, 6).alias("fill_ratio"),
        F.round(F.pow(F.col("bits_set").cast("double") / m, float(k)), 6).alias(
            "theoretical_fpr"
        ),
    )


def bloom_semi_stats_sql(
    facts: str, fact_key: str, dim: str, dim_key: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> str:
    """DuckDB oracle computing the identical bit pattern and stats."""
    from pdf_etl_pipeline_spark.functions.scalars import portable_hash32_sql

    def bit(i: int, key_expr: str) -> str:
        return portable_hash32_sql(f"'bf{i}_' || CAST({key_expr} AS VARCHAR)") + f" % {m}"

    dim_bits = ", ".join(bit(i, "key") for i in range(k))
    fact_bits = ", ".join(bit(i, "key") for i in range(k))
    return f"""
WITH dimk AS (SELECT DISTINCT {dim_key} AS key FROM {dim}),
bits AS (SELECT DISTINCT unnest([{dim_bits}]) AS bit FROM dimk),
fk AS (SELECT DISTINCT {fact_key} AS key FROM {facts} WHERE {fact_key} IS NOT NULL),
probes AS (SELECT key, unnest([{fact_bits}]) AS bit FROM fk),
cand AS (
  SELECT p.key FROM probes p JOIN bits USING (bit)
  GROUP BY p.key HAVING COUNT(*) = {k}
),
stats AS (
  SELECT
    (SELECT COUNT(*) FROM fk) AS n_fact_keys,
    (SELECT COUNT(*) FROM cand) AS n_candidates,
    (SELECT COUNT(*) FROM fk WHERE key IN (SELECT key FROM dimk)) AS n_true_match,
    (SELECT COUNT(*) FROM {facts} WHERE {fact_key} IS NOT NULL) AS rows_total,
    (SELECT COUNT(*) FROM {facts} WHERE {fact_key} IN (SELECT key FROM cand)) AS rows_pass,
    (SELECT COUNT(*) FROM bits) AS bits_set
)
SELECT n_fact_keys, n_candidates, n_true_match,
       n_candidates - n_true_match AS false_positives,
       rows_total, rows_pass, bits_set,
       round(CAST(bits_set AS DOUBLE) / {m}, 6) AS fill_ratio,
       round(pow(CAST(bits_set AS DOUBLE) / {m}, {float(k)}), 6) AS theoretical_fpr
FROM stats"""
