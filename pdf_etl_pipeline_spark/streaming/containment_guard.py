"""Streaming containment guard (st19) — dd15's exact set-containment
join as an admission-time excerpt screen.

dd15's exact set-containment join as an ADMISSION GUARD: the held
corpus's representative token sets pin once (write-once, with their
PPJoin prefixes precomputed under the pin's global df order); every
arriving document batch is screened — a doc whose token set is ≥ t
contained in (or ≥ t containing) a pinned doc is an excerpt/expansion
of held content. Candidates stay EXACT through the prefix-filter
pigeonhole: prefix(X) is ANY floor((1−t)·|X|)+1 tokens of X (the df
order only buys pruning power, never correctness), so batch-side
prefixes computed under the PIN's df order (unseen tokens df 0 — the
most selective rank) preserve the no-false-negative bound, and both
containment directions are covered by prefix(batch)×postings(pin) ∪
postings(batch)×prefix(pin). Pin-only screening — replays bit-identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONT_TOKS_SUBDIR = "cont_toks"
CONT_PREFIX_SUBDIR = "cont_prefix"
CONT_DF_SUBDIR = "cont_df"
CONT_REPORTS_SUBDIR = "cont_reports"
CONTAINMENT_GUARD_T = 0.9


def _cont_paths(state_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(state_dir, CONT_TOKS_SUBDIR),
        os.path.join(state_dir, CONT_PREFIX_SUBDIR),
        os.path.join(state_dir, CONT_DF_SUBDIR),
    )


def _prefix_of(hashed: DataFrame, dfreq: DataFrame, threshold: float) -> DataFrame:
    """(doc_id, h) PPJoin prefixes of a (doc_id, h) relation under the df
    order of ``dfreq`` (missing tokens rank first at df 0); prefix length
    floor((1−t)·n)+1 in decimal-exact arithmetic (dd15's float-trap fix)."""
    from pyspark.sql.window import Window as W

    sized = hashed.join(dfreq, "h", "left").withColumn(
        "_df", F.coalesce("_df", F.lit(0))
    ).withColumn("_n", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
    one_minus_t = F.lit(1).cast("decimal(12,6)") - F.lit(threshold).cast("decimal(12,6)")
    plen = F.floor(F.col("_n").cast("decimal(24,6)") * one_minus_t) + 1
    return (
        sized.withColumn(
            "_r", F.row_number().over(W.partitionBy("doc_id").orderBy("_df", "h"))
        )
        .filter(F.col("_r") <= plen)
        .select("doc_id", "h")
    )


def pin_containment_index(held_docs: DataFrame, state_dir: str,
                          threshold: float = CONTAINMENT_GUARD_T) -> bool:
    """Pin the held corpus's representative token sets, df relation and
    prefixes (write-once; existence judged on the TOKS relation, written
    LAST — a torn pin reads as unpinned and the guard refuses)."""
    from pdf_etl_pipeline_spark.llmdata.dedup import hashed_tokens
    from pdf_etl_pipeline_spark.operators import fsutil

    spark = held_docs.sparkSession
    toks_p, prefix_p, df_p = _cont_paths(state_dir)
    if fsutil.list_data_files(toks_p, spark):
        return False
    reps = (
        held_docs.groupBy(F.md5("text").alias("_k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    hashed = (
        hashed_tokens(held_docs.join(reps, "doc_id", "left_semi"))
        .dropDuplicates(["doc_id", "h"])
        .persist()
    )
    try:
        dfreq = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
        dfreq.write.mode("append").parquet(df_p)
        dfreq = spark.read.parquet(df_p)
        _prefix_of(hashed, dfreq, threshold).withColumnRenamed(
            "doc_id", "held_id"
        ).write.mode("append").parquet(prefix_p)
        (
            hashed.groupBy("doc_id")
            .agg(F.collect_set("h").alias("th"))
            .select(F.col("doc_id").alias("held_id"), "th")
            .write.mode("append")
            .parquet(toks_p)
        )
    finally:
        hashed.unpersist()
    return True


def containment_batch_df(
    batch_docs: DataFrame,
    pinned_toks: DataFrame,
    pinned_prefix: DataFrame,
    pinned_df: DataFrame,
    threshold: float = CONTAINMENT_GUARD_T,
) -> DataFrame:
    """One verdict row per incoming doc — (doc_id, n_held_matches,
    max_containment, is_excerpt). Candidates: prefix(batch) × postings(pin)
    ∪ postings(batch) × prefix(pin); exact containment verify on the
    survivors only."""
    from pdf_etl_pipeline_spark.llmdata.dedup import hashed_tokens

    hashed = hashed_tokens(batch_docs).dropDuplicates(["doc_id", "h"])
    my_prefix = _prefix_of(hashed, pinned_df, threshold)
    held_posts = pinned_toks.select(
        "held_id", F.explode("th").alias("h")
    )
    c1 = my_prefix.join(held_posts, "h").select("doc_id", "held_id")
    c2 = hashed.join(pinned_prefix, "h").select("doc_id", "held_id")
    cands = c1.unionByName(c2).dropDuplicates(["doc_id", "held_id"])
    my_toks = hashed.groupBy("doc_id").agg(F.collect_set("h").alias("ta"))
    inter = F.size(F.array_intersect("ta", "th"))
    cont = inter / F.least(F.size("ta"), F.size("th"))
    hits = (
        cands.join(my_toks, "doc_id")
        .join(pinned_toks, "held_id")
        .select("doc_id", "held_id", cont.alias("c_raw"))
        .filter(F.col("c_raw") >= threshold)
        .groupBy("doc_id")
        .agg(F.countDistinct("held_id").alias("nh"), F.max("c_raw").alias("mx"))
    )
    return batch_docs.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("nh", F.lit(0)).cast("long").alias("n_held_matches"),
        F.round("mx", 6).alias("max_containment"),
        (F.coalesce("nh", F.lit(0)) > 0).alias("is_excerpt"),
    )


def guard_containment_batch(
    batch_docs: DataFrame,
    state_dir: str,
    batch_id: int,
    threshold: float = CONTAINMENT_GUARD_T,
) -> DataFrame:
    """Screen one batch against the pinned containment index (raises when
    unpinned — st13's contract; a TORN pin reads as unpinned since
    existence is judged on the last-written TOKS relation)."""
    from pdf_etl_pipeline_spark.operators import fsutil

    spark = batch_docs.sparkSession
    toks_p, prefix_p, df_p = _cont_paths(state_dir)
    if not fsutil.list_data_files(toks_p, spark):
        raise ValueError(
            f"no containment index pinned under {state_dir!r}: call "
            "pin_containment_index first (an unpinned guard would silently "
            "admit everything)"
        )
    return containment_batch_df(
        batch_docs,
        spark.read.parquet(toks_p),
        spark.read.parquet(prefix_p),
        spark.read.parquet(df_p),
        threshold,
    ).localCheckpoint()


def containment_guard_stream(
    docs_stream: DataFrame,
    state_dir: str,
    threshold: float = CONTAINMENT_GUARD_T,
    checkpoint_location: str | None = None,
):
    """Streaming wrapper (foreachBatch, availableNow)."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        rows = guard_containment_batch(batch_df, state_dir, int(epoch_id), threshold)
        rows.withColumn("batch_id", F.lit(int(epoch_id)).cast("long")).write.mode(
            "append"
        ).parquet(os.path.join(state_dir, CONT_REPORTS_SUBDIR))

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(_batch)
        .option(
            "checkpointLocation",
            checkpoint_location or os.path.join(state_dir, "_checkpoint"),
        )
        .trigger(availableNow=True)
    )


def read_containment_reports(spark, state_dir: str) -> DataFrame:
    return spark.read.parquet(
        os.path.join(state_dir, CONT_REPORTS_SUBDIR)
    ).dropDuplicates(["batch_id", "doc_id"])
