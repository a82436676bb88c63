"""Incremental duplicated-span monitor (st10) — the streaming-scale form
of the span-dedup family (dd8/dd10/dd11), mirroring st7's incremental
near-dup ingest.

At 100 TB the corpus arrives in batches, and span dedup must answer at
ADMISSION TIME: "how much of this incoming document duplicates anything
already ingested (or arriving beside it)?" — the gating signal a
training-data pipeline acts on before the document enters the corpus.

Index design: an append-only parquet relation of ``(h, nd)`` — each
batch appends ONE aggregated row per distinct window hash it saw, where
``nd`` is that batch's DISTINCT-document count for the hash. Documents
are ingested exactly once, so doc sets across batches are disjoint and
the corpus-wide distinct-doc count for a hash is the plain SUM of its
per-batch ``nd`` rows — the merge is associative, append-only, and
needs no doc-id storage (the index is bounded by distinct hashes, not
corpus tokens). A window of an incoming doc is DUPLICATED iff
``nd(index) + nd(batch) >= 2`` for its hash.

Admission semantics (same contract as st7): a batch's report is FINAL.
A batch-1 window that only becomes duplicated when batch 2 arrives does
not retro-update batch 1's report — batch 2's own report sees it.
Crash contract matches the ingest index: the append goes through the
normal committer; a crash between report and append costs a re-reported
batch, never a half-written index (re-appending the same batch inflates
``nd`` — callers that replay batches should drop the index dir first,
exactly the st7 checkpoint discipline).

Scale shape per batch: the incoming spans explode corpus-linearly; the
index probe is ONE equi-join on the hash (the index side is pre-
aggregated, one row per (batch, hash)); coverage is dd10's audited
doc_id-partitioned interval merge over duplicated starts only. Nothing
iterative, nothing Python-side, no window over the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.llmdata.dedup import (
    DUP_SPAN_N,
    coverage_from_dup_starts,
    span_hashes_df,
    tokens_col,
)

SPANS_SUBDIR = "span_counts"


def _index_path(index_dir: str) -> str:
    return os.path.join(index_dir, SPANS_SUBDIR)


def monitor_batch(
    docs: DataFrame, index_dir: str, n: int = DUP_SPAN_N
) -> DataFrame:
    """Process one ingest batch: report every incoming doc's duplicated-
    token coverage against (index ∪ this batch), then append the batch's
    per-hash distinct-doc counts to the index. Returns
    (doc_id, n_tokens, n_dup_tokens, dup_token_frac) for the batch,
    localCheckpoint'ed (the report must survive the index append and be
    immune to recomputation against a mutated index)."""
    from pdf_etl_pipeline_spark.operators import fsutil

    spark = docs.sparkSession
    spans = span_hashes_df(docs, n).persist()
    batch_counts = spans.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    path = _index_path(index_dir)
    if fsutil.exists(path, spark):
        idx = (
            spark.read.parquet(path)
            .groupBy("h")
            .agg(F.sum("nd").alias("nd_idx"))
        )
    else:
        idx = None
    total = (
        batch_counts.join(idx, "h", "left").select(
            "h", (F.col("nd") + F.coalesce("nd_idx", F.lit(0))).alias("nd_total")
        )
        if idx is not None
        else batch_counts.select("h", F.col("nd").alias("nd_total"))
    )
    dup_h = total.filter(F.col("nd_total") >= 2).select("h")
    dup_starts = spans.join(dup_h, "h", "left_semi").select("doc_id", "pos")
    covered = coverage_from_dup_starts(dup_starts, n)
    totals = docs.select(
        "doc_id",
        F.size(tokens_col("text", distinct=False)).cast("long").alias("n_tokens"),
    )
    report = (
        totals.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
            F.round(
                F.coalesce("n_dup_tokens", F.lit(0))
                / F.nullif(F.col("n_tokens"), F.lit(0)),
                6,
            ).alias("dup_token_frac"),
        )
        .orderBy("doc_id")
        .localCheckpoint()
    )
    # append AFTER the report is materialized — the report must reflect
    # the pre-batch index state plus this batch only
    batch_counts.write.mode("append").parquet(path)
    spans.unpersist()
    return report


REPORTS_SUBDIR = "span_reports"


def span_monitor_stream(
    docs_stream: DataFrame, index_dir: str, n: int = DUP_SPAN_N
):
    """Streaming wrapper: each micro-batch goes through
    :func:`monitor_batch` (foreachBatch, availableNow) — same body as
    batch, same index on disk — and the admission-time report is
    appended under ``span_reports`` so downstream curation reads one
    growing relation of final verdicts."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        report = monitor_batch(batch_df, index_dir, n)
        report.write.mode("append").parquet(
            os.path.join(index_dir, REPORTS_SUBDIR)
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(_batch)
        .trigger(availableNow=True)
    )


MAX_INDEX_FILES = 16


def compact_span_index(
    spark, index_dir: str, max_files: int = MAX_INDEX_FILES
) -> bool:
    """Compact the append-only span index: one file family lands per
    batch, so a long-running monitor fragments exactly like st7's index
    — but here compaction also SHRINKS THE RELATION, because per-batch
    ``(h, nd)`` rows merge by SUM into one row per hash.

    Same object-store-safe discipline as ``ingest.compact_index``
    (append-then-prune through the Hadoop FS, no renames): read the
    explicit old-file list, append the aggregated replacement through
    the normal committer, delete the old files individually. A crash
    between the two steps leaves the per-batch rows alongside the
    aggregated ones — and because the consumer SUMs ``nd`` per hash,
    that degraded state DOUBLE-COUNTS: re-run compaction (which
    converges) before the next monitor_batch, or replay from a clean
    index. That recovery contract is one step stricter than st7's
    (whose duplicates were admission-neutral) and is the price of an
    index that stores counts instead of rows; a table-format
    transactional commit subsumes it at cluster scale.

    Returns True when a rewrite happened."""
    from pdf_etl_pipeline_spark.operators import fsutil

    path = _index_path(index_dir)
    files = [uri for uri, _ in fsutil.list_data_files(path, spark)]
    if len(files) <= max_files:
        return False
    merged = (
        spark.read.parquet(*files)
        .groupBy("h")
        .agg(F.sum("nd").alias("nd"))
        .coalesce(1)
    )
    merged.write.mode("append").parquet(path)
    for uri in files:
        fsutil.delete(uri, spark=spark)
    return True


def drop_span_index(spark, index_dir: str) -> None:
    from pdf_etl_pipeline_spark.operators import fsutil

    fsutil.delete(_index_path(index_dir), recursive=True, spark=spark)
