"""Incremental duplicated-span monitor (st10) — the streaming-scale form
of the span-dedup family (dd8/dd10/dd11), mirroring st7's incremental
near-dup ingest.

At 100 TB the corpus arrives in batches, and span dedup must answer at
ADMISSION TIME: "how much of this incoming document duplicates anything
already ingested (or arriving beside it)?" — the gating signal a
training-data pipeline acts on before the document enters the corpus.

Index design: an append-only parquet relation of ``(h, nd, batch_id)``
partitioned by ``bucket`` (a fixed hash-range of ``h``) — each batch
appends ONE aggregated row per distinct window hash it saw, where ``nd``
is that batch's DISTINCT-document count for the hash and ``batch_id``
tags the row's provenance. Documents are ingested exactly once, so doc
sets across batches are disjoint and the corpus-wide distinct-doc count
for a hash is the plain SUM of its per-batch ``nd`` rows — the merge is
associative, append-only, and needs no doc-id storage (the index is
bounded by per-batch distinct hashes, not corpus tokens). A window of an
incoming doc is DUPLICATED iff ``nd(index) + nd(batch) >= 2`` for its
hash.

Admission semantics (same contract as st7): a batch's report is FINAL.
A batch-1 window that only becomes duplicated when batch 2 arrives does
not retro-update batch 1's report — batch 2's own report sees it.

Idempotence / crash contract (matches st7's: duplicate rows are
admission-NEUTRAL, never double-counted):

- every index read first ``dropDuplicates`` on ``(batch_id, h)`` — a
  row appended twice (micro-batch replay after a crash, a compaction
  rewrite that crashed between append and prune) collapses back to one;
- the admission probe EXCLUDES rows carrying the incoming batch's own
  ``batch_id`` — a replayed batch whose crashed first attempt already
  appended its counts still reports against the exact pre-batch index
  state, so the recomputed report is bit-identical;
- ``batch_id`` must be deterministic under replay: the streaming
  wrapper uses the checkpointed ``epoch_id`` (checkpointLocation is
  plumbed by default), direct callers either pass one or get a
  content-derived id (order-independent hash of the batch's doc_ids).
  One index must be fed through ONE of those disciplines, not both —
  the two id spaces are not collision-protected against each other.

Scale shape per batch: the incoming spans explode corpus-linearly; the
index probe is ONE equi-join on the hash (the index side is pre-
aggregated, one row per (batch, hash)); coverage is dd10's audited
doc_id-partitioned interval merge over duplicated starts only. Nothing
iterative, nothing Python-side, no window over the corpus, no global
sort (reports are unordered; sort at read time if you need order).
"""

from __future__ import annotations

import math
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

# Fixed hash-range partitioning of the index by bucket = pmod(h, SPAN_BUCKETS):
# compaction scopes to one bucket at a time (cost bounded by that bucket's
# fragmentation, never the index size). Fixed at index creation — changing it
# on a live index would split a hash's rows across bucket values.
SPAN_BUCKETS = 8


def _index_path(index_dir: str) -> str:
    return os.path.join(index_dir, SPANS_SUBDIR)


def _bucket_col():
    return F.pmod(F.col("h"), F.lit(SPAN_BUCKETS)).alias("bucket")


def _derived_batch_id(docs: DataFrame) -> int:
    """Content-derived batch id: order-independent sum of per-doc hashes —
    deterministic under replay of the same doc set, collision-improbable
    across distinct batches. Hashes are folded to 40 bits before the sum
    so the ANSI-mode long add can't overflow below ~2^23 docs per batch."""
    row = docs.agg(
        F.sum(F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(1 << 40))).alias("b")
    ).first()
    return int(row.b or 0)


def read_index_counts(spark, index_dir: str, exclude_batch_id: int | None = None) -> DataFrame:
    """(h, nd_idx): per-hash distinct-doc totals over the live index.
    Replay/compaction duplicates collapse via the (batch_id, h) dedup;
    ``exclude_batch_id`` drops a batch's own rows so its replayed probe
    sees the exact pre-batch state."""
    idx = spark.read.parquet(_index_path(index_dir))
    if exclude_batch_id is not None:
        idx = idx.filter(F.col("batch_id") != F.lit(exclude_batch_id))
    return (
        idx.dropDuplicates(["batch_id", "h"])
        .groupBy("h")
        .agg(F.sum("nd").alias("nd_idx"))
    )


def batch_report_df(
    docs: DataFrame,
    index_dir: str,
    n: int = DUP_SPAN_N,
    batch_id: int | None = None,
    spans: DataFrame | None = None,
) -> DataFrame:
    """The LAZY admission report for one batch against (index ∪ batch):
    (doc_id, n_tokens, n_dup_tokens, dup_token_frac), unordered. This is
    the plan the foreachBatch body runs — factored out so the physical-
    plan audit can assert its scale contract (one equi-join probe against
    the pre-aggregated index, doc_id-partitioned coverage windows only,
    no global sort) without triggering the side-effecting append."""
    from pdf_etl_pipeline_spark.operators import fsutil

    spark = docs.sparkSession
    if spans is None:
        spans = span_hashes_df(docs, n)
    batch_counts = spans.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    idx = (
        read_index_counts(spark, index_dir, exclude_batch_id=batch_id)
        if fsutil.exists(_index_path(index_dir), spark)
        else None
    )
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
    return totals.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
        F.round(
            F.coalesce("n_dup_tokens", F.lit(0))
            / F.nullif(F.col("n_tokens"), F.lit(0)),
            6,
        ).alias("dup_token_frac"),
    )


def monitor_batch(
    docs: DataFrame,
    index_dir: str,
    n: int = DUP_SPAN_N,
    batch_id: int | None = None,
) -> DataFrame:
    """Process one ingest batch: report every incoming doc's duplicated-
    token coverage against (index ∪ this batch), then append the batch's
    per-hash distinct-doc counts to the index tagged ``batch_id``.
    Returns (doc_id, n_tokens, n_dup_tokens, dup_token_frac) for the
    batch, localCheckpoint'ed (the report must survive the index append
    and be immune to recomputation against a mutated index). Unordered —
    sort at read time."""
    if batch_id is None:
        batch_id = _derived_batch_id(docs)
    spans = span_hashes_df(docs, n).persist()
    report = batch_report_df(
        docs, index_dir, n, batch_id=batch_id, spans=spans
    ).localCheckpoint()
    # append AFTER the report is materialized — the report must reflect
    # the pre-batch index state plus this batch only. One file per
    # non-empty bucket per batch (the repartition clusters bucket values).
    (
        spans.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .select("h", "nd", F.lit(batch_id).cast("long").alias("batch_id"), _bucket_col())
        .repartition(SPAN_BUCKETS, "bucket")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(_index_path(index_dir))
    )
    spans.unpersist()
    return report


REPORTS_SUBDIR = "span_reports"


def span_monitor_stream(
    docs_stream: DataFrame,
    index_dir: str,
    n: int = DUP_SPAN_N,
    checkpoint_location: str | None = None,
):
    """Streaming wrapper: each micro-batch goes through
    :func:`monitor_batch` (foreachBatch, availableNow) with the
    checkpointed ``epoch_id`` as its batch id — same body as batch, same
    index on disk — and the admission-time report (tagged ``batch_id``)
    is appended under ``span_reports`` so downstream curation reads one
    growing relation of final verdicts (via :func:`read_span_reports`,
    which collapses recovery replays).

    ``checkpointLocation`` defaults to ``<index_dir>/_checkpoint`` so a
    restarted stream resumes its offsets and epoch numbering instead of
    replaying the corpus against a non-empty index under fresh epoch ids.
    """

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        report = monitor_batch(batch_df, index_dir, n, batch_id=int(epoch_id))
        report.withColumn("batch_id", F.lit(int(epoch_id)).cast("long")).write.mode(
            "append"
        ).parquet(os.path.join(index_dir, REPORTS_SUBDIR))

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(_batch)
        .option(
            "checkpointLocation",
            checkpoint_location or os.path.join(index_dir, "_checkpoint"),
        )
        .trigger(availableNow=True)
    )


def read_span_reports(spark, index_dir: str) -> DataFrame:
    """The final admission verdicts, one row per document: a recovery
    replay re-appends a batch's reports verbatim (same batch_id, same
    values — the probe excluded the batch's own index rows), so the
    (batch_id, doc_id) dedup is exact, not lossy."""
    return spark.read.parquet(os.path.join(index_dir, REPORTS_SUBDIR)).dropDuplicates(
        ["batch_id", "doc_id"]
    )


MAX_INDEX_FILES_PER_BUCKET = 4


def compact_span_index(
    spark,
    index_dir: str,
    max_files: int = MAX_INDEX_FILES_PER_BUCKET,
    target_bytes: int = 128 << 20,
) -> list[str]:
    """Steady-state index maintenance: every batch appends one file per
    non-empty bucket, so a long-running monitor fragments exactly like
    st7's band partitions — and the fix is the same shape
    (``ingest.compact_index``): rewrite ONLY the over-threshold buckets,
    cost bounded by fragmentation, never by index size.

    Per over-threshold bucket: read the EXPLICIT old-file list, collapse
    any (batch_id, h) duplicates a previous crash or replay left behind,
    append the rows back as ``ceil(bucket_bytes / target_bytes)`` files
    through the normal committer, then delete the old files individually
    (append-then-prune through the Hadoop FS, no renames — object-store
    safe). This is PHYSICAL maintenance: rows keep their ``batch_id``
    provenance, so a crash between append and prune leaves duplicate
    (batch_id, h) rows that every reader already collapses —
    admission-NEUTRAL, the st7 contract. (Merging counts across batch ids
    would shrink the relation but forfeits that neutrality; that verb
    belongs to a table format's transactional commit at cluster scale.)

    Returns the list of compacted bucket partition names.
    """
    from pdf_etl_pipeline_spark.operators import fsutil

    path = _index_path(index_dir)
    compacted: list[str] = []
    for pdir in fsutil.list_subdirs(path, spark):
        base = pdir.rstrip("/").rsplit("/", 1)[-1]
        if not base.startswith("bucket="):
            continue
        files = fsutil.list_data_files(pdir, spark)
        if len(files) <= max_files:
            continue
        uris = [u for u, _ in files]
        n_out = max(1, math.ceil(sum(length for _, length in files) / target_bytes))
        merged = (
            spark.read.parquet(*uris)
            .dropDuplicates(["batch_id", "h"])
            .repartition(n_out)
        )
        # write straight into the bucket's partition directory (the
        # partition column lives in the dir name, not the files)
        merged.write.mode("append").parquet(pdir)
        for uri in uris:
            fsutil.delete(uri, spark=spark)
        compacted.append(base)
    return compacted


def drop_span_index(spark, index_dir: str) -> None:
    from pdf_etl_pipeline_spark.operators import fsutil

    fsutil.delete(_index_path(index_dir), recursive=True, spark=spark)
