"""Incremental near-dup corpus ingest — the streaming twin of the
MinHash-LSH dedup path (north-star op set).

A 100 TB training corpus is not deduped once: it is INGESTED — new document
batches arrive (crawl drops, partner deliveries) and must be admitted only
if they are not near-duplicates of what the corpus already holds. This
module implements the standard online semantics:

1. **Intra-batch canonicalization**: connected components over the batch's
   own LSH pair graph (``label_components``, pointer-doubling, convergence
   observed) — keep one canonical doc (min doc_id) per near-dup component.
2. **Cross-batch admission**: surviving docs are checked against the
   ACCUMULATED index — an on-disk ``(doc_id, band, key)`` banding relation
   plus ``(doc_id, toks)`` verify sets of every previously-admitted doc.
   Candidates come from the same (band, key) equi-join as the batch path;
   exact Jaccard verifies; matched docs are rejected.
3. **Index append**: admitted docs' bands and token-hash sets append to the
   index. The bands relation is written **partitioned by ``band``** so the
   admission scan prunes to exactly the probed band partitions
   (``PartitionFilters`` on the index scan — asserted in tests); the verify
   sets are hash-clustered by ``doc_id`` on write (one file family per hash
   bucket; a metastore-bucketed table at cluster scale) so the survivor
   semi-join touches a clustered, splittable layout rather than whatever
   file boundaries the batch happened to produce.

Online-vs-offline divergence (inherent, documented): admission compares
against ADMITTED docs only. A chain A≈B, B≈C split across batches admits C
when B was rejected (B≈A) but C≉A — offline clustering would drop C via
the B-bridge. Offline keepers are always a SUBSET of the ingest's kept set
when batches arrive in doc_id order (the component minimum is kept at
batch level and can never match an earlier-admitted doc of its own
component — that doc would have a smaller id); pinned by test.

Scale notes: per batch, cost is one md5 pass over the batch + two keyed
equi-joins whose shuffle key is the band key; the index side is
semi-joined down to banding survivors before the verify join, so the
full index's token sets are never shuffled. Nothing is quadratic in the
corpus; state grows by (4 band rows + 1 tok-set row) per admitted doc.

Reference parity note: this generalizes the reference's only incremental
behavior — insert-dedup on re-runs (db_connection.py:41-47, exact-key
anti-join) — from exact keys to near-duplicate content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.llmdata.dedup import (
    BANDS,
    STAR_ROUNDS,
    bands_from_signatures,
    hashed_tokens,
    label_components,
    signatures_from_hashed,
)

BANDS_SUBDIR = "bands"
TOKS_SUBDIR = "toks"
TOK_BUCKETS = 8  # hash-cluster width for the verify-set files


def _index_exists(spark, index_dir: str) -> bool:
    # local-fs check; a cluster deployment would register the index as a
    # catalog table and test its existence there instead
    return os.path.isdir(os.path.join(index_dir, BANDS_SUBDIR))


def admission_matches(
    spark,
    bands: DataFrame,
    toks: DataFrame,
    kept: DataFrame,
    index_dir: str,
    threshold: float = 0.9,
    probe_bands=None,
) -> DataFrame:
    """Docs of ``kept`` that near-dup-match the on-disk index: banding
    candidates from a (band, key) equi-join against the index, verified by
    exact Jaccard on the pruned verify sets.

    ``probe_bands`` (default: all ``BANDS``) is the cheap-admission lever —
    probing a subset of bands trades recall for index I/O, and because the
    index is partitioned by ``band`` the subset becomes a static
    ``PartitionFilters`` entry on the scan: unprobed partitions are never
    read (asserted in tests). With the default all-band probe the filter
    still bounds the scan to the current banding config's partitions, so
    rows from a retired wider config can coexist in the index without ever
    being scanned."""
    probe = list(range(BANDS)) if probe_bands is None else sorted(probe_bands)
    ex_bands = spark.read.parquet(os.path.join(index_dir, BANDS_SUBDIR)).filter(
        F.col("band").isin(probe)
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    xc = (
        bands.filter(F.col("band").isin(probe))
        .join(kept, "doc_id", "left_semi")
        .alias("n")
        .join(
            ex_bands.alias("o"),
            (F.col("n.band") == F.col("o.band")) & (F.col("n.key") == F.col("o.key")),
        )
        .select(F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id"))
        .dropDuplicates(["new_id", "old_id"])
    )
    ex_toks = (
        spark.read.parquet(os.path.join(index_dir, TOKS_SUBDIR))
        # semi-join the index's verify sets down to banding survivors
        # BEFORE the verify join — the full index never shuffles
        .join(xc.select(F.col("old_id").alias("doc_id")).distinct(), "doc_id", "left_semi")
    )
    return (
        xc.join(toks.select(F.col("doc_id").alias("new_id"), F.col("toks").alias("ta")), "new_id")
        .join(
            ex_toks.select(F.col("doc_id").alias("old_id"), F.col("toks").alias("tb")),
            "old_id",
        )
        .filter((inter / union) >= threshold)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )


def ingest_batch(batch_docs: DataFrame, index_dir: str, threshold: float = 0.9) -> DataFrame:
    """Admit one batch against (and into) the near-dup index at
    ``index_dir``; returns the admitted ``(doc_id)`` relation, already
    materialized (the index directory may be rewritten by later batches).
    """
    from pyspark import StorageLevel

    spark = batch_docs.sparkSession
    hashed = hashed_tokens(batch_docs).persist(StorageLevel.MEMORY_AND_DISK)
    bands = bands_from_signatures(signatures_from_hashed(hashed)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    toks = hashed.groupBy("doc_id").agg(F.collect_set("h").alias("toks")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # 1. intra-batch: LSH pairs -> connected components -> component minima
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    pairs = (
        cands.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter((inter / union) >= threshold)
        .select("doc_a", "doc_b")
    )
    kept = (
        label_components(
            batch_docs.select("doc_id"),
            pairs,
            rounds=STAR_ROUNDS,
            doubling=True,
            until_converged=True,
        )
        .filter(F.col("is_keeper"))
        .select("doc_id")
    )

    # 2. cross-batch: banding candidates vs the admitted index, verified
    if _index_exists(spark, index_dir):
        matched = admission_matches(spark, bands, toks, kept, index_dir, threshold)
        kept = kept.join(matched, "doc_id", "left_anti")

    # materialize admissions BEFORE appending to the index this plan reads
    kept = kept.localCheckpoint()

    # 3. append the admitted docs' index rows. toks FIRST: the two writes
    # are not atomic, and a failure in between must leave a safe state. A
    # doc with toks but no bands is merely invisible to future admission
    # joins (its near-dups get re-admitted — an availability error); a doc
    # with bands but no toks would generate banding candidates whose inner
    # join on the missing verify set silently DROPS them, wrongly admitting
    # true near-duplicates (a correctness error). At cluster scale both
    # writes move into one transactional-table commit.
    # toks: hash-clustered by doc_id (repartition = one file family per hash
    # bucket; a metastore-bucketed table at cluster scale would make the
    # survivor semi-join shuffle-free on the index side too).
    toks.join(kept, "doc_id", "left_semi").repartition(TOK_BUCKETS, "doc_id").write.mode(
        "append"
    ).parquet(os.path.join(index_dir, TOKS_SUBDIR))
    # bands: partitioned by band so admission probes prune to the probed
    # band partitions (PartitionFilters on the scan — see admission_matches).
    bands.join(kept, "doc_id", "left_semi").write.mode("append").partitionBy("band").parquet(
        os.path.join(index_dir, BANDS_SUBDIR)
    )
    for cached in (bands, toks, hashed):
        cached.unpersist()
    return kept


def near_dup_ingest_stream(docs_stream: DataFrame, index_dir: str, threshold: float = 0.9):
    """Streaming wrapper: each micro-batch of documents goes through
    ``ingest_batch`` (foreachBatch, availableNow) — same body as batch,
    same index on disk."""

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch(batch_df, index_dir, threshold)

    return (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(_batch)
        .trigger(availableNow=True)
    )
