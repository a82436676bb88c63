"""Incremental near-dup ingest catalog (st7) — the streaming twin of the
MinHash-LSH dedup path, gate-checked end to end.

The registered query simulates two ingest batches (documents split at the
median doc_id) against a fresh on-disk index, exactly what the
``foreachBatch`` stream does per micro-batch. The DuckDB oracle composes
the SAME fragments the batch path is checked with — per-batch MinHash →
banding → verified pairs → unrolled min-label components (keepers), then
the cross-batch banding join against batch-1 keepers with exact-Jaccard
verification — so the online admission semantics are hash-pinned, not just
rows-counted.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.catalog.dedup_q import _DD3_JACCARD, _label_rounds
from pdf_etl_pipeline_spark.llmdata import dedup as DD
from pdf_etl_pipeline_spark.session import load_table, tune

_TOKSH = DD.token_hashes_sql("text")
_SIG = DD.minhash_signature_sql("text")


def _half_ctes(h: int, pred: str) -> str:
    """One ingest batch's intra-batch pipeline: signatures, banding,
    verified pairs, converged (12-round) min-label components, keepers."""
    r = DD.ROWS_PER_BAND
    return f"""s{h} AS MATERIALIZED (
  SELECT doc_id, {_TOKSH} AS toks, {_SIG} AS sig FROM documents WHERE {pred}
),
b{h} AS MATERIALIZED (
  SELECT doc_id, toks, band,
         array_to_string(sig[band * {r} + 1 : (band + 1) * {r}], '-') AS key
  FROM s{h}, (VALUES (0), (1), (2), (3)) bb(band)
),
c{h} AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         any_value(a.toks) AS ta, any_value(b.toks) AS tb
  FROM b{h} a JOIN b{h} b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
p{h} AS MATERIALIZED (SELECT doc_a, doc_b FROM c{h} WHERE {_DD3_JACCARD} >= 0.9),
e{h} AS MATERIALIZED (
  SELECT doc_a, doc_b FROM p{h}
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b FROM p{h}
),
n{h} AS (SELECT doc_id FROM s{h}),
{_label_rounds(12, nodes=f"n{h}", edges=f"e{h}", prefix=f"k{h}_")},
keep{h} AS MATERIALIZED (SELECT doc_id FROM k{h}_12 WHERE doc_id = cluster_id)"""


_SPLIT = "(SELECT (MAX(doc_id) + 1) // 2 FROM documents)"

_ST7_ORACLE = f"""
WITH {_half_ctes(1, f"doc_id < {_SPLIT}")},
{_half_ctes(2, f"doc_id >= {_SPLIT}")},
xb AS (
  SELECT a.doc_id AS new_id, b.doc_id AS old_id,
         any_value(a.toks) AS ta, any_value(b.toks) AS tb
  FROM b2 a JOIN b1 b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id IN (SELECT doc_id FROM keep2)
    AND b.doc_id IN (SELECT doc_id FROM keep1)
  GROUP BY 1, 2
),
matched AS (SELECT DISTINCT new_id FROM xb WHERE {_DD3_JACCARD} >= 0.9)
SELECT doc_id, CAST(0 AS BIGINT) AS batch_id FROM keep1
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT) AS batch_id FROM keep2
WHERE doc_id NOT IN (SELECT new_id FROM matched)
ORDER BY doc_id"""


@register(
    "st7_neardup_ingest",
    oracle=_ST7_ORACLE,
    doc="ST7 incremental near-dup ingest: per-batch LSH clustering keeps component minima, cross-batch banding join vs the admitted index rejects near-dups of already-admitted docs (streaming foreachBatch twin driven in tests)",
)
def st7_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    from pdf_etl_pipeline_spark.llmdata.ingest import ingest_batch

    docs = load_table(spark, sf_dir, "documents")
    split = (docs.agg(F.max("doc_id")).first()[0] + 1) // 2
    tmp = tempfile.mkdtemp(prefix="st7_index_")
    try:
        k1 = ingest_batch(docs.filter(F.col("doc_id") < split), tmp)
        k2 = ingest_batch(docs.filter(F.col("doc_id") >= split), tmp)
        out = (
            k1.select("doc_id", F.lit(0).cast("long").alias("batch_id"))
            .unionAll(k2.select("doc_id", F.lit(1).cast("long").alias("batch_id")))
            .orderBy("doc_id")
            # materialize before the temp index directory disappears
            .localCheckpoint()
        )
    finally:
        from pdf_etl_pipeline_spark.llmdata.ingest import drop_index
        from pdf_etl_pipeline_spark.operators import fsutil

        drop_index(spark, tmp)
        fsutil.delete(tmp, recursive=True, spark=spark)
    return out
