"""pdf_etl_pipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference PDF/invoice ETL
pipeline (``maumcl/pdf-etl-pipeline``), re-expressed Spark-first.

Layout
------
- ``functions``  — scalar function layer (SURVEY.md §2.7, F1–F17) as native
  Column expressions (JVM-side, codegen-friendly; no Python UDFs).
- ``sources``    — file corpus scan, PDF/OCR extraction UDFs, sidecar JSON,
  JDBC (SURVEY.md §2.1, S1–S9).
- ``operators``  — relational building blocks: dedup anti-join sink (J1/S7),
  gap sessionization (W2), look-back window (W3), block segmentation (W4),
  heterogeneous union (U1), top-k (W5).
- ``parsers``    — document parser UDTFs (SURVEY.md §2.8, T1–T12) as
  Arrow-batched pandas transforms.
- ``plans``      — end-to-end pipelines: extraction plan (§3.1) and the
  analytics query set (A1–A5).
- ``streaming``  — Structured Streaming jobs (§2.9): windowed aggregates,
  session windows, watermarked dedup, foreachBatch upsert sink.
- ``llmdata``    — 100-TB-scale training-data ops: dedup (exact / MinHash-LSH
  / SimHash / n-gram Jaccard / embedding), similarity search, text analysis,
  multimodal column plumbing.
- ``catalog``    — the query registry consumed by ``__spark_entry__.py``:
  every operator exposed as ``(spark, sf_dir) -> DataFrame`` plus a DuckDB
  oracle SQL string where SQL-expressible.

Design rules (100 TB first)
---------------------------
1. Declarative plans only — ``spark.read`` / DataFrame / SQL; Catalyst picks
   physical strategy. No driver-side loops over data.
2. Scalar logic stays JVM-side as Column expressions; Python appears only in
   Arrow-batched pandas UDFs for genuinely non-relational work (PDF/OCR
   decode, free-text parsers).
3. Every join states its distribution strategy: broadcast for dimension-sized
   sides, shuffle hash/sort-merge with AQE skew handling otherwise.
4. No ``collect()`` in any transform path.
"""

__version__ = "0.1.0"
