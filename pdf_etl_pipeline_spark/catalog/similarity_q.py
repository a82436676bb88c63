"""Similarity-search catalog — brute-force exact top-k (the correctness
baseline) and hyperplane-LSH bucketed ANN (the scale path), both
oracle-checked with identical fold arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.llmdata import similarity as SS
from pdf_etl_pipeline_spark.llmdata.dedup import cosine_sql
from pdf_etl_pipeline_spark.session import load_table, tune

_QUERY_IDS = [0, 1, 2, 3, 4]
_COS = cosine_sql("qv", "cv")
_BUCKET = SS.bucket_key_sql("embedding")


@register(
    "ss1_cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, cand_id, {_COS} AS cos
  FROM q JOIN c ON query_id <> cand_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    doc="SS1 exact top-5 cosine neighbors for 5 query vectors (broadcast query side)",
)
def ss1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.cosine_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5)


@register(
    "ss2_hyperplane_lsh_topk",
    oracle=f"""
WITH wb AS (
  SELECT vec_id, embedding, {_BUCKET} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM wb
      WHERE vec_id IN ({', '.join(map(str, _QUERY_IDS))})),
c AS (SELECT vec_id AS cand_id, embedding AS cv, bucket FROM wb),
scored AS (
  SELECT query_id, cand_id, {_COS} AS cos
  FROM q JOIN c USING (bucket) WHERE query_id <> cand_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, round(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",
    doc="SS2 hyperplane-LSH bucketed ANN: 8 deterministic planes -> sign bucket -> in-bucket exact re-rank",
)
def ss2_hyperplane_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return SS.hyperplane_lsh_topk(load_table(spark, sf_dir, "embeddings"), _QUERY_IDS, k=5)
