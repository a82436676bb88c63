"""Ranked keyword retrieval over the corpus — BM25 as a broadcast
postings join (IR1, beyond-reference).

This is the query side of the inverted index: where tf-idf
(:func:`pdf_etl_pipeline_spark.llmdata.text.tfidf_topk`) extracts
keywords per document, BM25 answers "which documents match THIS query"
— the op a retrieval / RAG-data pipeline runs millions of times.

Plan shape for 100 TB: the corpus explodes ONCE into (doc_id, tok, tf)
postings — the inverted index relation; at cluster scale this is the
thing you materialize bucketed by ``tok`` (operators/bucketed.py) so a
query never rescans raw text. The query table is tiny and broadcasts to
the postings (equi-join on ``tok`` = postings-list lookup); per-(query,
doc) accumulation is a keyed aggregation of the matched postings only —
documents sharing no term with a query never appear anywhere. Top-k per
query is a window over the scored relation.

Uses the Lucene/ATIRE BM25 variant: idf = ln(1 + (N − df + 0.5)/(df +
0.5)) (always positive), k1 = 1.2, b = 0.75. Determinism: idf and each
term contribution are rounded to 6 (libm ln convention), the per-doc
sum runs through exact decimals, ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_etl_pipeline_spark.functions.scalars import dec_sum, dec_sum_sql
from pdf_etl_pipeline_spark.llmdata.dedup import tokens_col, tokens_sql

K1 = 1.2
B = 0.75


def bm25_topk(docs: DataFrame, queries: dict[int, list[str]], k: int = 5) -> DataFrame:
    """(query_id, rank, doc_id, score): top-``k`` BM25 documents per query.

    ``queries`` maps query_id -> term list (already-normalized tokens).
    """
    spark = docs.sparkSession
    q = spark.createDataFrame(
        [(qid, t) for qid, terms in queries.items() for t in set(terms)],
        "query_id long, tok string",
    )
    toks = docs.select("doc_id", F.explode(tokens_col("text", distinct=False)).alias("tok"))
    postings = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # doc length from the postings themselves (sum of tf) — the expensive
    # token explode runs ONCE; dl/df/avgdl all derive from the postings
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
    )
    avgdl = dl.agg((F.sum("dl") / F.count(F.lit(1))).alias("avgdl"))
    df_ = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(F.broadcast(corpus)).select(
        "tok",
        F.round(
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
            6,
        ).alias("idf"),
    )
    contrib = (
        postings.join(F.broadcast(q), "tok")
        .join(idf, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("idf")
                * (F.col("tf") * (K1 + 1))
                / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
                6,
            ).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(dec_sum("c"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def bm25_topk_sql(table: str, queries: dict[int, list[str]], k: int = 5) -> str:
    """DuckDB oracle for :func:`bm25_topk` — identical arithmetic."""
    toks = tokens_sql("text", distinct=False)
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in queries.items() for t in sorted(set(terms))
    )
    return f"""
WITH q(query_id, tok) AS (VALUES {qvals}),
toks AS (SELECT doc_id, unnest({toks}) AS tok FROM {table}),
postings AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
corpus AS (SELECT COUNT(*) AS n_docs FROM {table}),
avgdl AS (SELECT SUM(dl) / COUNT(*) AS avgdl FROM dl),
df AS (SELECT tok, COUNT(*) AS df FROM postings GROUP BY 1),
idf AS (
  SELECT tok, round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS idf
  FROM df, corpus
),
contrib AS (
  -- constants go through CAST(... AS DOUBLE): DuckDB types bare literals
  -- as DECIMAL and computes tf * 2.2 EXACTLY, while Spark computes it in
  -- doubles — a last-ulp divergence that can flip the rounded 6th decimal
  SELECT query_id, p.doc_id AS doc_id,
         round(idf * (tf * CAST({K1 + 1} AS DOUBLE))
               / (tf + CAST({K1} AS DOUBLE) * (1 - {B} + {B} * dl / avgdl)), 6) AS c
  FROM postings p
  JOIN q ON p.tok = q.tok
  JOIN idf ON p.tok = idf.tok
  JOIN dl ON p.doc_id = dl.doc_id
  CROSS JOIN avgdl
),
scored AS (
  SELECT query_id, doc_id, round({dec_sum_sql('c')}, 6) AS score
  FROM contrib GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank"""


# --- SS9: hybrid retrieval via reciprocal-rank fusion -------------------------
RRF_K = 60


def rrf_fuse(rankings: list[DataFrame], k: int = 10, rrf_k: int = RRF_K) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists:
    score(q, d) = Σ_r 1/(rrf_k + rank_r(q, d)) over the rankings that
    retrieved d — THE standard hybrid-retrieval combiner (lexical BM25 +
    dense vectors) because it needs no score calibration, only ranks.

    Each input is (query_id, doc_id, rank). Shape for scale: the inputs
    are already top-N per query (tiny relative to the corpus), so fusion
    is a union + one keyed aggregation + a per-query window — cost is in
    the upstream retrievers, never here. Determinism: 1/(60+rank) is the
    same double in every engine, each term rounds to 9 and the per-doc
    sum runs through exact decimals (dec_sum) — a plain double sum would
    become partition-order-dependent the moment a third ranking is fused.
    """
    tagged = [r.select("query_id", "doc_id", "rank") for r in rankings]
    pooled = tagged[0]
    for t in tagged[1:]:
        pooled = pooled.unionAll(t)
    scored = pooled.groupBy("query_id", "doc_id").agg(
        F.round(
            dec_sum(F.round(1.0 / (F.lit(rrf_k) + F.col("rank")), 9), scale=9), 9
        ).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf_score", "n_lists")
        .orderBy("query_id", "rank")
    )


def rrf_fuse_sql(ranking_sqls: list[str], k: int = 10, rrf_k: int = RRF_K) -> str:
    """DuckDB oracle for :func:`rrf_fuse`: each input SQL must yield
    (query_id, doc_id, rank)."""
    pooled = "\nUNION ALL\n".join(f"SELECT query_id, doc_id, rank FROM ({s})" for s in ranking_sqls)
    return f"""
WITH pooled AS (
{pooled}
),
scored AS (
  SELECT query_id, doc_id,
         round({dec_sum_sql(f'round(1.0 / ({rrf_k} + rank), 9)', 9)}, 9) AS rrf_score,
         COUNT(*) AS n_lists
  FROM pooled GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, rrf_score, n_lists
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank"""
