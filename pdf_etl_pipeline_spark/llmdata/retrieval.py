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
    # token explode runs ONCE; dl/df/avgdl all derive from the postings.
    # MATERIALIZED (r16): postings is referenced three times (dl, df, the
    # contrib join) and Catalyst re-planned the explode+aggregate under
    # each — the before-plan re-scanned documents 3x (guide §5: cut the
    # lineage of a many-referenced intermediate). At cluster scale this is
    # the standard "build the inverted index once" materialization.
    postings = postings.localCheckpoint()
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl")).localCheckpoint()
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


def phrase_topk(docs: DataFrame, phrases: dict[int, list[str]], k: int = 5) -> DataFrame:
    """(query_id, rank, doc_id, n_occurrences, first_pos): top-``k``
    documents per EXACT PHRASE via positional-postings alignment (IR2 —
    the other half of the inverted index: BM25 ranks bags of words, this
    answers "this exact sequence").

    The alignment trick: each phrase term carries its in-phrase offset;
    a posting (doc, tok, p) matching term (tok, off) votes for anchor
    ``p − off``, and an anchor collecting ALL distinct offsets is a full
    occurrence (repeated phrase terms — "batch batch" — are handled by
    the DISTINCT-offset count: a lone token votes for two anchors but
    completes neither). Overlapping occurrences each count.

    Plan shape for 100 TB: the corpus explodes ONCE into positional
    postings (the relation a phrase-capable index materializes, bucketed
    by tok); the tiny phrase-term table broadcasts onto it (equi-join on
    tok — only docs containing SOME phrase term are ever touched); the
    anchor vote is one keyed aggregation; top-k per query is a window
    over the (query, doc) occurrence relation. No substring scan of raw
    text, no self-join of postings.
    """
    spark = docs.sparkSession
    q = spark.createDataFrame(
        [(qid, t, off) for qid, terms in phrases.items() for off, t in enumerate(terms)],
        "query_id long, tok string, off long",
    )
    qlen = spark.createDataFrame(
        [(qid, len(terms)) for qid, terms in phrases.items()], "query_id long, qlen long"
    )
    postings = docs.select(
        "doc_id", F.posexplode(tokens_col("text", distinct=False)).alias("p", "tok")
    )
    hits = (
        postings.join(F.broadcast(q), "tok")
        .groupBy("query_id", "doc_id", (F.col("p") - F.col("off")).alias("anchor"))
        .agg(F.countDistinct("off").alias("nmatch"))
    )
    occ = (
        hits.join(F.broadcast(qlen), "query_id")
        .filter((F.col("nmatch") == F.col("qlen")) & (F.col("anchor") >= 0))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("anchor").alias("first_pos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_occurrences"), "doc_id")
    return (
        occ.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            "n_occurrences",
            F.col("first_pos").cast("long").alias("first_pos"),
        )
        .orderBy("query_id", "rank")
    )


def phrase_topk_sql(table: str, phrases: dict[int, list[str]], k: int = 5) -> str:
    """DuckDB oracle for :func:`phrase_topk` — identical alignment math
    (0-based positions; DuckDB lists are 1-based, hence t[p + 1])."""
    toks = tokens_sql("text", distinct=False)
    qvals = ", ".join(
        f"({qid}, '{t}', {off})"
        for qid, terms in phrases.items()
        for off, t in enumerate(terms)
    )
    lvals = ", ".join(f"({qid}, {len(terms)})" for qid, terms in phrases.items())
    return f"""
WITH q(query_id, tok, off) AS (VALUES {qvals}),
qlen(query_id, qlen) AS (VALUES {lvals}),
pos AS (
  SELECT doc_id, t, unnest(range(0, len(t))) AS p
  FROM (SELECT doc_id, {toks} AS t FROM {table})
),
postings AS (SELECT doc_id, t[p + 1] AS tok, p FROM pos),
hits AS (
  SELECT q.query_id, s.doc_id, s.p - q.off AS anchor, COUNT(DISTINCT q.off) AS nmatch
  FROM postings s JOIN q USING (tok)
  GROUP BY 1, 2, 3
),
occ AS (
  SELECT h.query_id, doc_id, COUNT(*) AS n_occurrences, MIN(anchor) AS first_pos
  FROM hits h JOIN qlen USING (query_id)
  WHERE nmatch = qlen AND anchor >= 0
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY n_occurrences DESC, doc_id) AS rank
  FROM occ
)
SELECT query_id, rank, doc_id, n_occurrences, CAST(first_pos AS BIGINT) AS first_pos
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank"""
