"""Corpus curation — the flagship north-star plan composing the LLM-data
ops into one declarative pipeline:

    documents
      → exact dedup (md5 groupBy, keep min doc_id)
      → near-dup removal (MinHash-LSH pairs, drop the larger doc_id)
      → language filter (stopword-argmax lang ID)
      → quality filter (composite score threshold)
      → token accounting (whitespace tokens per survivor)

Everything is one lazy plan over the documents scan: Catalyst shares the
tokenization subtrees, the only shuffles are the two dedup aggregations and
the LSH band join. At 100 TB each stage is the operator documented in
dedup.py/text.py with its own scale notes; the composition adds nothing
driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.llmdata.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    near_dup_clusters,
)
from pdf_etl_pipeline_spark.llmdata.text import lang_id


def curate_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.9,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Surviving documents with their token counts after dedup + filters.

    ``pairs`` optionally injects a prebuilt near-dup pair relation (the
    LSH index built once per session and shared across queries — the
    scale-correct reuse pattern)."""
    from pdf_etl_pipeline_spark.llmdata.text import with_text_features

    if pairs is None:
        pairs = minhash_lsh_pairs(docs, threshold=near_dup_threshold)
    exact_keep = exact_dedup(docs).select(F.col("keep_doc_id").alias("doc_id"))
    near_losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # lang, quality and token count attach in ONE projection over the scan
    # with ONE shared tokenization (r16) — no text_stats join-back
    feats = with_text_features(docs).select(
        "doc_id", "lang_pred", "n_tokens", "quality_score"
    )
    return (
        feats.join(exact_keep, "doc_id", "left_semi")
        .join(near_losers, "doc_id", "left_anti")
        .filter(F.col("lang_pred") == lang)
        .filter(F.col("quality_score") >= min_quality)
        .select("doc_id", "n_tokens", "quality_score")
        .orderBy("doc_id")
    )


def curate_corpus_clustered(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.9,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Cluster-based curation: keep one canonical document per near-dup
    COMPONENT (transitive closure), then language + quality filters.

    Strictly stronger dedup than ``curate_corpus``'s pair-loser removal:
    A≈B, B≈C drops both B and C even when the A≈C pair was never emitted.
    Exact duplicates are subsumed — identical texts share every LSH band, so
    an exact-dup group is always one near-dup component and only its min
    doc_id survives; no separate md5 pass needed.
    """
    from pdf_etl_pipeline_spark.llmdata.text import with_text_features

    keepers = (
        near_dup_clusters(docs, threshold=near_dup_threshold, pairs=pairs)
        .filter(F.col("is_keeper"))
        .select("doc_id")
    )
    feats = with_text_features(docs).select(
        "doc_id", "lang_pred", "n_tokens", "quality_score"
    )
    return (
        feats.join(keepers, "doc_id", "left_semi")
        .filter(F.col("lang_pred") == lang)
        .filter(F.col("quality_score") >= min_quality)
        .select("doc_id", "n_tokens", "quality_score")
    )


# Repetition cutoffs (corpus-tuned; Gopher uses 0.2 / 0.6-class bounds on
# web text — the synthetic corpus is shorter, so the knee sits lower)
MAX_TOP_BIGRAM_FRAC = 0.12
MAX_DUP_TRIGRAM_FRAC = 0.5


def curate_corpus_full(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.9,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """The complete curation recipe — every filter family composed into one
    lazy plan (the FineWeb/Gopher-style delivery path):

        cluster dedup (one canonical doc per near-dup component)
          → language filter → quality filter
          → repetition filter (top-bigram / dup-trigram cutoffs)
          → benchmark exclusion + decontamination (shared 5-grams)
          → token accounting

    Each stage is the already-oracle-checked operator; composition adds two
    left-anti joins on doc_id (broadcast-sized exclusion lists after their
    own filters) and nothing driver-side.
    """
    from pdf_etl_pipeline_spark.llmdata.corpus import BENCH_MOD, decontaminate
    from pdf_etl_pipeline_spark.llmdata.text import repetition_stats

    cur = curate_corpus_clustered(docs, lang, min_quality, near_dup_threshold, pairs=pairs)
    contaminated = decontaminate(docs).select("doc_id")
    repetitive = (
        repetition_stats(docs)
        .filter(
            (F.col("top_bigram_frac") > MAX_TOP_BIGRAM_FRAC)
            | (F.col("dup_trigram_frac") > MAX_DUP_TRIGRAM_FRAC)
        )
        .select("doc_id")
    )
    return (
        cur.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
        .join(repetitive, "doc_id", "left_anti")
    )


SOURCE_CAP = 10


def source_cap(docs: DataFrame, cap: int = SOURCE_CAP) -> DataFrame:
    """Per-source frequency cap: keep at most ``cap`` documents from each
    source, preferring higher quality — the RefinedWeb/C4-style guard
    against any single domain dominating the training mix (a handful of
    crawler-friendly sites can contribute millions of near-identical
    pages; capping per registered domain is the standard fix).

    Shape for scale: quality scoring is pure codegen attached in the SAME
    projection as the scan (``text.quality_score_col`` — no join back to
    text_stats, no second corpus scan); the cap is ONE window partitioned
    by ``source`` — a keyed shuffle, never a global sort. A pathologically
    hot source makes this aggregation-skew; the row_number frame is
    rank-only (no payload carried), so even a 100M-page domain is a
    single fat partition of (doc_id, score) pairs — and the W5-style
    pre-aggregation or salting levers apply unchanged if that is too fat
    for one task.
    """
    from pyspark.sql import Window

    from pdf_etl_pipeline_spark.llmdata.text import quality_score_col

    scored = docs.select(
        "doc_id", "source", quality_score_col("text").alias("quality_score")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cap)
        .select("source", "rank", "doc_id", "quality_score")
        .orderBy("source", "rank")
    )


TOKEN_BUDGET = 800


def token_budget_mix(docs: DataFrame, budget: int = TOKEN_BUDGET) -> DataFrame:
    """Token-quota corpus mixing: admit each source's documents in quality
    order until the source's TOKEN budget is exhausted — how pretraining
    mixes are actually specified ("50 B tokens of web, 5 B of code"),
    which a doc-count cap (cc5) cannot express because document lengths
    vary by orders of magnitude.

    Greedy prefix rule: a doc is admitted iff the tokens admitted BEFORE
    it fit the budget (start_offset < budget, the pk1 packing
    convention), so each source overflows by at most its boundary doc.

    Shape for scale: token counting is codegen over the scan; ranking and
    the running total are ONE window each, both partitioned by source —
    keyed shuffles, no global sort, no driver state. Same skew posture as
    cc5: a pathologically hot source is one fat (id, score, count)
    partition, and the budget means the window can early-out of it after
    ~budget tokens when combined with a coarse pre-filter at read time.
    """
    from pyspark.sql import Window

    from pdf_etl_pipeline_spark.llmdata.text import with_text_features

    # quality and token count attach in the SAME projection as the scan —
    # no join back to text_stats (see source_cap); one shared tokenization
    scored = with_text_features(docs).select(
        "doc_id", "source", "quality_score", "n_tokens"
    )
    order = [F.desc("quality_score"), F.asc("doc_id")]
    w_rank = Window.partitionBy("source").orderBy(*order)
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    ranked = scored.select(
        "source",
        "doc_id",
        "n_tokens",
        F.row_number().over(w_rank).alias("rank"),
        (F.sum("n_tokens").over(w_cum) - F.col("n_tokens")).alias("start_offset"),
    )
    return (
        ranked.filter(F.col("start_offset") < budget)
        .select("source", "rank", "doc_id", "n_tokens", "start_offset")
        .orderBy("source", "rank")
    )
