"""Text-analysis catalog — language-ID, quality stats, token counting,
fingerprinting over ``documents``, each with an arithmetic-identical
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.llmdata import text as TX
from pdf_etl_pipeline_spark.llmdata.dedup import P31, PERM_A, PERM_B
from pdf_etl_pipeline_spark.functions.scalars import portable_hash32_sql
from pdf_etl_pipeline_spark.session import load_table, tune

_TOKS = TX.tokens_sql("text", distinct=False)
_EN = ", ".join(repr(w) for w in TX.LANG_MARKERS["en"])


# --- TX1: language identification -------------------------------------------
@register(
    "tx1_lang_id",
    oracle=f"""
SELECT doc_id, lang AS lang_true, {TX.lang_id_sql('text')} AS lang_pred
FROM documents ORDER BY doc_id""",
    doc="TX1 n-gram/stopword-hit language ID with CJK codepoint fallback",
)
def tx1_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        TX.lang_id("text").alias("lang_pred"),
    ).orderBy("doc_id")


# --- TX2: quality stats ------------------------------------------------------
@register(
    "tx2_text_stats",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars_m,
         len({_TOKS}) AS n_tokens,
         len(list_distinct({_TOKS})) AS n_distinct_tokens,
         list_reduce(list_prepend(0, list_transform({_TOKS}, t -> length(t))), (a, b) -> a + b) AS sum_len,
         length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
         len(list_filter({_TOKS}, t -> t IN ({_EN}))) AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars_m, n_tokens, n_distinct_tokens,
  round(sum_len / nullif(n_tokens, 0), 6) AS avg_word_len,
  round(n_distinct_tokens / nullif(n_tokens, 0), 6) AS type_token_ratio,
  round(stop_hits / nullif(n_tokens, 0), 6) AS stopword_ratio,
  round(punct / nullif(n_chars_m, 0), 6) AS punct_ratio,
  round(digits / nullif(n_chars_m, 0), 6) AS digit_ratio,
  round(
    least(n_tokens / 20.0, 1.0) * 0.3
    + COALESCE(n_distinct_tokens / nullif(n_tokens, 0), 0.0) * 0.3
    + CASE WHEN sum_len / nullif(n_tokens, 0) >= 3
               AND sum_len / nullif(n_tokens, 0) <= 8 THEN 0.2 ELSE 0.0 END
    + COALESCE(stop_hits / nullif(n_tokens, 0), 0.0) * 0.2
    - COALESCE(digits / nullif(n_chars_m, 0), 0.0) * 0.2, 6) AS quality_score
FROM base ORDER BY doc_id""",
    doc="TX2 quality-scoring feature set (length, diversity, stopword/punct/digit ratios, composite score)",
)
def tx2_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.text_stats(load_table(spark, sf_dir, "documents", spread=True))


# --- TX3: token counting ------------------------------------------------------
@register(
    "tx3_token_count",
    oracle=f"""
SELECT doc_id,
       len({_TOKS}) AS ws_tokens,
       len(regexp_extract_all(text, '{TX.BPE_RE}')) AS bpe_tokens
FROM documents ORDER BY doc_id""",
    doc="TX3 whitespace + BPE-ish regex token counts (JVM-side regexp_count)",
)
def tx3_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.token_count_bpe(load_table(spark, sf_dir, "documents"))


# --- TX6: repetition stats (Gopher-style quality filters) ---------------------
@register(
    "tx6_repetition_stats",
    oracle=f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
grams AS (
  SELECT doc_id, unnest(list_concat(
    list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                   i -> '2:' || t[i] || ' ' || t[i + 1]),
    list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                   i -> '3:' || t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
  )) AS gram
  FROM toks
),
counts AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN gram LIKE '2:%' THEN cnt ELSE 0 END) AS BIGINT) AS n_bigrams,
         MAX(CASE WHEN gram LIKE '2:%' THEN cnt ELSE 0 END) AS top_bigram_cnt,
         SUM(CASE WHEN gram NOT LIKE '2:%' THEN cnt ELSE 0 END) AS n_trigrams,
         SUM(CASE WHEN gram NOT LIKE '2:%' AND cnt >= 2 THEN cnt ELSE 0 END) AS dup_trigram_toks
  FROM counts GROUP BY 1
)
SELECT doc_id, n_bigrams,
       round(top_bigram_cnt / nullif(n_bigrams, 0), 6) AS top_bigram_frac,
       round(dup_trigram_toks / nullif(n_trigrams, 0), 6) AS dup_trigram_frac
FROM per_doc ORDER BY doc_id""",
    doc="TX6 Gopher-style repetition filters: top-bigram fraction + fraction of tokens in duplicated trigrams (explode -> keyed double aggregation)",
)
def tx6_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.repetition_stats(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


# --- TX4: fingerprinting ------------------------------------------------------
_norm = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
_h8 = portable_hash32_sql("s") + f" % {P31}"

@register(
    "tx4_fingerprint",
    oracle=f"""
WITH base AS (SELECT doc_id, {_norm} AS norm FROM documents)
SELECT doc_id,
  md5(norm) AS fp_md5,
  list_min(list_transform(
    list_transform(range(1, greatest(length(norm) - 7, 1) + 1), i -> substring(norm, i, 8)),
    s -> ({PERM_A[0]} * ({_h8}) + {PERM_B[0]}) % {P31})) AS fp_minshingle
FROM base ORDER BY doc_id""",
    doc="TX4 document fingerprints: md5 of normalized text + min 8-gram shingle hash (winnowing-style)",
)
def tx4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.fingerprint(load_table(spark, sf_dir, "documents"))


# --- TX7: unigram-LM quality score --------------------------------------------
from pdf_etl_pipeline_spark.functions.scalars import dec_sum_sql  # noqa: E402

@register(
    "tx7_unigram_logprob",
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT SUM(cnt) AS total FROM vocab),
lp AS (SELECT tok, round(ln(cnt / total), 6) AS logp FROM vocab, tot),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         round({dec_sum_sql('logp')} / COUNT(*), 6) AS avg_logprob
  FROM toks JOIN lp USING (tok) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       p.avg_logprob
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id""",
    doc="TX7 unigram-LM quality score (CCNet-style): avg per-token log probability under the corpus's own unigram distribution; 1-row broadcast total, decimal-exact mean",
)
def tx7_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.unigram_logprob(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


# --- TX10: bigram-LM quality score ----------------------------------------------
@register(
    "tx10_bigram_logprob",
    oracle=f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                               i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
  FROM base
),
bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bgf GROUP BY 1, 2),
hc AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY 1),
v AS (SELECT COUNT(DISTINCT tok) AS vs FROM (SELECT unnest(t) AS tok FROM base)),
lp AS (
  SELECT w1, w2, round(ln((c12 + {TX.BIGRAM_K}) / (c1 + {TX.BIGRAM_K} * vs)), 6) AS logp
  FROM bc JOIN hc USING (w1), v
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         round({dec_sum_sql('logp')} / COUNT(*), 6) AS avg_logprob
  FROM bgf JOIN lp USING (w1, w2) GROUP BY 1
)
SELECT d.doc_id AS doc_id,
       CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       p.avg_logprob
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id""",
    doc="TX10 bigram-LM quality score with add-k smoothing (the context-aware tx7 upgrade): adjacent-token pairs come from a per-row array zip (no window shuffle), head counts derive from the bigram counts (one corpus pass), |V| is a 1-row broadcast, decimal-exact per-doc mean",
)
def tx10_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.bigram_logprob(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


# --- TX12: CCNet perplexity buckets ---------------------------------------------
@register(
    "tx12_ppl_buckets",
    oracle=f"""
WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                               i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
  FROM base
),
bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bgf GROUP BY 1, 2),
hc AS (SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY 1),
v AS (SELECT COUNT(DISTINCT tok) AS vs FROM (SELECT unnest(t) AS tok FROM base)),
lp AS (
  SELECT w1, w2, round(ln((c12 + {TX.BIGRAM_K}) / (c1 + {TX.BIGRAM_K} * vs)), 6) AS logp
  FROM bc JOIN hc USING (w1), v
),
scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         -round({dec_sum_sql('logp')} / COUNT(*), 6) AS log_ppl
  FROM bgf JOIN lp USING (w1, w2) GROUP BY 1
),
thr AS (
  SELECT round(quantile_cont(log_ppl, {TX.PPL_CUTS[0]!r}), 6) AS t1,
         round(quantile_cont(log_ppl, {TX.PPL_CUTS[1]!r}), 6) AS t2
  FROM scored
)
SELECT doc_id, n_bigrams, log_ppl,
       CASE WHEN log_ppl <= t1 THEN 'head'
            WHEN log_ppl <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored, thr
ORDER BY doc_id""",
    doc="TX12 CCNet-style perplexity bucketing (Wenzek et al. 2020): tertile-split "
    "the corpus by bigram-LM log-perplexity into head/middle/tail — the curation "
    "decision the LM scores drive. Thresholds are one 1-row exact-percentile "
    "aggregate over the per-doc score relation broadcast back for labeling (no "
    "corpus-wide sort/window); at 100 TB swap in pc2's histogram-sketch quantile, "
    "same plan. Log-space ranking avoids a cross-engine libm exp",
)
def tx12_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.ppl_buckets(load_table(spark, sf_dir, "documents"))


# --- TX8: TF-IDF keyword extraction -------------------------------------------
@register(
    "tx8_tfidf_topk",
    oracle=TX.tfidf_topk_sql("documents", k=3),
    doc="TX8 top-3 TF-IDF keywords per document (smoothed sklearn idf): one token explode feeds both tf and df, N broadcast as 1 row, per-doc window top-k — no global sort",
)
def tx8_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.tfidf_topk(load_table(spark, sf_dir, "documents"), k=3)


# --- TX9: character entropy ---------------------------------------------------
@register(
    "tx9_char_entropy",
    oracle=TX.char_entropy_sql("documents"),
    doc="TX9 per-doc character-level Shannon entropy over [a-z0-9 ] (compression-proxy quality filter): 37-symbol counts keyed by doc_id, one shuffle, decimal-exact p*ln p sum",
)
def tx9_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.char_entropy(load_table(spark, sf_dir, "documents"))


# --- IR1: BM25 ranked retrieval -----------------------------------------------
from pdf_etl_pipeline_spark.llmdata.retrieval import bm25_topk, bm25_topk_sql  # noqa: E402

_IR1_QUERIES = {
    1: ["spark", "shuffle", "partition"],
    2: ["window", "aggregate", "sort"],
    3: ["vector", "index"],
}


@register(
    "ir1_bm25_topk",
    oracle=bm25_topk_sql("documents", _IR1_QUERIES, k=5),
    doc="IR1 BM25 top-5 retrieval for 3 keyword queries (Lucene idf, k1=1.2, b=0.75): corpus explodes once into (doc, tok, tf) postings, the broadcast query table equi-joins the postings — only matching documents are ever scored; per-query window top-k",
)
def ir1_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return bm25_topk(load_table(spark, sf_dir, "documents"), _IR1_QUERIES, k=5)


# --- ML2: multinomial Naive Bayes ---------------------------------------------
from pdf_etl_pipeline_spark.llmdata.classify import naive_bayes_classify, naive_bayes_sql  # noqa: E402


@register(
    "ml2_naive_bayes",
    oracle=naive_bayes_sql("documents"),
    doc="ML2 multinomial Naive Bayes trained AND applied in one plan (no MLlib): class/token counts and Laplace-smoothed log-likelihoods as aggregations, scoring as an equi-join on the token with a smoothed floor for unseen pairs, argmax per doc via window — the model never leaves the cluster",
)
def ml2_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return naive_bayes_classify(load_table(spark, sf_dir, "documents"))


# --- ML3: classifier evaluation (confusion matrix) -----------------------------
@register(
    "ml3_nb_confusion",
    oracle=f"""
WITH preds AS ({naive_bayes_sql("documents")})
SELECT lang_true, lang_pred, COUNT(*) AS n,
       round(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY lang_true), 6) AS row_frac
FROM preds GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="ML3 classifier evaluation: confusion matrix of the in-plan Naive Bayes vs ground-truth labels with per-true-class row fractions — the eval step of the train/apply/evaluate loop, all inside one declarative plan",
)
def ml3_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    tune(spark)
    preds = naive_bayes_classify(load_table(spark, sf_dir, "documents"))
    cm = preds.groupBy("lang_true", "lang_pred").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang_true")
    return (
        cm.withColumn("row_frac", F.round(F.col("n") / F.sum("n").over(w), 6))
        .orderBy("lang_true", "lang_pred")
    )


# --- ML7: classifier calibration by confidence margin ---------------------------
from pdf_etl_pipeline_spark.llmdata.classify import (  # noqa: E402
    nb_margin_calibration,
    nb_margin_calibration_sql,
)


@register(
    "ml7_nb_calibration",
    oracle=nb_margin_calibration_sql("documents"),
    doc="ML7 reliability table for the in-plan NB (the calibration step of "
    "train/apply/evaluate): confidence = top-2 LOG-SCORE margin (pure "
    "arithmetic on the rounded scores — a softmax posterior would drag a "
    "cross-engine libm exp into the gate), fixed-width bins (no global "
    "quantile sort), per-bin accuracy + decimal-exact mean margin — tells a "
    "curation pipeline which auto-labels to trust and which band to route to "
    "review. Top-2 is one doc-partitioned window over ml2's audited score "
    "relation; the report is <=10 rows",
)
def ml7_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return nb_margin_calibration(load_table(spark, sf_dir, "documents"))


# --- TX11: Zipf-law fit of the token-frequency distribution ---------------------
from pdf_etl_pipeline_spark.operators.linreg import linreg, linreg_sql  # noqa: E402

_TX11_TOPK = 1000

_TX11_RANKED = f"""(
WITH tc AS (
  SELECT tok, COUNT(*) AS cnt
  FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY 1
),
top AS (SELECT tok, cnt FROM tc ORDER BY cnt DESC, tok LIMIT {_TX11_TOPK}),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM top
)
SELECT 'corpus' AS g, rank, cnt FROM ranked) zr"""


@register(
    "tx11_zipf_fit",
    oracle=linreg_sql(_TX11_RANKED, "g", "ln(rank)", "ln(cnt)"),
    doc="TX11 Zipf-law fit: OLS of ln(frequency) ~ ln(rank) over the top-1000 "
    "tokens — slope estimates the Zipf exponent (natural corpora sit near "
    "-1; a flat slope flags synthetic/templated text, a cliff flags "
    "boilerplate). The rank window runs over the TakeOrderedAndProject'd "
    "top-k relation (<=1000 rows — bounded single-partition sort by "
    "design, standard practice for Zipf fits), and the fit is ml1's "
    "mergeable sufficient-statistics aggregate — the corpus is scanned "
    "once for token counts, nothing else",
)
def tx11_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(TX.tokens_col("text", distinct=False)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = tc.orderBy(F.desc("cnt"), "tok").limit(_TX11_TOPK)
    # intentional single-partition window: input is post-limit(_TX11_TOPK)
    # — at most a few hundred rows regardless of corpus size
    ranked = top.select(
        "cnt", F.row_number().over(Window.orderBy(F.desc("cnt"), "tok")).alias("rank")
    ).withColumn("g", F.lit("corpus"))
    return linreg(ranked, "g", F.log("rank"), F.log("cnt"))


# --- TX13: n-gram novelty profile ------------------------------------------------
# First-occurrence novelty with doc_id as ingest order: the fraction of a
# document's distinct trigrams whose corpus-wide FIRST occurrence is that
# document. Syndicated/boilerplate-heavy docs score near 0, fresh content
# near 1 — the per-doc novelty signal curation recipes use alongside dd10's
# duplication coverage (novelty looks back over the whole corpus prefix,
# not just at exact 10-gram repeats).
#
# Grams ride dd8's span-hash machinery at n=3 (one md5 per TOKEN, then a
# pure-integer Horner fold per window — identical in both engines, so
# results hash-match exactly; semantics modulo hash collisions like every
# hashed dedup signal here). The naive per-gram string build + md5 was
# measured at 17-22 s at sf0.1; this form lands ~2 s because nothing
# string-shaped survives past the token hash.
from pdf_etl_pipeline_spark.llmdata.dedup import ROLL_B, tokens_sql as _dd_tokens_sql  # noqa: E402

_TX13_N = 3
_TX13_TOKS = _dd_tokens_sql("text", distinct=False)
_TX13_TH = portable_hash32_sql("t") + f" % {P31}"


@register(
    "tx13_ngram_novelty",
    oracle=f"""
WITH tokhash AS (
  SELECT doc_id, list_transform({_TX13_TOKS}, t -> {_TX13_TH}) AS th FROM documents
),
grams AS (
  SELECT doc_id,
         list_reduce(th[i:i+{_TX13_N - 1}], (a, b) -> (a * {ROLL_B} + b) % {P31}) AS gram
  FROM tokhash, unnest(range(1, greatest(len(th) - {_TX13_N - 1}, 0) + 1)) AS u(i)
),
per_doc AS (
  SELECT doc_id, COUNT(DISTINCT gram) AS n_grams FROM grams GROUP BY 1
),
firsts AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY 1
),
novel AS (
  SELECT first_doc AS doc_id, COUNT(*) AS n_novel FROM firsts GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
       round(COALESCE(nv.n_novel, 0) / nullif(COALESCE(p.n_grams, 0), 0), 6) AS novelty_frac
FROM documents d
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
LEFT JOIN novel nv ON d.doc_id = nv.doc_id
ORDER BY d.doc_id""",
    doc="TX13 n-gram novelty profile (first-occurrence fraction, doc_id as "
    "ingest order): per doc, the share of its distinct trigrams whose corpus "
    "MIN(doc_id) is the doc itself — near-0 for syndication/boilerplate, "
    "near-1 for fresh text; the curation-side novelty complement to dd10's "
    "exact-span coverage. Grams ride dd8's span-hash plan at n=3 (one md5 "
    "per TOKEN + integer Horner fold per window — nothing string-shaped "
    "survives past the token hash; measured 22.6 s -> 2.4 s at sf0.1 vs the "
    "naive per-gram string build). n_novel per doc derives from the firsts "
    "relation alone — never a grams-by-firsts join of two corpus-gram-sized "
    "relations. Scale: one corpus-linear explode, two keyed aggregations, "
    "bounded joins — no window, nothing corpus-global",
)
def tx13_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    from pdf_etl_pipeline_spark.llmdata.dedup import span_hashes_df

    docs = load_table(spark, sf_dir, "documents")
    grams = span_hashes_df(docs, _TX13_N).select("doc_id", F.col("h").alias("gram"))
    # materialized (r16): both aggregates below reference grams and
    # Catalyst re-planned the explode+hash pass under each (two documents
    # scans in the before-plan; guide §5 — cache-or-recompute favors one
    # pass for a relation of two longs per gram)
    grams = grams.localCheckpoint()
    per_doc = grams.groupBy("doc_id").agg(
        F.count_distinct("gram").alias("n_grams")
    )
    # n_novel per doc = how many distinct grams this doc is the MIN owner
    # of — derivable from the firsts relation alone (no grams ⋈ firsts
    # join of two corpus-gram-sized relations)
    novel = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(novel, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0))
                / F.nullif(F.coalesce("n_grams", F.lit(0)), F.lit(0)),
                6,
            ).alias("novelty_frac"),
        )
        .orderBy("doc_id")
    )


# --- TX14: Heaps-law vocabulary growth ------------------------------------------
@register(
    "tx14_vocab_growth",
    oracle=f"""
WITH mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
first AS (SELECT tok, MIN(doc_id) AS fd FROM tok GROUP BY 1),
dstats AS (
  SELECT CAST(floor(doc_id * 10 / m) AS BIGINT) AS bucket,
         COUNT(*) AS n_docs, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tok
  FROM documents, mx GROUP BY 1
),
vstats AS (
  SELECT CAST(floor(fd * 10 / m) AS BIGINT) AS bucket, COUNT(*) AS new_vocab
  FROM first, mx GROUP BY 1
)
SELECT d.bucket, d.n_docs,
       CAST(SUM(d.n_docs) OVER (ORDER BY d.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
       CAST(SUM(d.n_tok) OVER (ORDER BY d.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(v.new_vocab, 0)) OVER (ORDER BY d.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
FROM dstats d LEFT JOIN vstats v ON d.bucket = v.bucket
ORDER BY d.bucket""",
    doc="TX14 Heaps-law vocabulary-growth curve: per doc_id decile, cumulative "
    "docs / token occurrences / DISTINCT vocabulary — the corpus-health readout "
    "(dedup failures flatten V against N; templated floods bend it down). "
    "Prefix-distinct WITHOUT prefix rescans: a token is new to a prefix iff its "
    "min doc_id lands there — one keyed min-agg over the exploded tokens, a "
    "10-row roll-up, a running sum over that bounded relation only.",
)
def tx14_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return TX.vocab_growth(load_table(spark, sf_dir, "documents"))


# --- IR2: exact phrase search (positional postings) ------------------------------
from pdf_etl_pipeline_spark.llmdata.retrieval import phrase_topk, phrase_topk_sql  # noqa: E402

_IR2_PHRASES = {
    1: ["table", "hash"],
    2: ["batch", "batch"],  # repeated term — exercises the distinct-offset vote
    3: ["join", "part", "filter"],
}


@register(
    "ir2_phrase_topk",
    oracle=phrase_topk_sql("documents", _IR2_PHRASES, k=5),
    doc="IR2 exact-phrase top-5 via positional postings: each phrase term "
    "votes for anchor p - offset, an anchor collecting all DISTINCT offsets "
    "is one occurrence (repeated terms handled; overlaps count). Scale: one "
    "positional explode (the phrase-index relation, bucket by tok at 100 TB), "
    "broadcast phrase-term equi-join touches only docs sharing a term, one "
    "keyed anchor aggregate, per-query window — no substring scan, no "
    "postings self-join",
)
def ir2_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return phrase_topk(load_table(spark, sf_dir, "documents"), _IR2_PHRASES, k=5)


# --- ML8: one-vs-rest ROC AUC of the in-plan classifier ---------------------------
from pdf_etl_pipeline_spark.llmdata.classify import nb_auc_sql, nb_one_vs_rest_auc  # noqa: E402


@register(
    "ml8_nb_auc",
    oracle=nb_auc_sql("documents"),
    doc="ML8 one-vs-rest ROC AUC per class from the NB log scores — "
    "rank-based (Mann-Whitney U) with AVERAGE ranks on ties (a constant "
    "scorer reads exactly 0.5); rank sums in scale-1 decimals (average ranks "
    "are .5-multiples — no float-order drift). Completes the eval trio: ml3 "
    "confusion (argmax), ml7 calibration (confidence), ml8 ranking. Scale: "
    "per-class rank windows (classes bounded); w8/pc2 histogram ranks are "
    "the drop-in beyond sortable per-class cardinality",
)
def ml8_nb_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return nb_one_vs_rest_auc(load_table(spark, sf_dir, "documents"))
