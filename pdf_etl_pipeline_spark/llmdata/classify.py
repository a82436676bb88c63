"""Multinomial Naive Bayes, trained AND applied in one declarative plan
(ML2, beyond-reference) — the classic supervised text classifier as
pure DataFrame algebra, no MLlib, no driver-side model object.

Where tx1 is a rule-based language ID (fixed stopword lists), ml2
LEARNS the model from the labeled corpus itself: per-class priors and
Laplace-smoothed token likelihoods are aggregations; "the model" is
just two small relations that stay on the cluster and join back to the
data they score. At 100 TB this is the shape that matters — training is
one map-side-combinable pass (class/token counts), scoring is an
equi-join on the token, and no parameter ever funnels through the
driver.

Plan: tokens explode once; (lang, tok) counts + per-lang totals + vocab
size V are aggregations; each document's tokens join the per-class
likelihood table for ALL classes (a |tokens| × |classes| relation —
linear, classes is a small constant) with a LEFT join so unseen
(class, token) pairs fall back to the smoothed floor ln(1/(total+V));
per-(doc, class) log-scores are decimal-exact sums; argmax is a window
partitioned by doc_id.

Determinism: every ln term rounds to 6 before the exact decimal sum
(libm convention, see text.unigram_logprob); argmax ties break on the
class name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_etl_pipeline_spark.functions.scalars import dec_sum, dec_sum_sql
from pdf_etl_pipeline_spark.llmdata.dedup import tokens_col, tokens_sql


def nb_doc_scores(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """(doc_id, lang, log_score): every document scored under EVERY class
    by the self-trained multinomial NB — the relation classification
    (argmax) and calibration (top-2 margin) both read."""
    toks = docs.select(
        "doc_id",
        F.col(label_col).alias("lang_true"),
        F.explode(tokens_col("text", distinct=False)).alias("tok"),
    )
    class_tok = toks.groupBy("lang_true", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    class_tot = class_tok.groupBy("lang_true").agg(F.sum("cnt").alias("total"))
    vocab = toks.select("tok").distinct().agg(F.count(F.lit(1)).alias("v"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    priors = (
        docs.groupBy(F.col(label_col).alias("lang"))
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(n_docs))
        .select("lang", F.round(F.log(F.col("n") / F.col("n_docs")), 6).alias("log_prior"))
    )
    # per-class likelihood table with the smoothing constants attached
    lik = (
        class_tok.select(F.col("lang_true").alias("lang"), "tok", "cnt")
        .join(class_tot.select(F.col("lang_true").alias("lang"), "total"), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "tok",
            F.round(F.log((F.col("cnt") + 1) / (F.col("total") + F.col("v"))), 6).alias(
                "logp"
            ),
        )
    )
    # floor for unseen (class, token): ln(1 / (total + V))
    floors = (
        class_tot.select(F.col("lang_true").alias("lang"), "total")
        .crossJoin(F.broadcast(vocab))
        .select("lang", F.round(F.log(1 / (F.col("total") + F.col("v"))), 6).alias("floor"))
    )
    # every doc token scored under EVERY class
    classes = priors.select("lang")
    scored_toks = (
        toks.crossJoin(F.broadcast(classes))
        .join(lik, ["lang", "tok"], "left")
        .join(F.broadcast(floors), "lang")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("logp"), F.col("floor")).alias("term"),
        )
    )
    return (
        scored_toks.groupBy("doc_id", "lang")
        .agg(F.round(dec_sum("term"), 6).alias("sum_terms"))
        .join(F.broadcast(priors), "lang")
        .select(
            "doc_id",
            "lang",
            F.round(F.col("sum_terms") + F.col("log_prior"), 6).alias("log_score"),
        )
    )


def naive_bayes_classify(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """(doc_id, lang_true, lang_pred, log_score): self-train multinomial
    NB on the labeled corpus and classify every document with it."""
    doc_scores = nb_doc_scores(docs, label_col)
    w = Window.partitionBy("doc_id").orderBy(F.desc("log_score"), F.asc("lang"))
    best = doc_scores.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        docs.select("doc_id", F.col(label_col).alias("lang_true"))
        .join(best.select("doc_id", F.col("lang").alias("lang_pred"), "log_score"), "doc_id", "left")
        .orderBy("doc_id")
    )


CALIB_BIN_W = 10.0  # log-score units per confidence bin
CALIB_BINS = 10


def nb_margin_calibration(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """Reliability table for the in-plan NB: confidence = the top-2
    LOG-SCORE MARGIN (argmax score − runner-up score — pure arithmetic
    on the already-rounded scores; a softmax posterior would drag a
    cross-engine libm exp into the gate), binned at fixed width so no
    global quantile sort is needed, accuracy per bin beside it. A
    well-behaved classifier shows accuracy rising monotonically with the
    margin — the readout that tells a curation pipeline which
    auto-labels to trust and which band to route to review.

    Scale: nb_doc_scores is ml2's audited plan; top-2 is one
    doc_id-partitioned window over the |docs|×|classes| score relation;
    the report is |bins| rows."""
    doc_scores = nb_doc_scores(docs, label_col)
    w = Window.partitionBy("doc_id").orderBy(F.desc("log_score"), F.asc("lang"))
    ranked = doc_scores.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    top = (
        ranked.groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("lang"))).alias("lang_pred"),
            F.max(F.when(F.col("rk") == 1, F.col("log_score"))).alias("s1"),
            F.max(F.when(F.col("rk") == 2, F.col("log_score"))).alias("s2"),
        )
        # single-class degenerate corpora have no runner-up: margin 0
        .select(
            "doc_id",
            "lang_pred",
            F.round(F.col("s1") - F.coalesce("s2", F.col("s1")), 6).alias("margin"),
        )
    )
    joined = docs.select("doc_id", F.col(label_col).alias("lang_true")).join(top, "doc_id")
    binned = joined.select(
        F.least(
            F.floor(F.col("margin") / CALIB_BIN_W), F.lit(CALIB_BINS - 1)
        ).cast("long").alias("bin"),
        "margin",
        (F.col("lang_pred") == F.col("lang_true")).alias("correct"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.when(F.col("correct"), 1).otherwise(0)) / F.count(F.lit(1)), 6
            ).alias("accuracy"),
            F.round(dec_sum("margin") / F.count(F.lit(1)), 6).alias("mean_margin"),
        )
        .orderBy("bin")
    )


def _nb_scores_ctes(table: str, label_col: str = "lang") -> str:
    """Shared WITH-body through ``doc_scores`` — the SQL twin of
    :func:`nb_doc_scores`, read by both the ml2/ml3 and ml7 oracles."""
    toks = tokens_sql("text", distinct=False)
    return f"""toks AS (
  SELECT doc_id, {label_col} AS lang_true, unnest({toks}) AS tok FROM {table}
),
class_tok AS (SELECT lang_true, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
class_tot AS (SELECT lang_true, SUM(cnt) AS total FROM class_tok GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
n AS (SELECT COUNT(*) AS n_docs FROM {table}),
priors AS (
  SELECT {label_col} AS lang, round(ln(COUNT(*) / n_docs), 6) AS log_prior
  FROM {table}, n GROUP BY 1, n_docs
),
lik AS (
  SELECT ct.lang_true AS lang, tok,
         round(ln((cnt + 1) / (total + v)), 6) AS logp
  FROM class_tok ct JOIN class_tot tt ON ct.lang_true = tt.lang_true, vocab
),
floors AS (
  SELECT lang_true AS lang, round(ln(1 / (total + v)), 6) AS floor
  FROM class_tot, vocab
),
scored_toks AS (
  SELECT t.doc_id AS doc_id, c.lang AS lang,
         COALESCE(l.logp, f.floor) AS term
  FROM toks t
  CROSS JOIN (SELECT lang FROM priors) c
  LEFT JOIN lik l ON l.lang = c.lang AND l.tok = t.tok
  JOIN floors f ON f.lang = c.lang
),
doc_scores AS (
  SELECT s.doc_id AS doc_id, s.lang AS lang,
         round(round({dec_sum_sql('term')}, 6) + ANY_VALUE(p.log_prior), 6) AS log_score
  FROM scored_toks s JOIN priors p ON s.lang = p.lang
  GROUP BY 1, 2
)"""


def naive_bayes_sql(table: str, label_col: str = "lang") -> str:
    """DuckDB oracle for :func:`naive_bayes_classify`."""
    return f"""
WITH {_nb_scores_ctes(table, label_col)},
best AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY log_score DESC, lang) AS rk
  FROM doc_scores
)
SELECT d.doc_id AS doc_id, d.{label_col} AS lang_true,
       b.lang AS lang_pred, b.log_score AS log_score
FROM {table} d
LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rk = 1
ORDER BY d.doc_id"""


def nb_margin_calibration_sql(table: str, label_col: str = "lang") -> str:
    """DuckDB oracle for :func:`nb_margin_calibration` — identical top-2
    margin, fixed-width bins, per-bin accuracy and decimal-exact mean."""
    return f"""
WITH {_nb_scores_ctes(table, label_col)},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY log_score DESC, lang) AS rk
  FROM doc_scores
),
top AS (
  SELECT doc_id,
         MAX(CASE WHEN rk = 1 THEN lang END) AS lang_pred,
         round(MAX(CASE WHEN rk = 1 THEN log_score END)
               - COALESCE(MAX(CASE WHEN rk = 2 THEN log_score END),
                          MAX(CASE WHEN rk = 1 THEN log_score END)), 6) AS margin
  FROM ranked WHERE rk <= 2 GROUP BY 1
),
binned AS (
  SELECT least(CAST(floor(margin / {CALIB_BIN_W!r}) AS BIGINT), {CALIB_BINS - 1}) AS bin,
         margin,
         (t.lang_pred = d.{label_col}) AS correct
  FROM top t JOIN {table} d USING (doc_id)
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(SUM(CASE WHEN correct THEN 1 ELSE 0 END) / COUNT(*), 6) AS accuracy,
       round({dec_sum_sql('margin')} / COUNT(*), 6) AS mean_margin
FROM binned GROUP BY 1 ORDER BY bin"""


def nb_one_vs_rest_auc(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """(lang, n_pos, n_neg, auc): one-vs-rest ROC AUC per class from the
    self-trained NB's per-class log scores — the threshold-free ranking
    metric that complements ml3's confusion matrix (argmax quality) and
    ml7's calibration (confidence quality).

    Rank-based (Mann-Whitney U): AUC = (Σ ranks of positives − n⁺(n⁺+1)/2)
    / (n⁺ n⁻) with AVERAGE ranks for tied scores (the standard tie
    correction — a constant scorer reads exactly 0.5, not an artifact of
    tie order). Ranks and tie counts are windows over the (class, score)
    relation; the rank sum runs through exact decimals (average ranks are
    .5-multiples — scale-1 decimals, no float-order drift). Scale note:
    the per-class rank window sorts each class's scores (classes are
    bounded; each is a range-partitioned sort); w8/pc2's histogram-rank
    sketch is the drop-in when per-class cardinality outgrows a sort.
    """
    from pdf_etl_pipeline_spark.functions.scalars import dec_sum

    scores = nb_doc_scores(docs, label_col)
    truth = docs.select("doc_id", F.col(label_col).alias("lang_true"))
    s = scores.join(truth, "doc_id").select(
        "lang",
        "log_score",
        (F.col("lang") == F.col("lang_true")).alias("is_pos"),
    )
    w_rank = Window.partitionBy("lang").orderBy("log_score")
    w_tie = Window.partitionBy("lang", "log_score")
    r = F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / 2
    ranked = s.select("lang", "is_pos", r.alias("r"))
    agg = ranked.groupBy("lang").agg(
        dec_sum(F.when(F.col("is_pos"), F.col("r")), scale=1).alias("rsum"),
        F.count(F.when(F.col("is_pos"), F.lit(1))).alias("n_pos"),
        F.count(F.when(~F.col("is_pos"), F.lit(1))).alias("n_neg"),
    )
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    auc = (F.col("rsum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2) / (
        F.col("n_pos") * F.col("n_neg")
    )
    return agg.select(
        "lang",
        "n_pos",
        "n_neg",
        F.when(ok, F.round(auc, 6)).alias("auc"),
    ).orderBy("lang")


def nb_auc_sql(table: str, label_col: str = "lang") -> str:
    """DuckDB oracle for :func:`nb_one_vs_rest_auc` — identical tie-average
    rank arithmetic over the shared score CTEs."""
    from pdf_etl_pipeline_spark.functions.scalars import dec_sum_sql

    return f"""
WITH {_nb_scores_ctes(table, label_col)},
truth AS (SELECT doc_id, {label_col} AS lang_true FROM {table}),
s AS (
  SELECT d.lang, d.log_score, d.lang = t.lang_true AS is_pos
  FROM doc_scores d JOIN truth t USING (doc_id)
),
ranked AS (
  SELECT lang, is_pos,
         rank() OVER (PARTITION BY lang ORDER BY log_score)
         + (COUNT(*) OVER (PARTITION BY lang, log_score) - 1) / 2.0 AS r
  FROM s
),
agg AS (
  SELECT lang,
         {dec_sum_sql('CASE WHEN is_pos THEN r END', 1)} AS rsum,
         COUNT(*) FILTER (WHERE is_pos) AS n_pos,
         COUNT(*) FILTER (WHERE NOT is_pos) AS n_neg
  FROM ranked GROUP BY 1
)
SELECT lang, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN round((rsum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6)
       END AS auc
FROM agg ORDER BY lang"""
