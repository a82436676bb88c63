"""Text analysis for training-data pipelines (north-star op set):
language-ID, quality scoring, token counting, document fingerprinting.

All native Column expressions — these run inside whole-stage codegen over
the document scan, so at 100 TB they add no shuffle and no Python workers;
cost is one pass over the text bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_etl_pipeline_spark.functions.scalars import (
    dec_sum_sql,
    portable_hash32,
    portable_hash32_sql,
)
from pdf_etl_pipeline_spark.llmdata.dedup import P31, PERM_A, PERM_B, tokens_col, tokens_sql

# Stopword marker lists per language (tiny on purpose — the heuristic is
# hit-count argmax, deterministic and portable).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "es": ["el", "los", "las", "y", "de", "que", "una", "es"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
}

# BPE-ish pretokenizer: letter runs | single digits | non-space symbols
BPE_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"

LANG_ORDER = ["en", "fr", "es", "de", "zh"]

# Native per-row let-binding (see functions.scalars.let_col): evaluates the
# token array ONCE per row instead of once per reference — the pre-r16
# lang_id expanded to ~35 evaluations of split(lower(text)) per row
# (each score referenced by the when-chain AND inside ``greatest``).
# Verified by plan inspection: one ``split(`` in the plan vs 35.
from pdf_etl_pipeline_spark.functions.scalars import let_col as _let  # noqa: E402


def _hit(words: list[str]):
    return lambda t: t.isin(*words)


def _lang_scores_struct(ts: Column, c: Column) -> Column:
    """Marker-hit scores per language as ONE struct over the bound token
    array ``ts`` (zh scored by CJK codepoint count over the raw text)."""
    fields = [
        F.size(F.filter(ts, _hit(words))).alias(lang)
        for lang, words in LANG_MARKERS.items()
    ]
    # CJK detection by codepoint range (zh has no space-delimited stopwords)
    fields.append(F.length(F.regexp_replace(c, r"[^一-鿿]", "")).alias("zh"))
    return F.struct(*fields)


def _lang_pick(sc: Column) -> Column:
    """Argmax over a bound score struct with deterministic priority order."""
    best = F.greatest(*[sc[lang] for lang in LANG_ORDER])
    out = F.lit("unknown")
    # reversed so earlier languages win ties (first-match priority en>fr>es>de>zh)
    for lang in reversed(LANG_ORDER):
        out = F.when((sc[lang] > 0) & (sc[lang] == best), F.lit(lang)).otherwise(out)
    return out


def lang_from_tokens(ts: Column, c: Column) -> Column:
    """Language ID over an already-bound token array (single score pass)."""
    return _let(_lang_scores_struct(ts, c), _lang_pick)


def lang_id(text: Column | str) -> Column:
    """Argmax over marker hits with deterministic priority order.

    Double let-binding: the token array is evaluated once, then the five
    scores are evaluated once into a struct the when-chain reads — same
    values as the naive expansion, ~35x less tokenizer work per row."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c, distinct=False)
    return _let(toks, lambda ts: lang_from_tokens(ts, c))


def lang_id_sql(text_expr: str) -> str:
    toks = tokens_sql(text_expr, distinct=False)
    score = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in LANG_MARKERS.items()
    }
    # RE2 has no \uXXXX escapes — use the literal CJK range chars
    score["zh"] = f"length(regexp_replace({text_expr}, '[^一-鿿]', '', 'g'))"
    best = "greatest(" + ", ".join(score.values()) + ")"
    out = "'unknown'"
    for lang in reversed(["en", "fr", "es", "de", "zh"]):
        out = f"CASE WHEN {score[lang]} > 0 AND {score[lang]} = {best} THEN '{lang}' ELSE {out} END"
    return out


def quality_from_tokens(ts: Column, c: Column) -> Column:
    """The composite quality score over an already-bound token array
    (single stats pass; ``c`` only feeds the digit-ratio regexp)."""

    def formula(st: Column) -> Column:
        n_chars = F.length(c)
        digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
        avg_word_len = st["sum_len"] / F.nullif(st["n_tokens"], F.lit(0))
        ttr = st["n_distinct"] / F.nullif(st["n_tokens"], F.lit(0))
        stop_ratio = st["stop_hits"] / F.nullif(st["n_tokens"], F.lit(0))
        digit_ratio = digits / F.nullif(n_chars, F.lit(0))
        quality = (
            F.least(st["n_tokens"] / F.lit(20.0), F.lit(1.0)) * 0.3
            + F.coalesce(ttr, F.lit(0.0)) * 0.3
            + F.when((avg_word_len >= 3) & (avg_word_len <= 8), 0.2).otherwise(0.0)
            + F.coalesce(stop_ratio, F.lit(0.0)) * 0.2
            - F.coalesce(digit_ratio, F.lit(0.0)) * 0.2
        )
        return F.round(quality, 6)

    stats = F.struct(
        F.size(ts).alias("n_tokens"),
        F.size(F.array_distinct(ts)).alias("n_distinct"),
        F.aggregate(ts, F.lit(0), lambda acc, t: acc + F.length(t)).alias("sum_len"),
        F.size(F.filter(ts, _hit(LANG_MARKERS["en"]))).alias("stop_hits"),
    )
    return _let(stats, formula)


def quality_score_col(text: Column | str = "text") -> Column:
    """The composite quality score as a pure Column expression (rounded to
    6) — extracted so curation ops can attach it in the SAME projection
    as the scan instead of joining back to text_stats (a corpus-sized
    self-join on doc_id for a value derivable inline). Let-bound (r16):
    the token array and the token stats are each evaluated once per row
    instead of once per reference."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c, distinct=False)
    return _let(toks, lambda ts: quality_from_tokens(ts, c))


def text_stats(docs: DataFrame) -> DataFrame:
    """Quality-scoring feature set + composite score.

    The token array is materialized ONCE per row in its own projection
    (r16): CollapseProject declines to inline a non-cheap alias with
    multiple references, so the stats below read the bound ``_toks``
    column instead of each re-running split+lower+filter (the pre-r16
    plan evaluated the tokenizer 20+ times per row)."""
    text = F.col("text")
    bound = docs.select(
        "doc_id", "text", tokens_col(text, distinct=False).alias("_toks")
    )
    toks = F.col("_toks")
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    stop_hits = F.size(F.filter(toks, _hit(LANG_MARKERS["en"])))
    avg_word_len = sum_len / F.nullif(n_tokens, F.lit(0))
    ttr = n_distinct / F.nullif(n_tokens, F.lit(0))
    stop_ratio = stop_hits / F.nullif(n_tokens, F.lit(0))
    punct_ratio = punct / F.nullif(n_chars, F.lit(0))
    digit_ratio = digits / F.nullif(n_chars, F.lit(0))
    return bound.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_m"),
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        # the composite formula lives ONCE, in quality_from_tokens — reported
        # stats and curation scoring cannot drift apart
        quality_from_tokens(toks, text).alias("quality_score"),
    ).orderBy("doc_id")


def with_text_gates(
    df: DataFrame,
    text_col: str | Column,
    lang_out: str = "lang_trim",
    q_out: str = "q_trim",
    round_q: bool = False,
) -> DataFrame:
    """Attach BOTH curation gates (language ID + quality score) with ONE
    tokenization pass: the token array is let-bound per row and shared by
    the two gate expressions. Values are identical to
    ``lang_id(text_col)`` / ``quality_score_col(text_col)`` — only the
    evaluation count changes."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens_col(c, distinct=False)
    gates = _let(
        toks,
        lambda ts: F.struct(
            lang_from_tokens(ts, c).alias("lang"),
            quality_from_tokens(ts, c).alias("q"),
        ),
    )
    q = F.col("_gates")["q"]
    return (
        df.withColumn("_gates", gates)
        .withColumn(lang_out, F.col("_gates")["lang"])
        .withColumn(q_out, F.round(q, 6) if round_q else q)
        .drop("_gates")
    )


def with_text_features(
    df: DataFrame,
    text_col: str | Column = "text",
    lang_out: str = "lang_pred",
    n_out: str = "n_tokens",
    q_out: str = "quality_score",
) -> DataFrame:
    """Attach the standard curation feature triple — language ID, token
    count, quality score — with ONE tokenization pass (same single-pass
    rationale as :func:`with_text_gates`; values identical to the three
    separate expressions)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens_col(c, distinct=False)
    feats = _let(
        toks,
        lambda ts: F.struct(
            lang_from_tokens(ts, c).alias("lang"),
            F.size(ts).cast("long").alias("n"),
            quality_from_tokens(ts, c).alias("q"),
        ),
    )
    return (
        df.withColumn("_feats", feats)
        .withColumn(lang_out, F.col("_feats")["lang"])
        .withColumn(n_out, F.col("_feats")["n"])
        .withColumn(q_out, F.col("_feats")["q"])
        .drop("_feats")
    )


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish token counts (regexp_count stays JVM-side)."""
    return docs.select(
        "doc_id",
        F.size(tokens_col("text", distinct=False)).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_RE)).cast("long").alias("bpe_tokens"),
    ).orderBy("doc_id")


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition filters: per-document top-bigram fraction and
    fraction of tokens inside duplicated trigrams (Rae et al. 2021 §A1.1 use
    these to drop template/boilerplate pages before training).

    Shape for scale: tokens explode to (doc_id, gram) and aggregate twice —
    first on (doc_id, gram) for per-gram counts (the wide shuffle, linear in
    token volume), then on doc_id for the per-doc ratios. Both shuffles are
    keyed; nothing is quadratic and no per-row O(n²) in-array counting.
    """
    toks = tokens_col("text", distinct=False)
    two = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    three = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    grams = docs.select(
        "doc_id",
        F.explode(F.concat(
            F.transform(two, lambda g: F.concat(F.lit("2:"), g)),
            F.transform(three, lambda g: F.concat(F.lit("3:"), g)),
        )).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    is2 = F.col("gram").startswith("2:")
    per_doc = counts.groupBy("doc_id").agg(
        F.sum(F.when(is2, F.col("cnt")).otherwise(0)).alias("n_bigrams"),
        F.max(F.when(is2, F.col("cnt")).otherwise(0)).alias("top_bigram_cnt"),
        F.sum(F.when(~is2, F.col("cnt")).otherwise(0)).alias("n_trigrams"),
        F.sum(F.when(~is2 & (F.col("cnt") >= 2), F.col("cnt")).otherwise(0)).alias("dup_trigram_toks"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round(F.col("top_bigram_cnt") / F.nullif(F.col("n_bigrams"), F.lit(0)), 6).alias(
            "top_bigram_frac"
        ),
        F.round(
            F.col("dup_trigram_toks") / F.nullif(F.col("n_trigrams"), F.lit(0)), 6
        ).alias("dup_trigram_frac"),
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """CCNet-style unigram language-model quality score: each document's
    average per-token natural-log probability under the corpus's OWN
    unigram distribution (Wenzek et al. 2019 rank pages by LM perplexity;
    the unigram form is the shuffle-only Spark-native analog — no external
    model artifact, the corpus is the model).

    Shape for scale: tokens explode to (doc_id, tok); the vocabulary
    aggregate is one map-side-combined shuffle; the grand total joins back
    as a 1-row broadcast (NEVER a partition-less window — vocabulary is
    millions of rows at 100 TB); scoring is an equi-join on the token (the
    shuffle key) + one keyed per-doc aggregate.

    Cross-engine determinism: libm ``ln`` may differ in the last ulp
    between engines, so the per-token logprob is rounded to 6 decimals in
    BOTH engines before averaging, and the per-doc mean runs through exact
    decimal sums (order-independent, like every money aggregate here).
    """
    from pdf_etl_pipeline_spark.functions.scalars import dec_sum

    toks = docs.select("doc_id", F.explode(tokens_col("text", distinct=False)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok", F.round(F.log(F.col("cnt") / F.col("total")), 6).alias("logp")
    )
    per_doc = (
        toks.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(dec_sum("logp") / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            "avg_logprob",
        )
    )


BIGRAM_K = 0.5  # add-k smoothing constant


def bigram_logprob(docs: DataFrame, k_smooth: float = BIGRAM_K) -> DataFrame:
    """Bigram language-model quality score — the context-aware upgrade of
    :func:`unigram_logprob` (CCNet proper uses a 5-gram KenLM; the bigram
    form is the largest order whose counts stay a single keyed aggregate):
    each document's average log P(w2 | w1) under the corpus's own bigram
    distribution with add-k smoothing,
    P(w2|w1) = (c(w1,w2) + k) / (c(w1,·) + k·|V|).

    Shape for scale: bigrams come from one per-row array zip (NO window —
    adjacent-token pairing happens inside the token array, so there is no
    per-token shuffle to restore order); counts are two keyed aggregates
    (the head count derives from the bigram counts, not a second corpus
    pass); |V| joins as a 1-row broadcast (the tx7 move); scoring is an
    equi-join on the bigram. Docs with < 2 tokens report 0 bigrams and a
    null score.

    Determinism: counts are exact integers, the smoothed ratio and its log
    are double ops on those integers (engine-identical), rounded to 6
    before the decimal-exact per-doc mean.
    """
    from pdf_etl_pipeline_spark.functions.scalars import dec_sum

    toks = tokens_col("text", distinct=False)
    base = docs.select("doc_id", toks.alias("t"))
    pair_t = "array<struct<w1:string,w2:string>>"
    pairs_arr = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at("t", i).alias("w1"),
                F.element_at("t", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast(pair_t))
    bg = base.select("doc_id", F.explode(pairs_arr).alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    hc = bc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = base.select(F.explode("t").alias("tok")).agg(
        F.count_distinct("tok").alias("vs")
    )
    lp = (
        bc.join(hc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c12") + k_smooth) / (F.col("c1") + k_smooth * F.col("vs"))), 6
            ).alias("logp"),
        )
    )
    per_doc = (
        bg.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(dec_sum("logp") / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            "avg_logprob",
        )
    )


PPL_CUTS = (1.0 / 3, 2.0 / 3)  # CCNet tertiles: head / middle / tail


def ppl_buckets(docs: DataFrame, cuts: tuple = PPL_CUTS) -> DataFrame:
    """CCNet-style perplexity bucketing — the curation decision the LM
    scores exist to drive (Wenzek et al. 2020 split Common Crawl into
    head/middle/tail by LM perplexity tertile and trained on the head):
    rank every document by its bigram-LM log-perplexity (``-avg_logprob``
    from :func:`bigram_logprob` — monotone in perplexity, and staying in
    log space avoids a cross-engine libm ``exp``), cut the corpus at the
    1/3 and 2/3 quantiles, label head (most fluent) / middle / tail.

    Shape for scale: scoring is tx10's audited plan; the two thresholds
    are ONE 1-row exact-percentile aggregate over the |docs|-row score
    relation (not the token relation), broadcast back for the labeling —
    no global sort or window over the corpus. At 100 TB swap the exact
    percentile for pc2's histogram-sketch quantile or approx_percentile:
    same plan, bounded state; exact is registered because it is the
    hash-checkable form. Docs with <2 tokens have no bigram score and are
    excluded (CCNet drops them before bucketing too).
    """
    scored = (
        bigram_logprob(docs)
        .filter(F.col("n_bigrams") > 0)
        .select("doc_id", "n_bigrams", (-F.col("avg_logprob")).alias("log_ppl"))
    )
    thr = scored.agg(
        F.round(F.expr(f"percentile(log_ppl, {cuts[0]!r})"), 6).alias("t1"),
        F.round(F.expr(f"percentile(log_ppl, {cuts[1]!r})"), 6).alias("t2"),
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            "n_bigrams",
            "log_ppl",
            F.when(F.col("log_ppl") <= F.col("t1"), F.lit("head"))
            .when(F.col("log_ppl") <= F.col("t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of normalized text + a 1-perm MinHash of
    8-gram character shingles (rolling-hash analog, content-defined)."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    n = F.length(norm)
    starts = F.sequence(F.lit(1), F.greatest(n - 7, F.lit(1)))
    shingles = F.transform(starts, lambda i: norm.substr(i, F.lit(8)))
    min_shingle_hash = F.array_min(
        F.transform(shingles, lambda s: (F.lit(PERM_A[0]) * (portable_hash32(s) % P31) + F.lit(PERM_B[0])) % P31)
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        min_shingle_hash.alias("fp_minshingle"),
    ).orderBy("doc_id")


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` keywords per document by TF-IDF (smoothed sklearn-style
    idf = ln((N+1)/(df+1)) + 1) — the classic keyword/feature-extraction
    op a corpus pipeline runs before clustering or retrieval.

    Shape for scale: one token explode feeds BOTH the per-(doc, tok) term
    frequency and the document frequency (df aggregates the tf relation,
    so the expensive explode shuffles once on ``tok``-free keys and the
    df pass is map-side combined); N arrives as a 1-row broadcast
    (vocabulary is millions of rows at 100 TB — never a partition-less
    window); scoring joins tf to idf on ``tok`` (an equi-join on the
    aggregation key) and the top-k is a per-doc window, partitioned by
    doc_id — no global sort anywhere.

    Cross-engine determinism: idf is rounded to 6 decimals before the
    multiply (libm ln last-ulp convention, see :func:`unigram_logprob`);
    score ties break on the token string so row_number is total-ordered.
    """
    toks = docs.select("doc_id", F.explode(tokens_col("text", distinct=False)).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "tok",
        F.round(F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1, 6).alias("idf"),
    )
    scored = tf.join(idf, "tok").select(
        "doc_id", "tok", F.round(F.col("tf") * F.col("idf"), 6).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", "score")
        .orderBy("doc_id", "rank")
    )


def tfidf_topk_sql(table: str, k: int = 3) -> str:
    """DuckDB oracle for :func:`tfidf_topk` — identical arithmetic."""
    toks = tokens_sql("text", distinct=False)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS tok FROM {table}
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM {table}),
idf AS (SELECT tok, round(ln((n_docs + 1) / (df + 1)) + 1, 6) AS idf FROM df, n),
scored AS (
  SELECT doc_id, tf.tok AS tok, round(tf * idf, 6) AS score
  FROM tf JOIN idf ON tf.tok = idf.tok
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank
  FROM scored
)
SELECT doc_id, rank, tok, score FROM ranked WHERE rank <= {k}
ORDER BY doc_id, rank"""


ENTROPY_ALPHABET_RE = "[a-z0-9 ]"


def char_entropy(docs: DataFrame) -> DataFrame:
    """Character-level Shannon entropy per document over a fixed
    ``[a-z0-9 ]`` alphabet (lowercased) — the compression-proxy quality
    signal: near-zero entropy flags repetitive/boilerplate docs, and
    anomalously high entropy flags base64/gibberish; both are standard
    pretraining-corpus filters.

    Shape for scale: ``regexp_extract_all`` + explode → (doc_id, ch)
    counts; the alphabet is 37 symbols so the per-doc relation is tiny
    and every aggregation is map-side combined and keyed by doc_id — one
    shuffle, no global state at all (unlike tf-idf there is no corpus
    pass; each doc is scored against its own distribution).

    Determinism: each p·ln p term is rounded to 6 decimals (ln ulp
    convention) and summed through exact decimals, so the result is
    independent of partition order in both engines.
    """
    from pdf_etl_pipeline_spark.functions.scalars import dec_sum

    chars = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(ENTROPY_ALPHABET_RE), 0)).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_alpha"),
        F.count(F.lit(1)).alias("n_symbols"),
    )
    terms = counts.join(per_doc.select("doc_id", "n_alpha"), "doc_id").select(
        "doc_id",
        F.round((F.col("c") / F.col("n_alpha")) * F.log(F.col("c") / F.col("n_alpha")), 6).alias("term"),
    )
    ent = terms.groupBy("doc_id").agg(F.round(-dec_sum("term"), 6).alias("entropy"))
    return (
        docs.select("doc_id")
        .join(per_doc.join(ent, "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_alpha", F.lit(0)).cast("long").alias("n_alpha"),
            F.coalesce("n_symbols", F.lit(0)).cast("long").alias("n_symbols"),
            "entropy",
        )
        .orderBy("doc_id")
    )


def char_entropy_sql(table: str) -> str:
    """DuckDB oracle for :func:`char_entropy` — identical arithmetic."""
    return f"""
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{ENTROPY_ALPHABET_RE}')) AS ch
  FROM {table}
),
counts AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, SUM(c) AS n_alpha, COUNT(*) AS n_symbols FROM counts GROUP BY 1
),
terms AS (
  SELECT counts.doc_id AS doc_id,
         round((c / n_alpha) * ln(c / n_alpha), 6) AS term
  FROM counts JOIN per_doc ON counts.doc_id = per_doc.doc_id
),
ent AS (SELECT doc_id, round(-{dec_sum_sql('term')}, 6) AS entropy FROM terms GROUP BY doc_id)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(n_alpha, 0) AS BIGINT) AS n_alpha,
       CAST(coalesce(n_symbols, 0) AS BIGINT) AS n_symbols,
       entropy
FROM {table} d
LEFT JOIN (SELECT per_doc.doc_id AS doc_id, n_alpha, n_symbols, entropy
           FROM per_doc JOIN ent ON per_doc.doc_id = ent.doc_id) s
  ON d.doc_id = s.doc_id
ORDER BY doc_id"""


def vocab_growth(docs: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Heaps-law vocabulary-growth curve (tx14): documents in doc_id
    order are cut into ``n_buckets`` equal-width id buckets; per bucket,
    the cumulative doc count, cumulative token OCCURRENCES, and
    cumulative DISTINCT vocabulary — the V(N) curve whose log-log slope
    is the Heaps exponent. The curve is the corpus-health readout a
    training pipeline watches: a dedup failure flattens vocabulary
    growth against token growth (the corpus repeats itself), synthetic
    or templated floods bend it down, genuinely fresh data keeps
    V(N) ~ K·N^β with β ≈ 0.4–0.6.

    The prefix-distinct count is computed WITHOUT any prefix rescans:
    a token is new to prefix P iff its FIRST occurrence (min doc_id)
    lands in P — so one keyed min-aggregation over the exploded tokens
    (map-side combinable), a 10-row per-bucket roll-up, and a running
    sum over that bounded relation. Scale shape: one corpus-linear
    explode + keyed agg; the only global window runs over the
    ``n_buckets``-row aggregate (pk1's bounded-offsets discipline),
    never the corpus."""
    spark_max = docs.agg(F.max("doc_id")).first()[0]
    m = int(spark_max) + 1

    def bucket(c: Column) -> Column:
        return F.floor(c * n_buckets / m).cast("long")

    toks = docs.select(
        "doc_id", F.explode(tokens_col("text", distinct=False)).alias("tok")
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("fd"))
    dstats = (
        docs.select(
            bucket(F.col("doc_id")).alias("bucket"),
            F.size(tokens_col("text", distinct=False)).cast("long").alias("nt"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("n_tok"))
    )
    vstats = first.groupBy(bucket(F.col("fd")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("new_vocab")
    )
    # intentional single-partition window: runs over the per-BUCKET
    # aggregate (fixed bucket count), not the token/doc relations
    run = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dstats.join(vstats, "bucket", "left")
        .fillna(0, subset=["new_vocab"])
        .select(
            "bucket",
            "n_docs",
            F.sum("n_docs").over(run).alias("cum_docs"),
            F.sum("n_tok").over(run).alias("cum_tokens"),
            F.sum("new_vocab").over(run).alias("cum_vocab"),
        )
        .orderBy("bucket")
    )
