"""Subword-tokenization catalog (tk*) — learned BPE trained AND applied
in-plan, plus the BPE-denominated variants of the token-budget ops:
cc6's source mixing (tk3) and pk1's sequence packing (tk4) re-expressed
over learned-subword counts, which is the denominator real pretraining
mixes are specified in.

Every oracle unrolls the IDENTICAL merge algorithm as a DuckDB
MATERIALIZED CTE chain (see llmdata/bpe.py) — training is deterministic
(exact integer pair counts, total-order argmax), so even the learned
merge table itself is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_etl_pipeline_spark.catalog import register
from pdf_etl_pipeline_spark.llmdata import bpe
from pdf_etl_pipeline_spark.llmdata.corpus import PACK_BUDGET, pack_counts
from pdf_etl_pipeline_spark.llmdata.text import quality_score_col
from pdf_etl_pipeline_spark.session import load_table, tune

# cc6 budgets 800 whitespace tokens; the measured subword ratio on this
# corpus is ~3.4 subwords/pretoken, so the BPE-denominated budget is
# scaled to keep the admitted sets comparable.
BPE_BUDGET = 2800


# --- TK1: BPE training --------------------------------------------------------
@register(
    "tk1_bpe_train",
    oracle=bpe.bpe_train_sql("documents", bpe.N_MERGES),
    doc=f"TK1 learned BPE merge table ({bpe.N_MERGES} merges): iterative "
    "pair-count aggregation over the distinct-pretoken vocabulary relation "
    "(vocabulary scale, never corpus scale), 1-row argmax per merge, "
    "window-based greedy left-to-right merge apply with gaps-and-islands "
    "parity for overlapping (a,a) runs; per-stage localCheckpoint keeps the "
    "plan constant-size. Oracle unrolls the same stages as MATERIALIZED CTEs",
)
def tk1_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    merges, _ = bpe.train_bpe(load_table(spark, sf_dir, "documents"), bpe.N_MERGES)
    return bpe.merge_table(spark, merges)


# --- TK2: BPE encoding (per-doc subword counts) -------------------------------
@register(
    "tk2_bpe_encode",
    oracle=bpe.bpe_encode_sql("documents", bpe.N_MERGES),
    doc="TK2 BPE encode, train+apply in one composition: the encoded "
    "VOCABULARY (word -> subword count) broadcast-joins back to the corpus's "
    "exploded pretokens — encode cost at 100 TB is one equi-join on the "
    "pretoken; the merge iteration never touches corpus-sized data",
)
def tk2_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return bpe.bpe_doc_counts(load_table(spark, sf_dir, "documents"), bpe.N_MERGES).orderBy(
        "doc_id"
    )


# --- TK3: cc6 token-budget mixing, BPE-denominated ----------------------------
def _tk3_oracle() -> str:
    from pdf_etl_pipeline_spark.catalog.curation_q import _QUALITY

    return f"""WITH {bpe.bpe_chain_sql('documents', bpe.N_MERGES)},
{bpe.bpe_counts_tail_sql('documents', bpe.N_MERGES)},
scored AS (
  SELECT d.doc_id AS doc_id, d.source AS source,
         round({_QUALITY}, 6) AS quality_score,
         c.bpe_tokens AS n_tokens
  FROM documents d JOIN doc_counts c USING (doc_id)
),
ranked AS (
  SELECT source, doc_id, n_tokens,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality_score DESC, doc_id) AS rank,
         CAST(SUM(n_tokens) OVER (PARTITION BY source
                                  ORDER BY quality_score DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
           AS start_offset
  FROM scored
)
SELECT source, rank, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, start_offset
FROM ranked WHERE start_offset < {BPE_BUDGET}
ORDER BY source, rank"""


@register(
    "tk3_bpe_budget_mix",
    oracle=_tk3_oracle(),
    doc=f"TK3 token-quota corpus mixing in LEARNED-subword units (cc6 with "
    f"the real denominator): admit each source's docs in quality order until "
    f"a {BPE_BUDGET}-BPE-token budget fills. Counts come from the tk2 "
    "broadcast join; ranking + running total stay source-partitioned windows",
)
def tk3_bpe_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    counts = bpe.bpe_doc_counts(docs, bpe.N_MERGES)
    scored = docs.select(
        "doc_id", "source", quality_score_col("text").alias("quality_score")
    ).join(counts.select("doc_id", F.col("bpe_tokens").alias("n_tokens")), "doc_id")
    w = Window.partitionBy("source").orderBy(F.desc("quality_score"), "doc_id")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = scored.select(
        "source",
        F.row_number().over(w).alias("rank"),
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.sum("n_tokens").over(cum) - F.col("n_tokens")).cast("long").alias("start_offset"),
    )
    return ranked.filter(F.col("start_offset") < BPE_BUDGET).orderBy("source", "rank")


# --- TK4: pk1 sequence packing, BPE-denominated -------------------------------
def _tk4_oracle() -> str:
    return f"""WITH {bpe.bpe_chain_sql('documents', bpe.N_MERGES)},
{bpe.bpe_counts_tail_sql('documents', bpe.N_MERGES)},
c AS (
  SELECT doc_id, bpe_tokens AS n_tokens,
         CAST(SUM(bpe_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              - bpe_tokens AS BIGINT) AS start_offset
  FROM doc_counts
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(CAST(start_offset AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS shard_id,
       start_offset
FROM c ORDER BY doc_id"""


@register(
    "tk4_bpe_packing",
    oracle=_tk4_oracle(),
    doc="TK4 greedy sequence packing into 2048-token shards with LEARNED-"
    "subword counts (pk1 with the real denominator): the tk2 counts feed the "
    "same two-level bucketed cumulative sum — no single-partition global "
    "window, packing stays shuffle-bounded at corpus scale",
)
def tk4_bpe_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    counts = bpe.bpe_doc_counts(docs, bpe.N_MERGES).select(
        "doc_id", F.col("bpe_tokens").alias("n_tokens")
    )
    return pack_counts(counts, PACK_BUDGET).orderBy("doc_id")


# --- TK5: batched BPE training (the realistic-merge-count scale path) ----------
@register(
    "tk5_bpe_batched_train",
    oracle=bpe.bpe_batched_train_sql("documents", bpe.N_MERGES, 8, 4),
    doc=f"TK5 BATCHED BPE training ({bpe.N_MERGES} merges, conflict-free "
    "rounds of 8): each round is one bounded top-K collect + ONE windowed "
    "apply pass, so N merges cost ~N/round_size Spark jobs instead of N — "
    "the lever that makes 32k-merge vocabularies feasible (measured cost "
    "model in SCALE.md). The oracle unrolls every round, expressing the "
    "driver-side conflict-free greedy selection as a RECURSIVE CTE over the "
    "ranked pair counts, so even the batched scale path is hash-checked",
)
def tk5_bpe_batched_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    merges, _ = bpe.train_bpe_batched(
        load_table(spark, sf_dir, "documents"), bpe.N_MERGES, round_size=8, margin=4
    )
    return bpe.merge_table(spark, merges)


# --- TK6: frequency-capped BPE (bounded-vocabulary scale path) ------------------
TK6_CAP = 16


@register(
    "tk6_bpe_capped_encode",
    oracle=bpe.bpe_capped_encode_sql("documents", bpe.N_MERGES, TK6_CAP),
    doc=f"TK6 frequency-capped BPE ({bpe.N_MERGES} merges over the top-{TK6_CAP} "
    "pretokens, closed-vocab encode with character fallback): the bounded path "
    "for tk2's measured adversarial regime (SCALE.md e=0.83 when vocabulary "
    "grows with the corpus) — training iterates a relation that never exceeds "
    "the cap regardless of corpus size (TakeOrdered top-K, deterministic "
    "tie-break), encode is ONE left join against a <=cap-row broadcast, OOV "
    "pretokens take the char-count fallback production tokenizers use for the "
    "long tail; oov_tokens exposes the cap's coverage",
)
def tk6_bpe_capped_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return bpe.bpe_doc_counts_capped(
        load_table(spark, sf_dir, "documents"), bpe.N_MERGES, TK6_CAP
    )


# --- TK7: vocabulary-cap coverage sweep ---------------------------------------------
@register(
    "tk7_cap_sweep",
    oracle=bpe.bpe_cap_sweep_sql("documents"),
    doc="TK7 cap/coverage tradeoff curve: the tk6 frequency-capped tokenizer "
    "at caps 4/8/16, one corpus-total row per cap (oov_rate = char-fallback "
    "volume, subword_ratio) — the sizing readout before freezing a vocab. "
    "Scale: ONE word-vocabulary pass shared across caps (checkpointed), "
    "per-cap training bounded by the cap, per-cap encode one broadcast left "
    "join folded to 1 row",
)
def tk7_cap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return bpe.bpe_cap_sweep(load_table(spark, sf_dir, "documents"))
