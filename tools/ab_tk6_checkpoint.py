"""Interleaved A/B for the r16 lazy-vs-eager per-round checkpoints in
tk6's capped BPE trainer (r16 VERDICT task 4: tk6 read 14.1 -> 21.4 s and
the lazy conversion was a suspect). LAZY = the committed
train_bpe_on_vocab (localCheckpoint(eager=False), next round's argmax
materializes); EAGER = identical loop with eager checkpoints (the r15
shape). Both arms in ONE session, alternating.

Usage: python tools/ab_tk6_checkpoint.py [-n REPS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.llmdata import bpe
from pdf_etl_pipeline_spark.llmdata.dedup import tokens_col
from pdf_etl_pipeline_spark.session import get_spark, load_table


def train_eager(vocab, n_merges):
    """r15 shape: eager checkpoint per round (one extra job per round)."""
    rel = bpe.symbols_rel(vocab).localCheckpoint()
    merges = []
    for _ in range(n_merges):
        best = bpe.best_pair(rel)
        if best is None:
            break
        a, b, _cnt = best
        merges.append(best)
        rel = bpe.apply_merge(rel, a, b).localCheckpoint()  # EAGER
    return merges, rel


def tk6_with(docs, trainer):
    from pdf_etl_pipeline_spark.catalog.tokenize_q import TK6_CAP

    merges, rel = trainer(bpe.capped_vocab(docs, TK6_CAP), bpe.N_MERGES)
    enc = bpe.subword_counts(rel)
    dt = docs.select("doc_id", F.explode(tokens_col("text", distinct=False)).alias("word"))
    per = (
        dt.join(F.broadcast(enc), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum(F.coalesce("n_sub", F.length("word"))).alias("bpe_tokens"),
            F.sum(F.when(F.col("n_sub").isNull(), 1).otherwise(0)).alias("oov_tokens"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("ws_tokens", F.lit(0)).cast("long").alias("ws_tokens"),
            F.coalesce("bpe_tokens", F.lit(0)).cast("long").alias("bpe_tokens"),
            F.coalesce("oov_tokens", F.lit(0)).cast("long").alias("oov_tokens"),
            F.round(
                F.col("bpe_tokens") / F.nullif(F.col("ws_tokens").cast("double"), F.lit(0.0)), 6
            ).alias("subword_ratio"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_tk6")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    from bench import _Window

    docs = load_table(spark, sf_dir, "documents")  # tk6 reads the raw scan (r17)

    def run(trainer) -> float:
        t0 = time.time()
        tk6_with(docs, trainer).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    run(bpe.train_bpe_on_vocab)  # warm lazy
    run(train_eager)  # warm eager
    w = _Window()
    lazy_t, eager_t = [], []
    for _ in range(reps):
        lazy_t.append(run(bpe.train_bpe_on_vocab))
        eager_t.append(run(train_eager))
    win = w.close()
    print(
        json.dumps(
            {
                "tk6_lazy": min(lazy_t),
                "tk6_eager": min(eager_t),
                "lazy_runs": lazy_t,
                "eager_runs": eager_t,
                "other": win["other_cores"],
                "steal": win["steal_cores"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
