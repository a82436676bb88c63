"""Interleaved A/B for the r17 cc10 spans-persist change: OLD body (lazy
trimmed_docs — span hashing runs twice per execution) vs NEW registered
cc10 (spans persisted once, manifest eagerly checkpointed, spans released).
Both arms run in ONE session, alternating, so host noise lands on both.

Usage: python tools/ab_cc10_spans.py [-n REPS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.catalog import load_registry
from pdf_etl_pipeline_spark.llmdata import corpus as CP
from pdf_etl_pipeline_spark.session import get_spark, load_table


def cc10_old(spark, sf_dir):
    """The pre-r17 cc10 body: trimmed_docs left fully lazy (spans relation
    evaluated once per consumer), no manifest checkpoint."""
    from pdf_etl_pipeline_spark.catalog.dedup_q import shared_pairs
    from pdf_etl_pipeline_spark.llmdata.dedup import near_dup_clusters, trimmed_docs
    from pdf_etl_pipeline_spark.llmdata.text import with_text_gates

    docs = load_table(spark, sf_dir, "documents", spread=True)
    keepers = (
        near_dup_clusters(docs, threshold=0.9, pairs=shared_pairs(spark, sf_dir, 0.9))
        .filter(F.col("is_keeper"))
        .select("doc_id")
    )
    trimmed = trimmed_docs(docs).join(keepers, "doc_id", "left_semi")
    survivors = (
        with_text_gates(trimmed, "trimmed_text", "_lang", "_q")
        .filter((F.col("_lang") == "en") & (F.col("_q") >= 0.5))
        .select("doc_id", F.col("n_kept").alias("n_tokens"))
    )
    packed = CP.pack_counts(survivors)
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .orderBy("shard_id")
    )


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_registry()
    spark = get_spark("ab_cc10")
    for t in ("documents",):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    from bench import _Window, _reset_session_memos

    new_fn = registry["cc10_trimmed_shard_manifest"].fn

    def run(fn) -> float:
        _reset_session_memos(spark)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    run(new_fn)
    run(cc10_old)
    w = _Window()
    new_t, old_t = [], []
    for _ in range(reps):
        new_t.append(run(new_fn))
        old_t.append(run(cc10_old))
    win = w.close()
    print(
        json.dumps(
            {
                "cc10_new": min(new_t),
                "cc10_old": min(old_t),
                "new_runs": new_t,
                "old_runs": old_t,
                "other": win["other_cores"],
                "steal": win["steal_cores"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
