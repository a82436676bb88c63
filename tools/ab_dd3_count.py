"""Interleaved A/B for dd3's mid-pipeline cands.count() (minhash_lsh_pairs
persist path): the eager count materializes the candidate cache so AQE
plans the verify join against real sizes — measured ~6 s faster at sf0.1
when introduced, but the conditions changed since (spread exchange, r16
plan changes), so r17 re-measures it. Arms: registered dd3 (WITH count)
vs an identical pipeline with the count removed.

Usage: python tools/ab_dd3_count.py [-n REPS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.llmdata import dedup as DD
from pdf_etl_pipeline_spark.session import get_spark, load_table


def dd3_no_count(spark, sf_dir, threshold=0.9):
    """minhash_lsh_pairs(materialize=True) minus the eager cands.count()."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    hashed = DD.hashed_tokens(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = DD.signatures_from_hashed(hashed).persist(StorageLevel.MEMORY_AND_DISK)
    bands = DD.bands_from_signatures(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cand_ids = cands.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id")).distinct()
    toks = (
        hashed.groupBy("doc_id")
        .agg(F.collect_set("h").alias("toks"))
        .join(cand_ids, "doc_id", "left_semi")
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    verified = cands.join(ta, "doc_a").join(tb, "doc_b")
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    result = (
        verified.filter((inter / union) >= threshold)
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .localCheckpoint()
    )
    for cached in (cands, sigs, hashed):
        cached.unpersist()
    return result


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_dd3")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    from bench import _Window, _reset_session_memos

    def run_with() -> float:
        _reset_session_memos(spark)
        t0 = time.time()
        DD.minhash_lsh_pairs(
            load_table(spark, sf_dir, "documents", spread=True), 0.9, materialize=True
        ).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def run_without() -> float:
        _reset_session_memos(spark)
        t0 = time.time()
        dd3_no_count(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    run_with()
    run_without()
    w = _Window()
    wc, woc = [], []
    for _ in range(reps):
        wc.append(run_with())
        woc.append(run_without())
    win = w.close()
    print(
        json.dumps(
            {
                "dd3_with_count": min(wc),
                "dd3_no_count": min(woc),
                "with_runs": wc,
                "without_runs": woc,
                "other": win["other_cores"],
                "steal": win["steal_cores"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
