"""Measured st10 steady-state monitor-latency curve (SCALE.md evidence).

Drives N staged micro-batches through ``monitor_batch`` twice over the
same document stream — once with in-loop per-bucket compaction
(``compact_span_index`` after every batch at the default threshold),
once without — recording per-batch wall seconds and the max
data-file-count per bucket partition. The claim under test
(``llmdata/span_ingest.py``, r11 redesign): every batch appends one file
per non-empty bucket, so the uncompacted probe opens O(batches) files
per bucket while the compacted series stays bounded by the threshold;
and compaction is INVISIBLE to admission (both series' reports are
bit-identical — also pinned at smaller scale in tests).

Usage:
    python tools/span_latency.py [sf_dir] [n_batches]   # default sf0.01, 24
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.llmdata.span_ingest import (
    _index_path,
    compact_span_index,
    monitor_batch,
)
from pdf_etl_pipeline_spark.operators import fsutil
from pdf_etl_pipeline_spark.session import get_spark, load_table


def max_bucket_files(ix: str) -> int:
    counts = [
        fsutil.data_file_count(p)
        for p in fsutil.list_subdirs(_index_path(ix))
        if "bucket=" in p
    ]
    return max(counts) if counts else 0


def run_series(spark, docs, cuts, compact: bool):
    ix = tempfile.mkdtemp(prefix="st10_latency_")
    secs, files, rows, reports = [], [], [], {}
    try:
        lo = None
        for i, hi in enumerate(cuts):
            b = docs.filter(F.col("doc_id") < hi)
            if lo is not None:
                b = b.filter(F.col("doc_id") >= lo)
            t0 = time.time()
            rep = monitor_batch(b, ix, batch_id=i)
            for r in rep.collect():
                reports[r.doc_id] = (r.n_tokens, r.n_dup_tokens)
            if compact:
                compact_span_index(spark, ix)
            secs.append(round(time.time() - t0, 3))
            files.append(max_bucket_files(ix))
            rows.append(spark.read.parquet(_index_path(ix)).count())
            lo = hi
        distinct_h = (
            spark.read.parquet(_index_path(ix)).select("h").distinct().count()
        )
    finally:
        shutil.rmtree(ix, ignore_errors=True)
    return secs, files, rows, distinct_h, reports


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("st10-latency")
    docs = load_table(spark, sf_dir, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cuts = [ids[int(len(ids) * i / n_batches)] for i in range(1, n_batches)] + [ids[-1] + 1]

    # warm plans so batch 1 isn't charged JVM/codegen startup
    warm = tempfile.mkdtemp(prefix="st10_warm_")
    try:
        monitor_batch(docs.filter(F.col("doc_id") < cuts[0]), warm, batch_id=0)
        monitor_batch(docs.filter(F.col("doc_id") < cuts[0]), warm, batch_id=1)
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    plain_secs, plain_files, plain_rows, plain_h, rep_plain = run_series(
        spark, docs, cuts, compact=False
    )
    comp_secs, comp_files, comp_rows, comp_h, rep_comp = run_series(
        spark, docs, cuts, compact=True
    )
    assert rep_plain == rep_comp, "compaction changed admission reports"

    def slope(ys):
        ys = ys[4:]
        n = len(ys)
        xs = list(range(n))
        mx, my = sum(xs) / n, sum(ys) / n
        return round(
            sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            / sum((x - mx) ** 2 for x in xs),
            4,
        )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_batches": n_batches,
                "n_docs": len(ids),
                "plain": {
                    "secs": plain_secs,
                    "max_bucket_files": plain_files,
                    "index_rows": plain_rows,
                    "distinct_hashes": plain_h,
                    "tail_slope_sec_per_batch": slope(plain_secs),
                },
                "compacted": {
                    "secs": comp_secs,
                    "max_bucket_files": comp_files,
                    "index_rows": comp_rows,
                    "distinct_hashes": comp_h,
                    "tail_slope_sec_per_batch": slope(comp_secs),
                },
                "load_avg_before": os.getloadavg()[0],
            }
        )
    )


if __name__ == "__main__":
    main()
