"""Adjudicate the cc10 bench outlier (r11 finding 1: committed runs
[15.59, 27.24, 15.88] s — a 1.75x spread, the only query above the
warm-pass round's 1.55x worst case).

Runs cc10 N times back-to-back on an idle box (same guard + memo-reset +
inter-run GC discipline as bench.py), recording per-run wall seconds and
a fingerprint of the executed plan (joins + exchange count from the
formatted explain) so an AQE plan flip between runs is distinguishable
from machine noise. Usage:

    python tools/cc10_adjudicate.py [sf_dir] [n_runs]   # default sf0.1, 5
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _require_idle, _reset_session_memos
from pdf_etl_pipeline_spark.catalog import load_registry
from pdf_etl_pipeline_spark.session import get_spark


def plan_fingerprint(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "joins": sorted(
            set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan))
        ),
        "n_exchanges": len(re.findall(r"Exchange ", plan)),
        "n_aqe_reused": len(re.findall(r"ReusedExchange|AQEShuffleRead", plan)),
    }


def main() -> None:
    load_before = _require_idle()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("cc10-adjudicate")
    for t in ("lineitem", "documents", "events", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    fn = load_registry()["cc10_trimmed_shard_manifest"].fn

    # untimed warm pass (bench discipline)
    _reset_session_memos(spark)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # timed via collect() on the SAME DataFrame reference so each run's
    # FINAL adaptive plan (isFinalPlan=true) is fingerprintable — a noop
    # write executes a separate QueryExecution whose AQE decisions are
    # invisible afterwards. The manifest result is bounded (a few shard
    # rows), so collect cost is negligible next to the chain.
    secs, fps = [], []
    for _ in range(n_runs):
        _reset_session_memos(spark)
        # fn() INSIDE the timed window, exactly like bench.py: the memoized
        # LSH chain rebuilds eagerly at plan-construction time and is part
        # of the query's cost
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.collect()
        secs.append(round(time.time() - t0, 3))
        fps.append(plan_fingerprint(df))
    spread = round(max(secs) / min(secs), 3)
    print(
        json.dumps(
            {
                "query": "cc10_trimmed_shard_manifest",
                "sf_dir": sf_dir,
                "secs": secs,
                "max_over_min": spread,
                "plan_flip": any(fp != fps[0] for fp in fps),
                "plan_fingerprints": fps,
                "load_avg_before": [round(x, 2) for x in load_before],
                "load_avg_after": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
