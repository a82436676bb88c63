"""Adjudicate the r12 headline drift (r12 finding 1: 12.798 -> 13.387 s,
9 of 11 headline queries +5-22% with no plan change — w5 worst at
0.897 -> 1.095 s).

A NEAR-UNIFORM drift across unrelated plans is the signature of
harness/session/machine effects, not of any single bad plan (all 90 plan
audits passed unchanged in r12). Suspects, each measured separately here:

1. **Catalog/session bring-up** — the registry grew 169 -> 178 between
   r11 and r12; if import or session-tune time leaked into the timed
   windows the drift would track registry size. (It should not: bench.py
   times only ``fn(spark, sf_dir).write(noop)``.)
2. **Machine state** — both rounds passed the load guard (r11 before
   1.40, r12 before 1.20) but guard-passing boxes still differ; 5 idle
   back-to-back runs per query separate a real floor from a transient.
3. **AQE plan flips** — fingerprints (join strategies + exchange counts)
   of the worst drifters distinguish a plan change from noise.

Runs the FULL headline set (bench.py discipline: memo reset + inter-run
GC, untimed warm pass, min-of-N) with N=5, then fingerprints the three
worst r12 drifters via collect() (final adaptive plans). Prints one JSON
record comparing per-query mins against the committed BENCH_r11/r12
artifacts. Usage:

    python tools/drift_adjudicate.py [sf_dir] [n_runs]   # default sf0.1, 5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, _require_idle, _reset_session_memos
from tools.cc10_adjudicate import plan_fingerprint

FINGERPRINT_QUERIES = ["w5_topk_per_group", "dd1_exact_dedup", "ss1_cosine_topk"]


def _committed_mins(path: str) -> dict[str, float]:
    try:
        with open(path) as f:
            return json.load(f)["parsed"]["queries"]
    except Exception:
        return {}


def main() -> None:
    load_before = _require_idle()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    # suspect 1: harness phases, timed separately from any query
    t0 = time.time()
    from pdf_etl_pipeline_spark.catalog import load_registry

    registry = load_registry()
    t_registry = round(time.time() - t0, 3)

    t0 = time.time()
    from pdf_etl_pipeline_spark.session import get_spark

    spark = get_spark("drift-adjudicate")
    t_session = round(time.time() - t0, 3)

    t0 = time.time()
    for t in ("lineitem", "documents", "events", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    t_table_warm = round(time.time() - t0, 3)

    # suspects 2+3: per-query idle repetition, bench.py's exact discipline
    runs: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        fn = registry[name].fn
        _reset_session_memos(spark)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        raw: list[float] = []
        for _ in range(n_runs):
            _reset_session_memos(spark)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            raw.append(round(time.time() - t0, 3))
        runs[name] = raw

    fps = {}
    for name in FINGERPRINT_QUERIES:
        _reset_session_memos(spark)
        df = registry[name].fn(spark, sf_dir)
        df.collect()
        fps[name] = plan_fingerprint(df)

    r11 = _committed_mins(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_r11.json"))
    r12 = _committed_mins(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_r12.json"))
    mins = {k: min(v) for k, v in runs.items()}
    print(
        json.dumps(
            {
                "phase_secs": {
                    "load_registry": t_registry,
                    "get_spark": t_session,
                    "table_warm": t_table_warm,
                },
                "n_runs": n_runs,
                "runs": runs,
                "mins": mins,
                "total_min": round(sum(mins.values()), 3),
                "vs_r11": {
                    k: round(mins[k] / r11[k], 3) for k in mins if k in r11
                },
                "vs_r12": {
                    k: round(mins[k] / r12[k], 3) for k in mins if k in r12
                },
                "worst_spread": max(
                    round(max(v) / min(v), 3) for v in runs.values()
                ),
                "plan_fingerprints": fps,
                "load_avg_before": [round(x, 2) for x in load_before],
                "load_avg_after": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
