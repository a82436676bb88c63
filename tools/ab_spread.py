"""Interleaved A/B of session.spread_scan (ON vs OFF) per query — host
steal hits both arms equally in expectation, so the per-query min
contrast is meaningful even on a bursty box. Prints per-query
{on: min, off: min, window: other+steal cores}.

Usage: python tools/ab_spread.py [-n REPS_PER_ARM] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_etl_pipeline_spark.catalog import load_registry
from pdf_etl_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_registry()
    spark = get_spark("ab_spread")
    for t in ("lineitem", "documents", "events", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    from bench import _Window, _reset_session_memos

    out = {}
    for name in args:
        fn = registry[name].fn

        def run(mode_off: bool) -> float:
            os.environ["SPARK_GRAFT_NO_SPREAD"] = "1" if mode_off else "0"
            _reset_session_memos(spark)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)

        # one warm pass per arm
        run(False)
        run(True)
        w = _Window()
        on, off = [], []
        for _ in range(reps):
            on.append(run(False))
            off.append(run(True))
        win = w.close()
        out[name] = {
            "on": min(on),
            "off": min(off),
            "on_runs": on,
            "off_runs": off,
            "other": win["other_cores"],
            "steal": win["steal_cores"],
        }
        print(json.dumps({name: out[name]}), flush=True)
    os.environ.pop("SPARK_GRAFT_NO_SPREAD", None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
