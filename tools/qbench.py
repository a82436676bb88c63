"""Quick per-query timing for optimization iteration — NOT the committed
bench (bench.py stays the artifact of record). Times the named queries
with the noop sink, one untimed warm pass then min-of-N, same session
discipline as bench.py (memo reset between runs) but no load gate, no
calibration — it exists so a candidate change's effect is visible in
seconds, to be confirmed by a full bench.py run afterwards.

Usage: python tools/qbench.py [-n RUNS] query [query ...]
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
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_registry()
    spark = get_spark("qbench")
    for t in ("lineitem", "documents", "events", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    from bench import _Window, _reset_session_memos

    out: dict[str, object] = {}
    for name in names:
        fn = registry[name].fn
        spark.sparkContext.setJobDescription(f"qbench:{name}:warm")
        _reset_session_memos(spark)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        raw = []
        wins = []
        for i in range(runs):
            _reset_session_memos(spark)
            spark.sparkContext.setJobDescription(f"qbench:{name}:{i}")
            w = _Window()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            raw.append(round(time.time() - t0, 3))
            ww = w.close()
            wins.append((ww["other_cores"], ww["steal_cores"]))
        out[name] = {"min": min(raw), "runs": raw, "other_steal": wins}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
