"""Local emulation of the driver's correctness gate.

Runs every registered query's Spark plan AND its DuckDB oracle at a given
scale factor, then compares row count, schema (sorted column names) and an
order-insensitive value comparison. Usage:

    python tools/check_oracle.py [sf_dir] [query-name-substring ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize to sorted-column, sorted-row string frame."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "null" if pd.isna(v) else repr(round(float(v), 9)))
        elif pd.api.types.is_datetime64_any_dtype(s):
            # midnight-normalized so DATE-as-datetime64 equals DATE-as-object
            out[c] = s.map(
                lambda v: "null"
                if pd.isna(v)
                else pd.Timestamp(v).isoformat().removesuffix("T00:00:00")
            )
        else:
            out[c] = s.map(lambda v: "null" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v))
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = list(a.index[neq])[:3]
        for i in idx:
            problems.append(f"row {i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}")
        problems.insert(0, f"{int(neq.sum())}/{len(a)} rows differ")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    filters = [a for a in sys.argv[1:] if "/" not in a]

    from pdf_etl_pipeline_spark.catalog import load_registry
    from pdf_etl_pipeline_spark.session import get_spark

    registry = load_registry()
    spark = get_spark("check_oracle")
    con = duck_connection(sf_dir)

    failed, passed, skipped = [], [], []
    for name, spec in sorted(registry.items()):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if spec.oracle is None:
            skipped.append(name)
            print(f"SKIP {name}: rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(spec.oracle).fetchdf()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
        else:
            passed.append(name)
            print(f"PASS {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
