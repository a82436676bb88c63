"""Cross-engine DATE normalization at the catalog boundary.

Spark DATE reaches pandas as ``datetime.date`` objects while DuckDB DATE
arrives as ``datetime64`` — engine-level schemas match, but a value-hash
computed naively over the pandas frames would not. Catalog outputs
therefore surface date columns as naive TIMESTAMPs on both sides:
``cast("timestamp_ntz")`` in Spark, ``SELECT * REPLACE (CAST(c AS
TIMESTAMP) AS c)`` around the oracle. Library APIs keep proper DateType;
only the driver-facing projections are normalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# query name → date-typed output columns
DATE_COLS: dict[str, list[str]] = {
    "a5_monthly_spend": ["month_start"],
    "f_scalar_suite": ["parsed_date", "mined_date"],
    "t1_t3_invoice_pipeline": ["processed_date", "invoice_date", "due_date"],
    "t4_receipt_products": ["processed_date", "invoice_date"],
    "t5_award_letter": ["letting_date"],
    "t6_bids_as_read": ["letting_date"],
    "t7_bid_tabs": ["letting_date"],
    "t8_item_c": ["date_available", "final_completion"],
    "t9_invitation_to_bid": ["date_available", "completion_date", "letting_date"],
    "t11_dispatch_union": [
        "processed_date",
        "invoice_date",
        "due_date",
        "letting_date",
        "date_available",
        "completion_date",
        "final_completion",
    ],
}


def cast_dates_spark(df: DataFrame, cols: list[str]) -> DataFrame:
    from pyspark.sql import functions as F

    return df.withColumns({c: F.col(c).cast("timestamp_ntz") for c in cols if c in df.columns})


def cast_dates_sql(oracle: str, cols: list[str]) -> str:
    repl = ", ".join(f"CAST({c} AS TIMESTAMP) AS {c}" for c in cols)
    return f"SELECT * REPLACE ({repl}) FROM (\n{oracle}\n)"


def apply(registry: dict) -> None:
    for name, cols in DATE_COLS.items():
        spec = registry.get(name)
        if spec is None:
            continue
        inner_fn = spec.fn

        def wrapped(spark, sf_dir, _inner=inner_fn, _cols=cols):
            return cast_dates_spark(_inner(spark, sf_dir), _cols)

        spec.fn = wrapped
        if spec.oracle is not None:
            spec.oracle = cast_dates_sql(spec.oracle, cols)
