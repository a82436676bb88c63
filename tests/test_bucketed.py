"""S12 bucketed co-located join: the on-disk layout replaces the shuffle.

Asserts the property SCALE.md claims, on the physical plan itself: joining
two tables bucketed on the join key produces NO Exchange above either scan,
while the identical join over plain parquet exchanges both sides — and both
plans return identical results.
"""

import os

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.operators.bucketed import bucketed_equi_join, write_bucketed
from pdf_etl_pipeline_spark.session import load_table


def _executed_plan(df) -> str:
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    write_bucketed(orders, "s12_orders", "o_orderkey", 8, str(tmp_path / "o"))
    write_bucketed(lineitem, "s12_lineitem", "l_orderkey", 8, str(tmp_path / "l"))

    # disable auto-broadcast so the join shape is decided by the bucket
    # layout, not the small test-data size; restore afterwards
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_equi_join(
            spark, "s12_orders", "s12_lineitem", "o_orderkey", "l_orderkey"
        ).groupBy("o_orderstatus").agg(F.count("*").alias("n"))
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        # the join's distribution requirement is met by the on-disk buckets:
        # neither side may hash-exchange on its join key (the only exchange
        # left in the plan is the groupBy's, on o_orderstatus)
        assert "hashpartitioning(o_orderkey" not in plan
        assert "hashpartitioning(l_orderkey" not in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan

        plain = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus")
            .join(
                load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plain_plan = _executed_plan(plain)
        # the un-bucketed twin of the same join DOES shuffle both sides
        assert "hashpartitioning(o_orderkey" in plain_plan
        assert "hashpartitioning(l_orderkey" in plain_plan

        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS s12_orders")
        spark.sql("DROP TABLE IF EXISTS s12_lineitem")


def test_bucketed_scan_prunes_buckets(spark, sf_dir, tmp_path):
    """A point predicate on the bucket key reads one bucket, not the table:
    the scan reports SelectedBucketsCount 1 out of 8. (The planner's
    auto-bucketed-scan heuristic drops bucket info when nothing downstream
    needs the distribution, so pin it on for the probe — at scale a point
    probe on a fact table is exactly where the 1/n-bucket read pays.)"""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(orders, "s12_probe", "o_orderkey", 8, str(tmp_path / "p"))
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        some_key = orders.select(F.min("o_orderkey")).first()[0]
        probe = spark.table("s12_probe").filter(F.col("o_orderkey") == some_key)
        plan = _executed_plan(probe)
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert probe.count() == orders.filter(F.col("o_orderkey") == some_key).count()
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
        spark.sql("DROP TABLE IF EXISTS s12_probe")
