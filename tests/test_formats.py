"""Source-format breadth: the engine's relations are format-agnostic —
the same events relation must round-trip through CSV, JSON and ORC with
identical contents (parquet is the canonical path everywhere else)."""

import pytest

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.session import load_events

FORMATS = ["csv", "json", "orc"]


@pytest.mark.parametrize("fmt", FORMATS)
def test_events_round_trip(spark, sf_dir, tmp_path, fmt):
    base = (
        load_events(spark, sf_dir)
        .drop("ts_ns")
        # epoch seconds: CSV/JSON have no native timestamp type, so the
        # round-trip is checked on an integer column both sides agree on
        .withColumn("ts_s", F.unix_timestamp("ts"))
        .drop("ts")
        .limit(200)
    )
    path = str(tmp_path / f"events_{fmt}")
    writer = base.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.format(fmt).save(path)

    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", True)
    if fmt in ("csv", "json"):  # text formats: schema is the contract, not inference
        reader = reader.schema(base.schema)
    got = reader.format(fmt).load(path)

    assert got.schema == base.schema
    key = lambda r: (r.event_id,)
    assert sorted(got.collect(), key=key) == sorted(base.collect(), key=key)


def test_schema_evolution_merge_read(spark, tmp_path):
    """S18: a table whose files were written under three evolving schemas
    (column added, column dropped) reads back as ONE unified relation
    with mergeSchema — absent columns null-fill per file, no rewrite of
    old files; and without mergeSchema the read silently keeps only the
    footer-sampled schema (the gotcha that motivates the option)."""
    import os

    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double")
    v3 = spark.createDataFrame([(3, 7.5, "x")], "id long, score double, extra string")
    v1.write.parquet(p + "/f=1")
    v2.write.parquet(p + "/f=2")
    v3.write.parquet(p + "/f=3")

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) >= {"id", "name", "score", "extra"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].name == "a" and rows[1].score is None and rows[1].extra is None
    assert rows[2].score == 9.5 and rows[2].extra is None
    assert rows[3].extra == "x" and rows[3].name is None
    # old files untouched: evolution is metadata-only
    n_files_before = sum(len(fs) for _, _, fs in os.walk(p))
    _ = merged.count()
    assert sum(len(fs) for _, _, fs in os.walk(p)) == n_files_before
