"""Real Structured Streaming runs (readStream → memory/foreachBatch sinks)
of the §2.9 jobs that the catalog checks in batch mode."""

import os

import pytest

from pyspark.sql import functions as F

from pdf_etl_pipeline_spark.session import load_events
from pdf_etl_pipeline_spark.streaming.jobs import (
    dedup_stream,
    read_event_stream,
    session_windows,
    upsert_stream,
    windowed_counts,
)


@pytest.fixture(scope="module")
def event_drop_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as micro-precision parquet drops (the stream source)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_events(spark, sf_dir).drop("ts_ns").coalesce(2).write.mode("overwrite").parquet(d)
    return d


def _run_to_memory(stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_windowed_counts_match_batch(spark, sf_dir, event_drop_dir):
    stream = read_event_stream(spark, event_drop_dir)
    _run_to_memory(windowed_counts(stream), "win_counts", mode="complete")
    got = {
        (r.ws, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in spark.sql(
            "SELECT unix_timestamp(w.start) ws, event_type, n_events, total_value FROM win_counts"
        ).collect()
    }
    batch = {
        (r.ws, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in windowed_counts(load_events(spark, sf_dir))
        .select(F.unix_timestamp("w.start").alias("ws"), "event_type", "n_events", "total_value")
        .collect()
    }
    assert got == batch


def test_streaming_session_windows_runs(spark, event_drop_dir):
    stream = read_event_stream(spark, event_drop_dir)
    _run_to_memory(session_windows(stream), "sess", mode="complete")
    rows = spark.sql("SELECT count(*) c FROM sess").collect()
    assert rows[0].c > 0


def test_streaming_dedup(spark, event_drop_dir):
    stream = read_event_stream(spark, event_drop_dir)
    _run_to_memory(dedup_stream(stream), "dedup")
    n = spark.sql("SELECT count(*) c, count(distinct event_id) d FROM dedup").collect()[0]
    assert n.c == n.d  # no duplicate event_ids survive


def test_foreach_batch_upsert_idempotent(spark, event_drop_dir, tmp_path):
    sink = str(tmp_path / "sink")
    stream = read_event_stream(spark, event_drop_dir)
    q = upsert_stream(stream, sink).start()
    q.awaitTermination(120)
    n1 = spark.read.parquet(sink).count()
    # re-run the whole stream from scratch → anti-join discards everything
    q2 = upsert_stream(read_event_stream(spark, event_drop_dir), sink).option(
        "checkpointLocation", os.path.join(str(tmp_path), "ckpt2")
    ).start()
    q2.awaitTermination(120)
    n2 = spark.read.parquet(sink).count()
    assert n1 == n2  # second pass inserted 0 (reference dedup semantics)


def test_stateful_user_totals_accumulates(spark, event_drop_dir):
    from pdf_etl_pipeline_spark.streaming.jobs import stateful_user_totals

    stream = read_event_stream(spark, event_drop_dir)
    q = (
        stateful_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_tot")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last emitted row per user == batch-mode aggregate (state accumulated
    # correctly across the maxFilesPerTrigger micro-batches)
    import pandas as pd

    got = spark.sql(
        "SELECT user_id, max_by(n_events, n_events) n, round(max_by(total_value, n_events), 4) t "
        "FROM state_tot GROUP BY user_id"
    ).toPandas().set_index("user_id").sort_index()
    batch = (
        stateful_user_totals(spark.read.parquet(event_drop_dir))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got["n"] == batch["n_events"]).all()
    assert (got["t"] - batch["total_value"].round(4)).abs().max() < 1e-6
