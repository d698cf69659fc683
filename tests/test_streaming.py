"""Structured Streaming: finite drain must agree with the batch plans."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from ragflow_spark.streaming import (
    events_stream,
    run_to_memory,
    sessionize_stream,
    windowed_counts_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as a 4-file directory, TIME-RANGE partitioned
    (sessionize_stream's ordering contract: micro-batches arrive in
    non-decreasing event time, like ingested event logs). The file
    source reads part files in path order, and repartitionByRange
    assigns ascending ts ranges to ascending partition ids."""
    d = str(tmp_path_factory.mktemp("events_src"))
    shutil.rmtree(d, ignore_errors=True)
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(d)
    )
    # The file stream source picks up files in MODIFICATION-TIME order
    # (a bulk write leaves ties -> arbitrary order); stamp ascending
    # mtimes so batch order == event-time order, as it would be for
    # files landing from a live ingest.
    import glob
    import os
    import time

    t0 = time.time() - 1000
    for i, f in enumerate(sorted(glob.glob(f"{d}/part-*"))):
        os.utime(f, (t0 + i * 60, t0 + i * 60))
    return d


def test_windowed_counts_matches_batch(spark, sf_dir, events_dir, tmp_path):
    stream = windowed_counts_stream(events_stream(spark, events_dir))
    got = run_to_memory(stream, "wc_stream", str(tmp_path / "ckpt")).collect()

    import ragflow_spark.operators as ops

    want = ops.QUERIES["windowed_event_counts"](spark, sf_dir).collect()

    canon = lambda rows: sorted(
        (r["window_start"], r["event_type"], r["n"], round(r["total_value"], 4))
        for r in rows
    )
    assert canon(got) == canon(want)


def test_watermark_present_in_plan(spark, events_dir):
    stream = windowed_counts_stream(events_stream(spark, events_dir))
    assert stream.isStreaming
    assert "EventTimeWatermark" in stream._jdf.queryExecution().logical().toString()


def test_sessionize_stream_closed_sessions(spark, sf_dir, events_dir, tmp_path):
    """Drained stream emits every CLOSED session; each user's final
    (still-open) session stays in state. So per user:
    streamed = batch_n_sessions - 1, and total event coverage differs
    by exactly the open session's events."""
    stream = sessionize_stream(
        events_stream(spark, events_dir, max_files_per_trigger=2)
    )
    got = run_to_memory(
        stream, "sess_stream", str(tmp_path / "ckpt2"), output_mode="append"
    )
    streamed = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in got.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }

    import ragflow_spark.operators as ops

    batch = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in ops.QUERIES["sessionize"](spark, sf_dir).collect()
    }

    assert set(streamed) <= set(batch)
    for uid, (bn, _be) in batch.items():
        sn, _se = streamed.get(uid, (0, 0))
        assert sn == bn - 1, f"user {uid}: streamed {sn} vs batch {bn} sessions"

    # session integrity: no emitted session shorter than 1 event or
    # spanning a gap larger than the threshold internally
    rows = got.collect()
    assert all(r["n_events"] >= 1 for r in rows)
    assert all(r["session_end"] >= r["session_start"] for r in rows)
