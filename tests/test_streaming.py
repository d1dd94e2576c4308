"""Streaming batch-equivalence tests (SURVEY §5: run the same agg in batch
and via Trigger.AvailableNow streaming over the events fixture, compare)."""

import pytest

from keystone_spark.sources import load_table
from keystone_spark.streaming.windows import (
    dedup_within_watermark,
    read_events_stream,
    run_available_now,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, "events", sf_dir)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_batch_vs_stream(spark, sf_dir, events):
    batch = tumbling_window_agg(events, duration="1 hour")
    stream_in = read_events_stream(spark, f"{sf_dir}/events.parquet")
    streamed = tumbling_window_agg(stream_in, duration="1 hour", watermark="2 hours")
    run_available_now(streamed, "tumbling_out")
    got = spark.sql("SELECT * FROM tumbling_out")
    assert _rows(got) == _rows(batch)


def test_sliding_window_counts(events):
    out = sliding_window_agg(events, duration="2 hours", slide="1 hour")
    rows = out.collect()
    assert len(rows) > 0
    # every event lands in exactly duration/slide = 2 windows
    total_events = events.count()
    assert sum(r.c for r in rows) == 2 * total_events


def test_session_window_batch_vs_stream(spark, sf_dir, events):
    batch = session_window_agg(events, gap="30 minutes")
    stream_in = read_events_stream(spark, f"{sf_dir}/events.parquet")
    streamed = session_window_agg(stream_in, gap="30 minutes", watermark="1 hour")
    run_available_now(streamed, "session_out")
    got = spark.sql("SELECT * FROM session_out")
    assert _rows(got) == _rows(batch)


def test_dedup_within_watermark_batch_path(events):
    d = dedup_within_watermark(events, ["user_id", "event_type"])
    assert d.count() == events.select("user_id", "event_type").distinct().count()
