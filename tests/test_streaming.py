"""Structured Streaming ↔ batch parity for the windowed aggregation."""

from __future__ import annotations

from clusterforge_spark.operators.relational import window_sessionize
from clusterforge_spark.streaming.sessionize import run_sessionize_batchlike

from tests.conftest import SF_DIR


def test_stream_matches_batch(spark, events):
    stream_rows = {
        (r.user_id, r.hour_start_us): (r.events_in_hour, r.value_in_hour)
        for r in run_sessionize_batchlike(spark, SF_DIR).collect()
    }
    batch_rows = {
        (r.user_id, r.hour_start_us): (r.events_in_hour, r.value_in_hour)
        for r in window_sessionize(events).collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_stateful_gap_sessions_match_batch(spark, events):
    """Closed sessions from the stateful stream == batch sessions minus
    each user's final (still-open) session."""
    import pyspark.sql.functions as F

    from clusterforge_spark.operators.relational import sessionize_gap
    from clusterforge_spark.streaming.sessionize import run_gap_sessions_batchlike

    stream_rows = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events, r.session_value)
        for r in run_gap_sessions_batchlike(spark, SF_DIR).collect()
    }
    batch = sessionize_gap(events).collect()
    last_idx = {}
    for r in batch:
        last_idx[r.user_id] = max(last_idx.get(r.user_id, -1), r.session_idx)
    closed_batch = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events, r.session_value)
        for r in batch
        if r.session_idx != last_idx[r.user_id]
    }
    assert len(stream_rows) > 0
    assert stream_rows == closed_batch


def test_streaming_dedup_matches_batch_distinct(spark, events):
    from clusterforge_spark.streaming.sessionize import run_dedup_stream_batchlike

    out = run_dedup_stream_batchlike(spark, SF_DIR)
    stream_ids = {r.event_id for r in out.collect()}
    batch_ids = {r.event_id for r in events.select("event_id").distinct().collect()}
    assert stream_ids == batch_ids
