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
