"""Streaming semantics: batch-vs-stream parity (SURVEY.md §5.2.3) and
the D4/D5 state behaviors, on the sf0.001 fixture."""

from __future__ import annotations

import pytest

import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.streaming.dedup_stream import (
    BUSINESS_KEY,
)


@pytest.fixture(scope="module")
def stream_dedup_rows(spark, sf_dir):
    df = engine.get_queries()["dedup_stream_watermark"](spark, sf_dir)
    return df.collect()


def test_stream_dedup_produces_rows(stream_dedup_rows):
    assert len(stream_dedup_rows) > 0


def test_stream_dedup_key_unique(stream_dedup_rows):
    keys = [(r.user_id, r.event_type, r.value) for r in stream_dedup_rows]
    assert len(keys) == len(set(keys))


def test_batch_stream_parity_on_distinct_keys(spark, sf_dir, stream_dedup_rows):
    """With availableNow over a single batch, every distinct business key
    must survive exactly once — same key-set as batch dedup (D2)."""
    batch = engine.get_queries()["dedup_keep_first"](spark, sf_dir).collect()
    batch_keys = {(r.user_id, r.event_type, r.value) for r in batch}
    stream_keys = {(r.user_id, r.event_type, r.value) for r in stream_dedup_rows}
    assert batch_keys == stream_keys


def test_custom_ttl_stream_runs(spark, sf_dir):
    rows = engine.get_queries()["dedup_stream_custom_ttl"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 1000


def test_custom_ttl_batch_stream_parity(spark, sf_dir):
    stream_ids = sorted(
        r.event_id
        for r in engine.get_queries()["dedup_stream_custom_ttl"](spark, sf_dir).collect()
    )
    batch_ids = sorted(
        r.event_id
        for r in engine.get_queries()["dedup_batch_custom_ttl"](spark, sf_dir).collect()
    )
    assert stream_ids == batch_ids


def test_windowed_stream_aggregation(spark, sf_dir):
    rows = engine.get_queries()["window_tumbling_stream"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.n_events > 0 for r in rows)


def test_stream_interval_join_matches_batch(spark, sf_dir):
    stream = engine.get_queries()["join_interval_stream"](spark, sf_dir).collect()
    batch = engine.get_queries()["join_interval_view_purchase"](spark, sf_dir).collect()
    stream_pairs = {(r.view_id, r.purchase_id) for r in stream}
    batch_pairs = {(r.view_id, r.purchase_id) for r in batch}
    assert stream_pairs == batch_pairs
