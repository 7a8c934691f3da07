"""P7 peek/foreach observability (SURVEY.md §2.2) — batch Observation
values and the streaming MetricsTap listener."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.operators.stateless import peek
from minefields_kafka_streams_deduplication_spark.streaming.observe import (
    MetricsTap,
    observe_stream,
)
from minefields_kafka_streams_deduplication_spark.streaming.source import (
    read_events_stream,
    run_to_memory,
)


def test_batch_peek_observes_exact_metrics(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    tapped, obs = peek(
        df, "tap_batch", F.count(F.lit(1)).alias("rows"), F.sum("v").alias("total")
    )
    assert tapped.count() == 10  # rows pass through untouched
    got = obs.get
    assert got["rows"] == 10
    assert got["total"] == 45


def test_peek_default_metric_is_row_count(spark):
    tapped, obs = peek(spark.range(7), "tap_default")
    tapped.collect()
    assert obs.get["rows"] == 7


def test_peek_query_is_pure_passthrough(spark, sf_dir):
    out = engine.get_queries()["peek_event_counts"](spark, sf_dir)
    plain = engine.load_table(spark, sf_dir, "events")
    assert out.count() == plain.count()
    assert out.columns == ["event_id", "event_type", "value"]


def test_streaming_metrics_tap_sees_all_rows(spark, sf_dir):
    tap = MetricsTap()
    spark.streams.addListener(tap)
    try:
        stream = read_events_stream(spark, sf_dir)
        tapped = observe_stream(
            stream, "stream_tap", F.count(F.lit(1)).alias("rows")
        )
        out = run_to_memory(tapped, "observe_tap_test")
        n = out.count()
        assert n > 0
        # Listener delivery is asynchronous; poll briefly.
        deadline = time.time() + 15
        while time.time() < deadline and tap.total("stream_tap", "rows") < n:
            time.sleep(0.2)
        assert tap.total("stream_tap", "rows") == n
    finally:
        spark.streams.removeListener(tap)
