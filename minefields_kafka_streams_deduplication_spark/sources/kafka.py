"""Kafka source wiring — the reference's native ingress
[R StreamsBuilder#stream(topic, Consumed.with(serdes, timestampExtractor))].

No broker exists in this container, so `events_from_kafka` cannot be
integration-tested here; the JSON payload parser it delegates to
(`parse_event_payload`) is pure DataFrame logic, unit-tested on static
data (tests/test_sources.py). On a real cluster this is the only
function that changes between file-replay and live-topic deployments —
every downstream operator is identical, which is the point of
Structured Streaming's unified API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune

# JSON payload schema of an event record on the topic (value side).
EVENT_PAYLOAD_SCHEMA = (
    "event_id LONG, ts_us LONG, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def parse_event_payload(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode a Kafka-shaped frame (binary key/value) into typed event
    rows: the serde layer [R Serdes.String + JSON POJO mapping].

    Event time comes from the payload (`ts_us`, µs epoch) — the analog
    of a custom TimestampExtractor — falling back to broker append time
    would just mean keeping the `timestamp` column instead.
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), EVENT_PAYLOAD_SCHEMA).alias("e")
    )
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.timestamp_micros(F.col("e.ts_us")).alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
    )


def events_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming events table from a Kafka topic. Same columns as the
    parquet fixture — swap this for `read_events_stream` and every
    query/dedup/window downstream runs unchanged."""
    tune(spark)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_event_payload(raw)
