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

from ..registry import query
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

    Record headers [R ProcessorContext#headers; SURVEY.md §1.1]: Kafka's
    source emits `headers` as ARRAY<STRUCT<key STRING, value BINARY>>
    (with `includeHeaders`); we surface them as the declared
    MAP<STRING, BINARY> via `map_from_entries` (last entry wins on
    duplicate keys, matching Headers#lastHeader lookup). Frames without
    a headers column get an empty map, so the output schema is stable.
    """
    has_headers = "headers" in raw.columns
    cols = [F.from_json(F.col(value_col).cast("string"), EVENT_PAYLOAD_SCHEMA).alias("e")]
    if has_headers:
        cols.append(F.col("headers"))
    parsed = raw.select(*cols)
    if has_headers:
        # Keep only the LAST entry per key before building the map —
        # map_from_entries throws on duplicate keys (default
        # mapKeyDedupPolicy=EXCEPTION) and Kafka allows repeated header
        # keys. O(n²) per record is fine: header lists are tiny.
        headers = F.map_from_entries(
            F.expr(
                "filter(headers, (h, i) -> NOT exists("
                "slice(headers, i + 2, size(headers) - i - 1), "
                "h2 -> h2.key = h.key))"
            )
        )
    else:
        headers = F.map_from_entries(
            F.array().cast("array<struct<key:string,value:binary>>")
        )
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.timestamp_micros(F.col("e.ts_us")).alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
        headers.alias("headers"),
    )


def events_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming events table from a Kafka topic. Same columns as the
    parquet fixture — swap this for `read_events_stream` and every
    query/dedup/window downstream runs unchanged.

    ``max_offsets_per_trigger`` caps records per micro-batch (the
    backpressure knob a production ingest always sets); left None the
    source takes whatever is available. The env-gated integration test
    (tests/test_sources.py::test_kafka_live_roundtrip_env_gated, active
    when KAFKA_BOOTSTRAP is set) drives this path against a real
    broker; in broker-less containers the wire serde is still proven
    bit-exact by kafka_wire_roundtrip."""
    tune(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", "true")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_event_payload(reader.load())


def serialize_event_payload(events: DataFrame) -> DataFrame:
    """Encode typed event rows back into the Kafka wire shape — the
    produce-side serde [R KStream#to(topic, Produced.with(serdes))]:
    key = user_id bytes (the partitioning key, so co-partitioning
    survives the round-trip), value = JSON payload bytes, headers
    MAP<STRING,BINARY> → ARRAY<STRUCT<key,value>> (the sink format the
    kafka writer expects), timestamp from event time.
    """
    has_headers = "headers" in events.columns
    headers = (
        F.expr("transform(map_entries(headers), h -> struct(h.key as key, h.value as value))")
        if has_headers
        else F.array().cast("array<struct<key:string,value:binary>>")
    )
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                "event_id",
                F.unix_micros("ts").alias("ts_us"),
                "user_id",
                "event_type",
                "value",
                "props",
            )
        )
        .cast("binary")
        .alias("value"),
        headers.alias("headers"),
        F.col("ts").alias("timestamp"),
    )


@query("kafka_wire_roundtrip")  # rows-only: binary serde, no SQL oracle
def kafka_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S4 serde proof without a broker: events → produce-side wire
    frame (`serialize_event_payload`) → consume-side parser
    (`parse_event_payload`) must reproduce the typed rows bit-exactly
    (asserted in tests/test_sources.py). Registered so the driver
    exercises the full serde pair; both directions are pure codegen
    expressions (from_json/to_json), zero Python.
    """
    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    wire = serialize_event_payload(ev)
    return parse_event_payload(wire).drop("headers")


def events_to_kafka(
    events: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
):
    """Streaming Kafka sink [R KStream#to(topic, Produced.with(serdes))]:
    serializes typed event rows through `serialize_event_payload` (the
    same serde pair `kafka_wire_roundtrip` proves bit-exact) and starts
    the streaming write. Untestable here (no broker in this container)
    for the same reason as `events_from_kafka`; on a cluster this is
    the only line that changes between file-replay and live-topic
    deployments. Returns the StreamingQuery.
    """
    wire = serialize_event_payload(events)
    return (
        wire.selectExpr("key", "value", "headers")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("includeHeaders", "true")
        .option("checkpointLocation", checkpoint)
        .start()
    )
