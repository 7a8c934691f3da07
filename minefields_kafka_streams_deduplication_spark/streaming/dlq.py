"""Streaming dead-letter routing — the RUNNING-topology form of the
batch-proved DLQ serde (sources/kafka.parse_event_payload_routed),
[R o.a.k.streams.errors.DeserializationExceptionHandler /
LogAndContinueExceptionHandler wired into a live StreamsBuilder#stream
→ two sinks] (reconstructed public API surface — SURVEY.md §0).

One ``readStream`` over the wire-shaped topic replay; each micro-batch
splits through ONE parse into (good → typed parquet, dead → DLQ parquet
with the ORIGINAL key/value bytes untouched plus the routing reason).
Both sinks are batchId-addressed, ``_SUCCESS``-gated directories (the
expectations gate's / EOS sink's discipline), so foreachBatch's
at-least-once delivery yields exactly-once sink contents — a crashed
and replayed batch skips the halves it already committed.

100 TB story: the parse and the split are per-batch narrow codegen (no
shuffle, no Python); sink writes are partition-parallel appends. DLQ
volume is incident-bounded, not data-sized, and nothing here holds
state — the checkpoint tracks source offsets only, so a poisoned topic
at any scale streams through at scan cost.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

__all__ = ["run_dlq_stream", "WIRE_STREAM_SCHEMA"]

# The staged wire replay carries event time alongside the raw bytes so
# the existing time-ordered stager can slice it; the router drops it.
WIRE_STREAM_SCHEMA = "ts TIMESTAMP, key BINARY, value BINARY"


def run_dlq_stream(
    spark: SparkSession,
    stage_dir: str,
    good_dir: str,
    dlq_dir: str,
    checkpoint: str,
) -> None:
    """Replay ``stage_dir`` (wire-shaped parquet, one file per
    micro-batch) through the routed parser into the two sinks.
    Idempotent under replay: each batch's halves land in
    batchId-addressed ``_SUCCESS``-gated directories, so re-delivery
    (fresh checkpoint over the same staged files, or a crash between
    the two writes) never duplicates a committed half."""
    from ..sources.kafka import parse_event_payload_routed
    from ..sources.sinks import write_idempotent_batch

    stream = (
        spark.readStream.schema(WIRE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )

    def route(batch_df: DataFrame, batch_id: int) -> None:
        wire = batch_df.drop("ts")
        good, dead = parse_event_payload_routed(wire)
        write_idempotent_batch(good, good_dir, batch_id)
        write_idempotent_batch(dead, dlq_dir, batch_id)

    q = (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def corrupted_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture on the wire with the SAME deterministic corruption
    as the batch witness (kafka_wire_dlq_routing): event_id % 97 →
    truncated bytes (malformed JSON), event_id % 101 → valid JSON
    missing every required field. Event time rides along for the
    time-ordered stager."""
    from ..sources.kafka import serialize_event_payload

    ev = load_table(spark, sf_dir, "events")
    wire = serialize_event_payload(ev).select("timestamp", "key", "value")
    wire_id = F.get_json_object(
        F.col("value").cast("string"), "$.event_id"
    ).cast("long")
    return wire.select(
        F.col("timestamp").alias("ts"),
        "key",
        F.when(wire_id % 97 == 0, F.lit('{"event_id": 12,').cast("binary"))
        .when(
            wire_id % 101 == 0,
            F.to_json(F.struct(F.lit("orphan").alias("event_type"))).cast(
                "binary"
            ),
        )
        .otherwise(F.col("value"))
        .alias("value"),
    )


@query("kafka_stream_dlq_routing")  # rows-only: a real availableNow
# two-sink stream; conservation, byte preservation and double-replay
# idempotence are pinned in tests/test_streaming.py (the batch twin
# kafka_wire_dlq_routing carries the oracle for the same counts)
def kafka_stream_dlq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming DLQ end to end: corrupt wire staged as a
    time-ordered 3-slice replay, routed per micro-batch into the two
    idempotent sinks, and the per-reason record counts recomputed FROM
    THE SINKS (not the stream) — so a lost batch half, a double-write,
    or a mis-routed record changes the output. Matches
    kafka_wire_dlq_routing's (reason, n_records) shape."""
    from .punctuate import stage_events_ordered

    stage = tempfile.mkdtemp(prefix="dlq_stage_")
    good_dir = tempfile.mkdtemp(prefix="dlq_good_")
    dlq_dir = tempfile.mkdtemp(prefix="dlq_dead_")
    ckpt = tempfile.mkdtemp(prefix="dlq_ckpt_")
    try:
        stage_events_ordered(corrupted_wire(spark, sf_dir), stage, n_slices=3)
        run_dlq_stream(spark, stage, good_dir, dlq_dir, ckpt)
        ok = (
            spark.read.parquet(good_dir)
            .agg(F.count(F.lit(1)).alias("n_records"))
            .select(F.lit("ok").alias("reason"), F.col("n_records").cast("long"))
        )
        dlq = (
            spark.read.parquet(dlq_dir)
            .groupBy("reason")
            .agg(F.count(F.lit(1)).cast("long").alias("n_records"))
        )
        rows = dlq.unionByName(ok).orderBy("reason").collect()
    finally:
        for d in (stage, good_dir, dlq_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, "reason STRING, n_records LONG")
