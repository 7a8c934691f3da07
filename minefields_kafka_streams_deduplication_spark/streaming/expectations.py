"""Per-micro-batch expectations gate with a quarantine path.

The streaming twin of ``functions/pipeline.validate_expectations``
(VERDICT r5 #7) — completing the ingestion-gate pair next to the drift
monitor (drift.py): every micro-batch is validated against a
declarative rule suite in ONE map-side-combined aggregate; a batch
with any violation is DIVERTED to a quarantine sink untouched (so an
operator can inspect/replay it), a clean batch is promoted to the
serving sink. The gate-then-promote pattern a production ingest runs
in front of a training-data lake.

Scale shape: the per-batch check is one aggregate over the batch (no
second scan — the violation counts for ALL rules fold into one pass,
same as the batch suite); routing writes the batch exactly once to
one of two append-only parquet sinks. Gate state is rule-bounded: the
report is one row per (batch, rule-set) — nothing grows with data.
Batch granularity (not row-splitting) is deliberate: a violating batch
usually signals an upstream incident, and promoting its clean rows
while quarantining the rest would tear apart an atomic ingest unit.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

__all__ = ["run_expectations_gate", "EXPECT_EVENT_RULES"]

# Rule = (name, violation predicate as a SQL boolean expression).
EXPECT_EVENT_RULES: list[tuple[str, str]] = [
    ("value_not_null", "value IS NULL"),
    ("value_non_negative", "value < 0"),
    ("user_id_not_null", "user_id IS NULL"),
    ("ts_not_null", "ts IS NULL"),
]


def run_expectations_gate(
    spark: SparkSession,
    stage_dir: str,
    schema: str,
    rules: list[tuple[str, str]],
    promoted_dir: str,
    quarantine_dir: str,
) -> list[tuple[int, int, int, str]]:
    """Replay ``stage_dir`` one file per micro-batch through the gate.
    Returns the per-batch report [(batch_id, n_rows, n_violations,
    'promoted'|'quarantined')] in batch order; the batches' rows land
    in ``promoted_dir`` / ``quarantine_dir`` accordingly."""
    from ..sources.sinks import write_idempotent_batch

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    report: list[tuple[int, int, int, str]] = []
    reported: set[int] = set()

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        counts = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.when(F.expr(pred), 1).otherwise(0))
                .cast("long")
                .alias(f"r{i}")
                for i, (_name, pred) in enumerate(rules)
            ],
        ).first()
        n = counts["n"]
        if n == 0:
            return
        n_viol = sum(counts[f"r{i}"] for i in range(len(rules)))
        # foreachBatch delivery is at-least-once: a checkpointed
        # availableNow restart re-runs the last uncommitted batch, so
        # both the sink write and the report entry must be idempotent
        # (ADVICE r6) — batchId-addressed _SUCCESS-gated directories
        # (the EOS sink's discipline) plus a batch-id dedupe on the
        # report keep the conservation invariant under replay.
        dest, status = (
            (quarantine_dir, "quarantined") if n_viol > 0 else (promoted_dir, "promoted")
        )
        write_idempotent_batch(batch_df, dest, batch_id)
        if batch_id not in reported:
            reported.add(batch_id)
            report.append((batch_id, n, int(n_viol), status))

    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_gate_{uuid.uuid4().hex[:8]}_")
    try:
        q = (
            stream.writeStream.foreachBatch(gate)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(checkpoint, ignore_errors=True)
    return sorted(report)


@query("validate_stream_gate")  # rows-only: per-micro-batch routing harness
def validate_stream_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate over a 4-slice time-ordered replay of the events
    fixture, with slice 2 deliberately POISONED (its values nulled —
    the synthetic upstream incident): the report must show slices
    0/1/3 promoted and slice 2 quarantined with its full row count as
    violations. Conservation (promoted + quarantined = input) and
    untouched-quarantine-bytes are pinned in tests/test_streaming.py.
    """
    from .punctuate import stage_events_ordered

    import datetime as dt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    # Poison bounds replicate stage_events_ordered's slice-2 cut
    # arithmetic EXACTLY (float-second cuts), so the nulled rows are
    # precisely the third micro-batch.
    span = (hi - lo).total_seconds() or 1.0
    c2 = lo + dt.timedelta(seconds=span * 2 / 4)
    c3 = lo + dt.timedelta(seconds=span * 3 / 4)
    poisoned = ev.withColumn(
        "value",
        F.when(
            (F.col("ts") >= F.lit(c2)) & (F.col("ts") < F.lit(c3)),
            F.lit(None).cast("double"),
        ).otherwise(F.col("value")),
    )
    stage = tempfile.mkdtemp(prefix="gate_stage_")
    promoted = tempfile.mkdtemp(prefix="gate_promoted_")
    quarantine = tempfile.mkdtemp(prefix="gate_quarantine_")
    try:
        stage_events_ordered(poisoned, stage, n_slices=4)
        report = run_expectations_gate(
            spark,
            stage,
            "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE",
            EXPECT_EVENT_RULES,
            promoted,
            quarantine,
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(promoted, ignore_errors=True)
        shutil.rmtree(quarantine, ignore_errors=True)
    return spark.createDataFrame(
        report, "batch_id LONG, n_rows LONG, n_violations LONG, status STRING"
    )
