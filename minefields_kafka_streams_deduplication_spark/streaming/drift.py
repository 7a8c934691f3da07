"""Streaming drift monitor: per-micro-batch PSI against a frozen
baseline histogram — the online form of
`functions.pipeline.drift_report_value_psi`.

A production ingestion stream computes each arriving batch's value
distribution and scores it against the accepted baseline BEFORE the
batch is promoted; a PSI spike triggers quarantine. The Spark-first
shape: the baseline histogram is a tiny broadcast-able dict captured in
the `foreachBatch` closure (cell-cardinality-bounded, never data-sized),
each micro-batch runs ONE map-side-combined bucket count (JVM
aggregate), and only the ~10 cell rows reach the driver for the PSI
arithmetic — per-row work never touches Python.
"""

from __future__ import annotations

import math
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

DRIFT_STREAM_BUCKETS = 10


def _bucket_col(vmin: float, vmax: float, k: int):
    return F.least(
        F.lit(k - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("value") - vmin) / (vmax - vmin) * k).cast("int"),
        ),
    )


def psi_of_counts(base: dict[int, int], cur: dict[int, int], k: int) -> float:
    """PSI between two cell-count dicts, Laplace-smoothed (+0.5/cell) —
    the same arithmetic as the batch oracle, reused by tests as the
    reference."""
    tb = sum(base.values()) + k / 2.0
    tc = sum(cur.values()) + k / 2.0
    psi = 0.0
    for b in range(k):
        pb = (base.get(b, 0) + 0.5) / tb
        pc = (cur.get(b, 0) + 0.5) / tc
        psi += (pc - pb) * math.log(pc / pb)
    return psi


def run_drift_monitor(
    spark: SparkSession,
    stage_dir: str,
    baseline: dict[int, int],
    vmin: float,
    vmax: float,
    k: int = DRIFT_STREAM_BUCKETS,
) -> list:
    """Replay ``stage_dir`` one file per micro-batch and score each
    batch's value histogram against ``baseline``. Returns
    [(batch_id, n_rows, psi)] in batch order."""
    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    results: list = []

    def score(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.groupBy(_bucket_col(vmin, vmax, k).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        cur = {r.bucket: r.n for r in rows}
        n = sum(cur.values())
        if n:
            results.append((batch_id, n, psi_of_counts(baseline, cur, k)))

    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_drift_{uuid.uuid4().hex[:8]}_")
    try:
        q = (
            stream.writeStream.foreachBatch(score)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(checkpoint, ignore_errors=True)
    return sorted(results)


@query("drift_stream_psi")  # rows-only: per-micro-batch emission timing
def drift_stream_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online drift scoring over the events fixture: the first half (by
    time) freezes the baseline histogram; the second half replays as
    time-ordered micro-batches, each scored with its PSI against that
    baseline. On the stationary fixture every batch's PSI is small; the
    spike behavior on an actually drifting stream is pinned in
    tests/test_streaming.py with a crafted corpus."""
    from .punctuate import stage_events_ordered

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    b = ev.agg(
        F.min("value"), F.max("value"),
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts")),
    ).collect()[0]
    vmin, vmax, tmin, tmax = float(b[0]), float(b[1]), b[2], b[3]
    mid = tmin + (tmax - tmin) // 2
    k = DRIFT_STREAM_BUCKETS
    baseline = {
        r.bucket: r.n
        for r in ev.filter(F.unix_micros("ts") <= mid)
        .groupBy(_bucket_col(vmin, vmax, k).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    stage = tempfile.mkdtemp(prefix="drift_stage_")
    try:
        stage_events_ordered(ev.filter(F.unix_micros("ts") > mid), stage)
        rows = run_drift_monitor(spark, stage, baseline, vmin, vmax, k)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return spark.createDataFrame(
        rows, "batch_id LONG, n_rows LONG, psi DOUBLE"
    )
