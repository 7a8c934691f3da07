"""W4 late-data semantics — THE minefield the reference repo exists to
demonstrate [R: dupes readmitted after expiry / late arrivals near the
window edge]. Deterministic multi-batch replay: availableNow +
maxFilesPerTrigger=1 processes one file per micro-batch, so the
watermark advances between files and a too-late record in file 2 is
observably dropped."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import uuid

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_batches(spark, batches):
    d = tempfile.mkdtemp(prefix="late_data_")
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"
        )
        df.coalesce(1).write.parquet(os.path.join(d, f"b{i}.parquet"))
    return d


def _run_stream(spark, src_dir, build):
    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"
    files = sorted(
        os.path.join(src_dir, f) for f in os.listdir(src_dir) if f.endswith(".parquet")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_dir, "*.parquet"))
    )
    out = build(stream)
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(files) >= 2  # sanity: multi-batch replay
    return spark.table(name)


def test_late_event_dropped_from_closed_window(spark):
    """Batch 1 advances the watermark past 12:00-13:00; batch 2's
    12:05 straggler must NOT reopen the closed window."""
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)
    # Spark filters late INPUT with the PREVIOUS batch's watermark
    # (lenient) while EVICTING state with the current one — so a
    # straggler is only guaranteed-dropped once the watermark crossed
    # its window end a full batch earlier. A real minefield: "watermark
    # passed the window" is NOT the same batch the drop happens in.
    batch1 = [(1, m(5), 7, 1.0)]    # window 12:00
    batch2 = [(2, m(75), 7, 1.0)]   # 13:15 → wm advances to 13:05 ≥ 13:00
    batch3 = [(3, m(130), 7, 1.0)]  # wm for late-filter now 13:05
    batch4 = [(4, m(6), 7, 100.0)]  # LATE: window end 13:00 <= 13:05 → dropped
    d = _write_batches(spark, [batch1, batch2, batch3, batch4])

    def build(stream):
        return (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
            .select(F.col("w.start").alias("ws"), "n", "total")
        )

    rows = {r.ws: (r.n, r.total) for r in _run_stream(spark, d, build).collect()}
    noon = T0.replace(minute=0)
    # Append mode emits only closed windows; the 12:00 window closed
    # with exactly ONE event — the late 100.0-value straggler is gone.
    assert rows[noon] == (1, 1.0)


def test_on_time_event_within_grace_is_kept(spark):
    """An out-of-order event that is WITHIN the 10-minute grace when it
    arrives is aggregated normally (the other half of the contract)."""
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)
    batch1 = [(1, m(5), 7, 1.0), (2, m(20), 7, 1.0)]   # watermark → 12:10
    batch2 = [(3, m(15), 7, 5.0), (4, m(125), 7, 1.0)]  # 12:15 > watermark → kept
    d = _write_batches(spark, [batch1, batch2])

    def build(stream):
        return (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
            .select(F.col("w.start").alias("ws"), "n", "total")
        )

    rows = {r.ws: (r.n, r.total) for r in _run_stream(spark, d, build).collect()}
    noon = T0.replace(minute=0)
    assert rows[noon] == (3, 7.0)  # includes the out-of-order 12:15 event


def test_streaming_dedup_readmits_after_state_eviction(spark):
    """The reference's TTL-expiry readmission case, streaming form: a
    duplicate key arriving AFTER the watermark evicted its state is
    emitted again (dropDuplicatesWithinWatermark contract)."""
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)
    # State eviction runs at batch END, one batch after the watermark
    # crosses (state_ts + delay) — hence the extra advancing batch
    # before the readmission attempt (Spark eviction-lag semantics,
    # verified empirically; the guarantee is only "duplicates WITHIN the
    # delay are dropped", eviction beyond it is best-effort-later).
    batch1 = [(1, m(0), 7, 1.0)]
    batch2 = [(2, m(60), 8, 1.0)]   # wm → 12:50 > 12:10 expiry
    batch3 = [(3, m(65), 8, 2.0)]   # eviction phase runs with wm 12:50
    batch4 = [(4, m(70), 7, 1.0)]   # same key as 1, state gone → kept
    d = _write_batches(spark, [batch1, batch2, batch3, batch4])

    def build(stream):
        return stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
            ["user_id", "value"]
        )

    ids = sorted(r.event_id for r in _run_stream(spark, d, build).collect())
    assert ids == [1, 2, 3, 4]


def test_streaming_dedup_drops_duplicate_within_watermark(spark):
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)
    batch1 = [(1, m(0), 7, 1.0)]
    batch2 = [(2, m(4), 7, 1.0)]   # same key, within watermark → dropped
    d = _write_batches(spark, [batch1, batch2])

    def build(stream):
        return stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
            ["user_id", "value"]
        )

    ids = sorted(r.event_id for r in _run_stream(spark, d, build).collect())
    assert ids == [1]
