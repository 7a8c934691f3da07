"""Streaming checkpoint recovery — the KS changelog-restore analog
[R KafkaStreams state restoration from changelog topics]: a restarted
query resumes from committed offsets and does NOT reprocess old input,
while stateful results stay consistent."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import functions as F

from minefields_kafka_streams_deduplication_spark.operators.stateless import peek

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"


def _write(spark, d, fname, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(os.path.join(d, fname))


def _run(spark, src, checkpoint, out_dir):
    """Parquet sink: the fault-tolerant path (memory sink cannot recover
    from a checkpoint — it raises; file sinks commit via the sink log)."""
    stream = spark.readStream.schema(SCHEMA).parquet(os.path.join(src, "*.parquet"))
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "value"]
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def test_restart_resumes_from_committed_offsets(spark):
    src = tempfile.mkdtemp(prefix="recov_src_")
    ckpt = tempfile.mkdtemp(prefix="recov_ckpt_")
    out = os.path.join(tempfile.mkdtemp(prefix="recov_out_"), "sink")
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)

    _write(spark, src, "b0.parquet", [(1, m(0), 7, 1.0), (2, m(1), 8, 2.0)])
    run1 = {r.event_id for r in _run(spark, src, ckpt, out).collect()}
    assert run1 == {1, 2}

    # New file arrives; restart with the SAME checkpoint: only the new
    # file is read (offset log), and dedup state survives the restart —
    # event 3 duplicates event 1's key and is dropped by RESTORED state;
    # events 1/2 are NOT duplicated in the sink (exactly-once commit log).
    _write(spark, src, "b1.parquet", [(3, m(2), 7, 1.0), (4, m(3), 9, 4.0)])
    run2 = sorted(r.event_id for r in _run(spark, src, ckpt, out).collect())
    assert run2 == [1, 2, 4], f"expected state-restored dedup + no reprocessing, got {run2}"


def test_windowed_agg_restart_no_reemission(spark):
    """W1/W4 recovery: a restarted append-mode windowed count must (a)
    not re-emit windows it already closed, and (b) close newly-eligible
    windows using RESTORED watermark state — emissions across both runs
    are disjoint and together equal the closed-window batch aggregate."""
    src = tempfile.mkdtemp(prefix="wrec_src_")
    ckpt = tempfile.mkdtemp(prefix="wrec_ckpt_")
    out = os.path.join(tempfile.mkdtemp(prefix="wrec_out_"), "sink")
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(os.path.join(src, "*.parquet"))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    # Run 1: hours 12 and 13 populated; watermark ends inside hour 13,
    # so only the hour-12 window closes and emits.
    _write(spark, src, "b0.parquet", [(1, m(0), 7, 1.0), (2, m(30), 7, 1.0), (3, m(70), 8, 1.0)])
    first = {(r.ws, r.n) for r in run()}
    assert first == {(T0, 2)}, first

    # Run 2 (restart from checkpoint): a late hour-13 event plus an
    # hour-15 event that pushes the watermark past hour 13's close.
    _write(spark, src, "b1.parquet", [(4, m(80), 9, 1.0), (5, m(195), 9, 1.0)])
    both = [(r.ws, r.n) for r in run()]
    assert len(both) == len(set(both)), f"re-emitted a closed window: {both}"
    assert set(both) == {
        (T0, 2),
        (T0 + dt.timedelta(hours=1), 2),
    }, both


def test_eos_sink_replays_partially_written_batch(spark):
    """EOS recovery depth (VERDICT r2 #6): foreachBatch delivery is
    at-least-once, so a crash can leave a batch directory PARTIALLY
    written (data files present, no _SUCCESS marker). The replay must
    treat that batch as uncommitted: overwrite the torn files, commit
    fully, and end with no duplicates and no loss; a second replay of a
    COMMITTED batch must be a no-op."""
    import glob

    from minefields_kafka_streams_deduplication_spark.sources.sinks import (
        write_idempotent_batch,
    )

    root = tempfile.mkdtemp(prefix="eos_replay_")
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)
    b0 = spark.createDataFrame([(1, m(0), 7, 1.0), (2, m(1), 8, 2.0)], SCHEMA)
    b1 = spark.createDataFrame([(3, m(2), 7, 3.0), (4, m(3), 9, 4.0)], SCHEMA)

    # Batch 0 commits cleanly.
    write_idempotent_batch(b0, root, 0)
    assert os.path.exists(os.path.join(root, "batch_id=0", "_SUCCESS"))

    # Simulate a crash mid-batch-1: stale partial data files on disk,
    # no _SUCCESS. (A torn write = some rows present, some missing,
    # possibly from an aborted task attempt with WRONG content.)
    dest1 = os.path.join(root, "batch_id=1")
    b1.limit(1).write.mode("overwrite").parquet(dest1)
    os.remove(os.path.join(dest1, "_SUCCESS"))
    assert glob.glob(os.path.join(dest1, "*.parquet")), "partial files staged"

    # Replay of the uncommitted batch must overwrite the torn state.
    write_idempotent_batch(b1, root, 1)
    got = sorted(
        r.event_id for r in spark.read.parquet(os.path.join(root, "batch_id=*")).collect()
    )
    assert got == [1, 2, 3, 4], f"torn batch not repaired: {got}"

    # Replaying a committed batch is a no-op — byte-identical output.
    files_before = sorted(glob.glob(os.path.join(dest1, "*")))
    mtimes_before = [os.path.getmtime(f) for f in files_before]
    write_idempotent_batch(b1, root, 1)
    files_after = sorted(glob.glob(os.path.join(dest1, "*")))
    assert files_after == files_before
    assert [os.path.getmtime(f) for f in files_after] == mtimes_before
    got2 = sorted(
        r.event_id for r in spark.read.parquet(os.path.join(root, "batch_id=*")).collect()
    )
    assert got2 == [1, 2, 3, 4]


def test_observe_peek_counts_during_execution(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id LONG, v DOUBLE")
    observed, obs = peek(
        df.filter(F.col("id") >= 4), "tap", F.count(F.lit(1)).alias("rows"),
        F.round(F.sum("v"), 4).alias("total"),
    )
    assert observed.count() == 6
    assert obs.get == {"rows": 6, "total": 39.0}


def test_foreach_batch_partitioned_upsert(spark):
    """foreachBatch + dynamic partition overwrite: output lands date-
    partitioned, and replaying the same input into a fresh checkpoint
    (simulating redelivery) leaves the layout unchanged (idempotent)."""
    from minefields_kafka_streams_deduplication_spark.streaming.sinks import (
        start_partitioned_upsert,
    )

    src = tempfile.mkdtemp(prefix="fb_src_")
    out = os.path.join(tempfile.mkdtemp(prefix="fb_out_"), "t")
    m = lambda d: dt.datetime(2024, 1, d, 10, 0, 0)
    _write(spark, src, "b0.parquet", [(1, m(1), 7, 1.0), (2, m(2), 8, 2.0)])

    stream = spark.readStream.schema(SCHEMA).parquet(os.path.join(src, "*.parquet"))
    q = start_partitioned_upsert(stream, out, tempfile.mkdtemp(prefix="fb_c1_"))
    q.awaitTermination()
    first = sorted((r.event_id, str(r.event_date)) for r in spark.read.parquet(out).collect())
    assert first == [(1, "2024-01-01"), (2, "2024-01-02")]

    # Redelivery: fresh checkpoint reprocesses everything; dynamic
    # overwrite rewrites the same partitions → identical layout.
    stream2 = spark.readStream.schema(SCHEMA).parquet(os.path.join(src, "*.parquet"))
    q2 = start_partitioned_upsert(stream2, out, tempfile.mkdtemp(prefix="fb_c2_"))
    q2.awaitTermination()
    second = sorted((r.event_id, str(r.event_date)) for r in spark.read.parquet(out).collect())
    assert second == first


def test_custom_ttl_state_survives_restart(spark):
    """D5 recovery: the applyInPandasWithState TTL dedup's per-key state
    (last forwarded timestamp) must be RESTORED on restart — a repeat
    inside the TTL that arrives in the second run is suppressed only if
    the first run's state came back from the checkpoint."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from minefields_kafka_streams_deduplication_spark.streaming.dedup_stream import (
        DEDUP_TTL_OUTPUT_SCHEMA,
        DEDUP_TTL_STATE_SCHEMA,
        TTL_KEY,
        _dedup_ttl_fn,
    )

    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    src = tempfile.mkdtemp(prefix="ttlrec_src_")
    ckpt = tempfile.mkdtemp(prefix="ttlrec_ckpt_")
    out = os.path.join(tempfile.mkdtemp(prefix="ttlrec_out_"), "sink")
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)

    def write(fname, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, fname)
        )

    def run():
        stream = (
            spark.readStream.schema(schema)
            .parquet(os.path.join(src, "*.parquet"))
            .select(
                "event_id",
                F.unix_micros("ts").alias("ts_us"),
                "user_id",
                "event_type",
                "value",
                F.col("ts"),
            )
            .withWatermark("ts", "10 minutes")
            .groupBy(*TTL_KEY)
            .applyInPandasWithState(
                _dedup_ttl_fn,
                outputStructType=DEDUP_TTL_OUTPUT_SCHEMA,
                stateStructType=DEDUP_TTL_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r.event_id for r in spark.read.parquet(out).collect())

    # Run 1: keeper at t0, repeat at +5 min (suppressed, TTL 30 min).
    write("b0.parquet", [(1, m(0), 7, "a", 1.0), (2, m(5), 7, "a", 1.0)])
    assert run() == [1]

    # Run 2 (restart): +20 min repeat is inside the RESTORED TTL state
    # and must stay suppressed; +45 min is past the TTL and forwards.
    write("b1.parquet", [(3, m(20), 7, "a", 1.0), (4, m(45), 7, "a", 1.0)])
    assert run() == [1, 4], "state not restored: the +20min repeat leaked"


def test_anomaly_welford_state_survives_restart(spark):
    """Streaming z-score recovery: the Welford (n, mean, m2) state must
    be RESTORED from the checkpoint — a spike arriving in the second
    run is only flagged if the first run's 10-event baseline came back;
    a fresh state would stay silent (n < minimum)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from minefields_kafka_streams_deduplication_spark.streaming.anomaly_stream import (
        ANOMALY_OUTPUT_SCHEMA,
        ANOMALY_STATE_SCHEMA,
        _anomaly_fn,
    )

    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"
    src = tempfile.mkdtemp(prefix="anorec_src_")
    ckpt = tempfile.mkdtemp(prefix="anorec_ckpt_")
    out = os.path.join(tempfile.mkdtemp(prefix="anorec_out_"), "sink")
    m = lambda minutes: T0 + dt.timedelta(minutes=minutes)

    def write(fname, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, fname)
        )

    def run():
        stream = (
            spark.readStream.schema(schema)
            .parquet(os.path.join(src, "*.parquet"))
            .select(
                "event_id",
                F.unix_micros("ts").alias("ts_us"),
                "user_id",
                "value",
                F.col("ts"),
            )
            .withWatermark("ts", "10 minutes")
            .groupBy("user_id")
            .applyInPandasWithState(
                _anomaly_fn,
                outputStructType=ANOMALY_OUTPUT_SCHEMA,
                stateStructType=ANOMALY_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    # Run 1: ten calm events build user 7's baseline. No anomaly yet.
    write("b0.parquet", [(i, m(i), 7, 10.0 + (i % 2)) for i in range(10)])
    assert run().count() == 0

    # Run 2 (restart from checkpoint): one spike. Flagged IFF the
    # restored state carries the 10-event baseline.
    write("b1.parquet", [(100, m(60), 7, 1000.0)])
    flagged = run().collect()
    assert [r.event_id for r in flagged] == [100]
    assert flagged[0].n_baseline == 10
