"""Wall-clock punctuator (SURVEY.md §2 gap #2) — processing-time-driven
emission, the twin of the event-time family in windows_stream.py.

[R o.a.k.streams.processor.ProcessorContext#schedule(interval,
 PunctuationType.WALL_CLOCK_TIME, punctuator)] (reconstructed public
API surface — SURVEY.md §0; the reference checkout is empty).

Kafka Streams offers two punctuation clocks: STREAM_TIME (event-time,
advanced by records — our watermark-driven window emitters) and
WALL_CLOCK_TIME (host clock, fires regardless of traffic). Structured
Streaming's native analogs, both used here:

1. The **trigger** IS a topology-wide wall-clock punctuation:
   ``trigger(processingTime="Xs")`` runs a micro-batch every X seconds
   of host time whether or not data arrived.
2. Per-key scheduled callbacks map to
   ``GroupStateTimeout.ProcessingTimeTimeout``: a key arms a host-clock
   timer; when it expires the state function is invoked for that key
   with NO input rows and ``state.hasTimedOut`` set — exactly a
   punctuator callback with access to the key's state.

The operator here is the canonical wall-clock-punctuator use case:
accumulate per-key counts silently and FLUSH each key's snapshot only
when its host-clock timer fires (emit-on-punctuate, nothing emitted on
data). Spark's processing-time timeout is "interval after the key's
last update" (timers reset on activity) rather than a fixed metronome —
the practical difference from KS, documented and pinned by test: every
emitted snapshot proves ``emit_wall - last_update_wall >= interval``.

Scale: one shuffle on the grouping key; state is (count, two clocks)
per live key; timed-out keys are deleted, so state size tracks ACTIVE
keys, not history. The snapshot stream is tiny (one row per key per
punctuation) — the classic periodic-flush topology.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid
from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import load_table
from ..registry import query

# Host-clock punctuation interval. Small so the driver/bench run
# converges in seconds; a deployment would schedule minutes.
PUNCTUATE_INTERVAL_MS = 700

PUNCT_STATE_SCHEMA = "n LONG, first_wall_us LONG, last_wall_us LONG"
PUNCT_OUTPUT_SCHEMA = (
    "event_type STRING, n LONG, last_update_wall_us LONG, emit_wall_us LONG"
)
_SENTINEL = "__punct_sentinel__"


def _staged_partitions(spark: SparkSession, stage_dir: str) -> int:
    """Size-aware state-partition pick for staged-replay harnesses —
    the stage-dir twin of source.stream_partitions: small stages run
    fastest on few state stores (fixed per-store commit cost), big
    ones need the parallelism. Measured on the 10× suppress stage
    (1M rows, 8.4 MB staged): 66-79 s on 4 partitions → 24-25 s on 32
    (interleaved A/B, min-of-2 each); fixture stages (<1 MB) measure
    ~2× FASTER on 4 than 32. The 4 MB cut separates those regimes."""
    import glob as _glob

    size = sum(
        os.path.getsize(f) for f in _glob.glob(os.path.join(stage_dir, "*.parquet"))
    )
    if size < 4 * 1024 * 1024:
        return 4
    return spark.sparkContext.defaultParallelism


def make_punctuate_fn(interval_ms: int = PUNCTUATE_INTERVAL_MS):
    """Build the per-key state function for a given punctuation
    interval. Counts rows per key; emits ONLY when the wall-clock timer
    fires.

    On timeout the key's snapshot is flushed and the state deleted —
    if the key stays active it re-registers and a later punctuation
    flushes the next delta, so ``sum(n)`` over all snapshots equals the
    total rows seen for the key regardless of how punctuations
    interleave with data (the invariant the oracle checks).
    """

    def _punctuate_fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        now_us = int(time.time() * 1_000_000)
        if state.hasTimedOut:
            n, _first, last = state.get
            state.remove()
            yield pd.DataFrame(
                [[key[0], n, last, now_us]],
                columns=["event_type", "n", "last_update_wall_us", "emit_wall_us"],
            )
            return
        add = sum(len(pdf) for pdf in pdfs)
        if state.exists:
            n, first, _last = state.get
            state.update((n + add, first, now_us))
        else:
            state.update((add, now_us, now_us))
        # Re-arm on every update: Spark clears a key's timer each time
        # its function runs, so this is "punctuate INTERVAL after last
        # activity". The armed timestamp is absolute and checkpointed
        # with the state, so a pending punctuation survives restart
        # (pinned by tests/test_streaming.py's restart test).
        state.setTimeoutDuration(interval_ms)
        return

    return _punctuate_fn


def punctuated_counts_stream(
    events_stream: DataFrame, interval_ms: int = PUNCTUATE_INTERVAL_MS
) -> DataFrame:
    """events stream -> wall-clock-punctuated per-type count snapshots."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        make_punctuate_fn(interval_ms),
        outputStructType=PUNCT_OUTPUT_SCHEMA,
        stateStructType=PUNCT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_punctuated(
    spark: SparkSession,
    stage_dir: str,
    schema: str,
    expected_total: int,
    timeout_s: float = 120.0,
    interval_ms: int = PUNCTUATE_INTERVAL_MS,
) -> DataFrame:
    """Drive the punctuated topology until every accumulated row has
    been flushed by a host-clock punctuation, then stop.

    A ``processingTime`` trigger keeps micro-batches firing on the host
    clock; because the stateful operator holds processing-time timers,
    Spark schedules batches even with no new input, so pending timers
    drain without traffic. Belt-and-braces for an idle scheduler: if
    the flushed total stalls, drop a sentinel row into the source
    directory to force a batch (filtered back out below) — the harness
    then converges on any scheduler behavior.

    ``stage_dir`` is CONSUMED by the harness: sentinel rows may be
    appended to it permanently, so callers must stage into a scratch
    dir they own and delete afterwards (both registered call sites do).
    The sentinel row is built generically from ``schema`` — every
    string field carries the sentinel marker, every other field NULL —
    so multi-column stages work and downstream filters on any string
    key column drop it.
    """
    from pyspark.sql.types import StringType, StructType

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    sentinel_row = tuple(
        _SENTINEL if isinstance(f.dataType, StringType) else None
        for f in st.fields
    )
    name = f"punct_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        stage_dir
    )
    snapshots = punctuated_counts_stream(stream, interval_ms)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_staged_partitions(spark, stage_dir))
    )
    q = None
    try:
        q = (
            snapshots.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

        def flushed() -> int:
            return (
                spark.table(name)
                .where(F.col("event_type") != _SENTINEL)
                .agg(F.coalesce(F.sum("n"), F.lit(0)))
                .first()[0]
            )

        deadline = time.time() + timeout_s
        stalled_since = time.time()
        last = -1
        while (cur := flushed()) < expected_total:
            if time.time() > deadline:
                raise TimeoutError(
                    f"punctuator flushed {cur}/{expected_total} rows"
                )
            if cur != last:
                last, stalled_since = cur, time.time()
            elif time.time() - stalled_since > 5.0:
                # Scheduler idle with timers pending: force a batch.
                spark.createDataFrame(
                    [sentinel_row], st
                ).coalesce(1).write.mode("append").parquet(stage_dir)
                stalled_since = time.time()
            time.sleep(0.15)
    finally:
        # Stop on EVERY exit path: an abandoned query would keep
        # triggering against a checkpoint we are about to delete
        # (review r4), leaking scheduler threads for the session.
        if q is not None:
            q.stop()
            q.awaitTermination()
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(checkpoint, ignore_errors=True)
    return spark.table(name).where(F.col("event_type") != _SENTINEL)


@query(
    "punctuate_wall_clock_counts",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def punctuate_wall_clock_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wall-clock punctuator, driver-verified end to end: every event
    row is absorbed into per-type state and emitted by some host-clock
    punctuation; summing the flushed snapshots must reproduce the batch
    group-count EXACTLY (a lost timer, double flush, or dropped state
    row breaks the hash). The harness only terminates once the flushed
    total equals the input count, so the oracle row certifies the
    punctuation loop actually drained — not a vacuous pass."""
    ev = load_table(spark, sf_dir, "events").select("event_type")
    total = ev.count()
    stage = tempfile.mkdtemp(prefix="punct_stage_")
    try:
        # Several files + maxFilesPerTrigger=1 => punctuations interleave
        # with multiple data batches, exercising re-registration.
        ev.repartition(3).write.mode("overwrite").parquet(stage)
        snaps = run_punctuated(spark, stage, "event_type STRING", total)
        out = (
            snaps.groupBy("event_type")
            .agg(F.sum("n").cast("long").alias("n_events"))
            .orderBy("event_type")
        )
        rows = out.collect()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return spark.createDataFrame(rows, "event_type STRING, n_events LONG")


# ---------------------------------------------------------------------------
# Stream-time punctuator — the event-time sibling.
# ---------------------------------------------------------------------------

# Event-time punctuation interval. The fixture spans 30 days, so a 1-day
# interval yields multiple genuine stream-time punctuations per key.
STREAM_PUNCT_INTERVAL_MS = 24 * 3600 * 1000

PUNCT_ET_STATE_SCHEMA = "n LONG, max_ts_us LONG"
PUNCT_ET_OUTPUT_SCHEMA = (
    "event_type STRING, n LONG, max_event_ts_us LONG, emit_stream_time_ms LONG"
)


def make_stream_time_punctuate_fn(interval_ms: int = STREAM_PUNCT_INTERVAL_MS):
    """Per-key state fn for STREAM_TIME punctuation
    [R ProcessorContext#schedule(interval, PunctuationType.STREAM_TIME,
    punctuator)]: counts accumulate silently; each update arms an
    EVENT-TIME timer at the next interval boundary after the key's
    observed stream time, and the snapshot flushes only when the
    WATERMARK (Spark's stream-time clock) crosses that boundary. KS
    semantics precisely: punctuation advances with event time carried
    by records, never with the host clock — an idle stream punctuates
    nothing however long the wall clock runs.

    Same conservation invariant as the wall-clock twin: flush deletes
    the state, an active key re-registers, so sum(n) over snapshots
    equals rows seen per key."""

    def _fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm_ms = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            n, max_ts_us = state.get
            state.remove()
            yield pd.DataFrame(
                [[key[0], n, max_ts_us, wm_ms]],
                columns=[
                    "event_type", "n", "max_event_ts_us", "emit_stream_time_ms",
                ],
            )
            return
        add, mx_us = 0, 0
        for pdf in pdfs:
            add += len(pdf)
            if len(pdf):
                mx_us = max(mx_us, int(pdf["ts"].max().value) // 1000)
        if state.exists:
            n, prev_mx = state.get
            n, mx_us = n + add, max(prev_mx, mx_us)
        else:
            n = add
        state.update((n, mx_us))
        # Next interval boundary strictly after the key's stream time
        # (and after the current watermark — Spark rejects a timeout the
        # watermark has already passed).
        seen_ms = max(mx_us // 1000, wm_ms)
        state.setTimeoutTimestamp((seen_ms // interval_ms + 1) * interval_ms)
        return

    return _fn


def punctuated_counts_stream_time(
    events_stream: DataFrame,
    interval_ms: int = STREAM_PUNCT_INTERVAL_MS,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """events stream -> stream-time-punctuated per-type count snapshots.
    EventTimeTimeout requires a watermark on the event-time column; the
    delay is the usual lateness bound and also the lag between a
    boundary-crossing record and the punctuation actually firing."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy("event_type")
        .applyInPandasWithState(
            make_stream_time_punctuate_fn(interval_ms),
            outputStructType=PUNCT_ET_OUTPUT_SCHEMA,
            stateStructType=PUNCT_ET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_punctuated_stream_time(
    spark: SparkSession,
    stage_dir: str,
    expected_total: int,
    timeout_s: float = 180.0,
    interval_ms: int = STREAM_PUNCT_INTERVAL_MS,
    watermark_delay_ms: int = 60_000,
) -> DataFrame:
    """Drive the stream-time topology until every row has flushed.

    The stage must be a TIME-ORDERED replay (``stage_events_ordered``):
    files are picked up oldest-first, so the watermark — Spark's
    stream-time clock — advances monotonically batch over batch exactly
    like Kafka Streams' stream time does over an in-order topic, and no
    row is late-dropped. (KS stream time is max observed ts with NO
    late-dropping; Structured Streaming's watermark both drives timers
    AND drops late rows, so an out-of-order replay would silently lose
    counts — the ordering is what keeps the two models equivalent.)

    Event-time timers fire only when the watermark advances, and the
    watermark advances only on data — so draining a bounded stage needs
    stream time pushed past the last armed boundary. On stall the
    harness appends a sentinel row whose ``ts`` leaps one
    interval+delay further each time (monotone, so the watermark always
    moves); the sentinel key's own snapshots are filtered back out.
    ``stage_dir`` is consumed: sentinel rows accumulate in it (same
    contract as ``run_punctuated``)."""
    schema = "event_type STRING, ts TIMESTAMP"
    name = f"punct_et_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        stage_dir
    )
    snapshots = punctuated_counts_stream_time(
        stream, interval_ms, f"{watermark_delay_ms} milliseconds"
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_staged_partitions(spark, stage_dir))
    )
    max_ts_us = (
        spark.read.schema(schema).parquet(stage_dir).agg(F.max("ts")).first()[0]
    )
    sentinel_base_us = int(max_ts_us.timestamp() * 1_000_000)
    n_sentinels = 0
    q = None
    try:
        q = (
            snapshots.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

        def flushed() -> int:
            return (
                spark.table(name)
                .where(F.col("event_type") != _SENTINEL)
                .agg(F.coalesce(F.sum("n"), F.lit(0)))
                .first()[0]
            )

        deadline = time.time() + timeout_s
        stalled_since = time.time()
        last = -1
        while (cur := flushed()) < expected_total:
            if time.time() > deadline:
                raise TimeoutError(
                    f"stream-time punctuator flushed {cur}/{expected_total} rows"
                )
            if cur != last:
                last, stalled_since = cur, time.time()
            elif time.time() - stalled_since > 3.0:
                # Watermark stalled with timers pending: push stream
                # time one interval (plus the delay) further.
                n_sentinels += 1
                push_us = sentinel_base_us + n_sentinels * (
                    interval_ms + watermark_delay_ms
                ) * 1000
                spark.createDataFrame(
                    [(_SENTINEL, push_us)], "event_type STRING, us LONG"
                ).select(
                    "event_type", F.timestamp_micros(F.col("us")).alias("ts")
                ).coalesce(1).write.mode("append").parquet(stage_dir)
                stalled_since = time.time()
            time.sleep(0.15)
    finally:
        if q is not None:
            q.stop()
            q.awaitTermination()
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(checkpoint, ignore_errors=True)
    return spark.table(name).where(F.col("event_type") != _SENTINEL)


def stage_events_ordered(df: DataFrame, stage: str, n_slices: int = 3) -> None:
    """Write ``df`` (event_type, ts) as ``n_slices`` sequential
    time-range files — an in-order topic replay. The file source picks
    new files oldest-mtime-first, so writing the slices one at a time
    (mode=append) replays them in event-time order."""
    import datetime as _dt

    lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds() or 1.0
    cuts = [lo + _dt.timedelta(seconds=span * i / n_slices) for i in range(1, n_slices)]
    bounds = [None, *cuts, None]
    for i in range(n_slices):
        part = df
        if bounds[i] is not None:
            part = part.where(F.col("ts") >= F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") < F.lit(bounds[i + 1]))
        part.coalesce(1).write.mode("append").parquet(stage)
        time.sleep(0.05)  # distinct mtimes => deterministic pickup order


@query(
    "punctuate_stream_time_counts",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def punctuate_stream_time_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-time punctuator, driver-verified end to end: every event
    row is absorbed into per-type state and flushed by some EVENT-TIME
    punctuation (watermark crossing an armed interval boundary); the
    snapshot sums must reproduce the batch group-count exactly. The
    harness terminates only once the flushed total equals the input
    count, so the oracle row certifies the event-time timer loop
    drained — the STREAM_TIME sibling of punctuate_wall_clock_counts."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    total = ev.count()
    stage = tempfile.mkdtemp(prefix="punct_et_stage_")
    try:
        # Time-ordered slices + maxFilesPerTrigger=1 => the watermark
        # advances across batches, so mid-stream punctuations fire
        # before the drain phase, exercising re-registration.
        stage_events_ordered(ev, stage)
        snaps = run_punctuated_stream_time(spark, stage, total)
        out = (
            snaps.groupBy("event_type")
            .agg(F.sum("n").cast("long").alias("n_events"))
            .orderBy("event_type")
        )
        rows = out.collect()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return spark.createDataFrame(rows, "event_type STRING, n_events LONG")


# ---------------------------------------------------------------------------
# Cancellable punctuators ([R ProcessorContext#schedule returns a
# Cancellable]) — the last unmodeled piece of the KS punctuation API
# (VERDICT r5 "missing" #4): a processor can cancel its punctuator once
# a condition is met, or cancel-and-reschedule with a new interval
# (the backoff pattern).
#
# Spark mapping: applyInPandasWithState CLEARS a key's processing-time
# timer every time the function runs for that key; re-arming is an
# explicit setTimeoutDuration call. So:
#   - Cancellable#cancel  == stop re-arming (state may live on — rows
#     keep accumulating, punctuations simply stop);
#   - reschedule          == re-arm with a different interval.
# Both are per-key state decisions, checkpointed with the state like
# everything else — a cancelled punctuator stays cancelled across
# restart.
# ---------------------------------------------------------------------------

CANCEL_STATE_SCHEMA = "n LONG, firings LONG, last_wall_us LONG"
CANCEL_OUTPUT_SCHEMA = (
    "event_type STRING, n LONG, firing LONG, emit_wall_us LONG"
)


def make_cancellable_fn(
    interval_ms: int,
    slow_interval_ms: int,
    reschedule_after: int,
    cancel_after: int,
):
    """Per-key metronome punctuator with a firing budget:

    - firings 1..reschedule_after fire every ``interval_ms``;
    - after ``reschedule_after`` firings the punctuator RESCHEDULES to
      ``slow_interval_ms`` (cancel + schedule-new in KS terms);
    - after ``cancel_after`` firings it CANCELS: no timer is ever
      re-armed for the key, later rows accumulate silently (`n` keeps
      counting in state but nothing further is emitted — exactly a
      cancelled KS punctuator over a still-running processor).

    Emits (key, delta_n, firing#, emit_wall) per punctuation; the delta
    resets each firing so sum(n) over emissions = rows seen up to the
    last firing. ``emit_wall_us`` is the BATCH processing time
    (``GroupState.getCurrentProcessingTimeMs``), not the Python
    worker's clock: the timeout contract is defined on the batch clock
    (a timer armed for +interval fires in the first batch whose
    processing time passes the deadline, so successive firings are
    ≥ interval apart in THIS clock by engine guarantee), while the
    worker clock adds a scheduling+spawn delay that varies per firing
    and can compress observed gaps below the interval on a loaded box
    (r8 flake: two metronome tests each tripped once under a full-suite
    run on the worker-clock basis)."""

    def _next_interval(firings_done: int) -> int:
        return (
            slow_interval_ms if firings_done >= reschedule_after else interval_ms
        )

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        now_us = int(time.time() * 1_000_000)
        if state.hasTimedOut:
            proc_us = state.getCurrentProcessingTimeMs() * 1000
            n, firings, _last = state.get
            firing = firings + 1
            state.update((0, firing, now_us))
            if firing < cancel_after:  # metronome continues
                state.setTimeoutDuration(_next_interval(firing))
            # else: CANCELLED — never re-armed again for this key
            yield pd.DataFrame(
                [[key[0], n, firing, proc_us]],
                columns=["event_type", "n", "firing", "emit_wall_us"],
            )
            return
        add = sum(len(pdf) for pdf in pdfs)
        if state.exists:
            n, firings, _last = state.get
            state.update((n + add, firings, now_us))
            if firings < cancel_after:
                state.setTimeoutDuration(_next_interval(firings))
            # cancelled key: rows accumulate, no timer
        else:
            state.update((add, 0, now_us))
            state.setTimeoutDuration(interval_ms)
        return

    return fn


def punctuated_counts_cancellable(
    events_stream: DataFrame,
    interval_ms: int = PUNCTUATE_INTERVAL_MS,
    slow_interval_ms: int | None = None,
    reschedule_after: int = 10**9,
    cancel_after: int = 10**9,
) -> DataFrame:
    """events stream -> per-type punctuation snapshots under a
    cancellable/reschedulable punctuator."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        make_cancellable_fn(
            interval_ms,
            slow_interval_ms if slow_interval_ms is not None else interval_ms,
            reschedule_after,
            cancel_after,
        ),
        outputStructType=CANCEL_OUTPUT_SCHEMA,
        stateStructType=CANCEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_cancellable(
    spark: SparkSession,
    stage_dir: str,
    schema: str,
    n_keys: int,
    cancel_after: int,
    interval_ms: int = PUNCTUATE_INTERVAL_MS,
    slow_interval_ms: int | None = None,
    reschedule_after: int = 10**9,
    settle_s: float = 2.5,
    timeout_s: float = 120.0,
    build_snapshots=None,
) -> DataFrame:
    """Drive the cancellable punctuator until EVERY key has exhausted
    its firing budget, then keep the query alive ``settle_s`` longer —
    proving no post-cancel punctuation fires — and return the
    snapshots. Same stall-sentinel protocol as run_punctuated.

    ``build_snapshots`` (stream DataFrame -> snapshots DataFrame)
    swaps in an alternative construction of the SAME punctuator —
    the topology facade's schedule() verb pins facade-vs-direct parity
    through it; the drain/settle protocol and the output contract
    (event_type/n/firing columns) stay the harness's."""
    from pyspark.sql.types import StringType, StructType

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    sentinel_row = tuple(
        _SENTINEL if isinstance(f.dataType, StringType) else None
        for f in st.fields
    )
    name = f"cancel_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(stage_dir)
    snapshots = (
        build_snapshots(stream)
        if build_snapshots is not None
        else punctuated_counts_cancellable(
            stream, interval_ms, slow_interval_ms, reschedule_after, cancel_after
        )
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_staged_partitions(spark, stage_dir))
    )
    q = None
    try:
        q = (
            snapshots.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

        def exhausted_keys() -> int:
            return (
                spark.table(name)
                .where(F.col("event_type") != _SENTINEL)
                .where(F.col("firing") >= cancel_after)
                .select("event_type")
                .distinct()
                .count()
            )

        deadline = time.time() + timeout_s
        stalled_since = time.time()
        last = -1
        while (cur := exhausted_keys()) < n_keys:
            if time.time() > deadline:
                raise TimeoutError(f"{cur}/{n_keys} keys exhausted their budget")
            if cur != last:
                last, stalled_since = cur, time.time()
            elif time.time() - stalled_since > 5.0:
                spark.createDataFrame([sentinel_row], st).coalesce(1).write.mode(
                    "append"
                ).parquet(stage_dir)
                stalled_since = time.time()
            time.sleep(0.15)
        # settle window: a cancelled punctuator must stay silent even
        # though the trigger keeps running micro-batches. Count REAL
        # keys only — the stall sentinel spawns its own key whose
        # punctuator may still be mid-budget.
        def real_rows() -> int:
            return (
                spark.table(name)
                .where(F.col("event_type") != _SENTINEL)
                .count()
            )

        n_before = real_rows()
        time.sleep(settle_s)
        n_after = real_rows()
        if n_after != n_before:
            raise AssertionError(
                f"post-cancel punctuation fired: {n_before} -> {n_after}"
            )
    finally:
        if q is not None:
            q.stop()
            q.awaitTermination()
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(checkpoint, ignore_errors=True)
    return spark.table(name).where(F.col("event_type") != _SENTINEL)


CANCEL_AFTER_FIRINGS = 2


@query("punctuate_cancellable_counts")  # rows-only: wall-clock firing
                                        # timing is host-dependent
def punctuate_cancellable_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cancellable punctuator over the events fixture: every event_type
    fires exactly CANCEL_AFTER_FIRINGS punctuations, then its
    punctuator cancels (verified by the harness's settle window).
    Returns (event_type, n_firings, n_flushed) — firing counts are
    exact by construction; flush totals are bounded by the type's event
    count (rows arriving after the final firing stay unflushed: the
    cancel semantics, pinned tighter in tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    n_keys = ev.select("event_type").distinct().count()
    stage = tempfile.mkdtemp(prefix="cancel_stage_")
    try:
        ev.coalesce(1).write.mode("overwrite").parquet(stage)
        out = run_cancellable(
            spark,
            stage,
            "event_id LONG, ts TIMESTAMP, event_type STRING",
            n_keys=n_keys,
            cancel_after=CANCEL_AFTER_FIRINGS,
        ).localCheckpoint()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return (
        out.groupBy("event_type")
        .agg(
            F.max("firing").cast("long").alias("n_firings"),
            F.sum("n").cast("long").alias("n_flushed"),
        )
        .orderBy("event_type")
    )
