"""`Suppressed.untilTimeLimit` analog — debounced KTable update emission.

[R o.a.k.streams.kstream.Suppressed#untilTimeLimit(timeToWaitForMoreEvents,
 BufferConfig)] (reconstructed public API surface — SURVEY.md §0; the
reference checkout is empty).

Kafka Streams' two suppression modes and their Spark analogs here:

- ``untilWindowCloses`` — final-result windowed emission. Covered by the
  append-mode watermarked window aggregates (windows_stream.py, W5).
- ``untilTimeLimit`` — THIS module: rate-limit the changelog of an
  UNWINDOWED KTable. A key's first buffered update starts a stream-time
  clock; further updates within ``timeLimit`` coalesce into the buffer
  (latest value wins); when stream time passes first_update + timeLimit
  the key emits ONE coalesced update and the buffer empties. Downstream
  sees at most one update per key per limit interval — the classic
  debounce for rate-sensitive sinks.

Spark mapping: ``applyInPandasWithState`` with
``GroupStateTimeout.EventTimeTimeout`` over a watermarked stream — the
same machinery as the stream-time punctuator (punctuate.py), with
buffer-holding state instead of counters. Stream time = the watermark,
advanced by an in-order replay (``stage_events_ordered``), matching KS
stream time over an in-order topic.

Scale: state is ONE buffered row per key currently inside a debounce
window — strictly smaller than the KTable itself; emission volume is
keys/limit per unit stream time, which is the point. One shuffle on the
key, identical to any keyed stateful op.
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
from .punctuate import _staged_partitions, stage_events_ordered

# Debounce limit in EVENT time. The fixture spans 30 days, so 2 days
# gives each active key several distinct emission cycles.
SUPPRESS_LIMIT_MS = 2 * 24 * 3600 * 1000

SUPPRESS_STATE_SCHEMA = (
    "first_buffered_ms LONG, ts_us LONG, event_id LONG, "
    "value DOUBLE, event_type STRING"
)
SUPPRESS_OUTPUT_SCHEMA = (
    "user_id LONG, last_value DOUBLE, last_type STRING, last_ts_us LONG, "
    "emit_stream_time_ms LONG"
)
_SENTINEL_KEY = -1  # drain rows use an impossible user_id


def make_suppress_fn(limit_ms: int = SUPPRESS_LIMIT_MS):
    """Per-key state fn for the debounce.

    Buffer rule (KS untilTimeLimit): the clock starts at the FIRST
    buffered update of a cycle and is NOT re-armed by later updates —
    so an update is delayed at most ``limit_ms`` of stream time, and a
    key emits at most once per limit interval. Coalescing keeps the
    latest value by the repo-wide (ts, event_id) ordering."""

    cols = [
        "user_id", "last_value", "last_type", "last_ts_us",
        "emit_stream_time_ms",
    ]

    def _fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm_ms = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            # idle-key path: the armed event-time timer fired
            _first, ts_us, _eid, value, etype = state.get
            state.remove()
            yield pd.DataFrame([[key[0], value, etype, ts_us, wm_ms]], columns=cols)
            return
        best = None  # (ts_us, event_id, value, event_type) max by (ts, id)
        mn_us = None  # earliest update in the batch — a new cycle's clock
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_us_col = pdf["ts"].astype("int64") // 1000
            mn_us = min(mn_us, int(ts_us_col.min())) if mn_us is not None else int(
                ts_us_col.min()
            )
            i = pd.DataFrame(
                {"t": ts_us_col, "e": pdf["event_id"]}
            ).sort_values(["t", "e"]).index[-1]
            cand = (
                int(ts_us_col[i]), int(pdf["event_id"][i]),
                float(pdf["value"][i]), str(pdf["event_type"][i]),
            )
            if best is None or cand[:2] > best[:2]:
                best = cand
        if best is None:
            return
        flushed = None
        if state.exists:
            first, ts_us, eid, value, etype = state.get
            if wm_ms >= first + limit_ms:
                # active-key path: Spark only invokes the timeout
                # callback for keys with NO data in the batch, so a key
                # that stays busy must flush its expired buffer inline
                # — KS emits on stream-time advance regardless of
                # traffic, and so do we.
                flushed = [key[0], value, etype, ts_us, wm_ms]
                state.remove()
                # new cycle: clock = its EARLIEST buffered update (KS
                # starts the wait at the first record, not the last)
                first = max(mn_us // 1000, wm_ms + 1)
                ts_us, eid, value, etype = best
            elif best[:2] > (ts_us, eid):
                ts_us, eid, value, etype = best
            # clock NOT re-armed by later updates: the FIRST buffered
            # update keeps the timer (KS: delay <= timeLimit per update)
            state.update((first, ts_us, eid, value, etype))
        else:
            # cycle opens: clock = its earliest update's stream position
            first = max(mn_us // 1000, wm_ms + 1)
            state.update((first, *best))
        # Spark rejects a timeout the watermark already passed — clamp
        # just ahead of it (fires next watermark advance, i.e. ASAP).
        state.setTimeoutTimestamp(max(first + limit_ms, wm_ms + 1))
        if flushed is not None:
            yield pd.DataFrame([flushed], columns=cols)
        return

    return _fn


def suppressed_table_stream(
    events_stream: DataFrame,
    limit_ms: int = SUPPRESS_LIMIT_MS,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """events stream -> debounced per-user latest-value updates."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_suppress_fn(limit_ms),
            outputStructType=SUPPRESS_OUTPUT_SCHEMA,
            stateStructType=SUPPRESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_suppressed(
    spark: SparkSession,
    stage_dir: str,
    expected_final: dict[int, int],
    timeout_s: float | None = None,
    limit_ms: int = SUPPRESS_LIMIT_MS,
    watermark_delay_ms: int = 60_000,
) -> DataFrame:
    """Drive the debounced topology until every key's FINAL value has
    been emitted (``expected_final``: user_id -> last ts_us from the
    batch KTable), then stop — the fixpoint at which the coalesced
    update stream has caught up with ``latest_by_key``.

    Drain mirrors run_punctuated_stream_time: timers are bounded by
    (last buffered update + limit), so escalating far-future sentinel
    rows (impossible key, filtered out) push the watermark past every
    armed timeout. ``stage_dir`` is consumed (sentinels accumulate).

    Drain pacing scales with staged input size (r6 probe-driven fix —
    the fixed 180 s deadline, 3 s stall window and 0.15 s poll were
    fixture-sized: at the 1000× probe a single micro-batch runs
    MINUTES, so the old pacing declared a timeout before batch 1
    committed and would have dumped a sentinel file every 3 s while
    waiting). timeout_s=None → max(180 s, 2 s per staged MB)."""
    schema = "user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE, event_type STRING"
    name = f"suppress_{uuid.uuid4().hex[:8]}"
    checkpoint = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        stage_dir
    )
    updates = suppressed_table_stream(
        stream, limit_ms, f"{watermark_delay_ms} milliseconds"
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_staged_partitions(spark, stage_dir))
    )
    staged_mb = sum(
        os.path.getsize(os.path.join(stage_dir, f))
        for f in os.listdir(stage_dir)
        if f.endswith(".parquet")
    ) / 1e6
    if timeout_s is None:
        timeout_s = max(180.0, staged_mb * 2.0)
    stall_s = max(3.0, staged_mb / 8.0)
    poll_s = max(0.15, min(staged_mb / 100.0, 5.0))
    max_ts_us = (
        spark.read.schema(schema).parquet(stage_dir).agg(F.max("ts")).first()[0]
    )
    sentinel_base_us = int(max_ts_us.timestamp() * 1_000_000)
    n_sentinels = 0
    q = None

    expected_df = spark.createDataFrame(
        list(expected_final.items()), "user_id LONG, want_ts_us LONG"
    ).cache()
    n_keys = len(expected_final)
    try:
        q = (
            updates.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

        def caught_up() -> int:
            latest = (
                spark.table(name)
                .where(F.col("user_id") != _SENTINEL_KEY)
                .groupBy("user_id")
                .agg(F.max("last_ts_us").alias("got_ts_us"))
            )
            return (
                latest.join(expected_df, "user_id")
                .where(F.col("got_ts_us") >= F.col("want_ts_us"))
                .count()
            )

        deadline = time.time() + timeout_s
        stalled_since = time.time()
        last = -1
        while (cur := caught_up()) < n_keys:
            if time.time() > deadline:
                raise TimeoutError(
                    f"suppress drained {cur}/{n_keys} keys to their final value"
                )
            if cur != last:
                last, stalled_since = cur, time.time()
            elif time.time() - stalled_since > stall_s:
                n_sentinels += 1
                push_us = sentinel_base_us + n_sentinels * (
                    limit_ms + watermark_delay_ms
                ) * 1000
                spark.createDataFrame(
                    [(_SENTINEL_KEY, -1, push_us, 0.0, "__drain__")],
                    "user_id LONG, event_id LONG, us LONG, value DOUBLE, event_type STRING",
                ).select(
                    "user_id", "event_id",
                    F.timestamp_micros(F.col("us")).alias("ts"),
                    "value", "event_type",
                ).coalesce(1).write.mode("append").parquet(stage_dir)
                stalled_since = time.time()
            time.sleep(poll_s)
    finally:
        if q is not None:
            q.stop()
            q.awaitTermination()
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        expected_df.unpersist()
        shutil.rmtree(checkpoint, ignore_errors=True)
    return spark.table(name).where(F.col("user_id") != _SENTINEL_KEY)


# One harness run serves both registered queries below; memoized per
# (session, fixture identity) so the driver executing them back-to-back
# pays the micro-batch machinery once.
_SUPPRESS_HIST_CACHE: dict = {}


def _suppress_history_rows(spark: SparkSession, sf_dir: str) -> list:
    import os

    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    # The state-store provider is part of the key: a provider-parity
    # test (RocksDB vs default) must re-run the harness under the new
    # provider, not read back the memoized default-provider rows.
    provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", "default"
    )
    key = (id(spark), sf_dir, st.st_mtime_ns, st.st_size, provider)
    if key in _SUPPRESS_HIST_CACHE:
        return _SUPPRESS_HIST_CACHE[key]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value", "event_type"
    )
    final = {
        r.user_id: int(r.ts.timestamp() * 1_000_000)
        for r in ev.groupBy("user_id")
        .agg(F.max_by(F.col("ts"), F.struct("ts", "event_id")).alias("ts"))
        .collect()
    }
    stage = tempfile.mkdtemp(prefix="suppress_stage_")
    try:
        stage_events_ordered(ev, stage, n_slices=3)
        hist = run_suppressed(spark, stage, final)
        rows = hist.orderBy("user_id", "emit_stream_time_ms").collect()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    _SUPPRESS_HIST_CACHE[key] = rows
    return rows


@query("table_suppress_time_limit")  # rows-only: emission timing is
                                     # stream-position-dependent
def table_suppress_time_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounced KTable updates over the events fixture: replay the
    topic in time order, coalesce each user's updates under a 2-day
    stream-time limit, emit at most one update per user per cycle. The
    harness runs to the fixpoint where the update stream has delivered
    every key's final value, so the returned history is complete; the
    per-key final values equal `latest_by_key` and the once-per-limit
    pacing is pinned in tests/test_streaming.py."""
    rows = _suppress_history_rows(spark, sf_dir)
    return spark.createDataFrame(rows, SUPPRESS_OUTPUT_SCHEMA)


@query(
    "table_suppress_final_state",
    oracle="""
SELECT user_id,
       value AS last_value,
       event_type AS last_type,
       CAST(epoch_us(ts) AS BIGINT) AS last_ts_us
FROM (
  SELECT user_id, value, event_type, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
ORDER BY user_id
""",
)
def table_suppress_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The debounce's conservation law as a DRIVER-HASH-CHECKED oracle
    row: after the coalesced update stream drains, the last emission
    per key must carry exactly the batch latest-per-key value — a lost
    buffer, a double flush, or a mis-coalesced winner breaks the hash.
    (The emission TIMING stays rows-only in table_suppress_time_limit;
    this query projects the timing away so the invariant that IS
    engine-independent gets the stronger check.)"""
    rows = _suppress_history_rows(spark, sf_dir)
    best: dict = {}
    for r in rows:
        cur = best.get(r.user_id)
        if cur is None or r.last_ts_us > cur.last_ts_us:
            best[r.user_id] = r
    out = [
        (u, b.last_value, b.last_type, b.last_ts_us)
        for u, b in sorted(best.items())
    ]
    return spark.createDataFrame(
        out, "user_id LONG, last_value DOUBLE, last_type STRING, last_ts_us LONG"
    )
