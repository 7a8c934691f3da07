"""Arbitrary-state streaming ops: per-key running z-score anomaly
detection (the monitoring twin of the batch ``anomaly_value_zscore``)
and the tombstone-aware KTable changelog.

The reference shape [R o.a.k.streams.kstream.KStream#processValues +
KeyValueStore]: a processor keeps per-key running statistics and flags
records that deviate from the key's OWN history-so-far. Spark-first
port: ``applyInPandasWithState`` with a (count, mean, M2) Welford state
— numerically stable single-pass mean/variance, one double triple per
live key, updated Arrow-batch-at-a-time.

Unlike the batch op (global per-user stats), the streaming op scores
each event against the statistics of the events BEFORE it — exactly
what an online monitor can know — so an early spike both gets flagged
and then joins the baseline. Semantics are pinned against a pure-Python
Welford model in tests/test_streaming.py.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import query
from .source import read_events_stream, run_to_parquet

ZSCORE_MIN_EVENTS = 10
ZSCORE_THRESHOLD = 3.0

ANOMALY_OUTPUT_SCHEMA = (
    "event_id LONG, user_id LONG, value DOUBLE, zscore DOUBLE, n_baseline LONG"
)
ANOMALY_STATE_SCHEMA = "n LONG, mean DOUBLE, m2 DOUBLE"


def welford_step(n: int, mean: float, m2: float, v: float) -> tuple[int, float, float]:
    """One Welford update — shared by the operator and the test model."""
    n += 1
    delta = v - mean
    mean += delta / n
    m2 += delta * (v - mean)
    return n, mean, m2


def _anomaly_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out = []
    # A key's micro-batch rows arrive as MULTIPLE Arrow chunks once they
    # exceed arrow.maxRecordsPerBatch, with arbitrary cross-chunk order —
    # concatenate first so the (ts_us, event_id) sort spans the whole
    # batch, else Welford absorption order diverges from event-time order.
    chunks = [c[["event_id", "ts_us", "user_id", "value"]] for c in pdfs]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        for row in pdf.itertuples(index=False):
            # Score against history-so-far BEFORE absorbing the value.
            if n >= ZSCORE_MIN_EVENTS and m2 > 0:
                std = math.sqrt(m2 / (n - 1))
                z = (row.value - mean) / std
                if abs(z) > ZSCORE_THRESHOLD:
                    zr = math.floor(z * 10000 + 0.5) / 10000
                    out.append((row.event_id, row.user_id, row.value, zr, n))
            n, mean, m2 = welford_step(n, mean, m2, row.value)
    state.update((n, mean, m2))
    if out:
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "value", "zscore", "n_baseline"]
        )


@query("anomaly_stream_zscore")  # rows-only: online state op, no SQL oracle
def anomaly_stream_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online per-user outlier stream: |z| > 3 against the user's
    running Welford statistics, minimum 10 prior events.

    Scale shape: ONE shuffle on user_id into the state operator; state
    is three numbers per live user regardless of history length (the
    whole point of Welford vs storing the window), and the Python hop
    is Arrow-batched. At 100 TB the state store holds |users| triples —
    KBs per million users — and the op emits only anomalies, so the
    output stream is sparse.
    """
    stream = read_events_stream(spark, sf_dir).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "value",
        F.col("ts"),
    )
    flagged = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _anomaly_fn,
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    n_part = spark.sparkContext.defaultParallelism
    return run_to_parquet(flagged, "anomaly_stream_zscore", partitions=n_part)


# ---------------------------------------------------------------------------
# Tombstone-aware KTable changelog (streaming twin of
# operators/scan.latest_by_key_tombstoned).
# ---------------------------------------------------------------------------

CHANGELOG_OUTPUT_SCHEMA = (
    "user_id LONG, op STRING, event_id LONG, ts_us LONG, event_type STRING, "
    "value DOUBLE"
)
CHANGELOG_STATE_SCHEMA = (
    "w_ts_us LONG, w_event_id LONG, w_is_del INT, w_type STRING, w_value DOUBLE"
)


def _tombstone_changelog_fn(key, pdfs, state):
    """Per-key changelog emitter: track the latest record (max by
    (ts, event_id)); when the winner changes, emit 'upsert' — or
    'delete' when the new winner is a tombstone ('error' events stand
    in for null-value records, same derivation as the batch op)."""
    import pandas as pd

    (uid,) = key
    if state.exists:
        w_ts, w_eid, w_del, w_type, w_val = state.get
    else:
        w_ts = w_eid = None
        w_del, w_type, w_val = 0, None, None
    out = []
    # Same multi-chunk hazard as _anomaly_fn: concat before the sort so
    # changelog emission order is ts-ordered across the whole micro-batch.
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        for row in pdf.itertuples(index=False):
            if w_ts is None or (row.ts_us, row.event_id) > (w_ts, w_eid):
                w_ts, w_eid = row.ts_us, row.event_id
                w_del = 1 if row.event_type == "error" else 0
                w_type, w_val = row.event_type, row.value
                out.append(
                    (
                        uid,
                        "delete" if w_del else "upsert",
                        w_eid,
                        w_ts,
                        w_type,
                        None if w_del else w_val,
                    )
                )
    state.update((w_ts, w_eid, w_del, w_type, w_val))
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "op", "event_id", "ts_us", "event_type", "value"],
        )


@query("table_changelog_tombstone_stream")  # rows-only: stateful changelog emission
def table_changelog_tombstone_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable changelog WITH DELETE semantics [R KTable: records with
    null value are tombstones; the changelog topic carries them so
    downstream materializations drop the key]: every change of a key's
    winning record emits an 'upsert' row, and a winning tombstone emits
    'delete' — replaying the ops in order reconstructs exactly the
    batch latest_by_key_tombstoned table (parity pinned in
    tests/test_streaming.py).

    Scale shape: one shuffle on the key into arbitrary state; state is
    one winner tuple per live key; emission volume per batch is bounded
    by changed keys. The batch op answers "what is the table NOW"; this
    op answers "what happened", which is what a downstream CDC consumer
    tails.
    """
    stream = read_events_stream(spark, sf_dir).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        F.col("ts"),
    )
    log = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _tombstone_changelog_fn,
            outputStructType=CHANGELOG_OUTPUT_SCHEMA,
            stateStructType=CHANGELOG_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    n_part = spark.sparkContext.defaultParallelism
    return run_to_parquet(log, "table_changelog_tombstone_stream", partitions=n_part)
