"""Interactive queries over LIVE streaming state — the true analog of
[R o.a.k.streams.KafkaStreams#store(StoreQueryParameters) serving reads
from a RUNNING topology's RocksDB state store] (reconstructed public
API surface — SURVEY.md §0; the reference checkout is empty, so
coordinates are the public Kafka Streams ones).

The batch-materialized bucketed layout (sources/state_store.py) answers
the same verbs from a *derived* table; this module reads the streaming
query's OWN state via Spark's State Data Source
(``spark.read.format("statestore")`` over a checkpoint location):

- every committed micro-batch is an addressable state VERSION
  (``option("batchId", n)``) — the point-in-time read KS exposes via
  standby replicas, here first-class;
- the store read is distributed (one task per state-store shard,
  ``partition_id`` in the output), no driver materialization;
- change-feed options exist upstream for CDC-style tailing.

Topology under read: the infinite-retention streaming dedup
(``dropDuplicates([user_id])`` — the non-windowed persistent
KeyValueStore twin, dedup_stream.py) replayed over time-ordered chunks
with one micro-batch per chunk, checkpoint RETAINED. Its state rows are
exactly the first-seen row per user — so the live-state read is
parity-checkable against both the batch distinct-key set and the
bucketed-layout store (pinned in tests/test_live_state.py).

100 TB story: checkpointed state shards by ``spark.sql.shuffle
.partitions`` at first run; the statestore reader scans shards in
parallel and never routes rows through the driver. Reading version N
costs the delta replay from the latest snapshot ≤ N (RocksDB/HDFS
state-store snapshot discipline), independent of event volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fingerprint_dir, load_table, mark_ready
from ..registry import query
from .punctuate import stage_events_ordered
from .source import STREAM_SHUFFLE_PARTITIONS

LIVE_STATE_CHUNKS = 3  # time-ordered replay chunks = state versions


def dedup_state_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Run the keyed streaming dedup over the fixture once per fixture
    identity, RETAINING the checkpoint, and return its location.

    Unlike every other harness here the checkpoint is the *product*:
    interactive queries address its committed versions long after the
    query stopped — exactly a KS state dir surviving app restarts. The
    dir is fingerprint-keyed (catalog.fingerprint_dir), so a fixture
    regeneration rebuilds and stale state dirs are swept, bounding /tmp
    to one live state per fixture."""
    root, ready = fingerprint_dir(
        "livestate", os.path.join(sf_dir, "events.parquet")
    )
    ckpt = os.path.join(root, "ckpt")
    if ready:
        return ckpt
    stage = os.path.join(root, "stage")
    out = os.path.join(root, "out")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    stage_events_ordered(ev, stage, n_slices=LIVE_STATE_CHUNKS)
    schema = "user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    deduped = stream.dropDuplicates(["user_id"])
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # Shard count freezes into the checkpoint at first commit — size it
    # like the other fixture-scale streams (8 stores locally; a
    # deployment sizes UP with key cardinality before first run).
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    try:
        q = (
            deduped.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    mark_ready(root)
    return ckpt


def _ensure_state_coordinator(spark: SparkSession) -> None:
    """The statestore reader's partition readers report to the driver's
    StateStoreCoordinator RPC endpoint, which Spark only materializes
    lazily for a RUNNING streaming query — in a session that has not
    run one (or after the last query stopped and executor-side state
    management wound down), every read fails with
    CANNOT_LOAD_STATE_STORE / RpcEndpointNotFoundException. Touching the
    StreamingQueryManager's lazy coordinator val creates (or returns)
    the endpoint; idempotent."""
    spark._jsparkSession.sessionState().streamingQueryManager().stateStoreCoordinator()


def read_live_state(
    spark: SparkSession, checkpoint: str, batch_id: int | None = None
) -> DataFrame:
    """ReadOnlyKeyValueStore#all over the streaming query's own store:
    one row per live state entry, key columns flattened, with the
    owning shard (`partition_id`). ``batch_id`` addresses a committed
    version (KS standby point-in-time read); default = latest."""
    _ensure_state_coordinator(spark)
    reader = spark.read.format("statestore").option("path", checkpoint)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load()


def window_state_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Run a streaming tumbling-window count (1-day windows × event
    type, NO watermark — infinite retention, the KS persistent
    WindowStore shape) over the fixture once per fixture identity,
    RETAINING the checkpoint, and return its location. The state rows
    are the live window aggregates :func:`read_live_state` serves —
    [R KafkaStreams#store(... windowStore()).fetchAll]."""
    root, ready = fingerprint_dir(
        "livewindow", os.path.join(sf_dir, "events.parquet")
    )
    ckpt = os.path.join(root, "ckpt")
    if ready:
        return ckpt
    stage = os.path.join(root, "stage")
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    stage_events_ordered(ev, stage, n_slices=LIVE_STATE_CHUNKS)
    schema = "ts TIMESTAMP, event_type STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    counts = stream.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    try:
        q = (
            counts.writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    mark_ready(root)  # the noop sink writes nothing; state IS the product
    return ckpt


@query("store_live_window_counts")  # rows-only: reads a checkpoint's
# window-store state; parity vs the batch tumbling counts is pinned in
# tests/test_live_state.py
def store_live_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[R windowStore().fetchAll] against LIVE state: every (day,
    event_type) window's running aggregate read straight out of the
    streaming query's state store. With no watermark the store retains
    every window (the KS persistent WindowStore), so after the full
    replay the state equals the batch tumbling counts — the parity
    pin. Ordered for determinism."""
    ckpt = window_state_checkpoint(spark, sf_dir)
    state = read_live_state(spark, ckpt)
    # state layout (inspected): key = (window struct(start,end),
    # event_type), value = the agg buffer (count LONG)
    return (
        state.select(
            F.col("key.window.start").cast("date").alias("day"),
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("long").alias("n_events"),
        )
        .orderBy("day", "event_type")
    )


def read_state_change_feed(
    spark: SparkSession,
    checkpoint: str,
    start_batch_id: int = 0,
    end_batch_id: int | None = None,
) -> DataFrame:
    """The state store's CHANGE FEED — the analog of [R the KS
    changelog topic backing every state store]: one row per state
    mutation with its ``batch_id``, ``change_type`` and shard, read
    with the State Data Source's CDC options (``readChangeFeed`` +
    ``changeStartBatchId``/``changeEndBatchId``). Where
    :func:`read_live_state` answers "what is the state at version N",
    this answers "what changed, when" — restore-by-replay, audit, and
    downstream-refresh feeds. Distributed exactly like the snapshot
    read (per-shard tasks, no driver materialization); cost is the
    delta files of the addressed batch range, independent of total
    state size."""
    _ensure_state_coordinator(spark)
    reader = (
        spark.read.format("statestore")
        .option("path", checkpoint)
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", start_batch_id)
    )
    if end_batch_id is not None:
        reader = reader.option("changeEndBatchId", end_batch_id)
    return reader.load()


@query("store_live_state_change_feed")  # rows-only: reads a checkpoint's
# change feed; fold-to-snapshot parity + per-batch insert attribution are
# pinned in tests/test_live_state.py
def store_live_state_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[R the changelog topic of the dedup store], as a query: every
    state mutation the streaming dedup committed, attributed to its
    micro-batch — for infinite-retention dedup each user appears
    exactly once, in the chunk that first saw it. Ordered for
    determinism."""
    ckpt = dedup_state_checkpoint(spark, sf_dir)
    feed = read_state_change_feed(spark, ckpt)
    return feed.select(
        F.col("key.user_id").alias("user_id"),
        F.col("change_type").cast("string").alias("change_type"),
        F.col("batch_id").cast("long").alias("batch_id"),
    ).orderBy("user_id", "batch_id")


SESSION_STATE_GAP_MINUTES = 30  # same inactivity gap as the batch store


def session_state_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Run a streaming SESSION-WINDOW aggregation (30-min inactivity
    gap × user, per-session count + value sum) over the fixture once
    per fixture identity, RETAINING the checkpoint, and return its
    location — the live SessionStore completing the store quartet
    [R o.a.k.streams.state.ReadOnlySessionStore served from a RUNNING
    topology via KafkaStreams#store].

    The watermark is set to ~100 years: Spark's append-mode session
    aggregation EVICTS a session from state once the watermark passes
    its close (that is emission, the KS suppress analog) — an
    effectively-infinite delay keeps every merged session live, which
    is exactly the KS persistent SessionStore (infinite retention is a
    valid KS config, mirroring the batch layouts in
    sources/state_store.py). Sessions MERGE in state across
    micro-batches: the time-ordered chunk replay makes boundary
    sessions span commits, so the final state proves cross-batch
    session merge, not just per-batch aggregation.

    State layout (inspected, pinned in tests/test_live_state.py):
    key = (user_id, sessionStartTime); value = (session_window
    struct(start, end), user_id, count, sum) where end = last event ts
    + gap — the same half-open [start, last+gap) contract as batch
    ``F.session_window``."""
    root, ready = fingerprint_dir(
        "livesession", os.path.join(sf_dir, "events.parquet")
    )
    ckpt = os.path.join(root, "ckpt")
    if ready:
        return ckpt
    stage = os.path.join(root, "stage")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    stage_events_ordered(ev, stage, n_slices=LIVE_STATE_CHUNKS)
    schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    sessions = (
        stream.withWatermark("ts", "36500 days")
        .groupBy(
            F.session_window("ts", f"{SESSION_STATE_GAP_MINUTES} minutes").alias(
                "session_window"
            ),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("count"), F.sum("value").alias("sum"))
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))
    try:
        q = (
            sessions.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    mark_ready(root)  # the noop sink writes nothing; state IS the product
    return ckpt


def session_state_fetch(
    spark: SparkSession,
    checkpoint: str,
    key: int | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """[R ReadOnlySessionStore#fetch(key)] (``key=None`` →
    [R #fetchAll]) against LIVE state: every merged session the
    running session-window aggregation holds for the key, read
    straight out of its state store — distributed per-shard, with
    point-in-time addressing via ``batch_id`` (KS standby reads)."""
    state = read_live_state(spark, checkpoint, batch_id=batch_id)
    # The value struct is the PHYSICAL agg buffer (session_window,
    # user_id, <count buffer>, <sum buffer>) and its field names follow
    # the physical aggregates, not their aliases — a shard-MIGRATED
    # checkpoint (state_migration.py) regenerates count as sum(weight),
    # whose buffer is named "sum" (colliding with the value sum) — so
    # extraction is POSITIONAL: a struct cast matches fields by
    # position, renaming them unambiguously for both layouts.
    from pyspark.sql.types import StructField, StructType

    vt = state.schema["value"].dataType
    names = ["w", "user_id", "cnt", "vsum"]
    cast_t = StructType(
        [StructField(n, f.dataType) for n, f in zip(names, vt.fields)]
    )
    flat = state.select(F.col("value").cast(cast_t).alias("v")).select("v.*")
    out = flat.select(
        F.col("user_id"),
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        F.col("cnt").cast("long").alias("n_events"),
        F.col("vsum").cast("double").alias("total_value"),
    )
    if key is not None:
        out = out.where(F.col("user_id") == int(key))
    return out.orderBy("user_id", "session_start")


@query("store_live_session_fetch")  # rows-only: reads a running
# session-window aggregation's own SessionStore state; parity vs the
# batch-materialized bucketed session store (state_store.py) and vs
# batch sessionize() is pinned in tests/test_live_state.py, along with
# a batchId point-in-time read and a cross-batch session-merge pin.
def store_live_session_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[R ReadOnlySessionStore#fetch(7)] against LIVE state: key 7's
    sessions served from the streaming session-window aggregation's
    state store — the fourth live store verb, completing the quartet
    (KV all / window fetchAll / change feed / session fetch). Ordered
    for determinism; total_value snaps to 4dp for a stable hash."""
    ckpt = session_state_checkpoint(spark, sf_dir)
    out = session_state_fetch(spark, ckpt, key=7)
    return out.withColumn("total_value", F.round("total_value", 4))


@query("store_live_streaming_state")  # rows-only: reads a checkpoint's state,
# not a SQL-derivable table (parity vs batch distinct keys + the
# bucketed-layout store is pinned in tests/test_live_state.py)
def store_live_streaming_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[R KafkaStreams#store(...).all()] against LIVE state: the
    per-shard key inventory of the running dedup topology's store —
    key set == distinct user_id (infinite-retention dedup state), each
    with its state shard. Ordered for determinism."""
    ckpt = dedup_state_checkpoint(spark, sf_dir)
    state = read_live_state(spark, ckpt)
    return (
        state.select(
            F.col("key.user_id").alias("user_id"),
            F.col("partition_id").cast("int").alias("state_shard"),
        )
        .orderBy("user_id")
    )
