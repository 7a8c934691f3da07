"""State-store shard migration — the operational escape from the
"shard count freezes at first commit" trap.

A Structured Streaming checkpoint pins its state-shard count (the
shuffle partition count of the stateful operator) at the FIRST commit;
Spark has no supported in-place re-shard (the new-query path is
"replay all input at the new setting" — prohibitive once the input is
history). [R the same trap as Kafka Streams' fixed topic
partitioning: a KS app re-partitions state only through a full
changelog re-shuffle into a new topic.]

This module migrates a checkpoint by replaying its STATE SNAPSHOT —
not its input history — into a fresh checkpoint at a new shard count:

1. read the old store via the State Data Source (distributed,
   per-shard tasks);
2. re-express each state row as a tiny WEIGHTED bootstrap input whose
   aggregation regenerates exactly that row (for a keyed dedup store
   the state rows ARE the inputs; for a session store, two weighted
   rows per session pin its window extent and exact totals);
3. run the same-shaped topology over the bootstrap with
   ``spark.sql.shuffle.partitions`` set to the target shard count.

Cost is O(state), never O(event history). The migrated checkpoint
serves the same fetch results (parity pinned in
tests/test_live_state.py) across the new shard layout; attaching the
live source afterwards is the caller's offset bookkeeping (for Kafka,
record the consumed offsets when the old query stopped and start the
new one from them).

Generality: this replay trick works for any store whose aggregation
buffer is a weighted fold (count/sum/min/max and compositions —
count folds as ``sum(weight)``, sum as ``sum(part)``); buffers that
are not re-expressible as weighted inputs (exact distinct sets, HLL
sketches) would need the changelog instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .live_state import SESSION_STATE_GAP_MINUTES, read_live_state

__all__ = ["migrate_keyvalue_state", "migrate_session_state"]


def _run_bootstrap(spark: SparkSession, plan_fn, boot: str, ckpt: str,
                   new_shards: int) -> None:
    """Execute one availableNow pass of ``plan_fn(stream)`` over the
    bootstrap dir with the target shard count pinned for the first
    (shard-freezing) commit."""
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(new_shards))
    try:
        q = plan_fn(boot).trigger(availableNow=True).option(
            "checkpointLocation", ckpt
        ).start()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def migrate_keyvalue_state(
    spark: SparkSession, old_ckpt: str, new_root: str, new_shards: int
) -> str:
    """Re-shard a keyed dedup (KeyValueStore) checkpoint: an unbounded
    ``dropDuplicates`` keeps exactly the seen-key set as state (the
    value is a placeholder), so replaying the KEY SNAPSHOT through the
    same topology regenerates an identical logical store across
    ``new_shards`` shards. Returns the new checkpoint location."""
    state = read_live_state(spark, old_ckpt)
    keys = state.select("key.*")
    key_cols = list(keys.columns)
    boot = os.path.join(new_root, "bootstrap")
    keys.write.mode("overwrite").parquet(boot)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keys.schema)
    ckpt = os.path.join(new_root, "ckpt")

    def plan(boot_dir: str):
        stream = spark.readStream.schema(schema).parquet(boot_dir)
        out = os.path.join(new_root, "out")
        return (
            stream.dropDuplicates(key_cols)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
        )

    _run_bootstrap(spark, plan, boot, ckpt, new_shards)
    return ckpt


def migrate_session_state(
    spark: SparkSession,
    old_ckpt: str,
    new_root: str,
    new_shards: int,
    gap_minutes: int = SESSION_STATE_GAP_MINUTES,
) -> str:
    """Re-shard a session-window aggregation checkpoint. Each stored
    session (window [start, last+gap), count, sum) becomes a few
    weighted bootstrap rows — (ts=start, weight 1, the whole sum),
    (ts=last, weight count−1, 0.0), plus ZERO-weight bridge rows every
    ``gap`` between them (a session longer than one gap was held
    together by interior events; the bridges stand in for them without
    disturbing count or sum) — so a session_window aggregation
    ``sum(cnt), sum(val)`` over the bootstrap regenerates the exact
    window extent and the exact totals (single-event sessions collapse
    to coincident head+tail rows). Bootstrap size is
    O(state · span/gap), never O(event history). Returns the new
    checkpoint location."""
    state = read_live_state(spark, old_ckpt)
    rows = state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.session_window.start").alias("session_start"),
        F.expr(f"value.session_window.end - INTERVAL {gap_minutes} MINUTES")
        .alias("last_ts"),
        F.col("value.count").cast("long").alias("cnt"),
        F.col("value.sum").cast("double").alias("vsum"),
    )
    bridge_ts = F.explode(
        F.expr(
            "slice(s, 2, greatest(size(s) - 1, 0))"
        )
    )
    boot_rows = (
        rows.select(
            "user_id",
            F.col("session_start").alias("ts"),
            F.lit(1).cast("long").alias("cnt"),
            F.col("vsum").alias("val"),
        )
        .unionByName(
            rows.select(
                "user_id",
                F.col("last_ts").alias("ts"),
                (F.col("cnt") - F.lit(1)).cast("long").alias("cnt"),
                F.lit(0.0).alias("val"),
            )
        )
        .unionByName(
            rows.withColumn(
                "s",
                F.expr(
                    f"sequence(session_start, last_ts,"
                    f" INTERVAL {gap_minutes} MINUTES)"
                ),
            )
            .select(
                "user_id",
                bridge_ts.alias("ts"),
                F.lit(0).cast("long").alias("cnt"),
                F.lit(0.0).alias("val"),
            )
        )
    )
    boot = os.path.join(new_root, "bootstrap")
    boot_rows.write.mode("overwrite").parquet(boot)
    ckpt = os.path.join(new_root, "ckpt")

    def plan(boot_dir: str):
        stream = spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP, cnt LONG, val DOUBLE"
        ).parquet(boot_dir)
        agg = (
            stream.withWatermark("ts", "36500 days")
            .groupBy(
                F.session_window("ts", f"{gap_minutes} minutes").alias(
                    "session_window"
                ),
                "user_id",
            )
            .agg(F.sum("cnt").alias("count"), F.sum("val").alias("sum"))
        )
        return agg.writeStream.format("noop").outputMode("append")

    _run_bootstrap(spark, plan, boot, ckpt, new_shards)
    return ckpt


@query("store_migrated_session_fetch")  # rows-only: reads a checkpoint
# REBUILT at a doubled shard count from the live session store's
# snapshot; fetch parity with the original checkpoint (and transitively
# with the batch session aggregation) is pinned in
# tests/test_live_state.py at both shard counts.
def store_migrated_session_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[R ReadOnlySessionStore#fetch(7)] served from the RE-SHARDED
    checkpoint: the live session store's snapshot replayed into a
    fresh checkpoint at 2× the shard count (the operational escape
    from 'shard count freezes at first commit'), then queried exactly
    like store_live_session_fetch — same rows, more reader
    parallelism. Ordered for determinism; total_value snaps to 4dp."""
    from ..catalog import fingerprint_dir, mark_ready
    from .live_state import session_state_checkpoint, session_state_fetch
    from .source import STREAM_SHUFFLE_PARTITIONS

    old_ckpt = session_state_checkpoint(spark, sf_dir)
    shards = STREAM_SHUFFLE_PARTITIONS * 2
    root, ready = fingerprint_dir(
        "migsession",
        os.path.join(sf_dir, "events.parquet"),
        suffix=f"_s{shards}",
    )
    if not ready:
        migrate_session_state(spark, old_ckpt, root, shards)
        mark_ready(root)
    out = session_state_fetch(spark, os.path.join(root, "ckpt"), key=7)
    return out.withColumn("total_value", F.round("total_value", 4))
