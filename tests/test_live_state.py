"""Interactive queries over LIVE streaming state (streaming/live_state).

The State Data Source read of the running dedup topology's checkpoint
must agree with (a) the batch distinct-key set and (b) the
batch-materialized bucketed store layout — the two existing serving
paths — and expose committed micro-batch versions as point-in-time
reads."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.catalog import load_table
from minefields_kafka_streams_deduplication_spark.streaming import live_state


def test_live_state_matches_batch_and_bucketed_store(spark, sf_dir):
    """Final live state key set == batch distinct user_id == the
    bucketed-layout store's key set; every state row names its shard."""
    out = engine.get_queries()["store_live_streaming_state"](spark, sf_dir)
    live = out.collect()
    live_keys = {r.user_id for r in live}

    batch_keys = {
        r.user_id
        for r in load_table(spark, sf_dir, "events").select("user_id").distinct().collect()
    }
    assert live_keys == batch_keys

    from minefields_kafka_streams_deduplication_spark.sources.state_store import (
        materialize_keyed_store,
        store_all,
    )

    store_dir = materialize_keyed_store(spark, sf_dir)
    bucketed_keys = {r.user_id for r in store_all(spark, store_dir).collect()}
    assert live_keys == bucketed_keys

    shards = {r.state_shard for r in live}
    assert all(0 <= s < live_state.STREAM_SHUFFLE_PARTITIONS for s in shards)


def test_live_state_point_in_time_versions(spark, sf_dir):
    """Committed micro-batch versions are addressable: batch 0 holds
    exactly the keys of the first time-ordered replay chunk, versions
    grow monotonically, and the explicit latest batch equals the
    default read."""
    ckpt = live_state.dedup_state_checkpoint(spark, sf_dir)
    last = live_state.LIVE_STATE_CHUNKS - 1

    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds() or 1.0
    cut1 = lo + dt.timedelta(seconds=span / live_state.LIVE_STATE_CHUNKS)
    chunk0_keys = {
        r.user_id
        for r in ev.where(F.col("ts") < F.lit(cut1))
        .select("user_id")
        .distinct()
        .collect()
    }

    v0 = {
        r["key"]["user_id"]
        for r in live_state.read_live_state(spark, ckpt, batch_id=0).collect()
    }
    assert v0 == chunk0_keys

    # Version b holds exactly the cumulative distinct keys of replay
    # chunks 0..b (infinite-retention dedup state) — an exact pin at
    # any SF (at sf0.001 every chunk already carries all users, so a
    # strict-growth assertion would be vacuous there).
    for b in range(last + 1):
        bound = lo + dt.timedelta(seconds=span * (b + 1) / live_state.LIVE_STATE_CHUNKS)
        expect = ev.where(F.col("ts") < F.lit(bound)) if b < last else ev
        expect_keys = {
            r.user_id for r in expect.select("user_id").distinct().collect()
        }
        got = {
            r["key"]["user_id"]
            for r in live_state.read_live_state(spark, ckpt, batch_id=b).collect()
        }
        assert got == expect_keys, f"version {b}"

    latest = {
        r["key"]["user_id"]
        for r in live_state.read_live_state(spark, ckpt).collect()
    }
    explicit = {
        r["key"]["user_id"]
        for r in live_state.read_live_state(spark, ckpt, batch_id=last).collect()
    }
    assert latest == explicit


def test_live_state_unknown_version_is_loud(spark, sf_dir):
    """Reading an uncommitted version must raise, not return stale or
    empty state silently."""
    ckpt = live_state.dedup_state_checkpoint(spark, sf_dir)
    with pytest.raises(Exception, match="[Bb]atch|[Cc]ommitted|offset"):
        live_state.read_live_state(
            spark, ckpt, batch_id=live_state.LIVE_STATE_CHUNKS + 50
        ).collect()


def test_change_feed_folds_to_snapshot_and_attributes_batches(spark, sf_dir):
    """The change feed (r8 — the KS changelog-topic analog): (a) the
    last change per key reproduces the final snapshot read exactly;
    (b) for infinite-retention dedup every key mutates exactly ONCE,
    in the chunk that first saw it (the same cumulative expectation
    the point-in-time test pins); (c) a bounded
    [changeStartBatchId, changeEndBatchId] range returns exactly the
    batches asked for."""
    ckpt = live_state.dedup_state_checkpoint(spark, sf_dir)
    feed = engine.get_queries()["store_live_state_change_feed"](
        spark, sf_dir
    ).collect()

    # (b) one mutation per key, non-delete
    assert len({r.user_id for r in feed}) == len(feed)
    assert all(r.change_type != "delete" for r in feed)

    snapshot_keys = {
        r["key"]["user_id"]
        for r in live_state.read_live_state(spark, ckpt).collect()
    }
    assert {r.user_id for r in feed} == snapshot_keys  # (a)

    # (b) insert batch == first chunk containing the user
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds() or 1.0
    last = live_state.LIVE_STATE_CHUNKS - 1
    seen: set = set()
    for b in range(last + 1):
        bound = lo + dt.timedelta(
            seconds=span * (b + 1) / live_state.LIVE_STATE_CHUNKS
        )
        cum = ev.where(F.col("ts") < F.lit(bound)) if b < last else ev
        cum_keys = {
            r.user_id for r in cum.select("user_id").distinct().collect()
        }
        expect_new = cum_keys - seen
        got_new = {r.user_id for r in feed if r.batch_id == b}
        assert got_new == expect_new, f"batch {b}"
        seen = cum_keys

    # (c) bounded range
    ranged = live_state.read_state_change_feed(
        spark, ckpt, start_batch_id=1, end_batch_id=1
    ).collect()
    assert {r["batch_id"] for r in ranged} <= {1}
    assert {r["key"]["user_id"] for r in ranged} == {
        r.user_id for r in feed if r.batch_id == 1
    }


def test_live_window_store_matches_batch_tumbling(spark, sf_dir):
    """Live WindowStore reads (r8): the streaming tumbling count's
    state — read via the State Data Source — equals the batch
    (day × event_type) counts exactly (no watermark → every window
    retained, the KS persistent WindowStore shape)."""
    got = {
        (r.day, r.event_type): r.n_events
        for r in engine.get_queries()["store_live_window_counts"](
            spark, sf_dir
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.day, r.event_type): r.n_events
        for r in ev.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
        )
        .collect()
    }
    assert got == want


def _batch_session_agg(ev):
    return (
        ev.groupBy(
            F.session_window(
                "ts", f"{live_state.SESSION_STATE_GAP_MINUTES} minutes"
            ).alias("sw"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def test_live_session_store_matches_batch_session_window(spark, sf_dir):
    """Live SessionStore fetchAll (r9): the streaming session-window
    aggregation's state — read via the State Data Source — equals the
    batch F.session_window aggregation exactly on (key, start, end,
    count); the float sum agrees to 1e-6 (state buffer sums in arrival
    order, batch in scan order)."""
    ckpt = live_state.session_state_checkpoint(spark, sf_dir)
    live = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in live_state.session_state_fetch(spark, ckpt).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    want = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in _batch_session_agg(ev).collect()
    }
    assert live.keys() == want.keys()
    for k, (n, v) in want.items():
        ln, lv = live[k]
        assert ln == n
        assert lv == pytest.approx(v, abs=1e-6)


def test_live_session_fetch_matches_bucketed_store(spark, sf_dir):
    """[R ReadOnlySessionStore#fetch(7)] live vs the batch-materialized
    bucketed session store (LAG sessionization): same sessions for the
    key, with the live end == LAG end + gap (session_window's half-open
    [start, last_event + gap) contract vs the LAG form's last-event
    end)."""
    from minefields_kafka_streams_deduplication_spark.sources.state_store import (
        materialize_session_store,
        session_store_fetch,
    )

    out = engine.get_queries()["store_live_session_fetch"](spark, sf_dir)
    live = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in out.collect()
    }
    gap = dt.timedelta(minutes=live_state.SESSION_STATE_GAP_MINUTES)
    store = materialize_session_store(spark, sf_dir)
    bucketed = {
        (r.user_id, r.session_start, r.session_end + gap): r.n_events
        for r in session_store_fetch(spark, store, 7).collect()
    }
    assert live == bucketed and len(live) > 0


def test_live_session_point_in_time_and_cross_batch_merge(spark, sf_dir):
    """Version 0 of the session state == the batch session aggregation
    over replay chunk 0 alone (point-in-time read), and the final
    version is NOT the disjoint union of per-chunk sessionizations
    whenever any session spans a chunk boundary — sessions MERGE in
    state across commits."""
    ckpt = live_state.session_state_checkpoint(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo).total_seconds() or 1.0
    cut1 = lo + dt.timedelta(seconds=span / live_state.LIVE_STATE_CHUNKS)

    v0 = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in live_state.session_state_fetch(spark, ckpt, batch_id=0).collect()
    }
    want0 = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in _batch_session_agg(ev.where(F.col("ts") < F.lit(cut1))).collect()
    }
    assert v0 == want0

    final = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in live_state.session_state_fetch(spark, ckpt).collect()
    }
    # Any chunk-0 session extended by a later chunk keeps its key's
    # start but grows its end/count — pin that the merge semantics
    # (not an append) applied wherever a boundary session exists.
    extended = {
        (u, s) for (u, s, e) in v0 if (u, s, e) not in final
    }
    for u, s in extended:
        assert any(u2 == u and s2 == s for (u2, s2, _) in final)


def test_session_state_shard_migration_parity(spark, sf_dir, tmp_path):
    """Shard migration (r10): replaying the session store's SNAPSHOT
    (two weighted bootstrap rows per session) into a fresh checkpoint
    at double the shard count serves the identical fetchAll — window
    extents and counts exact, sums to float tolerance — across MORE
    state shards, with cost O(state), not O(event history)."""
    from minefields_kafka_streams_deduplication_spark.streaming.source import (
        STREAM_SHUFFLE_PARTITIONS,
    )
    from minefields_kafka_streams_deduplication_spark.streaming.state_migration import (
        migrate_session_state,
    )

    old_ckpt = live_state.session_state_checkpoint(spark, sf_dir)
    new_shards = STREAM_SHUFFLE_PARTITIONS * 2
    new_ckpt = migrate_session_state(
        spark, old_ckpt, str(tmp_path / "resized"), new_shards
    )

    def fetch(ckpt):
        return {
            (r.user_id, r.session_start, r.session_end): (
                r.n_events, r.total_value,
            )
            for r in live_state.session_state_fetch(spark, ckpt).collect()
        }

    old, new = fetch(old_ckpt), fetch(new_ckpt)
    assert old.keys() == new.keys() and len(old) > 0
    for k, (n, v) in old.items():
        nn, nv = new[k]
        assert nn == n
        assert nv == pytest.approx(v, abs=1e-6)

    # the migrated store really is re-sharded: state rows live in
    # shards beyond the old 0..STREAM_SHUFFLE_PARTITIONS-1 range
    shards = {
        r.partition_id
        for r in live_state.read_live_state(spark, new_ckpt)
        .select("partition_id")
        .distinct()
        .collect()
    }
    assert max(shards) >= STREAM_SHUFFLE_PARTITIONS
    assert shards <= set(range(new_shards))


def test_keyvalue_state_shard_migration_parity(spark, sf_dir, tmp_path):
    """KV-store migration twin: the dedup store's state IS its seen-key
    set, so the key-snapshot replay regenerates the same key set at
    the new shard count."""
    from minefields_kafka_streams_deduplication_spark.streaming.source import (
        STREAM_SHUFFLE_PARTITIONS,
    )
    from minefields_kafka_streams_deduplication_spark.streaming.state_migration import (
        migrate_keyvalue_state,
    )

    old_ckpt = live_state.dedup_state_checkpoint(spark, sf_dir)
    new_shards = STREAM_SHUFFLE_PARTITIONS * 2
    new_ckpt = migrate_keyvalue_state(
        spark, old_ckpt, str(tmp_path / "resized_kv"), new_shards
    )

    def keys(ckpt):
        return {
            r.user_id
            for r in live_state.read_live_state(spark, ckpt)
            .select(F.col("key.user_id").alias("user_id"))
            .collect()
        }

    assert keys(old_ckpt) == keys(new_ckpt) and len(keys(old_ckpt)) > 0


def test_registered_migrated_fetch_matches_live_fetch(spark, sf_dir):
    """The registered rows-only query over the RE-SHARDED checkpoint
    returns exactly the live store's fetch(7) rows — the migration is
    invisible to the reader."""
    out = engine.get_queries()["store_migrated_session_fetch"](spark, sf_dir)
    live = engine.get_queries()["store_live_session_fetch"](spark, sf_dir)
    assert [tuple(r) for r in out.collect()] == [tuple(r) for r in live.collect()]


def test_live_session_checkpoint_extends_on_new_files(spark, tmp_path):
    """Spark-native incrementality for the live stores: a RETAINED
    checkpoint re-run over its file source picks up only the NEW
    files — sessions merge across the two runs in state, and the
    fetch serves the union. (The unified batch store folds appends
    through apply_session_batch; the live stores get the same
    append-economics from Structured Streaming itself.)"""
    import datetime as dt

    from minefields_kafka_streams_deduplication_spark.streaming.live_state import (
        SESSION_STATE_GAP_MINUTES,
        session_state_fetch,
    )

    t0 = dt.datetime(2024, 1, 1)
    stage = str(tmp_path / "stage")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(stage)
        agg = (
            stream.withWatermark("ts", "36500 days")
            .groupBy(
                F.session_window(
                    "ts", f"{SESSION_STATE_GAP_MINUTES} minutes"
                ).alias("session_window"),
                "user_id",
            )
            .agg(F.count(F.lit(1)).alias("count"), F.sum("value").alias("sum"))
        )
        q = (
            agg.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    slice_a = [(7, t0, 1.0), (8, t0 + dt.timedelta(hours=2), 2.0)]
    spark.createDataFrame(slice_a, schema).coalesce(1).write.mode(
        "append"
    ).parquet(stage)
    run_once()
    first = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in session_state_fetch(spark, ckpt).collect()
    }
    assert len(first) == 2

    # slice B: one event EXTENDING user 7's open session (20-min gap)
    # and one brand-new session — dropped as a new file, same source
    slice_b = [
        (7, t0 + dt.timedelta(minutes=20), 3.0),
        (9, t0 + dt.timedelta(hours=5), 4.0),
    ]
    spark.createDataFrame(slice_b, schema).coalesce(1).write.mode(
        "append"
    ).parquet(stage)
    run_once()
    got = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in session_state_fetch(spark, ckpt).collect()
    }
    assert len(got) == 3
    assert got[(7, t0)][0] == 2          # cross-run session MERGE in state
    assert got[(7, t0)][1] == 4.0        # 1.0 + 3.0
    assert (9, t0 + dt.timedelta(hours=5)) in got
