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
