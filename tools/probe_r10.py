"""Round-10 scale probes (VERDICT r9 #3/#5/#7 + new-op probes).

Protocol (SCALING.md): warm the plan shape at sf0.001, time at the
replicated /tmp/probe{10x,1000x} fixtures (base sf0.01), noop sink to
force full evaluation, JVM GC between probes (the r9 interference
discipline). Stages selectable by argv:

    python tools/probe_r10.py unified1000 append1000 migrate1000 \
        newq10 newq1000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import minefields_kafka_streams_deduplication_spark as engine  # noqa: E402

P10, P100, P1000 = "/tmp/probe10x", "/tmp/probe100x", "/tmp/probe1000x"
WARM = "/root/testdata/sf0.001"
APPEND_ROOT = "/tmp/probe_sessappend"  # dir-based events source for appends

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "100g")
    .getOrCreate()
)
QS = engine.get_queries()


def sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def gc() -> None:
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def probe(name: str, sf: str, warm: bool = True, tag: str = "") -> float:
    if warm:
        try:
            sink(QS[name](spark, WARM))
        except Exception as e:
            print(json.dumps({"probe": name, "warm_err": str(e)[:200]}), flush=True)
    gc()
    t0 = time.time()
    sink(QS[name](spark, sf))
    sec = round(time.time() - t0, 1)
    rec = {"probe": name, "sf": sf, "sec": sec}
    if tag:
        rec["tag"] = tag
    print(json.dumps(rec), flush=True)
    return sec


def _drop_unified_root(events_path: str) -> None:
    from minefields_kafka_streams_deduplication_spark.streaming.session_incremental import (
        _session_root,
    )

    shutil.rmtree(_session_root(events_path), ignore_errors=True)


def stage_unified1000() -> None:
    """Unified session store at 10M events: the FIRST consumer folds
    everything as batch 0 (the one per-user sort + state write); every
    later consumer scans the maintained open/closed state. r9
    one-shot-cache numbers for comparison: build 97.8 s, consumers
    0.4-5.1 s."""
    _drop_unified_root(os.path.join(P1000, "events.parquet"))
    consumers = [
        "session_path_topk",            # pays the fold
        "median_session_length_by_day", # state scan from here on
        "bounce_rate_daily",
        "concurrent_sessions_hourly",
        "session_duration_percentiles",
        "window_session_sql",
    ]
    for i, q in enumerate(consumers):
        probe(q, P1000, tag="folds_batch0" if i == 0 else "scan_only")


def stage_append1000() -> None:
    """The unification payoff (VERDICT r9 #3 done-criterion): against
    10M events of maintained state, APPEND a 100k-event tail and query
    — cost must be ~one incremental commit + a scan, not the ~100 s
    batch-0 rebuild. Uses a directory events source (base symlink +
    tail file), the production append shape."""
    from pyspark.sql import functions as F

    from minefields_kafka_streams_deduplication_spark.catalog import load_table

    ev_dir = os.path.join(APPEND_ROOT, "events.parquet")
    shutil.rmtree(APPEND_ROOT, ignore_errors=True)
    os.makedirs(ev_dir)
    os.symlink(
        os.path.join(P1000, "events.parquet"), os.path.join(ev_dir, "base.parquet")
    )
    _drop_unified_root(ev_dir)

    t0 = time.time()
    sink(QS["session_path_topk"](spark, APPEND_ROOT))
    print(
        json.dumps(
            {"probe": "append_base_build", "sf": APPEND_ROOT,
             "sec": round(time.time() - t0, 1), "tag": "folds_batch0"}
        ),
        flush=True,
    )

    # tail: sf0.1's 100k events shifted past the base max ts (in
    # contract — a pure append), one parquet file dropped into the dir
    base_hi = (
        spark.read.parquet(os.path.join(ev_dir, "base.parquet"))
        .agg(F.max("ts")).first()[0]
    )
    tail_src = load_table(spark, "/root/testdata/sf0.1", "events")
    lo = tail_src.agg(F.min("ts")).first()[0]
    shift_us = int((base_hi - lo).total_seconds() * 1_000_000) + 60_000_000
    tail = tail_src.withColumn(
        "ts", F.timestamp_micros(F.unix_micros("ts") + F.lit(shift_us))
    )
    tail.coalesce(1).write.mode("overwrite").parquet("/tmp/probe_tail_tmp")
    part = next(
        p for p in os.listdir("/tmp/probe_tail_tmp") if p.endswith(".parquet")
    )
    shutil.copy(
        os.path.join("/tmp/probe_tail_tmp", part),
        os.path.join(ev_dir, "tail.parquet"),
    )
    gc()
    t0 = time.time()
    sink(QS["session_path_topk"](spark, APPEND_ROOT))
    print(
        json.dumps(
            {"probe": "append_100k_then_query", "sf": APPEND_ROOT,
             "sec": round(time.time() - t0, 1), "tag": "incremental_fold"}
        ),
        flush=True,
    )
    gc()
    t0 = time.time()
    sink(QS["median_session_length_by_day"](spark, APPEND_ROOT))
    print(
        json.dumps(
            {"probe": "post_append_scan", "sf": APPEND_ROOT,
             "sec": round(time.time() - t0, 1), "tag": "scan_only"}
        ),
        flush=True,
    )


def stage_migrate1000() -> None:
    """Shard migration at 10M events (VERDICT r9 #5 done-criterion):
    the live session checkpoint froze at 8 shards (r9 measured the
    8-shard read at 608.7 s inside the full build+fetch); migrate the
    state snapshot into a 32-shard checkpoint and time the re-sized
    fetch."""
    from minefields_kafka_streams_deduplication_spark.streaming import live_state
    from minefields_kafka_streams_deduplication_spark.streaming.state_migration import (
        migrate_session_state,
    )

    t0 = time.time()
    ckpt = live_state.session_state_checkpoint(spark, P1000)
    print(
        json.dumps(
            {"probe": "livesession_checkpoint", "sf": P1000,
             "sec": round(time.time() - t0, 1),
             "tag": "build_or_cached"}
        ),
        flush=True,
    )
    gc()
    t0 = time.time()
    sink(live_state.session_state_fetch(spark, ckpt))
    print(
        json.dumps(
            {"probe": "session_fetch_8_shards", "sf": P1000,
             "sec": round(time.time() - t0, 1)}
        ),
        flush=True,
    )
    gc()
    new_root = "/tmp/probe_migrate32"
    shutil.rmtree(new_root, ignore_errors=True)
    t0 = time.time()
    new_ckpt = migrate_session_state(spark, ckpt, new_root, 32)
    print(
        json.dumps(
            {"probe": "migrate_8_to_32", "sf": P1000,
             "sec": round(time.time() - t0, 1),
             "tag": "snapshot_replay"}
        ),
        flush=True,
    )
    gc()
    t0 = time.time()
    sink(live_state.session_state_fetch(spark, new_ckpt))
    print(
        json.dumps(
            {"probe": "session_fetch_32_shards", "sf": P1000,
             "sec": round(time.time() - t0, 1)}
        ),
        flush=True,
    )


NEW_R10 = [
    "dedup_cross_source_matrix",
    "event_disorder_profile",
    "token_first_seen_by_source",
    "order_lines_span_days_histogram",
    "session_gap_sensitivity",
]


def stage_newq10() -> None:
    for q in NEW_R10:
        probe(q, P10)


def stage_newq1000() -> None:
    for q in NEW_R10:
        probe(q, P1000)


def stage_repair1000() -> None:
    """Durable late repair + compaction at 10M events: fold the corpus
    as batch 0, commit a tail batch carrying out-of-contract events
    (quarantined), then time (a) a minor compaction (folds only the
    tail's closed dirs), (b) the reconciled merge-on-read view, and
    (c) the durable repair (O(corpus) base-generation rewrite)."""
    from pyspark.sql import functions as F

    from minefields_kafka_streams_deduplication_spark.catalog import (
        load_table,
        normalize_events_ts,
    )
    from minefields_kafka_streams_deduplication_spark.streaming import (
        session_incremental as si,
    )

    state = "/tmp/probe_repair1000/state"
    shutil.rmtree("/tmp/probe_repair1000", ignore_errors=True)
    ev = normalize_events_ts(
        spark.read.parquet(os.path.join(P1000, "events.parquet"))
    ).select("user_id", "event_id", "ts", "value", "event_type")
    gc()
    t0 = time.time()
    si.apply_session_batch(spark, state, ev, 0)
    print(
        json.dumps(
            {"probe": "repair_fold_batch0", "sf": P1000,
             "sec": round(time.time() - t0, 1)}
        ),
        flush=True,
    )
    # tail: sf0.01's 10k events — half shifted past the corpus max
    # (in contract), half left at their original times (hours behind
    # the watermark → quarantined)
    hi = ev.agg(F.max("ts")).first()[0]
    tail_src = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "user_id", "event_id", "ts", "value", "event_type"
    )
    lo = tail_src.agg(F.min("ts")).first()[0]
    shift_us = int((hi - lo).total_seconds() * 1_000_000) + 60_000_000
    tail = tail_src.withColumn(
        "ts",
        F.when(
            F.col("event_id") % 2 == 0,
            F.timestamp_micros(F.unix_micros("ts") + F.lit(shift_us)),
        ).otherwise(F.col("ts")),
    )
    gc()
    t0 = time.time()
    si.apply_session_batch(spark, state, tail, 1)
    n_late = si.read_late_events(spark, state).count()
    print(
        json.dumps(
            {"probe": "repair_tail_commit", "sf": P1000,
             "sec": round(time.time() - t0, 1), "tag": f"late={n_late}"}
        ),
        flush=True,
    )
    gc()
    t0 = time.time()
    si.compact_session_state(spark, state)
    print(
        json.dumps(
            {"probe": "repair_minor_compaction", "sf": P1000,
             "sec": round(time.time() - t0, 1), "tag": "folds tail dirs only"}
        ),
        flush=True,
    )
    gc()
    t0 = time.time()
    sink(si.read_session_state_reconciled(spark, state))
    print(
        json.dumps(
            {"probe": "repair_reconciled_view_read", "sf": P1000,
             "sec": round(time.time() - t0, 1), "tag": "merge-on-read"}
        ),
        flush=True,
    )
    gc()
    t0 = time.time()
    si.repair_late_events(spark, state)
    print(
        json.dumps(
            {"probe": "repair_durable", "sf": P1000,
             "sec": round(time.time() - t0, 1),
             "tag": "base-generation rewrite"}
        ),
        flush=True,
    )
    gc()
    t0 = time.time()
    sink(si.read_session_state(spark, state))
    print(
        json.dumps(
            {"probe": "repair_post_read", "sf": P1000,
             "sec": round(time.time() - t0, 1), "tag": "plain read"}
        ),
        flush=True,
    )


def stage_skew1000() -> None:
    """Skew-safe sessionization A/B at 10M events with ONE user owning
    ~30% of the corpus (the power-key straggler no AQE setting fixes —
    stateful keys can't salt): plain per-user build vs the chunked
    builder (sessionize within (user, 1-day chunk), interval-merge the
    compact pieces)."""
    from pyspark.sql import functions as F

    from minefields_kafka_streams_deduplication_spark.catalog import (
        normalize_events_ts,
    )
    from minefields_kafka_streams_deduplication_spark.streaming.session_incremental import (
        build_session_rows,
        build_session_rows_chunked,
    )

    skew_dir = "/tmp/probe_skew/events.parquet"
    if not os.path.exists(skew_dir):
        ev = normalize_events_ts(
            spark.read.parquet(os.path.join(P1000, "events.parquet"))
        ).select("user_id", "event_id", "ts", "value", "event_type")
        hot = F.when(F.col("event_id") % 10 < 3, F.lit(777_777)).otherwise(
            F.col("user_id")
        )
        ev.withColumn("user_id", hot).write.mode("overwrite").parquet(skew_dir)
    ev = spark.read.parquet(skew_dir)
    n_hot = ev.where(F.col("user_id") == 777_777).count()
    print(json.dumps({"probe": "skew_fixture", "hot_rows": n_hot}), flush=True)
    for label, builder in [
        ("sessionize_plain_hotkey", lambda d: build_session_rows(d)),
        ("sessionize_chunked_hotkey",
         lambda d: build_session_rows_chunked(d, chunk_days=1)),
    ]:
        gc()
        t0 = time.time()
        sink(builder(ev))
        print(
            json.dumps(
                {"probe": label, "sf": "/tmp/probe_skew",
                 "sec": round(time.time() - t0, 1)}
            ),
            flush=True,
        )


STAGES = {
    "unified1000": stage_unified1000,
    "append1000": stage_append1000,
    "migrate1000": stage_migrate1000,
    "newq10": stage_newq10,
    "newq1000": stage_newq1000,
    "repair1000": stage_repair1000,
    "skew1000": stage_skew1000,
}

if __name__ == "__main__":
    for name in sys.argv[1:]:
        STAGES[name]()
    spark.stop()
