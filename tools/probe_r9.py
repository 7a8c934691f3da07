"""Round-9 scale probes (VERDICT r8 #3/#5/#7 + new-op probes).

Protocol (SCALING.md): warm the plan shape at sf0.001, time at the
replicated /tmp/probe{10x,100x,1000x} fixtures (base sf0.01), noop sink
to force full evaluation. Stages selectable by argv:

    python tools/probe_r9.py sessions1000 interference newq10 newq1000 \
        dlq100 livesession100 annindex1000
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


def probe(name: str, sf: str, warm: bool = True, tag: str = "") -> float:
    if warm:
        try:
            sink(QS[name](spark, WARM))
        except Exception as e:
            print(json.dumps({"probe": name, "warm_err": str(e)[:200]}), flush=True)
    spark.catalog.clearCache()
    # r9 interference finding: a heavy query's lazily-localCheckpointed
    # frames hold block-manager memory until ContextCleaner sees the
    # RDD unreachable — which needs a driver JVM GC. Without this, the
    # NEXT query runs memory-squeezed (measured 4.5 -> 19.7 s on
    # attribution after the jaccard self-join; GC restores 2.6 s).
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    sink(QS[name](spark, sf))
    sec = round(time.time() - t0, 1)
    rec = {"probe": name, "sf": sf, "sec": sec}
    if tag:
        rec["tag"] = tag
    print(json.dumps(rec), flush=True)
    return sec


def _drop_session_frame_cache(sf: str) -> None:
    from minefields_kafka_streams_deduplication_spark.catalog import fingerprint_dir

    root, ready = fingerprint_dir("sessions", os.path.join(sf, "events.parquet"))
    if ready:
        shutil.rmtree(root, ignore_errors=True)


def stage_sessions1000() -> None:
    """Sessionize-once at 100M events (VERDICT r8 #3): the FIRST
    consumer pays the frame build (the one per-user sort); every later
    consumer is a scan of the compact per-session frame. r8 solo costs
    for comparison: session_path_topk 272.6 s,
    median_session_length_by_day 327.1 s, bounce 457 s — each paid the
    full sort independently."""
    _drop_session_frame_cache(P1000)
    consumers = [
        "session_path_topk",            # pays the build
        "median_session_length_by_day", # scan-only from here on
        "bounce_rate_daily",
        "concurrent_sessions_hourly",
        "session_duration_percentiles",
        "window_session_sql",
    ]
    for i, q in enumerate(consumers):
        probe(q, P1000, tag="builds_frame" if i == 0 else "scan_only")


def stage_interference() -> None:
    """VERDICT r8 #5: chase the session-accumulation interference
    (327 s solo -> 648 s after the jaccard self-join at 1000x in r8).
    A/B the mechanism levers on a sort-class query that still pays its
    own per-user window (attribution_last_touch):

      t1  solo (fresh-ish session)
      t2  immediately after event_type_user_jaccard
      t3  after clearCache + explicit JVM System.gc()
      t4  after a second gc + 30 s settle (ContextCleaner drain)

    If t2 >> t1 and t3/t4 recover -> executor-heap/GC pressure.
    If nothing recovers inside the session -> shuffle-file or codegen
    accumulation. Heap samples printed with each step."""
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()

    def heap_gb() -> float:
        return round((rt.totalMemory() - rt.freeMemory()) / 1e9, 1)

    target = "attribution_last_touch"
    print(json.dumps({"step": "t1", "heap_gb": heap_gb()}), flush=True)
    t1 = probe(target, P1000, tag="solo")
    print(json.dumps({"step": "jaccard", "heap_gb": heap_gb()}), flush=True)
    probe("event_type_user_jaccard", P1000, warm=False, tag="heavy")
    print(json.dumps({"step": "t2", "heap_gb": heap_gb()}), flush=True)
    t2 = probe(target, P1000, warm=False, tag="after_heavy")
    spark.catalog.clearCache()
    jvm.java.lang.System.gc()
    time.sleep(5)
    print(json.dumps({"step": "t3", "heap_gb": heap_gb()}), flush=True)
    t3 = probe(target, P1000, warm=False, tag="after_gc")
    jvm.java.lang.System.gc()
    time.sleep(30)
    print(json.dumps({"step": "t4", "heap_gb": heap_gb()}), flush=True)
    t4 = probe(target, P1000, warm=False, tag="after_gc_settle")
    print(
        json.dumps(
            {"interference": {"t1": t1, "t2": t2, "t3": t3, "t4": t4},
             "heap_gb": heap_gb()}
        ),
        flush=True,
    )


NEW_R9 = [
    "order_value_buckets", "shipping_delay_histogram",
    "discount_revenue_curve", "monthly_order_status_mix",
    "clv_quartiles_by_nation", "inter_purchase_days_median_by_nation",
    "events_hourly_seasonality", "weekday_hour_peak_load",
    "session_duration_percentiles", "token_length_histogram",
    "stopword_density_histogram", "char_class_profile_by_lang",
    "lang_confusion_matrix", "part_type_revenue_topk",
    "basket_size_distribution", "returned_rate_by_month",
    "user_funnel_depth_distribution", "first_day_conversion_by_cohort",
    "corpus_token_budget_by_source", "dedup_savings_by_source",
]


def stage_newq10() -> None:
    for q in NEW_R9:
        probe(q, P10)


def stage_newq1000() -> None:
    for q in NEW_R9:
        probe(q, P1000)


def stage_dlq100() -> None:
    """Streaming DLQ two-sink router at 10M events (a real availableNow
    stream: serialize + corrupt + 3-slice stage + route + sink scan)."""
    probe("kafka_stream_dlq_routing", P100)


def stage_livesession100() -> None:
    """Live SessionStore at 10M events: streaming session_window agg
    with retained checkpoint, then the State Data Source fetch."""
    probe("store_live_session_fetch", P100)


def stage_streaming1000() -> None:
    """The two r9 streaming harnesses at 100M events: the DLQ router
    (serialize + corrupt + 3-slice stage + two idempotent sinks) and
    the live SessionStore (streaming session_window agg + State Data
    Source fetch)."""
    probe("kafka_stream_dlq_routing", P1000)
    probe("store_live_session_fetch", P1000)


def stage_sessinc1000() -> None:
    """Incremental sessionization at 100M events (3 micro-batches of
    ~33M): per-commit cost = batch sessionization + touched-bucket
    rewrite; compare the 97.8 s one-shot frame build."""
    probe("session_frame_incremental", P1000)


def stage_batch3_1000() -> None:
    for q in ("corpus_token_budget_by_source", "dedup_savings_by_source"):
        probe(q, P10)
        probe(q, P1000)


def stage_annindex1000() -> None:
    """Persisted IVF-PQ index at 500K vectors with the r9 equal-bytes
    winner config (m=4 x k=256, re-rank default ON); r8's config read
    27.0 s including build on its fixture."""
    probe("ann_ivf_pq_index_roundtrip", P1000)


STAGES = {
    "sessions1000": stage_sessions1000,
    "interference": stage_interference,
    "newq10": stage_newq10,
    "newq1000": stage_newq1000,
    "dlq100": stage_dlq100,
    "livesession100": stage_livesession100,
    "annindex1000": stage_annindex1000,
    "sessinc1000": stage_sessinc1000,
    "batch3_1000": stage_batch3_1000,
    "streaming1000": stage_streaming1000,
}

if __name__ == "__main__":
    for arg in sys.argv[1:]:
        print(json.dumps({"stage": arg, "start": time.strftime("%H:%M:%S")}), flush=True)
        STAGES[arg]()
    print(json.dumps({"done": True}), flush=True)
