"""Round-8 scale probes (VERDICT r7 #2/#6/#7 + new-op probes).

Protocol (SCALING.md): warm the plan shape at sf0.001, time at the
replicated /tmp/probe{10x,100x,1000x} fixtures (base sf0.01), noop sink
to force full evaluation. Stages selectable by argv so long stages can
run alone in tmux:

    python tools/probe_r8.py analytics1000 docs1000 orders1000 opq scd2 livestate
"""

from __future__ import annotations

import json
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


def probe(name: str, sf: str, warm: bool = True) -> None:
    if warm:
        try:
            sink(QS[name](spark, WARM))
        except Exception as e:  # warm failures are informational only
            print(json.dumps({"probe": name, "warm_err": str(e)[:200]}), flush=True)
    spark.catalog.clearCache()
    t0 = time.time()
    sink(QS[name](spark, sf))
    print(
        json.dumps({"probe": name, "sf": sf, "sec": round(time.time() - t0, 1)}),
        flush=True,
    )


def stage_analytics1000() -> None:
    """The r7 events-based analytics family at 1000x (100M events)."""
    for q in ("attribution_last_touch", "bounce_rate_daily", "rfm_segments",
              "inter_event_gap_stats_bucketed"):
        probe(q, P1000)


def stage_docs1000() -> None:
    """The r7 documents-based curation family at 1000x (5M docs,
    exact-duplicate-heavy by fixture construction)."""
    for q in ("dedup_keep_by_source_priority", "decontaminate_report",
              "tokens_per_doc_percentiles"):
        probe(q, P1000)


def stage_orders1000() -> None:
    """order_fulfillment_latency at 1000x (600M lineitem x 150M-key
    orders FK join). Requires the extended fixture tables."""
    probe("order_fulfillment_latency", P1000)


def stage_opq() -> None:
    """OPQ-rotated residual IVF-PQ (new r8) at 100x (200K vecs) and
    1000x (2M vecs) — should track the residual form's probe rows
    (the scan shape is identical; OPQ adds one driver-side rotation)."""
    probe("ann_ivf_pq_opq", P100)
    probe("ann_ivf_pq_opq", P1000)


def stage_scd2() -> None:
    """scd2_change_stream at 100x (10M events) through the r8
    parquet-sink streaming harness (VERDICT r7 #2's 'done' row)."""
    probe("scd2_change_stream", P100)


def stage_livestate() -> None:
    """store_live_streaming_state at 100x — the State Data Source read
    on a 10M-event dedup checkpoint."""
    probe("store_live_streaming_state", P100)


BATCH2 = (
    "new_vs_returning_daily",
    "revenue_mom_growth",
    "customer_lifespan_buckets",
    "basket_part_pairs_top",
    "bigram_pmi_top",
    "doc_length_token_corr",
    "concurrent_sessions_hourly",
)


def stage_batch2_10() -> None:
    """The late-r8 batch-2 queries at 10x."""
    for q in BATCH2:
        probe(q, P10)


def stage_batch2_1000() -> None:
    """Batch-2 at 1000x (100M events / 5M copy-heavy docs / 15M orders /
    60M lineitem). concurrent_sessions_hourly is the 100M-row
    sessionization sort class (bounce_rate_daily's cost) — run last."""
    for q in BATCH2:
        probe(q, P1000)


BATCH3 = (
    "label_centroid_distances",
    "tokens_mad_by_lang",
    "spend_decile_migration",
)
# Broadcast-reexecution sweep + copy-collapse rewrites (late r8): the
# queries whose 1000x rows changed; re-run one per fresh session for
# clean numbers (SCALING.md r7 contention lesson).
SWEEP_FIXED = (
    "revenue_mom_growth", "weekly_active_growth", "event_transition_matrix",
    "event_type_user_jaccard", "rfm_segments", "power_user_concentration",
    "importance_weight_dsir", "doc_unigram_logprob", "doc_bigram_logprob",
    "diagnose_key_skew", "tfidf_top_terms", "bm25_doc_search",
)


def stage_batch3() -> None:
    for q in BATCH3:
        probe(q, P10)
    for q in BATCH3:
        probe(q, P1000)


def stage_sweep_fixed() -> None:
    for q in SWEEP_FIXED:
        probe(q, P1000)


STAGES = {
    "analytics1000": stage_analytics1000,
    "batch2_10": stage_batch2_10,
    "batch2_1000": stage_batch2_1000,
    "batch3": stage_batch3,
    "sweep_fixed": stage_sweep_fixed,
    "docs1000": stage_docs1000,
    "orders1000": stage_orders1000,
    "opq": stage_opq,
    "scd2": stage_scd2,
    "livestate": stage_livestate,
}

if __name__ == "__main__":
    for arg in sys.argv[1:]:
        print(json.dumps({"stage": arg, "start": time.strftime("%H:%M:%S")}), flush=True)
        STAGES[arg]()
    print(json.dumps({"done": True}), flush=True)
