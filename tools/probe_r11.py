"""Round-11 scale probes: the five new oracle queries at 10×/1000× and
the AUTO skew-guard fold A/B (VERDICT r10 #5's SCALING row).

Protocol (SCALING.md): warm the plan shape at sf0.001, time at the
replicated /tmp/probe{10x,1000x} fixtures (base sf0.01), noop sink to
force full evaluation, JVM GC between probes. Same 100g probe harness
as r9/r10 (documented ~4-5× inflation vs a default-tuned session —
compare rows within the harness, not across to bench.py).

    python tools/probe_r11.py newq10 newq1000 autoskew
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

P10, P1000 = "/tmp/probe10x", "/tmp/probe1000x"
WARM = "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "100g")
    .getOrCreate()
)
QS = engine.get_queries()

NEW_QUERIES = [
    "dedup_prefix_digest",
    "supplier_revenue_hhi_by_nation",
    "customer_reorder_interval_buckets",
    "event_type_burstiness",
    "token_cooccurrence_topk",
]


def sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def gc() -> None:
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()


def probe(name: str, sf: str) -> None:
    try:
        sink(QS[name](spark, WARM))
    except Exception as e:
        print(json.dumps({"probe": name, "warm_err": str(e)[:200]}), flush=True)
    gc()
    t0 = time.time()
    sink(QS[name](spark, sf))
    print(
        json.dumps(
            {"probe": name, "sf": sf, "sec": round(time.time() - t0, 1)}
        ),
        flush=True,
    )


def stage_newq10() -> None:
    for q in NEW_QUERIES:
        probe(q, P10)


def stage_newq1000() -> None:
    for q in NEW_QUERIES:
        probe(q, P1000)


def stage_autoskew() -> None:
    """The SELF-APPLYING skew guard at 10M events with one user owning
    ~30%: apply_session_batch under the default chunk_days='auto' must
    detect the power key (one count aggregate) and land in chunked-
    builder territory; the forced plain fold is the straggler baseline.
    r10's builder-level A/B read 116.6 s plain vs 15.5 s chunked."""
    from pyspark.sql import functions as F

    from minefields_kafka_streams_deduplication_spark.catalog import (
        normalize_events_ts,
    )
    from minefields_kafka_streams_deduplication_spark.streaming.session_incremental import (
        apply_session_batch,
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
    for label, kw in [
        ("fold_auto_hotkey", {}),               # default: auto-detect
        ("fold_plain_hotkey", {"chunk_days": None}),
    ]:
        state = f"/tmp/probe_autoskew_{label}"
        shutil.rmtree(state, ignore_errors=True)
        gc()
        t0 = time.time()
        apply_session_batch(spark, state, ev, 0, **kw)
        print(
            json.dumps(
                {"probe": label, "sf": "/tmp/probe_skew",
                 "sec": round(time.time() - t0, 1)}
            ),
            flush=True,
        )
        shutil.rmtree(state, ignore_errors=True)




def stage_annlife() -> None:
    """Drift-gated lifecycle costs at 500K vectors (probe1000x
    embeddings): build, the gate's own aggregate, the extend branch
    (frozen-model encode + cell append), and the retrain branch
    (rebuild over source ∪ batch) — the operational price list behind
    maybe_retrain_index's decision rule."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from minefields_kafka_streams_deduplication_spark.catalog import load_table
    from minefields_kafka_streams_deduplication_spark.functions.ann_index import (
        _normalized_dim_stats,
        build_ivf_pq_index,
        extend_ivf_pq_index,
        maybe_retrain_index,
    )

    root = "/tmp/probe_annlife"
    _sh.rmtree(root, ignore_errors=True)
    emb = load_table(spark, P1000, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]
    batch = emb.sample(0.1, seed=7).select(
        (F.col("vec_id") + max_id + 1).alias("vec_id"), "embedding"
    )
    gc()
    t0 = time.time()
    build_ivf_pq_index(spark, P1000, root)
    print(json.dumps({"probe": "ann_build_500k", "sec": round(time.time() - t0, 1)}), flush=True)
    gc()
    t0 = time.time()
    _normalized_dim_stats(batch)
    print(json.dumps({"probe": "ann_drift_gate_50k_batch", "sec": round(time.time() - t0, 1)}), flush=True)
    gc()
    t0 = time.time()
    extend_ivf_pq_index(spark, root, batch)
    print(json.dumps({"probe": "ann_extend_50k_batch", "sec": round(time.time() - t0, 1)}), flush=True)
    # drifted copy of the batch -> the retrain branch end-to-end
    drifted = batch.select(
        (F.col("vec_id") + max_id + 1).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == F.lit(0), x + F.lit(50.0)).otherwise(x),
        ).alias("embedding"),
    )
    gc()
    t0 = time.time()
    decision = maybe_retrain_index(spark, P1000, root, drifted)
    print(
        json.dumps(
            {"probe": "ann_retrain_on_drift", "decision": decision,
             "sec": round(time.time() - t0, 1)}
        ),
        flush=True,
    )
    _sh.rmtree(root, ignore_errors=True)


STAGES = {
    "newq10": stage_newq10,
    "newq1000": stage_newq1000,
    "autoskew": stage_autoskew,
    "annlife": stage_annlife,
}

if __name__ == "__main__":
    for name in sys.argv[1:]:
        STAGES[name]()
