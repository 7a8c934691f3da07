"""Round-7 scale probes (VERDICT r6 #8 + new-op probes).

Protocol (SCALING.md): warm the plan shape at sf0.001, time at the
replicated /tmp/probe{10x,100x,1000x} fixtures, noop sink to force full
evaluation. Stages selectable by argv so long stages can run alone in
tmux:

    python tools/probe_r7.py analytics1000 scrub1000 pq newops snapshot1000 suppress1000
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

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
    t0 = time.time()
    sink(QS[name](spark, sf))
    print(
        json.dumps({"probe": name, "sf": sf, "sec": round(time.time() - t0, 1)}),
        flush=True,
    )


def stage_analytics1000() -> None:
    for q in (
        "cohort_churn_rate",
        "revenue_pareto_point",
        "event_transition_matrix",
        "dau_mau_stickiness_hll",
        "dau_mau_stickiness",
    ):
        probe(q, P1000)


def stage_scrub1000() -> None:
    probe("scrub_repeated_spans_all", P1000)
    probe("scrub_repeated_spans", P1000)  # r7 run-level attribution


def stage_pq() -> None:
    for sf in (P100, P1000):
        probe("ann_pq_adc", sf)
        probe("ann_ivf_pq_residual", sf)


def stage_newops() -> None:
    for q in (
        "weekly_active_growth",
        "inter_event_gap_stats",
        "attribution_last_touch",
        "dup_rate_by_source",
        "vocab_zipf_top100",
        "tokens_per_doc_percentiles",
        "order_fulfillment_latency",
        "dau_mau_stickiness_hll",
        "scrub_repeated_spans",
    ):
        probe(q, P10)
        probe(q, P100, warm=False)
    probe("store_snapshot_stream_eos", P10)


def stage_snapshot1000() -> None:
    import shutil
    import tempfile

    from minefields_kafka_streams_deduplication_spark.catalog import load_table
    from minefields_kafka_streams_deduplication_spark.sources.snapshots import (
        SnapshotStateTable,
    )

    ev = load_table(spark, P1000, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    lo, hi = ev.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).first()
    mid = lo + (hi - lo) // 2
    root = tempfile.mkdtemp(prefix="snap1000_")
    try:
        table = SnapshotStateTable(spark, root)
        t0 = time.time()
        table.commit(ev.where(F.unix_micros("ts") <= mid), batch_id=0)
        c1 = time.time() - t0
        t0 = time.time()
        table.commit(ev.where(F.unix_micros("ts") > mid), batch_id=1)
        c2 = time.time() - t0
        t0 = time.time()
        table.commit(
            ev.limit(1).select(
                "user_id", "event_id",
                (F.col("ts") + F.expr("INTERVAL 400 DAYS")).alias("ts"),
                "event_type", "value",
            ),
            batch_id=2,
        )
        c3 = time.time() - t0
        t0 = time.time()
        n = table.read().count()
        r = time.time() - t0
        print(
            json.dumps(
                {
                    "probe": "snapshot_commit_chain",
                    "sf": P1000,
                    "half_commit_1_sec": round(c1, 1),
                    "half_commit_2_sec": round(c2, 1),
                    "single_key_commit_sec": round(c3, 1),
                    "read_latest_sec": round(r, 1),
                    "keys": n,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def stage_suppress1000() -> None:
    import shutil
    import tempfile

    from minefields_kafka_streams_deduplication_spark.catalog import load_table
    from minefields_kafka_streams_deduplication_spark.streaming.punctuate import (
        stage_events_ordered,
    )
    from minefields_kafka_streams_deduplication_spark.streaming.suppress import (
        run_suppressed,
    )

    ev = load_table(spark, P1000, "events").select(
        "user_id", "event_id", "ts", "value", "event_type"
    )
    stage = tempfile.mkdtemp(prefix="sup1000_stage_")
    out = tempfile.mkdtemp(prefix="sup1000_out_")
    try:
        t0 = time.time()
        stage_events_ordered(ev, stage, n_slices=3)
        staged = time.time() - t0
        t0 = time.time()
        hist = run_suppressed(spark, stage, out_dir=out)
        n = hist.count()
        keys = hist.select("user_id").distinct().count()
        print(
            json.dumps(
                {
                    "probe": "table_suppress_1000x",
                    "sf": P1000,
                    "stage_sec": round(staged, 1),
                    "drain_sec": round(time.time() - t0, 1),
                    "rows": n,
                    "keys": keys,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


STAGES = {
    "analytics1000": stage_analytics1000,
    "scrub1000": stage_scrub1000,
    "pq": stage_pq,
    "newops": stage_newops,
    "snapshot1000": stage_snapshot1000,
    "suppress1000": stage_suppress1000,
}

if __name__ == "__main__":
    for arg in sys.argv[1:]:
        print(json.dumps({"stage": arg, "start": time.strftime("%H:%M:%S")}), flush=True)
        STAGES[arg]()
    print(json.dumps({"done": True}), flush=True)
