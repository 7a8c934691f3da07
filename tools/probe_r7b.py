"""Round-7 continuation probes: clean re-measures of rows that were
contended or changed after the first probe pass (tools/probe_r7.py)."""

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
        except Exception as e:
            print(json.dumps({"probe": name, "warm_err": str(e)[:200]}), flush=True)
    t0 = time.time()
    sink(QS[name](spark, sf))
    print(
        json.dumps({"probe": name, "sf": sf, "sec": round(time.time() - t0, 1)}),
        flush=True,
    )


# post-rewrite / post-fix rows
probe("inter_event_gap_stats", P10)
probe("inter_event_gap_stats", P100, warm=False)
probe("dup_rate_by_source", P10)
probe("dup_rate_by_source", P100, warm=False)
probe("vocab_zipf_top100", P10)
probe("vocab_zipf_top100", P100, warm=False)
probe("ann_ivf_pq_residual", P100)
probe("ann_ivf_pq_residual", P1000, warm=False)
probe("rfm_segments", P10)
probe("rfm_segments", P100, warm=False)
probe("order_fulfillment_latency", P10)
probe("order_fulfillment_latency", P100, warm=False)
# contended rows re-measured clean
probe("attribution_last_touch", P100)
probe("ann_pq_adc", P100)
probe("revenue_pareto_point", P1000)
probe("inter_event_gap_stats", P1000, warm=False)
probe("weekly_active_growth", P1000, warm=False)

# snapshot commit chain after the persist fix
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
root = tempfile.mkdtemp(prefix="snap1000b_")
try:
    table = SnapshotStateTable(spark, root)
    t0 = time.time()
    table.commit(ev.where(F.unix_micros("ts") <= mid), batch_id=0)
    c1 = time.time() - t0
    t0 = time.time()
    table.commit(ev.where(F.unix_micros("ts") > mid), batch_id=1)
    c2 = time.time() - t0
    print(
        json.dumps(
            {
                "probe": "snapshot_commit_chain_postfix",
                "half_commit_1_sec": round(c1, 1),
                "half_commit_2_sec": round(c2, 1),
            }
        ),
        flush=True,
    )
finally:
    shutil.rmtree(root, ignore_errors=True)
print(json.dumps({"done": True}), flush=True)
