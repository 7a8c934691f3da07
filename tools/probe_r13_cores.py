"""r13 core-scaling probe (VERDICT r12 #4): per-query low/high-core
ratio at a fixture big enough that compute dominates scheduling (the
sf0.1 block's ratios were all ~1 because every query ran 0.1-1 s of
mostly fixed overhead). One Spark session per invocation; pass the
core count via SPARK_GRAFT_CPUS exactly like bench.py.

Usage: SPARK_GRAFT_CPUS=N python tools/probe_r13_cores.py <fixture> [reps]
Prints one JSON line: {"cpus": N, "queries": {name: min_sec}}.
"""
from __future__ import annotations

import json, os, sys, time

sys.path.insert(0, "/root/repo")
import minefields_kafka_streams_deduplication_spark as engine
from bench import HEADLINE  # same query list as the driver bench

fixture = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = engine.get_spark("probe-cores")
# Diagnostic-only scan splitting (3rd arg "split"): the scaled fixtures
# are SINGLE parquet files under the 128 MB default split size, so every
# scan stage runs ONE task at any core count and the ratio measures the
# post-exchange stages only. Forcing small splits isolates genuinely
# serial OPERATORS from fixture-shaped scan serialism. NOT shipped as
# session config — the r12 rejection of local-only split tunes stands;
# a production scan has natural splits.
if len(sys.argv) > 3 and sys.argv[3] == "split":
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(16 * 1024))
    spark.conf.set(
        "spark.sql.files.minPartitionNum",
        str(2 * int(os.environ.get("SPARK_GRAFT_CPUS", "8") or 8)),
    )
QS = engine.get_queries()
out = {}
for name in HEADLINE:
    best = None
    for r in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"cores:{name}")
        t0 = time.time()
        QS[name](spark, fixture).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out[name] = round(best, 3)
print(json.dumps({"cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0),
                  "fixture": fixture, "queries": out}), flush=True)
