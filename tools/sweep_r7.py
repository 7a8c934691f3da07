"""Round-7 full-registry 10× sweep — run EVERY registered query at the
exact-copy-heavy /tmp/probe10x fixture with a per-query budget and
report times. The r5 sweep found the phash copy-flood cliff this way;
this round's new operators get the same treatment.

Output: one JSON line per query to stdout (tee to a log)."""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import minefields_kafka_streams_deduplication_spark as engine  # noqa: E402

P10 = "/tmp/probe10x"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "100g")
    .getOrCreate()
)
QS = engine.get_queries()

only = set(sys.argv[1:])
for name, fn in QS.items():
    if only and name not in only:
        continue
    # r1 sweep find: per-query caches accumulate across a long session
    # and skew later queries up to 7x — clear between queries.
    # r9 find: localCheckpoint blocks additionally pin block-manager
    # memory until a driver GC lets ContextCleaner release them —
    # without the explicit gc a heavy query distorts its successors
    # (4.5 -> 19.7 s measured; SCALING.md round-9 interference A/B).
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    try:
        fn(spark, P10).write.format("noop").mode("overwrite").save()
        print(
            json.dumps({"q": name, "sec": round(time.time() - t0, 1)}),
            flush=True,
        )
    except Exception as e:
        print(
            json.dumps(
                {"q": name, "sec": round(time.time() - t0, 1), "err": str(e)[:150]}
            ),
            flush=True,
        )
print(json.dumps({"done": True}), flush=True)
