"""Round-12 perf probe: time individual headline queries warm, with a
sentinel before each, mirroring bench.py's measurement discipline.

Usage: python tools/probe_r12.py q1 q2 ...   (defaults to the r12 focus set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import minefields_kafka_streams_deduplication_spark as engine

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FOCUS = ["dedup_text_minhash", "scrub_repeated_spans", "rank_users_by_spend"]


def main() -> None:
    names = sys.argv[1:] or FOCUS
    spark = engine.get_spark("probe_r12")
    queries = engine.get_queries()
    engine.load_table(spark, SF_DIR, "lineitem").count()
    spark.range(1000, numPartitions=8).mapInPandas(
        lambda it: it, "id LONG"
    ).write.format("noop").mode("overwrite").save()

    sent_df = (
        engine.load_table(spark, SF_DIR, "lineitem").groupBy("l_returnflag").count()
    )

    def sentinel() -> float:
        t0 = time.time()
        sent_df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    sentinel()
    # warm each plan once at sf0.001
    for name in names:
        try:
            queries[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:
            print(f"warmup {name}: {e}")
        spark.catalog.clearCache()

    for rep in range(3):
        for name in names:
            s = sentinel()
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.catalog.clearCache()
            print(f"pass{rep} {name}: {dt:.3f}s (sentinel {s:.3f}s)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
