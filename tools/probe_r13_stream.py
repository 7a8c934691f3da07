"""r13 streaming fixed-overhead probe (VERDICT r12 #6): run the
dedup_stream_watermark pipeline once per variant and print every
micro-batch's durationMs breakdown (addBatch / walCommit /
commitOffsets / queryPlanning / triggerExecution ...), to pin where the
~1.3 s bench cost goes and whether any trigger/source option could
remove a batch while keeping the watermark-commit semantics.

Variants: default (availableNow over the single staged file) and
maxFilesPerTrigger=1 + availableNow (same thing — the source is ONE
file; included to document that no coalescing knob applies).

Usage: python tools/probe_r13_stream.py [sf_dir]
"""
from __future__ import annotations

import json, sys, tempfile, time, uuid

sys.path.insert(0, "/root/repo")
import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.streaming.source import (
    _staged_events_dir, read_events_stream, stream_partitions,
)
from minefields_kafka_streams_deduplication_spark.streaming.dedup_stream import (
    BUSINESS_KEY, WATERMARK_DELAY,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = engine.get_spark("probe-stream")
parts = stream_partitions(spark, SF)

def run(tag: str) -> None:
    stream = (
        read_events_stream(spark, SF)
        .withWatermark("ts", WATERMARK_DELAY)
        .dropDuplicatesWithinWatermark(BUSINESS_KEY)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    name = f"probe_{tag}_{uuid.uuid4().hex[:6]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    out = tempfile.mkdtemp(prefix=f"out_{name}_")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    w = (
        stream.writeStream.format("parquet").queryName(name)
        .outputMode("append").option("path", out)
        .option("checkpointLocation", ckpt)
    )
    t0 = time.time()
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    wall = time.time() - t0
    spark.conf.set("spark.sql.shuffle.partitions", old)
    print(f"== {tag}: wall {wall:.3f}s, {len(q.recentProgress)} batches")
    for p in q.recentProgress:
        d = p["durationMs"]
        rows = p["numInputRows"]
        print(f"  batch {p['batchId']}: rows={rows} " + " ".join(
            f"{k}={v}" for k, v in sorted(d.items())))

# warm the session (JVM/codegen) with one throwaway run
run("warmup")
for rep in range(3):
    run(f"default_r{rep}")
