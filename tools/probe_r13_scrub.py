"""r13 scrub_repeated_spans probe (VERDICT r12 #2): stage-by-stage cost
at the near-dup FLOOD fixture (make_flood_fixture.py — every span
cross-doc repeated, the occ-join/collect_set worst case) and at the
exact-dup x1000 fixture (collapse-dominated). Stages are cumulative
prefixes of the real pipeline, forced with a noop sink.

Usage: python tools/probe_r13_scrub.py <sf_dir> [reps]
"""
from __future__ import annotations

import sys, time

sys.path.insert(0, "/root/repo")
import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.functions.neardup import (
    SCRUB_SPAN_TOKENS as N,
)
from pyspark.sql import Window, functions as F

SF = sys.argv[1]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = engine.get_spark("probe-scrub")
docs = engine.load_table(spark, SF, "documents")

def stages():
    all_toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("t"), F.md5(F.lower("text")).alias("th")
    )
    grp = Window.partitionBy("th")
    flagged = all_toks.withColumn("rep_id", F.min("doc_id").over(grp)).withColumn(
        "gsz", F.count(F.lit(1)).over(grp)
    )
    toks = flagged.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id", "t", "gsz")
    span_args = ", ".join(f"element_at(ht, i + {j + 1})" for j in range(N))
    spans = (
        toks.withColumn("ht", F.expr("transform(t, x -> xxhash64(x))"))
        .select(
            "doc_id",
            (F.col("gsz") > 1).alias("sd"),
            F.posexplode(
                F.expr(
                    f"IF(size(t) >= {N},"
                    f" transform(sequence(0, size(t) - {N}),"
                    f" i -> xxhash64({span_args})),"
                    f" array())"
                )
            ).alias("pos", "h"),
        )
    )
    # Mirrors the r13 shipped form (min != max, not countDistinct); the
    # first probe run inlined the old countDistinct form and recorded
    # c_repeated_agg 2.7-3.4 s at flood32 vs ~1 s delta after the swap.
    repeated = (
        spans.groupBy("h")
        .agg(F.min("doc_id").alias("keep_doc"), F.max("doc_id").alias("mxd"), F.max("sd").alias("sd"))
        .filter((F.col("keep_doc") != F.col("mxd")) | F.col("sd"))
        .select("h", "keep_doc")
    )
    occ = spans.join(repeated, "h")
    marks = occ.groupBy("doc_id").agg(
        F.collect_set("pos").alias("marks"),
        F.sort_array(F.collect_set(F.when(F.col("doc_id") == F.col("keep_doc"), F.col("pos")))).alias("keeps"),
    )
    return {
        "a_collapse_reps": toks.select("doc_id", F.size("t").alias("n"), "gsz"),
        "b_spans_explode": spans.select(F.sum(F.col("h") % 1000003).alias("s"), F.count("*").alias("c")),
        "c_repeated_agg": repeated.select(F.sum(F.col("h") % 1000003).alias("s"), F.count("*").alias("c")),
        "d_occ_marks": marks.select("doc_id", F.size("marks").alias("m"), F.size("keeps").alias("k")),
        "e_full_query": engine.get_queries()["scrub_repeated_spans"](spark, SF),
    }

for name, df in stages().items():  # warm pass
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
for rep in range(REPS):
    for name, df in stages().items():
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(name, round(time.time() - t0, 3), flush=True)
