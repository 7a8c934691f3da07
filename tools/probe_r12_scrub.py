"""A/B probe for scrub_repeated_spans caching variants at sf0.1."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.catalog import load_table
from minefields_kafka_streams_deduplication_spark.functions.neardup import (
    SCRUB_SPAN_TOKENS,
)
from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scrub_variant(docs, cache_flagged=False, cache_spans=False, tokhash=False):
    n = SCRUB_SPAN_TOKENS
    all_toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("t"), F.md5(F.lower("text")).alias("th")
    )
    grp = Window.partitionBy("th")
    flagged = all_toks.withColumn("rep_id", F.min("doc_id").over(grp)).withColumn(
        "gsz", F.count(F.lit(1)).over(grp)
    )
    if cache_flagged:
        flagged = flagged.cache()
    toks = flagged.filter(F.col("doc_id") == F.col("rep_id")).select(
        "doc_id", "t", "gsz"
    )
    copies = flagged.filter(F.col("doc_id") != F.col("rep_id")).select(
        "doc_id",
        F.when(F.size("t") >= n, F.lit("")).otherwise(F.concat_ws(" ", "t")).alias(
            "scrubbed_text"
        ),
        F.when(F.size("t") >= n, F.size("t")).otherwise(F.lit(0)).alias(
            "n_removed_tokens"
        ),
    )
    if tokhash:
        args = ", ".join(f"element_at(ht, i + {j + 1})" for j in range(n))
        spans = (
            toks.withColumn("ht", F.expr("transform(t, x -> xxhash64(x))"))
            .select(
                "doc_id",
                (F.col("gsz") > 1).alias("sd"),
                F.posexplode(
                    F.expr(
                        f"IF(size(t) >= {n},"
                        f" transform(sequence(0, size(t) - {n}),"
                        f" i -> xxhash64({args})),"
                        f" array())"
                    )
                ).alias("pos", "h"),
            )
        )
    else:
        spans = toks.select(
            "doc_id",
            (F.col("gsz") > 1).alias("sd"),
            F.explode(
                F.expr(
                    f"IF(size(t) >= {n},"
                    f" transform(sequence(0, size(t) - {n}),"
                    f" i -> struct(i as pos,"
                    f" xxhash64(concat_ws(' ', slice(t, i + 1, {n}))) as h)),"
                    f" array())"
                )
            ).alias("s"),
        ).select("doc_id", "sd", "s.pos", "s.h")
    if cache_spans:
        spans = spans.cache()
    repeated = (
        spans.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("keep_doc"),
            F.max("sd").alias("sd"),
        )
        .filter((F.col("nd") > 1) | F.col("sd"))
        .select("h", "keep_doc")
    )
    occ = spans.join(repeated, "h")
    marks = occ.groupBy("doc_id").agg(
        F.collect_set("pos").alias("marks"),
        F.sort_array(
            F.collect_set(
                F.when(F.col("doc_id") == F.col("keep_doc"), F.col("pos"))
            )
        ).alias("keeps"),
    )
    run_exprs = {
        "sm": "array_sort(marks)",
        "starts": (
            f"filter(transform(sm, (p, i) -> IF(i = 0 OR p > element_at(sm, i) + {n},"
            f" p, cast(null as int))), x -> x IS NOT NULL)"
        ),
        "ends": (
            f"filter(transform(sm, (p, i) -> IF(i = size(sm) - 1"
            f" OR element_at(sm, i + 2) > p + {n}, p + {n},"
            f" cast(null as int))), x -> x IS NOT NULL)"
        ),
        "removed": (
            f"filter(zip_with(starts, ends, (s, e) -> named_struct('s', s, 'e', e)),"
            f" r -> NOT exists(keeps, k -> k >= r.s AND k <= r.e - {n}))"
        ),
        "gap_s": "concat(array(0), transform(removed, r -> r.e))",
        "gap_e": "concat(transform(removed, r -> r.s), array(size(t)))",
    }
    out = toks.join(marks, "doc_id", "left").withColumn(
        "marks", F.expr("coalesce(marks, array())")
    ).withColumn("keeps", F.expr("coalesce(keeps, array())"))
    for c, e in run_exprs.items():
        out = out.withColumn(c, F.expr(e))
    out = (
        out.withColumn(
            "kept",
            F.expr(
                "flatten(zip_with(gap_s, gap_e, (a, b) -> slice(t, a + 1, greatest(b - a, 0))))"
            ),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("kept")).alias("scrubbed_text"),
            (F.size("t") - F.size("kept")).alias("n_removed_tokens"),
        )
    )
    return out.unionByName(copies)


def main() -> None:
    spark = engine.get_spark("probe_r12_scrub")
    load_table(spark, SF_DIR, "lineitem").count()
    variants = {
        "base": dict(),
        "cache_both": dict(cache_flagged=True, cache_spans=True),
        "tokhash": dict(tokhash=True),
        "tokhash_cache": dict(tokhash=True, cache_flagged=True, cache_spans=True),
    }
    docs_small = load_table(spark, "/root/testdata/sf0.001", "documents")
    for name, kw in variants.items():
        scrub_variant(docs_small, **kw).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    for rep in range(3):
        for name, kw in variants.items():
            docs = load_table(spark, SF_DIR, "documents")
            t0 = time.time()
            scrub_variant(docs, **kw).write.format("noop").mode("overwrite").save()
            print(f"pass{rep} {name}: {time.time() - t0:.3f}s", flush=True)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
