"""A/B probe for rank_users_by_spend two-phase rank variants at sf0.1."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.catalog import dec6, load_table
from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def spend_frame(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(dec6("value")).alias("spend"))
    )


def finish(ranked):
    rn, n = F.col("_rn"), F.col("_n")
    base = F.floor(n / 10).cast("long")
    rem = (n % 10).cast("long")
    big = rem * (base + 1)
    decile = F.when(rn <= big, F.ceil(rn / (base + 1))).otherwise(
        rem + F.ceil((rn - big) / F.greatest(base, F.lit(1)))
    )
    return ranked.select(
        "user_id",
        F.round("spend", 4).cast("double").alias("spend"),
        rn.cast("int").alias("spend_rank"),
        decile.cast("int").alias("spend_decile"),
    )


def rank_current(spark, sf_dir):
    return engine.get_queries()["rank_users_by_spend"](spark, sf_dir)


def rank_collect(spark, sf_dir):
    df = spend_frame(spark, sf_dir)
    order_cols = [F.desc("spend"), F.asc("user_id")]
    part = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = part.withColumn("_lrn", F.row_number().over(w))
    cnt = {
        r["_pid"]: r["c"]
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n_parts = (max(cnt) + 1) if cnt else 0
    offs, acc = [], 0
    for pid in range(n_parts):
        offs.append(acc)
        acc += cnt.get(pid, 0)
    total = acc
    off_arr = F.array(*[F.lit(o) for o in offs]) if offs else F.array(F.lit(0))
    ranked = local.withColumn(
        "_rn", (F.col("_lrn") + F.element_at(off_arr, F.col("_pid") + 1)).cast("long")
    ).withColumn("_n", F.lit(total).cast("long"))
    return finish(ranked)


def rank_ckpt(spark, sf_dir):
    from minefields_kafka_streams_deduplication_spark.operators.analytic import (
        _global_row_number,
    )

    spend = spend_frame(spark, sf_dir).localCheckpoint(eager=False)
    ranked = _global_row_number(spend, [F.desc("spend"), F.asc("user_id")])
    return finish(ranked)


def rank_cache(spark, sf_dir):
    from minefields_kafka_streams_deduplication_spark.operators.analytic import (
        _global_row_number,
    )

    spend = spend_frame(spark, sf_dir).cache()
    ranked = _global_row_number(spend, [F.desc("spend"), F.asc("user_id")])
    return finish(ranked)


def main() -> None:
    spark = engine.get_spark("probe_r12_rank")
    load_table(spark, SF_DIR, "lineitem").count()
    variants = {
        "current": rank_current,
        "collect": rank_collect,
        "ckpt": rank_ckpt,
        "cache": rank_cache,
    }
    for name, fn in variants.items():
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    # correctness cross-check between variants at sf0.1
    a = rank_current(spark, SF_DIR).orderBy("spend_rank").collect()
    b = rank_collect(spark, SF_DIR).orderBy("spend_rank").collect()
    print("MATCH" if a == b else "MISMATCH", len(a), len(b), flush=True)
    for name, fn in variants.items():
        times = []
        for rep in range(5):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            spark.catalog.clearCache()
        print(
            f"{name}: min={min(times):.3f} med={sorted(times)[2]:.3f} "
            f"all={[round(t, 3) for t in times]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
