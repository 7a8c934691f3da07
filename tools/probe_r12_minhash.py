"""Stage-level timing for dedup_text_minhash at sf0.1."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import minefields_kafka_streams_deduplication_spark as engine
from minefields_kafka_streams_deduplication_spark.catalog import load_table
from minefields_kafka_streams_deduplication_spark.functions import neardup as nd
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label}: {time.time() - t0:.3f}s", flush=True)
    return r


def main() -> None:
    spark = engine.get_spark("probe_r12_minhash")
    load_table(spark, SF_DIR, "lineitem").count()
    spark.range(1000, numPartitions=8).mapInPandas(lambda it: it, "id LONG").count()

    for rep in range(2):
        all_docs = load_table(spark, SF_DIR, "documents")
        exact_winner = (
            all_docs.select(F.md5(F.lower(F.trim(F.col("text")))).alias("nh"), "doc_id")
            .groupBy("nh")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
            .cache()
        )
        t("winner", lambda: exact_winner.count())
        docs = all_docs.join(exact_winner, "doc_id", "left_semi")
        sh_raw = nd._shingles(docs, distinct=False).cache()
        t("shingles", lambda: sh_raw.count())
        hashed = sh_raw.select("doc_id", F.xxhash64("shingle").alias("h"))
        banded = nd._banded_sigs_agg(
            hashed, nd.MINHASH_BANDS, nd.MINHASH_PERMS // nd.MINHASH_BANDS
        ).cache()
        t("banded", lambda: banded.count())
        cand = (
            banded.alias("x")
            .join(banded.alias("y"), ["band", "bhash"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("doc_id_1"), F.col("y.doc_id").alias("doc_id_2"))
            .distinct()
            .cache()
        )
        t("cand", lambda: cand.count())
        verified = nd.exact_jaccard_for_pairs(docs, cand, shingles=sh_raw).filter(
            F.col("jaccard") >= nd.MINHASH_VERIFY_THRESHOLD
        )
        dupes = verified.select(F.col("doc_id_2").alias("doc_id")).distinct()
        out = docs.select("doc_id", "lang", "source").join(dupes, "doc_id", "left_anti")
        t("verify+anti", lambda: out.write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
        print("---")
    spark.stop()


if __name__ == "__main__":
    main()
