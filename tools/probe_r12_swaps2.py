"""Interleaved A/B for the r12 second-batch swaps (neardup_incremental,
dedup_text_simhash, doc_winnow_fingerprint): old form (HEAD worktree at
/tmp/r12_old) vs new form (repo), alternating in ONE session, min+median
of 5 each, noop-sunk."""
from __future__ import annotations

import os, sys, time

sys.path.insert(0, "/root/repo")
import minefields_kafka_streams_deduplication_spark as eng_new

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = eng_new.get_spark("probe-swaps2")
new_q = eng_new.get_queries()
for k in [k for k in sys.modules if k.startswith("minefields")]:
    del sys.modules[k]
sys.path.remove("/root/repo")
sys.path.insert(0, "/tmp/r12_old")
import minefields_kafka_streams_deduplication_spark as eng_old
old_q = eng_old.get_queries()

NAMES = ["neardup_incremental", "dedup_text_simhash", "doc_winnow_fingerprint", "dedup_text_ngram_jaccard", "source_overlap_ngrams", "doc_novelty_ngrams", "contamination_ngram_check", "decontaminate_report"]

def run(fn):
    t0 = time.time()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt

for n in NAMES:
    # warm both plan shapes
    run(old_q[n]); run(new_q[n])
    olds, news = [], []
    for _ in range(5):
        olds.append(run(old_q[n]))
        news.append(run(new_q[n]))
    fmt = lambda v: f"min {min(v):.3f} med {sorted(v)[2]:.3f}"
    open("/tmp/ab_times.txt","a").write(f"{n}: OLD {fmt(olds)}  NEW {fmt(news)}\n")
spark.stop()
