"""r13 heavy-tail sweep (VERDICT r12 #3, carried from r11 #8): the 25
heaviest registry rows — the near-dup / text / LLM-pipeline families
whose cost envelopes are candidate- or copy-quadratic — at the
1000× exact-duplicate-heavy fixture (5M docs / 100M events), plus the
flood complement run separately (tools/make_flood_fixture.py).

Per-query clearCache + driver GC between rows (r1/r9 sweep hygiene).
Output: one JSON line per query.

Usage: python tools/sweep_r13.py <fixture_dir> [names...]
"""
from __future__ import annotations

import json, sys, time

sys.path.insert(0, "/root/repo")
import minefields_kafka_streams_deduplication_spark as engine

HEAVY25 = [
    "dedup_text_minhash", "neardup_minhash_verified", "neardup_incremental",
    "dedup_text_ngram_jaccard", "neardup_jaccard_histogram",
    "dedup_clusters_cc", "scrub_repeated_spans", "scrub_repeated_spans_all",
    "dedup_text_editdistance", "source_overlap_ngrams", "doc_novelty_ngrams",
    "contamination_ngram_check", "decontaminate_report", "corpus_vocab_stats",
    "doc_unigram_logprob", "doc_bigram_logprob", "importance_weight_dsir",
    "bm25_doc_search", "doc_repetition_metrics", "tfidf_top_terms",
    "dedup_embedding_cosine", "dedup_semantic_clusters",
    "corpus_dedup_pipeline_report", "dedup_text_simhash",
    "doc_winnow_fingerprint",
]

fixture = sys.argv[1]
names = sys.argv[2:] or HEAVY25
spark = engine.get_spark("sweep-r13")
QS = engine.get_queries()
for name in names:
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    spark.sparkContext.setJobDescription(f"sweep:{name}")
    t0 = time.time()
    try:
        QS[name](spark, fixture).write.format("noop").mode("overwrite").save()
        print(json.dumps({"q": name, "sec": round(time.time() - t0, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"q": name, "sec": round(time.time() - t0, 1), "err": str(e)[:150]}), flush=True)
print(json.dumps({"done": True, "fixture": fixture}), flush=True)
