"""Streaming MinHash-LSH near-duplicate dedup — the namesake dedup
topology applied to NEAR-dups, in-stream.

[R Confluent EventDeduplicationLambdaIntegrationTest pattern (state-
store dedup transformer), generalized from exact-key dedup to LSH
bucket keys] + the batch pipeline in functions/neardup.py (same shingle
grammar, same 64-permutation banded-signature kernel, same exact-
Jaccard verification threshold).

Topology:

  documents stream
    → shingle explode + xxhash64 (stateless, JVM)
    → banded MinHash signatures (`_banded_sigs` numpy kernel — the
      SAME kernel the batch pipeline uses, via mapInPandas on the
      stream)
    → groupBy (band, bhash) → applyInPandasWithState: each LSH bucket
      stores ONE long — the first-arrived doc_id (the "anchor") — and
      every later doc in that bucket emits a candidate pair
      (doc, anchor)
    → post-stream exact-Jaccard verification of candidate pairs; a doc
      is dropped iff verified >= MINHASH_VERIFY_THRESHOLD against an
      anchor.

Semantics — keep-FIRST-ARRIVAL, the Kafka Streams dedup policy: the
anchor is whichever bucket member the stream delivered first, and
later near-dups of it are dropped. This is deliberately a STAR
candidate graph (every candidate pairs with its bucket's anchor), not
the batch pipeline's all-pairs graph: per-bucket state is one long —
state size is O(live buckets) and an exact-copy flood of a bucket
costs O(copies) star edges, never O(copies²) pairs. The trade-off is
recall on chains (B≈C but neither ≈ anchor A goes undetected until a
bucket they share alone); the batch pipeline remains the full-recall
form. Parity is pinned by test against a batch reference implementing
this exact star policy (tests/test_streaming.py).

Scale: one shuffle to the numpy signature kernel, one shuffle of
(doc_id, band, bhash) into the state operator — shuffle volume
O(docs × bands), independent of text size, same as batch. The
verification pass touches candidate docs only.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import fingerprint_dir, load_table, mark_ready
from ..functions.neardup import (
    MINHASH_BANDS,
    MINHASH_PERMS,
    MINHASH_VERIFY_THRESHOLD,
    _banded_sigs,
    _shingles,
    exact_jaccard_for_pairs,
)
from ..registry import query
from .source import run_to_parquet

ANCHOR_STATE_SCHEMA = "anchor LONG"
CANDIDATE_SCHEMA = "doc_id LONG, anchor LONG"


def _bucket_anchor_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-LSH-bucket state: the first-arrived doc_id. Later docs in
    the bucket emit (doc, anchor) candidates. Within one micro-batch
    all Arrow chunks are concatenated and doc order fixed by doc_id
    BEFORE choosing an anchor (chunk boundaries past
    arrow.maxRecordsPerBatch are arbitrary — the r3 ADVICE lesson)."""
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    docs = sorted(set(pdf["doc_id"].tolist()))
    if state.exists:
        (anchor,) = state.get
    else:
        anchor = docs[0]
        state.update((anchor,))
    out = [(d, anchor) for d in docs if d != anchor]
    if out:
        yield pd.DataFrame(out, columns=["doc_id", "anchor"])


def streaming_neardup_candidates(docs_stream: DataFrame) -> DataFrame:
    """documents stream (doc_id, text) → candidate (doc_id, anchor)
    pairs from first-arrival LSH bucket anchors."""
    sh = _shingles(docs_stream, distinct=False)
    hashed = sh.select("doc_id", F.xxhash64("shingle").alias("h"))
    banded = _banded_sigs(hashed, MINHASH_BANDS, MINHASH_PERMS // MINHASH_BANDS)
    return banded.groupBy("band", "bhash").applyInPandasWithState(
        _bucket_anchor_fn,
        outputStructType=CANDIDATE_SCHEMA,
        stateStructType=ANCHOR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def verify_candidates(docs: DataFrame, cand: DataFrame) -> DataFrame:
    """Exact shingle-Jaccard verification of (doc_id, anchor) pairs —
    the same verify stage as the batch pipeline, restricted to
    candidate docs. Returns the DISTINCT doc_ids to drop."""
    pairs = cand.select(
        F.least("doc_id", "anchor").alias("doc_id_1"),
        F.greatest("doc_id", "anchor").alias("doc_id_2"),
    ).distinct()
    verified = exact_jaccard_for_pairs(docs, pairs).filter(
        F.col("jaccard") >= MINHASH_VERIFY_THRESHOLD
    )
    # Keep-first-arrival: the pair's anchor survives, the later doc
    # drops. cand holds (doc, anchor) with doc = the later arrival.
    return (
        cand.select(
            F.least("doc_id", "anchor").alias("doc_id_1"),
            F.greatest("doc_id", "anchor").alias("doc_id_2"),
            F.col("doc_id").alias("drop_id"),
        )
        .join(verified.select("doc_id_1", "doc_id_2"), ["doc_id_1", "doc_id_2"])
        .select(F.col("drop_id").alias("doc_id"))
        .distinct()
    )


def stage_documents_ordered(
    spark: SparkSession, sf_dir: str, n_splits: int = 3
) -> str:
    """Stage the documents fixture as n_splits files in doc_id order
    with strictly increasing mtimes, so the file source's
    maxFilesPerTrigger=1 replays the corpus as an ordered stream —
    arrival order IS doc_id order, which makes keep-first-arrival
    reproducible (and equal to keep-min-doc_id)."""
    stage, ready = fingerprint_dir(
        "docs_ordered",
        os.path.join(sf_dir, "documents.parquet"),
        suffix=f"_{n_splits}",
    )
    if ready:
        return stage
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hi = docs.agg(F.max("doc_id")).first()[0] or 0
    step = (hi + n_splits) // n_splits
    for i in range(n_splits):
        part = docs.where(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        )
        tmp_out = os.path.join(stage, f"_build_{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        src_file = next(
            f for f in os.listdir(tmp_out) if f.endswith(".parquet")
        )
        dest = os.path.join(stage, f"split_{i}.parquet")
        shutil.move(os.path.join(tmp_out, src_file), dest)
        shutil.rmtree(tmp_out, ignore_errors=True)
        mtime = time.time() + i  # strictly increasing → source order
        os.utime(dest, (mtime, mtime))
    mark_ready(stage)
    return stage


@query("dedup_stream_neardup")  # rows-only: xxhash64 sigs are engine-specific
def dedup_stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup dedup: replay documents as an ordered
    multi-batch stream, detect near-dups in-stream against per-bucket
    anchor state, verify candidates exactly, return survivors
    (doc_id, lang, source). Parity with the batch star-policy
    reference is pinned in tests/test_streaming.py."""
    stage = stage_documents_ordered(spark, sf_dir)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    cand = run_to_parquet(
        streaming_neardup_candidates(stream),
        "neardup_stream",
        partitions=spark.sparkContext.defaultParallelism,
    )
    docs = load_table(spark, sf_dir, "documents")
    dropped = verify_candidates(docs.select("doc_id", "text"), cand)
    return docs.select("doc_id", "lang", "source").join(
        dropped, "doc_id", "left_anti"
    )


def batch_star_reference(docs: DataFrame) -> DataFrame:
    """Batch reference for the STREAMING policy: bucket anchor =
    min(doc_id) per LSH bucket (equal to first-arrival under doc_id-
    ordered replay), star candidates, exact-Jaccard verify, drop the
    non-anchor. Used by the parity test only."""
    sh = _shingles(docs.select("doc_id", "text"), distinct=False)
    hashed = sh.select("doc_id", F.xxhash64("shingle").alias("h"))
    banded = _banded_sigs(hashed, MINHASH_BANDS, MINHASH_PERMS // MINHASH_BANDS)
    anchors = banded.groupBy("band", "bhash").agg(F.min("doc_id").alias("anchor"))
    cand = (
        banded.join(anchors, ["band", "bhash"])
        .where(F.col("doc_id") != F.col("anchor"))
        .select("doc_id", "anchor")
        .distinct()
    )
    dropped = verify_candidates(docs.select("doc_id", "text"), cand)
    return docs.select("doc_id").join(dropped, "doc_id", "left_anti")
