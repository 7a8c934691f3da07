"""Sinks (SURVEY.md §2.1 S4) — KStream#to analog [R o.a.k.streams.
kstream.KStream#to(topic, Produced)].

Batch: parquet writes (optionally partitioned — the 100 TB layout is
date-partitioned so readers get partition pruning for free). Streaming:
`DataFrame.writeStream` with checkpointing (see streaming.source.
run_to_memory for the memory-sink harness).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Plain parquet sink."""
    df.write.mode(mode).parquet(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned layout — at 100 TB, partition by a low-cardinality
    time/bucket column (e.g. event date) so downstream scans prune
    whole directories. Pair with sorting within files for row-group
    min/max pruning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted catalog table — THE layout for recurring joins
    on a stable key: two tables bucketed on their join key with the
    same bucket count join with ZERO exchanges (verified in
    tests/test_sources.py: 0 vs 2 shuffles on the plain join). At
    100 TB this converts every fact-fact join on the bucketed key from
    a full shuffle into a local merge per bucket."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


@query(
    "sink_parquet_roundtrip",
    oracle="""
SELECT CAST(ts AS DATE) AS event_date, count(*) AS n_events
FROM events
GROUP BY 1
ORDER BY 1
""",
)
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: write events partitioned by event date, read it back, count
    per partition — proves the sink + partitioned-scan path. Oracle
    (promoted from rows-only in round 3): the round-trip must be
    lossless, so the read-back per-date counts equal counting the
    source directly — any write/read corruption breaks the hash."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    root = tempfile.mkdtemp(prefix="sink_rt_")
    out = os.path.join(root, "events_by_date")
    write_partitioned_parquet(ev, out, ["event_date"])
    back = spark.read.parquet(out)
    agg = (
        back.groupBy("event_date")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_date")
    )
    # Materialize the tiny per-date aggregate, then remove the staging
    # copy — same /tmp-leak fix as the EOS sink (one full events copy
    # per driver/bench/test run otherwise).
    rows = agg.collect()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, agg.schema)


@query(
    "sink_exactly_once_parquet",
    oracle="""
SELECT event_type, count(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def sink_exactly_once_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 exactly-once: the foreachBatch idempotent-write pattern.

    Oracle (promoted from rows-only in round 3): the per-type counts of
    what the EOS sink wrote must equal counting the source table — a
    duplicate-delivered or lost batch breaks the hash, so the oracle
    row IS the end-to-end exactly-once witness, not just a rows check.
    [R Kafka Streams EOS / processing.guarantee=exactly_once_v2].
    Structured Streaming guarantees at-least-once delivery of each
    micro-batch to foreachBatch; writing every batch to a
    batchId-addressed directory and SKIPPING already-present ids makes
    the sink idempotent, so replays after failure cannot double-write —
    at-least-once delivery + idempotent writes = exactly-once output.
    The restart-replay path itself is exercised in
    tests/test_recovery.py-style fashion by re-running the same batch
    id through the writer below (tests/test_sources.py).
    """
    from ..streaming.source import read_events_stream, stream_partitions

    out_root = tempfile.mkdtemp(prefix="sink_eos_")
    checkpoint = tempfile.mkdtemp(prefix="sink_eos_ckpt_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_idempotent_batch(batch_df, out_root, batch_id)

    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(stream_partitions(spark, sf_dir))
    )
    try:
        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        import shutil

        shutil.rmtree(checkpoint, ignore_errors=True)
    back = spark.read.parquet(os.path.join(out_root, "batch_id=*"))
    agg = (
        back.groupBy("event_type").agg(F.count("*").alias("n")).orderBy("event_type")
    )
    # Materialize the (tiny) aggregate before removing the staging
    # output — otherwise every bench/driver/test run leaks a full
    # parquet copy of the events table in /tmp (ADVICE r2).
    rows = agg.collect()
    import shutil

    shutil.rmtree(out_root, ignore_errors=True)
    return spark.createDataFrame(rows, agg.schema)


def write_idempotent_batch(batch_df: DataFrame, out_root: str, batch_id: int) -> None:
    """Idempotent per-batch parquet write: batchId-addressed directory,
    `_SUCCESS`-gated skip on replay. Shared by the streaming sink above
    and the replay test."""
    dest = os.path.join(out_root, f"batch_id={batch_id}")
    if os.path.exists(os.path.join(dest, "_SUCCESS")):
        return  # replayed batch: already committed, skip (idempotence)
    batch_df.write.mode("overwrite").parquet(dest)


UPSERT_BUCKETS = 16


def _latest_per_key(df: DataFrame) -> DataFrame:
    """Latest row per user_id with the (ts, event_id) tiebreak — as a
    ``max_by`` HASH AGGREGATE, not a row_number window: the window form
    sorts every key's rows inside each partition, while max_by folds
    with partial (map-side) aggregation and no sort — the shape that
    matters when the events table is the 100 TB side. Identical winner:
    struct ordering on (ts, event_id) is lexicographic, the same order
    the window's ORDER BY ts DESC, event_id DESC picked."""
    others = [c for c in df.columns if c != "user_id"]
    winner = F.max_by(F.struct(*others), F.struct("ts", "event_id")).alias("__w")
    picked = df.groupBy("user_id").agg(winner)
    return picked.select(
        *[
            F.col(c) if c == "user_id" else F.col(f"__w.{c}").alias(c)
            for c in df.columns
        ]
    )


def merge_batch_into_state(
    spark: SparkSession, state_dir: str, batch_df: DataFrame
) -> None:
    """Fold one micro-batch into the bucketed current-state table:
    latest-per-key over (touched old buckets ∪ batch), dynamic
    partition overwrite of only those buckets. REPLAY-SAFE BY ALGEBRA:
    latest-per-key is an idempotent fold (max by (ts, event_id)), so
    re-merging an already-applied batch leaves the state unchanged —
    at-least-once foreachBatch delivery therefore yields exactly-once
    state (pinned by tests/test_sources.py's double-merge test).

    `localCheckpoint` materializes the merge BEFORE the write because
    it reads the same files the write replaces (self-overwrite hazard
    of in-place parquet merges)."""
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(UPSERT_BUCKETS)).alias("bucket")
    b_latest = _latest_per_key(
        batch_df.select("user_id", "event_id", "ts", "event_type", "value", bucket)
    )
    touched = [r.bucket for r in b_latest.select("bucket").distinct().collect()]
    existing = [
        p
        for t in touched
        if os.path.exists(p := os.path.join(state_dir, f"bucket={t}"))
    ]
    if existing:
        # The partition column lives in the directory name, not the
        # files — recompute it after reading the touched buckets.
        old = spark.read.parquet(*existing).withColumn(
            "bucket", F.pmod(F.xxhash64("user_id"), F.lit(UPSERT_BUCKETS))
        )
        b_latest = _latest_per_key(b_latest.unionByName(old))
    merged = b_latest.localCheckpoint(eager=True)
    # partitionOverwriteMode=dynamic as a PER-WRITE option, not a session
    # conf: under the default static mode this overwrite would delete ALL
    # bucket directories and rewrite only the touched ones — silent loss
    # of untouched state if the helper is called standalone (ADVICE r3).
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(state_dir)
    )


@query(
    "sink_upsert_keyed_table",
    oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
""",
)
def sink_upsert_keyed_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 upsert: materialize a KTable to storage with MERGE semantics
    and partition-pruned rewrites — the no-Delta upsert pattern. Each
    micro-batch folds into a bucketed current-state table: keys hash
    into UPSERT_BUCKETS partition directories, the batch only READS the
    buckets it touches, merges latest-per-key (decomposable: max by
    (ts, event_id) folds associatively across batches), and DYNAMIC
    partition overwrite rewrites ONLY those bucket directories.

    The oracle is latest_by_key over all events: the driver row proves
    the incremental fold across micro-batches reproduces the global
    latest-per-key exactly — the end-to-end upsert-sink witness, same
    pattern as the EOS sink's oracle. At 100 TB the bucket count scales
    with state size and a batch's write amplification is
    |touched buckets| / |buckets|, not the table; time-travel needs a
    real table format (Delta/Iceberg), which this container lacks.

    `localCheckpoint` materializes the merged state BEFORE the write
    because the merge reads the same files the write replaces —
    classic self-overwrite hazard of in-place parquet merges.

    The returned DataFrame is a LAZY scan of the materialized state
    table (no driver collect — at real state sizes the KTable does not
    fit a driver). The state root is keyed on the fixture's identity
    (path + mtime/size fingerprint, same scheme as the changelog
    stager), so each run overwrites its own staging and stale
    fingerprints of the same fixture are swept — bounded /tmp usage of
    one state copy per live fixture.
    """
    import shutil

    from ..catalog import fingerprint_dir
    from ..streaming.source import read_events_stream, stream_partitions

    out_root, _ready = fingerprint_dir(
        "sink_upsert", os.path.join(sf_dir, "events.parquet")
    )
    shutil.rmtree(out_root, ignore_errors=True)  # fresh fold this run
    state_dir = os.path.join(out_root, "state")
    checkpoint = os.path.join(out_root, "checkpoint")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_state(spark, state_dir, batch_df)

    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(stream_partitions(spark, sf_dir))
    )
    try:
        q = (
            stream.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(checkpoint, ignore_errors=True)

    return spark.read.parquet(os.path.join(state_dir, "bucket=*")).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


def merge_batch_into_versioned_state(
    spark: SparkSession, state_dir: str, batch_df: DataFrame
) -> None:
    """Fold one micro-batch into a VERSION-RETAINING bucketed table —
    the incremental maintenance verb for the versioned store
    (state_store.materialize_versioned_store builds the same layout in
    one shot; this keeps it live under a foreachBatch stream).

    Unlike the latest-per-key upsert, versions APPEND — nothing is
    overwritten, so the write touches only NEW files in the touched
    buckets. REPLAY-SAFE BY ANTI-JOIN, not by algebra: append is not
    idempotent, so the batch is first anti-joined on (user_id,
    event_id) against the touched buckets' existing version ids — a
    replayed batch finds all its rows present and appends nothing
    (pinned by the double-merge test). The anti-join reads only the
    two id columns of only the touched buckets (column-pruned,
    bucket-pruned); at-least-once foreachBatch delivery therefore
    yields exactly-once version history.

    Appended files are not (key, ts)-sorted within the bucket — the
    as-of read stays CORRECT (max_by needs no order) but loses some
    row-group pruning until ``compact_state_dir(...,
    sort_cols=("user_id", "ts"))`` re-sorts the bucket."""
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(UPSERT_BUCKETS)).alias("bucket")
    rows = batch_df.select(
        "user_id", "event_id", "ts", "event_type", "value", bucket
    )
    touched = [r.bucket for r in rows.select("bucket").distinct().collect()]
    existing = [
        p
        for t in touched
        if os.path.exists(p := os.path.join(state_dir, f"bucket={t}"))
    ]
    if existing:
        seen = spark.read.parquet(*existing).select("user_id", "event_id")
        rows = rows.join(seen, ["user_id", "event_id"], "left_anti")
    fresh = rows.localCheckpoint(eager=True)
    if fresh.rdd.isEmpty():
        return
    (
        fresh.repartition("bucket")
        .sortWithinPartitions("user_id", "ts")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(state_dir)
    )


def compact_state_dir(
    spark: SparkSession,
    state_dir: str,
    max_files_per_bucket: int = 1,
    sort_cols: tuple[str, ...] | None = None,
) -> list[int]:
    """Out-of-band compaction of the bucketed state table — the
    RocksDB-compaction / Kafka-log-compaction analog for the upsert
    sink's layout. Every micro-batch merge rewrites its touched buckets
    as fresh files; a long-running stream therefore accretes small
    files per bucket (one rewrite's worth is fine, thousands are a
    file-listing and open-cost problem at scale). Compaction rewrites
    ONLY the buckets whose file count exceeds ``max_files_per_bucket``,
    in one distributed job with dynamic partition overwrite — untouched
    buckets are never read or rewritten, same partial-rewrite contract
    as the merge itself. Returns the compacted bucket ids.

    `localCheckpoint` materializes the rows BEFORE the write because the
    rewrite replaces the very files it reads (the merge's self-overwrite
    hazard, same fix)."""
    import glob as _glob

    need = []
    for bdir in _glob.glob(os.path.join(state_dir, "bucket=*")):
        n_files = len(_glob.glob(os.path.join(bdir, "*.parquet")))
        if n_files > max_files_per_bucket:
            need.append(int(bdir.rsplit("bucket=", 1)[1]))
    if not need:
        return []
    paths = [os.path.join(state_dir, f"bucket={b}") for b in sorted(need)]
    rows = spark.read.parquet(*paths).withColumn(
        "bucket", F.pmod(F.xxhash64("user_id"), F.lit(UPSERT_BUCKETS))
    ).repartition("bucket")
    if sort_cols:
        # versioned layouts re-sort on compaction so the as-of read's
        # row-group pruning comes back after unsorted appends
        rows = rows.sortWithinPartitions(*sort_cols)
    rows = rows.localCheckpoint(eager=True)
    (
        rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(state_dir)
    )
    return sorted(need)


def delete_keys_from_state(
    spark: SparkSession,
    state_dir: str,
    keys: list[int],
    key_col: str = "user_id",
) -> list[int]:
    """Targeted key erasure from the bucketed state layout — the
    right-to-be-forgotten verb (RocksDB `delete`, Kafka tombstone +
    compaction collapsed into one batch op). Only the buckets that can
    CONTAIN the keys (pmod(xxhash64(key), UPSERT_BUCKETS)) are read and
    rewritten via dynamic partition overwrite; every other bucket's
    files are untouched bytes (pinned in tests/test_sources.py). Cost
    is O(|touched buckets|), independent of table size — the same
    partial-rewrite contract as merge_batch_into_state /
    compact_state_dir.

    The anti-join runs on the key column only; `localCheckpoint`
    materializes survivors before the write because the rewrite
    replaces the files it reads (the merge's self-overwrite hazard).
    Returns the rewritten bucket ids."""
    if not keys:
        return []
    kdf = spark.createDataFrame([(int(k),) for k in keys], f"{key_col} LONG")
    touched = sorted(
        r.b
        for r in kdf.select(
            F.pmod(F.xxhash64(key_col), F.lit(UPSERT_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    )
    paths = [os.path.join(state_dir, f"bucket={b}") for b in touched]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return []
    survivors = (
        spark.read.parquet(*paths)
        .join(F.broadcast(kdf), key_col, "left_anti")
        .withColumn("bucket", F.pmod(F.xxhash64(key_col), F.lit(UPSERT_BUCKETS)))
        .repartition("bucket")
        .localCheckpoint(eager=True)
    )
    (
        survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(state_dir)
    )
    # A bucket whose EVERY row was deleted writes nothing under dynamic
    # overwrite — drop its stale directory explicitly so reads don't
    # resurrect erased keys.
    import shutil as _shutil

    kept = {
        r.bucket for r in survivors.select("bucket").distinct().collect()
    }
    for b in touched:
        if b not in kept:
            _shutil.rmtree(
                os.path.join(state_dir, f"bucket={b}"), ignore_errors=True
            )
    return touched
