"""Interactive Queries analog — serve point reads from materialized state.

[R o.a.k.streams.KafkaStreams#store(StoreQueryParameters),
 o.a.k.streams.state.ReadOnlyKeyValueStore#get/range/all/
 approximateNumEntries, o.a.k.streams.state.ReadOnlyWindowStore#fetch]
(reconstructed public API surface — SURVEY.md §0/§2; the reference
checkout is empty, so coordinates are the public Kafka Streams ones.)

A Kafka Streams app serves reads straight from its RocksDB state
stores. The Spark-native analog: materialize the KTable
(latest-per-key) ONCE as a hash-bucketed parquet layout
(``bucket=pmod(xxhash64(key), N)`` partition directories — the exact
layout the upsert sink already maintains incrementally, sinks.py), then
serve the four ReadOnlyKeyValueStore verbs:

- ``store_get(keys)``     — compute each key's bucket, hand the reader
  ONLY those bucket directories (partition pruning by construction: a
  get touches 1/N of the state regardless of total size) and push the
  key equality into the parquet row-group scan.
- ``store_range(lo, hi)`` — hash buckets carry no key order (same
  trade-off RocksDB makes between point-lookup layout and range-scan
  layout), so a range fans out to all buckets with the BETWEEN
  predicate pushed to the scan; row-group min/max stats prune inside
  files because each bucket is written sorted by key.
- ``store_all()``         — full scan of the state table.
- ``store_approx_count()``— footer-metadata row counts only (sum of
  parquet row-group counts, no data scan) — the analog of RocksDB's
  ``estimate-num-keys``; exact for parquet, O(#files) metadata reads.

100 TB story: state size scales with key cardinality; bucket count N
scales with it (sinks.py sizing note), keeping a get's read
amplification at 1/N of directories and one row-group seek within.
The materialize step is a single latest-per-key shuffle — the same
fold the upsert sink runs incrementally; a live deployment would point
these verbs at the sink's continuously-maintained state_dir instead.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fingerprint_dir, load_table, mark_ready
from ..registry import query
from .sinks import UPSERT_BUCKETS, _latest_per_key

STORE_COLS = ["user_id", "event_id", "ts", "event_type", "value"]
STORE_SCHEMA = (
    "user_id LONG, event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
)


def _empty_store(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], STORE_SCHEMA)


def _read_state(spark: SparkSession, store_dir: str) -> DataFrame:
    """Scan the whole store; an empty store (no bucket directories —
    e.g. every key tombstoned, or nothing ingested yet) is a valid
    state and reads as zero rows, not an AnalysisException."""
    if not glob.glob(os.path.join(store_dir, "bucket=*")):
        return _empty_store(spark)
    return spark.read.parquet(store_dir).select(*STORE_COLS)


def materialize_keyed_store(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events KTable (latest row per user_id) as the
    bucketed layout interactive queries serve from; idempotent per
    fixture (fingerprint-keyed dir, same scheme as the upsert sink).

    Buckets are written SORTED BY KEY within files so parquet row-group
    min/max statistics prune inside a bucket too — get() then reads one
    directory and typically one row group.
    """
    root, ready = fingerprint_dir("iq_store", os.path.join(sf_dir, "events.parquet"))
    if ready:
        return root
    ev = load_table(spark, sf_dir, "events").select(*STORE_COLS)
    build_keyed_store(ev, root)
    mark_ready(root)
    return root


def build_keyed_store(df: DataFrame, root: str) -> str:
    """Write any (user_id, event_id, ts, event_type, value) DataFrame
    as the bucketed latest-per-key store layout. Deployment/test entry
    point — `materialize_keyed_store` wraps it for the fixture; the
    hypothesis property test drives it with arbitrary event sets."""
    state = _latest_per_key(df.select(*STORE_COLS)).withColumn(
        "bucket", F.pmod(F.xxhash64("user_id"), F.lit(UPSERT_BUCKETS))
    )
    (
        state.repartition("bucket")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(root)
    )
    return root


def buckets_of(spark: SparkSession, keys: Sequence[int]) -> dict[int, int]:
    """key -> bucket via the SAME Spark expression the writer used.

    One tiny driver-side job over len(keys) literal rows — never the
    state table. Duplicating xxhash64 in Python would silently fork the
    hash; asking Spark keeps writer and reader pinned to one function.
    """
    # Pure-JVM literal plan (range + explode(array(lit...))) — a
    # createDataFrame from a Python list would scan a Python RDD, and
    # that single task pays a pyspark-worker spawn (~4 s measured on
    # this box); this form stays in codegen and returns in ~0.1 s.
    keys_col = F.explode(
        F.array(*[F.lit(int(k)).cast("long") for k in keys])
    ).alias("user_id")
    rows = (
        spark.range(1)
        .select(keys_col)
        .select(
            "user_id",
            F.pmod(F.xxhash64("user_id"), F.lit(UPSERT_BUCKETS)).alias("bucket"),
        )
        .collect()
    )
    return {r.user_id: r.bucket for r in rows}


def store_get(
    spark: SparkSession, store_dir: str, keys: int | Sequence[int]
) -> DataFrame:
    """ReadOnlyKeyValueStore#get: latest row for each requested key,
    reading ONLY the bucket directories those keys hash to."""
    key_list = [keys] if isinstance(keys, int) else list(keys)
    if not key_list:
        return _empty_store(spark)
    buckets = sorted(set(buckets_of(spark, key_list).values()))
    dirs = [
        p
        for b in buckets
        if os.path.exists(p := os.path.join(store_dir, f"bucket={b}"))
    ]
    if not dirs:
        return _empty_store(spark)
    return (
        spark.read.parquet(*dirs)
        .where(F.col("user_id").isin([int(k) for k in key_list]))
        .select(*STORE_COLS)
    )


def store_range(spark: SparkSession, store_dir: str, lo: int, hi: int) -> DataFrame:
    """ReadOnlyKeyValueStore#range: hash layout ⇒ all buckets, predicate
    pushed to the scan; sorted-within-bucket files give row-group
    pruning."""
    return _read_state(spark, store_dir).where(
        F.col("user_id").between(int(lo), int(hi))
    )


def store_all(spark: SparkSession, store_dir: str) -> DataFrame:
    """ReadOnlyKeyValueStore#all: full state scan."""
    return _read_state(spark, store_dir)


def store_approx_count(store_dir: str) -> int:
    """ReadOnlyKeyValueStore#approximateNumEntries: parquet footer
    metadata only — no Spark job, no data pages; O(#files) driver-side
    footer reads, which is what RocksDB's estimate-num-keys costs too."""
    import pyarrow.parquet as pq

    total = 0
    for path in glob.glob(os.path.join(store_dir, "bucket=*", "*.parquet")):
        total += pq.ParquetFile(path).metadata.num_rows
    return total


# Keys chosen to exist at every fixture SF (user_id is dense from 0;
# sf0.001 has users 0..14 — TESTDATA.md).
LOOKUP_KEYS = [0, 1, 2, 3, 5, 8, 11, 13]


@query(
    "store_point_lookup",
    oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE user_id IN (0, 1, 2, 3, 5, 8, 11, 13)
) t
WHERE rn = 1
""",
)
def store_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive query: serve 8 point lookups from the materialized
    bucketed KTable. The oracle recomputes latest-per-key from raw
    events for the same keys, so the driver row proves the materialize +
    bucket-route + pruned-read path end to end. The pruning itself
    (only the looked-up keys' bucket directories are opened) is pinned
    by tests/test_plans.py via DataFrame.inputFiles()."""
    store = materialize_keyed_store(spark, sf_dir)
    return store_get(spark, store, LOOKUP_KEYS)


def materialize_window_store(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the hourly tumbling per-user count windows as a
    bucketed layout — the WindowStore a windowed aggregation keeps
    [R o.a.k.streams.state.ReadOnlyWindowStore]. Same bucket scheme as
    the KV store; files sorted by (user_id, window_start) so a fetch's
    time slice prunes row groups inside the key's bucket."""
    root, ready = fingerprint_dir("iq_wstore", os.path.join(sf_dir, "events.parquet"))
    if ready:
        return root
    ev = load_table(spark, sf_dir, "events")
    wins = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .withColumn("bucket", F.pmod(F.xxhash64("user_id"), F.lit(UPSERT_BUCKETS)))
    )
    (
        wins.repartition("bucket")
        .sortWithinPartitions("user_id", "window_start")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(root)
    )
    mark_ready(root)
    return root


def window_store_fetch(
    spark: SparkSession, wstore_dir: str, key: int, time_from: str, time_to: str
) -> DataFrame:
    """ReadOnlyWindowStore#fetch(key, timeFrom, timeTo): the key's
    windowed aggregates within [time_from, time_to) — reads only the
    key's bucket directory; the time slice rides the parquet row-group
    stats because files are sorted by (key, window_start)."""
    b = buckets_of(spark, [key])[key]
    path = os.path.join(wstore_dir, f"bucket={b}")
    if not os.path.exists(path):
        # Absent bucket == no rows for any key hashing there: fetch of
        # an unknown key returns empty, like every other store verb.
        return spark.createDataFrame(
            [], "user_id LONG, window_start TIMESTAMP, n_events LONG"
        )
    return (
        spark.read.parquet(path)
        .where(
            (F.col("user_id") == int(key))
            & (F.col("window_start") >= F.lit(time_from).cast("timestamp"))
            & (F.col("window_start") < F.lit(time_to).cast("timestamp"))
        )
        .select("user_id", "window_start", "n_events")
    )


def window_store_fetch_all(
    spark: SparkSession, wstore_dir: str, time_from: str, time_to: str
) -> DataFrame:
    """ReadOnlyWindowStore#fetchAll(timeFrom, timeTo): every key's
    windowed aggregates within [time_from, time_to) — all buckets (a
    time slice carries no key restriction to prune on), with the time
    predicate pushed to the scan; files sorted by (key, window_start)
    still prune row groups whose window range misses the slice."""
    if not glob.glob(os.path.join(wstore_dir, "bucket=*")):
        return spark.createDataFrame(
            [], "user_id LONG, window_start TIMESTAMP, n_events LONG"
        )
    return (
        spark.read.parquet(wstore_dir)
        .where(
            (F.col("window_start") >= F.lit(time_from).cast("timestamp"))
            & (F.col("window_start") < F.lit(time_to).cast("timestamp"))
        )
        .select("user_id", "window_start", "n_events")
    )


@query(
    "store_window_fetch_all",
    oracle="""
SELECT user_id, date_trunc('hour', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
WHERE date_trunc('hour', ts) >= TIMESTAMP '2024-01-10 00:00:00'
  AND date_trunc('hour', ts) <  TIMESTAMP '2024-01-11 00:00:00'
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def store_window_fetch_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive query: fetchAll over one day of hourly windows for
    EVERY key — the key-unrestricted sibling of store_window_fetch,
    completing the ReadOnlyWindowStore verb set (fetch / fetchAll)."""
    store = materialize_window_store(spark, sf_dir)
    return window_store_fetch_all(
        spark, store, "2024-01-10 00:00:00", "2024-01-11 00:00:00"
    )


@query(
    "store_window_fetch",
    oracle="""
SELECT user_id, date_trunc('hour', ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
WHERE user_id = 7
  AND date_trunc('hour', ts) >= TIMESTAMP '2024-01-05 00:00:00'
  AND date_trunc('hour', ts) <  TIMESTAMP '2024-01-12 00:00:00'
GROUP BY 1, 2
ORDER BY 2
""",
)
def store_window_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive query over WINDOWED state: fetch(key=7, one week of
    hourly windows) from the materialized window store. The oracle
    recomputes the same hourly counts from raw events, so the driver
    row proves materialize + bucket-route + time-slice end to end."""
    store = materialize_window_store(spark, sf_dir)
    return window_store_fetch(
        spark, store, 7, "2024-01-05 00:00:00", "2024-01-12 00:00:00"
    )


@query(
    "store_range_scan",
    oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE user_id BETWEEN 3 AND 11
) t
WHERE rn = 1
""",
)
def store_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive query: ReadOnlyKeyValueStore#range over the
    materialized KTable (keys 3..11 exist at every SF)."""
    store = materialize_keyed_store(spark, sf_dir)
    return store_range(spark, store, 3, 11)


def materialize_session_store(spark: SparkSession, sf_dir: str) -> str:
    """Materialize per-user session windows (30-min inactivity gap,
    operators/windows.sessionize) as a bucketed layout — the
    SessionStore a session-windowed aggregation keeps
    [R o.a.k.streams.state.ReadOnlySessionStore]. Completes the KS
    store triad (KeyValueStore / WindowStore / SessionStore) on the
    same bucket scheme."""
    from ..operators.windows import session_frame

    root, ready = fingerprint_dir("iq_sstore", os.path.join(sf_dir, "events.parquet"))
    if ready:
        return root
    # r9 sessionize-once: derive from the shared persisted session
    # frame — re-bucketing shuffles the compact per-session frame, the
    # 100M-row per-user event sort is not re-paid here.
    sessions = session_frame(spark, sf_dir).select(
        "user_id", "session_id", "n_events",
        "session_start", "session_end", "total_value",
    ).withColumn(
        "bucket", F.pmod(F.xxhash64("user_id"), F.lit(UPSERT_BUCKETS))
    )
    (
        sessions.repartition("bucket")
        .sortWithinPartitions("user_id", "session_start")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(root)
    )
    mark_ready(root)
    return root


def session_store_fetch(spark: SparkSession, sstore_dir: str, key: int) -> DataFrame:
    """ReadOnlySessionStore#fetch(key): every session for the key,
    from only the key's bucket directory."""
    b = buckets_of(spark, [key])[key]
    path = os.path.join(sstore_dir, f"bucket={b}")
    if not os.path.exists(path):
        return spark.createDataFrame(
            [],
            "user_id LONG, session_id BIGINT, n_events LONG, "
            "session_start TIMESTAMP, session_end TIMESTAMP, total_value DOUBLE",
        )
    return (
        spark.read.parquet(path)
        .where(F.col("user_id") == int(key))
        .select(
            "user_id", "session_id", "n_events",
            "session_start", "session_end", "total_value",
        )
    )


@query(
    "store_session_fetch",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE user_id = 7
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY session_id
""",
)
def store_session_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive query over SESSION state: fetch(key=7) from the
    materialized session store. The oracle re-runs LAG sessionization
    on raw events for the key (sessionization over one user is
    arrival-set-local, so per-key recompute equals the global run's
    slice), proving materialize + bucket-route end to end."""
    store = materialize_session_store(spark, sf_dir)
    return session_store_fetch(spark, store, 7)


# ---------------------------------------------------------------------------
# Versioned key-value store — the fourth KS store type.
# ---------------------------------------------------------------------------


def materialize_versioned_store(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events stream as a VERSIONED key-value store —
    every (ts, row) version retained per key, not just the latest
    [R o.a.k.streams.state.VersionedKeyValueStore /
     o.a.k.streams.state.ReadOnlyVersionedKeyValueStore] — completing
    the KS store quartet (KV / window / session / versioned) on the
    shared bucket scheme.

    Layout: bucket=pmod(xxhash64(key), N) directories, files sorted by
    (user_id, ts) so an as-of read's ``ts <= asOf`` slice prunes row
    groups inside the key's bucket. Retention: KS bounds history by
    ``historyRetention``; here retention is infinite (a valid KS
    config) — a bounded deployment would add ``WHERE ts >= now -
    retention`` at materialize time, which in this layout is a plain
    scan predicate riding the same sorted row-group stats."""
    root, ready = fingerprint_dir("iq_vstore", os.path.join(sf_dir, "events.parquet"))
    if ready:
        return root
    build_versioned_store(load_table(spark, sf_dir, "events"), root)
    mark_ready(root)
    return root


def build_versioned_store(df: DataFrame, root: str) -> str:
    """Write any (user_id, event_id, ts, event_type, value) DataFrame as
    the version-retaining bucketed layout (ALL rows kept, sorted by
    (key, ts) within files). Deployment/test entry point —
    `materialize_versioned_store` wraps it for the fixture."""
    ev = df.select(*STORE_COLS).withColumn(
        "bucket", F.pmod(F.xxhash64("user_id"), F.lit(UPSERT_BUCKETS))
    )
    (
        ev.repartition("bucket")
        .sortWithinPartitions("user_id", "ts")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(root)
    )
    return root


def versioned_store_get(
    spark: SparkSession,
    vstore_dir: str,
    keys: int | Sequence[int],
    as_of_ts: str,
) -> DataFrame:
    """ReadOnlyVersionedKeyValueStore#get(key, asOfTimestamp): for each
    requested key, the version that was current AT ``as_of_ts`` — the
    latest retained row with ``ts <= as_of`` ((ts, event_id) tiebreak,
    same ordering every latest-per-key fold in the repo uses). A key
    with no version at or before ``as_of`` yields no row (KS returns
    null there).

    Read path mirrors ``store_get``: only the keys' bucket directories
    are opened; the key equality AND the as-of upper bound are scan
    predicates (files sorted by (key, ts) ⇒ row-group pruning on both);
    the winner is a ``max_by`` hash aggregate over the surviving slice
    — no per-key sort, partial-aggregated map-side, so the verb stays
    O(slice) however deep the version history grows."""
    key_list = [keys] if isinstance(keys, int) else list(keys)
    if not key_list:
        return _empty_store(spark)
    buckets = sorted(set(buckets_of(spark, key_list).values()))
    dirs = [
        p
        for b in buckets
        if os.path.exists(p := os.path.join(vstore_dir, f"bucket={b}"))
    ]
    if not dirs:
        return _empty_store(spark)
    slice_df = (
        spark.read.parquet(*dirs)
        .where(F.col("user_id").isin([int(k) for k in key_list]))
        .where(F.col("ts") <= F.lit(as_of_ts).cast("timestamp"))
        .select(*STORE_COLS)
    )
    others = [c for c in STORE_COLS if c != "user_id"]
    winner = F.max_by(F.struct(*others), F.struct("ts", "event_id")).alias("__w")
    return (
        slice_df.groupBy("user_id")
        .agg(winner)
        .select(
            "user_id", *[F.col(f"__w.{c}").alias(c) for c in others]
        )
    )


AS_OF_TS = "2024-01-08 12:00:00"  # mid-fixture: every LOOKUP_KEY has
                                  # history before AND after it at all SFs


@query(
    "store_versioned_get",
    oracle=f"""
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WHERE user_id IN (0, 1, 2, 3, 5, 8, 11, 13)
    AND ts <= TIMESTAMP '{AS_OF_TS}'
) t
WHERE rn = 1
""",
)
def store_versioned_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive query over VERSIONED state: get(key, asOf) for the 8
    lookup keys at a mid-fixture timestamp. The oracle recomputes
    latest-at-or-before-asOf from raw events, so the driver row proves
    the version-retaining materialize + bucket-route + as-of fold end
    to end — and because every key also has LATER versions, a store
    that served the latest row instead of the as-of row hashes red."""
    store = materialize_versioned_store(spark, sf_dir)
    return versioned_store_get(spark, store, LOOKUP_KEYS, AS_OF_TS)


# ---------------------------------------------------------------------------
# Generic store wrapper — the KafkaStreams#store(...) return value.
# ---------------------------------------------------------------------------


def write_bucketed_state(df: DataFrame, root: str, key_col: str) -> str:
    """Write an already-compacted table (one row per key, any schema)
    as the bucketed store layout keyed on ``key_col`` (long keys)."""
    state = df.withColumn(
        "bucket", F.pmod(F.xxhash64(key_col), F.lit(UPSERT_BUCKETS))
    )
    (
        state.repartition("bucket")
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(root)
    )
    return root


class ReadOnlyKeyValueStore:
    """[R o.a.k.streams.state.ReadOnlyKeyValueStore] over a bucketed
    parquet state layout with an arbitrary long key column — what
    ``KTable.materialize()`` (topology.py) hands back, mirroring
    ``KafkaStreams#store(StoreQueryParameters)``. The module-level verbs
    above are the events-fixture specialization of the same layout."""

    def __init__(self, spark: SparkSession, root: str, key_col: str) -> None:
        self.spark = spark
        self.root = root
        self.key_col = key_col
        self._cols: list[str] | None = None

    def _read(self, paths: list[str] | None = None) -> DataFrame:
        dirs = paths if paths is not None else glob.glob(
            os.path.join(self.root, "bucket=*")
        )
        if not dirs:
            raise LookupError(f"empty store at {self.root}")
        df = self.spark.read.parquet(*dirs)
        return df.drop("bucket") if "bucket" in df.columns else df

    def get(self, key: int):
        """Point lookup → Row or None; opens only the key's bucket."""
        b = buckets_of(self.spark, [key])[key]
        path = os.path.join(self.root, f"bucket={b}")
        if not os.path.exists(path):
            return None
        rows = (
            self._read([path])
            .where(F.col(self.key_col) == int(key))
            .limit(1)
            .collect()
        )
        return rows[0] if rows else None

    def range(self, lo: int, hi: int) -> DataFrame:
        return self._read().where(F.col(self.key_col).between(int(lo), int(hi)))

    def all(self) -> DataFrame:
        return self._read()

    def approximate_num_entries(self) -> int:
        return store_approx_count(self.root)


class ReadOnlyVersionedKeyValueStore:
    """[R o.a.k.streams.state.ReadOnlyVersionedKeyValueStore] over a
    version-retaining bucketed parquet layout with arbitrary long key /
    timestamp columns — what ``KStream.materialize_versioned()``
    (topology.py) hands back. The module-level ``versioned_store_get``
    is the events-fixture specialization of the same layout.

    ``get(key)`` serves the latest version; ``get(key, as_of)`` the
    version current at the timestamp (None past it — KS returns null).
    Both open only the key's bucket directory; the as-of bound rides
    the (key, ts)-sorted row-group stats.

    Tie-breaking (ADVICE r5): two versions can share a timestamp, and a
    ``max_by`` on ts alone picks a nondeterministic winner. When
    ``tie_col`` is given (``materialize_versioned``'s ``tiebreak``,
    e.g. event_id — the repo-wide ordering), ties break on it; when it
    is None the store falls back to ordering by the FULL remaining row
    struct in schema order, which is deterministic for any two distinct
    rows. ``history()`` applies the same total order, oldest first."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_col: str,
        ts_col: str = "ts",
        tie_col: str | None = None,
    ) -> None:
        self.spark = spark
        self.root = root
        self.key_col = key_col
        self.ts_col = ts_col
        self.tie_col = tie_col

    def _order_cols(self, df: DataFrame) -> list[str]:
        """Deterministic version total-order: ts, then the explicit
        tiebreak, else every remaining column in schema order."""
        if self.tie_col:
            return [self.ts_col, self.tie_col]
        rest = [c for c in df.columns if c not in (self.key_col, self.ts_col)]
        return [self.ts_col, *rest]

    def _slice(self, key: int, as_of_ts: str | None) -> DataFrame | None:
        b = buckets_of(self.spark, [key])[key]
        path = os.path.join(self.root, f"bucket={b}")
        if not os.path.exists(path):
            return None
        df = self.spark.read.parquet(path).where(
            F.col(self.key_col) == int(key)
        )
        if as_of_ts is not None:
            df = df.where(F.col(self.ts_col) <= F.lit(as_of_ts).cast("timestamp"))
        return df.drop("bucket") if "bucket" in df.columns else df

    def get(self, key: int, as_of_ts: str | None = None):
        """Point read -> Row or None; the winner is a max_by hash
        aggregate over the pruned slice (no per-key sort)."""
        df = self._slice(key, as_of_ts)
        if df is None:
            return None
        order = F.struct(*self._order_cols(df))
        others = [c for c in df.columns if c != self.key_col]
        rows = (
            df.groupBy(self.key_col)
            .agg(F.max_by(F.struct(*others), order).alias("__w"))
            .select(self.key_col, "__w.*")
            .collect()
        )
        return rows[0] if rows else None

    def history(self, key: int) -> DataFrame:
        """All retained versions for the key, oldest first — the
        layout's extra verb (KS exposes no history scan; parquet
        retention makes it free). A key hashing to an absent bucket
        returns an empty frame with the STORE's schema (read from any
        existing bucket), not the events-fixture default."""
        df = self._slice(key, None)
        if df is None:
            others = glob.glob(os.path.join(self.root, "bucket=*"))
            if not others:
                return _empty_store(self.spark)
            return (
                self.spark.read.parquet(others[0]).limit(0).drop("bucket")
            )
        return df.orderBy(*self._order_cols(df))
