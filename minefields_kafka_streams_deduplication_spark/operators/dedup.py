"""Deduplication family — the reference's core capability
(SURVEY.md §2.3; BASELINE.json:6-7).

The reference [R — canonical Confluent recipe, o.a.k.streams.kstream.
KStream#processValues + Stores.persistentWindowStore]: for each record,
look up the event id in a window store; if seen within the retention
window → drop, else forward and record. Its "minefield" corner cases
(unbounded state without TTL, dupes readmitted after expiry,
out-of-order arrivals near the window edge) map to Spark watermarks.

Batch-checkable forms live here (D1/D2/D3/D6-exact); the streaming forms
(D4 `dropDuplicatesWithinWatermark`, D5 custom-TTL arbitrary state) are
in `streaming/dedup_stream.py`. Near-dup text (MinHash/SimHash/Jaccard)
is in `functions/neardup.py`.

Scale notes: every batch form below is one hash shuffle on the dedup
key. At 100 TB: keys should be salted only if a single dedup key is
pathologically hot (rare for IDs); AQE skew handling covers moderate
skew. `dropDuplicates` does partial (map-side) dedup before the
shuffle, so the shuffle volume is bounded by distinct keys per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

BUSINESS_KEY = ["user_id", "event_type", "value"]


@query(
    "dedup_exact",
    oracle="SELECT DISTINCT event_id, ts, user_id, event_type, value, props FROM events",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: exact full-row dedup (hash-groupBy on every column).

    `dropDuplicates()` with no subset == SELECT DISTINCT * — safe for the
    oracle because the whole row is the key (no arbitrary-row-kept
    hazard, SURVEY.md §5.3).
    """
    return load_table(spark, sf_dir, "events").select(*EVENT_COLS).dropDuplicates()


def dedup_first_by(df: DataFrame, key: list[str], order: list) -> DataFrame:
    """Generic deterministic 'keep first per key' operator (D2 core).

    Unlike `dropDuplicates(subset)` (keeps an *arbitrary* row), this is
    deterministic and therefore oracle-checkable.
    """
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@query(
    "dedup_keep_first",
    oracle="""
SELECT event_id, ts, user_id, event_type, value, props
FROM (
  SELECT event_id, ts, user_id, event_type, value, props,
         row_number() OVER (PARTITION BY user_id, event_type, value
                            ORDER BY ts, event_id) AS rn
  FROM events
) t
WHERE rn = 1
""",
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: dedup on the business key (user_id, event_type, value), keep
    the earliest record by (ts, event_id) — the batch analog of the
    reference's forward-first-drop-later-duplicates semantics."""
    ev = load_table(spark, sf_dir, "events").select(*EVENT_COLS)
    return dedup_first_by(ev, BUSINESS_KEY, [F.col("ts").asc(), F.col("event_id").asc()])


DEDUP_WINDOW_MINUTES = 30


@query(
    "dedup_windowed",
    oracle=f"""
SELECT event_id, ts, user_id, event_type, value
FROM (
  SELECT event_id, ts, user_id, event_type, value,
         lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_ts
  FROM events
) t
WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL {DEDUP_WINDOW_MINUTES} MINUTE
""",
)
def dedup_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: windowed (TTL) dedup, gap-based batch form.

    Semantics: drop a record if the SAME key appeared within the last W
    (here: the gap to the immediately preceding record of that key is
    <= W). This is the LAG formulation from SURVEY.md §2.3 — it models a
    window store whose entry is refreshed on every arrival (sliding
    TTL). The reference's put-only-on-forward variant (fixed TTL from
    the last *kept* record) is inherently iterative and is implemented
    as the streaming operator D5 (`streaming.dedup_stream`).

    Strict µs comparison on both sides: `unix_micros` diff here,
    `INTERVAL` arithmetic in DuckDB — identical because both readers
    truncate the ns fixture to µs.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("gap_us", gap_us)
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") > DEDUP_WINDOW_MINUTES * 60 * 1_000_000))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


INCREMENTAL_CUTOFF = "2024-01-20 00:00:00"


@query(
    "dedup_incremental_new_events",
    oracle=f"""
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value
FROM events e
WHERE e.ts >= TIMESTAMP '{INCREMENTAL_CUTOFF}'
  AND NOT EXISTS (
    SELECT 1 FROM events h
    WHERE h.ts < TIMESTAMP '{INCREMENTAL_CUTOFF}'
      AND h.user_id = e.user_id
      AND h.event_type = e.event_type
      AND h.value = e.value
  )
""",
)
def dedup_incremental_new_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-batch) dedup — the daily-pipeline shape at
    100 TB: today's partition anti-joined against the accumulated
    seen-keys table, so only never-seen keys flow downstream. Here the
    fixture's own history (ts < cutoff) stands in for the state table.

    Scale shape: the history side is reduced to DISTINCT keys before
    the anti-join (in production: a compact bucketed keys table, not
    the raw history), so the join input is keys, not events.
    """
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(INCREMENTAL_CUTOFF).cast("timestamp")
    history_keys = (
        ev.filter(F.col("ts") < cutoff).select(*BUSINESS_KEY).distinct()
    )
    new_events = ev.filter(F.col("ts") >= cutoff)
    return new_events.join(history_keys, BUSINESS_KEY, "left_anti").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# Bloom parameters: 32 buckets x 32768 bits = 1,048,576 bits (128 KiB
# broadcast regardless of history size), k=5 hash probes. Sized for
# ~10 bits/key at 100k distinct history keys (~1% false-positive rate);
# at 100 TB you scale BLOOM_BUCKETS with the seen-keys cardinality
# (m ~ 10 bits/key keeps fp ~1%) — the broadcast stays m/8 bytes.
BLOOM_BUCKETS = 32
BLOOM_BITS = BLOOM_BUCKETS * 32768
BLOOM_K = 5


def _bloom_positions(cols: list[str]) -> F.Column:
    """Array of BLOOM_K bit positions in [0, BLOOM_BITS) for a key."""
    return F.array(
        *[
            F.pmod(F.xxhash64(*cols, F.lit(i)), F.lit(BLOOM_BITS))
            for i in range(BLOOM_K)
        ]
    )


def bloom_prefilter(
    history_keys: DataFrame, batch: DataFrame, cols: list[str]
) -> DataFrame:
    """Append boolean ``maybe_seen`` to ``batch``: False means the key
    is DEFINITELY absent from ``history_keys`` (Bloom filters have no
    false negatives); True means it might be present (~1% false
    positives at design load) and needs exact verification.

    The filter is an m-bit bitmap built with ``bitmap_construct_agg``
    (one 4096-byte bucket per 32768 bits, pivoted into a SINGLE row so
    the probe side receives the whole structure as a 1-row broadcast
    cross join — m/8 bytes on the wire regardless of history size).
    Each probe is whole-stage-codegen byte arithmetic: bit p of a bucket
    lives in byte ``p/8 + 1`` at LSB-first position ``p%8`` (layout
    verified against ``bitmap_bit_position``), read back via
    ``conv(hex(substring(bm, byte, 1)), 16, 10) & (1 << bit)``.
    """
    bloom_row = (
        history_keys.select(F.explode(_bloom_positions(cols)).alias("p"))
        .groupBy(F.floor(F.col("p") / 32768).cast("int").alias("bucket"))
        .agg(F.expr("bitmap_construct_agg(cast(p % 32768 as int))").alias("bm"))
        .groupBy()
        .pivot("bucket", list(range(BLOOM_BUCKETS)))
        .agg(F.first("bm"))
    )
    out_cols = batch.columns
    with_bloom = batch.crossJoin(F.broadcast(bloom_row))
    blooms = F.array(*[F.col(f"`{b}`") for b in range(BLOOM_BUCKETS)])

    def _probe_hit(i: int) -> F.Column:
        pos = F.pmod(F.xxhash64(*cols, F.lit(i)), F.lit(BLOOM_BITS))
        bm = F.element_at(blooms, F.floor(pos / 32768).cast("int") + 1)
        inb = F.pmod(pos, F.lit(32768))
        byte = F.conv(
            F.hex(F.substring(bm, F.floor(inb / 8).cast("int") + 1, F.lit(1))),
            16,
            10,
        ).cast("int")
        mask = F.element_at(
            F.array(*[F.lit(1 << j) for j in range(8)]),
            F.pmod(inb, F.lit(8)).cast("int") + 1,
        )
        return bm.isNotNull() & (byte.bitwiseAND(mask) != 0)

    maybe_seen = F.lit(True)
    for i in range(BLOOM_K):
        maybe_seen = maybe_seen & _probe_hit(i)
    return with_bloom.select(*out_cols, maybe_seen.alias("maybe_seen"))


@query(
    "dedup_incremental_bloom",
    oracle=f"""
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value
FROM events e
WHERE e.ts >= TIMESTAMP '{INCREMENTAL_CUTOFF}'
  AND NOT EXISTS (
    SELECT 1 FROM events h
    WHERE h.ts < TIMESTAMP '{INCREMENTAL_CUTOFF}'
      AND h.user_id = e.user_id
      AND h.event_type = e.event_type
      AND h.value = e.value
  )
""",
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup with a Bloom-filter prefilter — identical
    semantics (and oracle) to :func:`dedup_incremental_new_events`, but
    the batch side never shuffles into the anti-join unless the Bloom
    filter says the key MIGHT be seen.

    This is the shape that matters at 100 TB: the seen-keys table is
    reduced to an m-bit Bloom bitmap (fixed 128 KiB broadcast here,
    m ~ 10 bits/key in production — still MBs for billions of keys,
    vs TBs for the key table itself). Each new row tests its k=5 bit
    positions against the broadcast bitmap in whole-stage codegen; rows
    failing ANY probe are DEFINITELY new (Bloom filters have no false
    negatives) and bypass the shuffle entirely. Only the candidate
    residue — true dupes plus ~1% false positives — pays the exact
    anti-join, so the expensive shuffle processes ~1% of the batch
    instead of 100%.

    Built entirely from public Spark bitmap built-ins: the bitmap is
    `bitmap_construct_agg` over per-bucket bit positions (4096-byte
    buckets, verified layout: bit p sets byte p/8+1, bit p%8 LSB-first),
    and the probe reads the byte back with
    `conv(hex(substring(bm, byte, 1)), 16, 10) & (1 << bit)` — all
    codegen, no UDF. Correctness does not depend on Bloom parameters
    (any fp rate only shrinks the bypass set); the oracle is the exact
    anti-join, and tests/test_operators.py pins both the parity with
    the plain anti-join and that the prefilter actually bypasses rows.
    """
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(INCREMENTAL_CUTOFF).cast("timestamp")
    hist_keys = ev.filter(F.col("ts") < cutoff).select(*BUSINESS_KEY).distinct()

    new_events = ev.filter(F.col("ts") >= cutoff).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    flagged = bloom_prefilter(hist_keys, new_events, BUSINESS_KEY)

    definitely_new = flagged.filter(~F.col("maybe_seen"))
    verified_new = flagged.filter(F.col("maybe_seen")).join(
        hist_keys, BUSINESS_KEY, "left_anti"
    )
    return (
        definitely_new.unionByName(verified_new)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "dedup_text_exact",
    oracle="""
SELECT doc_id, text, lang, source, n_chars
FROM (
  SELECT doc_id, text, lang, source, n_chars,
         row_number() OVER (PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn
  FROM documents
) t
WHERE rn = 1
""",
)
def dedup_text_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 (exact half): collapse documents with identical normalized
    text, keeping the lowest doc_id.

    Scale-shaped plan: the shuffle carries (md5(norm_text), doc_id) —
    ~40 bytes/row — NOT the document bodies; the winner set (one
    doc_id per distinct text) is broadcast back against the full table.
    A window over the raw text (the naive form) would shuffle every
    document byte twice; measured ~3× slower even at sf0.1. md5's
    128 bits make a winner-set collision effectively impossible, so
    semantics match the oracle's text-equality exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm_hash = F.md5(F.lower(F.trim(F.col("text"))))
    winners = (
        docs.select(norm_hash.alias("nh"), "doc_id")
        .groupBy("nh")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(F.broadcast(winners), "doc_id", "left_semi").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
