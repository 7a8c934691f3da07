"""Multi-dimensional data layout: Z-order (Morton) clustering.

A 100 TB table answered by 2-D box predicates (user × value, tenant ×
time, lat × lon) prunes poorly under any single-column sort: files are
tight on the sort key and span the full range of every other column.
Interleaving the bits of the two key columns (the public Morton/Z-order
curve — the same layout `OPTIMIZE ZORDER BY` computes in Delta/Iceberg
engines) makes every file a small rectangle in BOTH dimensions, so
parquet footer min/max stats skip most files for a box query on either
or both keys.

Everything is JVM-side codegen arithmetic: quantize each key to 16-bit
rank space, spread the bits with the standard mask-shift sequence
(4 shift+or+mask steps per dimension — the classic bit-twiddling
interleave, not a 32-term loop), OR them together, then
``repartitionByRange`` + sort on the interleaved key. No UDFs anywhere.

The pruning benefit is pinned in tests/test_layout.py by reading the
parquet footers of a z-ordered vs a single-key-sorted staging of the
same rows and counting the files a 2-D box could skip.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fingerprint_dir, load_table, mark_ready
from ..registry import query

ZORDER_BITS = 16  # per-dimension rank resolution (32-bit interleaved key)
ZORDER_FILES = 32  # staged layout width (range partitions = files)


def _spread_bits(col: Column) -> Column:
    """Spread a 16-bit value's bits to the even positions of a 32-bit
    lane (0babcd -> 0b0a0b0c0d) with the standard mask-shift sequence —
    4 codegen ops instead of a 16-term per-bit loop."""
    x = col.cast("long")
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def quantize(col: Column, lo: Column, hi: Column, bits: int = ZORDER_BITS) -> Column:
    """Rank a value into 0..2^bits-1 over [lo, hi] (inclusive), the
    per-dimension coordinate of the Morton key. Degenerate ranges
    (hi == lo) quantize to 0."""
    n = (1 << bits) - 1
    span = (hi - lo).cast("double")
    q = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n),
            F.floor((col - lo).cast("double") / span * (n + 1)).cast("long"),
        )
    )
    return F.greatest(F.lit(0), q)


def morton_key(q1: Column, q2: Column) -> Column:
    """Interleave two 16-bit quantized coordinates: q1 on even bits,
    q2 on odd — the Z-order curve position."""
    return _spread_bits(q1).bitwiseOR(F.shiftleft(_spread_bits(q2), 1))


def write_zorder(
    df: DataFrame, path: str, out_cols: list, zkey: Column,
    files: int = ZORDER_FILES,
) -> None:
    """Write ``df[out_cols]`` clustered by the Morton key:
    range-partition on the key (each output file owns a contiguous
    z-range = a small rectangle in both source dimensions) and sort
    within partitions so row-group stats are tight too. The key column
    is dropped before writing — it is a layout device, not data. One
    shuffle, fully distributed."""
    (
        df.withColumn("_z", zkey)
        .select(*out_cols, "_z")
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def _events_bounds(ev: DataFrame) -> DataFrame:
    """One-row bounds frame for the (user_id, value) plane."""
    return ev.agg(
        F.min("user_id").alias("umin"), F.max("user_id").alias("umax"),
        F.min("value").alias("vmin"), F.max("value").alias("vmax"),
    )


def stage_zorder_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table z-ordered on (user_id, value) under a
    fixture-fingerprinted dir; idempotent per fixture."""
    src = os.path.join(sf_dir, "events.parquet")
    root, ready = fingerprint_dir("zorder_events", src)
    if ready:
        return root
    ev = load_table(spark, sf_dir, "events")
    b = F.broadcast(_events_bounds(ev))
    with_key = ev.crossJoin(b)
    zkey = morton_key(
        quantize(F.col("user_id"), F.col("umin"), F.col("umax")),
        quantize(F.col("value"), F.col("vmin"), F.col("vmax")),
    )
    write_zorder(with_key, root, ev.columns, zkey)
    mark_ready(root)
    return root


@query(
    "zorder_box_query",
    oracle="""
WITH b AS (
  SELECT min(user_id) AS umin, max(user_id) AS umax,
         min(value) AS vmin, max(value) AS vmax
  FROM events
)
SELECT e.event_id, e.user_id, e.value
FROM events e, b
WHERE e.user_id >= b.umin + 0.40 * (b.umax - b.umin)
  AND e.user_id <= b.umin + 0.60 * (b.umax - b.umin)
  AND e.value   >= b.vmin + 0.40 * (b.vmax - b.vmin)
  AND e.value   <= b.vmin + 0.60 * (b.vmax - b.vmin)
""",
)
def zorder_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D box query served from the Z-ORDERED staging of events: the
    middle 20% of the user_id range × the middle 20% of the value
    range. The oracle runs the same box over the original table —
    layout must preserve content exactly — while the Spark side reads
    the Morton-clustered files, where BOTH predicates reach the
    parquet scan and footer min/max stats skip the files whose
    z-rectangle misses the box (pruning fraction pinned in
    tests/test_layout.py; a single-key sort prunes only its own
    dimension).

    Bounds arithmetic is one subtract + one multiply per side —
    IEEE-identical across engines (no rounding policy needed)."""
    root = stage_zorder_events(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    # One-row bounds collect (the serving-path pattern of the store
    # verbs): the box edges must be plan-time LITERALS for the
    # predicates to reach the parquet scan — a crossJoin-derived
    # comparison cannot push down, and un-pushed predicates skip
    # nothing. Arithmetic below mirrors the oracle's expression order
    # exactly (one subtract, one multiply, one add per edge — IEEE
    # doubles are identical across Python, JVM, and DuckDB for the
    # same operation order).
    import math

    b = _events_bounds(ev).collect()[0]
    # Integer column: snap the double edges to the equivalent integer
    # bounds (u >= 59.6 <=> u >= 60 for integers) — a DOUBLE literal
    # against a BIGINT column plans as cast(user_id AS double) >= x,
    # which parquet cannot push; the snapped LONG literals push.
    u_lo = math.ceil(b.umin + 0.40 * (b.umax - b.umin))
    u_hi = math.floor(b.umin + 0.60 * (b.umax - b.umin))
    v_lo = b.vmin + 0.40 * (b.vmax - b.vmin)
    v_hi = b.vmin + 0.60 * (b.vmax - b.vmin)
    z = spark.read.parquet(root)
    return z.filter(
        (F.col("user_id") >= u_lo) & (F.col("user_id") <= u_hi)
        & (F.col("value") >= v_lo) & (F.col("value") <= v_hi)
    ).select("event_id", "user_id", "value")


# ---------------------------------------------------------------------------
# Incrementally-maintained z-order: z-prefix partition dirs.
# ---------------------------------------------------------------------------

ZORDER_PREFIX_BITS = 5  # 2^5 = 32 z-range partition directories
_BOUNDS_FILE = "_ZORDER_BOUNDS.json"


def _zb(zkey: Column) -> Column:
    """Partition id = the Morton key's top prefix bits: each partition
    dir owns one contiguous z-range (a rectangle block in the 2-D key
    plane) — the unit of incremental rewrite."""
    return F.shiftright(zkey, 2 * ZORDER_BITS - ZORDER_PREFIX_BITS)


def _zkey_from_bounds(bounds: dict, c1: str, c2: str) -> Column:
    return morton_key(
        quantize(F.col(c1), F.lit(bounds["lo1"]), F.lit(bounds["hi1"])),
        quantize(F.col(c2), F.lit(bounds["lo2"]), F.lit(bounds["hi2"])),
    )


def stage_zorder_partitioned(
    df: DataFrame, root: str, c1: str, c2: str
) -> dict:
    """Initial build of the MAINTAINABLE z-order layout: quantization
    bounds are computed once, persisted next to the data, and reused by
    every later merge — z-cell assignment must stay stable or old and
    new rows of the same rectangle land in different partitions.
    Out-of-bounds future values clamp into the edge cells (quantize
    clamps), which degrades their locality but never their
    correctness. Layout: dirs ``zb=<prefix>`` (one contiguous z-range
    each), rows sorted by the full Morton key within files."""
    import json

    lo1, hi1, lo2, hi2 = df.agg(
        F.min(c1), F.max(c1), F.min(c2), F.max(c2)
    ).collect()[0]
    bounds = {"lo1": lo1, "hi1": hi1, "lo2": lo2, "hi2": hi2}
    zkey = _zkey_from_bounds(bounds, c1, c2)
    (
        df.withColumn("_z", zkey)
        .withColumn("zb", _zb(F.col("_z")))
        .repartition("zb")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .partitionBy("zb")
        .parquet(root)
    )
    with open(os.path.join(root, _BOUNDS_FILE), "w") as fh:
        json.dump(bounds, fh)
    return bounds


def merge_into_zorder(
    spark: SparkSession, root: str, batch: DataFrame, c1: str, c2: str
) -> list[int]:
    """Incremental z-order maintenance — the OPTIMIZE-ZORDER analog for
    a live table: a new batch is merged by rewriting ONLY the z-range
    partitions its rows land in (same partial-rewrite contract as
    merge_batch_into_state / delete_keys_from_state; untouched z-ranges
    keep their exact files, pinned in tests). Per merge: compute the
    batch's Morton keys under the PERSISTED bounds, collect the touched
    prefix set (bounded by 2^ZORDER_PREFIX_BITS), read those partitions,
    union, re-sort, dynamic-overwrite. Cost is O(touched z-ranges), not
    table size; a clustered batch (e.g. one tenant's backfill) touches
    few ranges. localCheckpoint materializes the union before the write
    (self-overwrite hazard). Returns the rewritten prefix ids."""
    import json

    with open(os.path.join(root, _BOUNDS_FILE)) as fh:
        bounds = json.load(fh)
    zkey = _zkey_from_bounds(bounds, c1, c2)
    tagged = batch.withColumn("_z", zkey).withColumn("zb", _zb(F.col("_z")))
    touched = sorted(r.zb for r in tagged.select("zb").distinct().collect())
    existing_paths = [
        p
        for b in touched
        if os.path.exists(p := os.path.join(root, f"zb={b}"))
    ]
    cols = batch.columns
    merged = tagged
    if existing_paths:
        old = spark.read.parquet(*existing_paths).select(*cols)
        merged = tagged.select(*cols, "_z", "zb").unionByName(
            old.withColumn("_z", zkey).withColumn("zb", _zb(F.col("_z")))
        )
    merged = (
        merged.repartition("zb")
        .sortWithinPartitions("_z")
        .drop("_z")
        .localCheckpoint(eager=True)
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("zb")
        .parquet(root)
    )
    return touched
