"""Source operators (SURVEY.md §2.1).

Kafka Streams anchors [R — reference checkout empty, public API cited]:
  S1 topic source  → o.a.k.streams.StreamsBuilder#stream
  S2 table source  → o.a.k.streams.StreamsBuilder#table (changelog →
                     latest value per key)

Spark mapping: a parquet scan IS the topic replay for batch semantics;
``StreamsBuilder.table`` is latest-by-key, expressed as a window-rank so
the result is deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@query(
    "scan_events",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: full scan of the stream table. Column pruning/pushdown is
    Catalyst's job; the scan itself reads all columns by declaration."""
    return load_table(spark, sf_dir, "events").select(*EVENT_COLS)


@query(
    "latest_by_key",
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
def latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: KTable semantics — latest record per key (changelog compaction).

    Deterministic tiebreak on event_id, folded with a max_by(struct)
    HASH aggregate rather than a row_number window: same winner (struct
    ordering is lexicographic on (ts, event_id)), but the aggregate
    partial-combines map-side and never sorts a key's rows — at 100 TB
    this is one shuffle of one row per key per map task, not a per-key
    sort. With date-partitioned input you'd pre-filter to the latest
    partition range first. (Same swap as sinks._latest_per_key; the
    oracle keeps the window formulation, which is the equivalence
    check.)
    """
    ev = load_table(spark, sf_dir, "events")
    payload = ["event_id", "ts", "event_type", "value"]
    winner = F.max_by(F.struct(*payload), F.struct("ts", "event_id")).alias("__w")
    return (
        ev.groupBy("user_id")
        .agg(winner)
        .select("user_id", *[F.col(f"__w.{c}").alias(c) for c in payload])
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@query(
    "latest_by_key_tombstoned",
    oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1 AND value IS NOT NULL
""",
)
def latest_by_key_tombstoned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 with DELETE semantics — the half of KTable compaction that
    plain latest-per-key misses: a changelog record with a NULL value is
    a tombstone [R o.a.k.streams.kstream.KTable: "records with null
    value are treated as deletes"], so a key whose LATEST record is a
    tombstone is absent from the materialized table, while a key that
    was deleted and later re-inserted resurfaces with the newer value.

    The fixture carries no physical nulls, so the changelog is derived
    identically on both engines: 'error' events emit a tombstone for
    their user (the GDPR-style "erase this key" shape). Semantics are
    pinned on a hand fixture in tests/test_operators.py
    (delete-then-reinsert resurfaces, delete-last disappears).

    Scale shape: identical to latest_by_key — ONE hash shuffle on the
    key; the tombstone filter is applied AFTER the per-key winner is
    chosen (filtering tombstones first would wrongly resurrect older
    non-tombstone records), and costs nothing extra: it rides the same
    window pass.
    """
    ev = load_table(spark, sf_dir, "events")
    changelog = ev.withColumn(
        "value",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        changelog.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "event_type", "value")
    )
