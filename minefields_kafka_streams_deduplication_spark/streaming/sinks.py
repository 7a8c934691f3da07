"""Streaming sinks beyond the built-ins (SURVEY.md §2.1 S4 streaming
half) — `foreachBatch` is Spark's escape hatch for sinks that need
merge/upsert semantics instead of append [R KStream#to writes through
the producer; idempotence there comes from EOS transactions — here it
comes from deterministic partition overwrite keyed by batch content].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def start_partitioned_upsert(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str = "event_date",
):
    """availableNow stream into a date-partitioned parquet layout via
    foreachBatch + dynamic partition overwrite.

    Idempotent under batch replay: a re-run batch rewrites exactly the
    partitions it owns (dynamic overwrite), so at-least-once delivery
    from the checkpoint becomes effectively exactly-once at the layout
    level — the standard lakehouse-less upsert pattern.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn(partition_col, F.col("ts").cast("date"))
                .write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
