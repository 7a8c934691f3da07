"""Fixture table catalog.

Loads the driver's parquet fixtures (TESTDATA.md) as DataFrames with
normalized types. The one normalization that matters: ``events.ts`` is
INT64 TIMESTAMP(NANOS) in parquet. Spark cannot read that type natively
(PARQUET_TYPE_ILLEGAL); with ``spark.sql.legacy.parquet.nanosAsLong`` we
read raw nanos and truncate to microseconds — byte-identical to what
DuckDB 1.0's reader produces for the same file, so oracle comparisons
hold exactly (SURVEY.md §5.3).

Kafka Streams mapping (SURVEY.md §2.1): ``load_table`` is the analog of
``StreamsBuilder.stream(topic)`` [R o.a.k.streams.StreamsBuilder#stream]
for batch; `streaming.read_events_stream` is the streaming analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Parquet schema inference runs a footer-sampling Spark job per
# spark.read.parquet call. Fixture schemas are immutable within a
# session, so cache them: repeat loads (the driver re-reads every table
# per query) become pure metadata ops, and plan construction stays
# job-free — pinned by tests/test_plans.py.
_SCHEMA_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with normalized types."""
    tune(spark)
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), path)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos → µs truncation. MUST use integer division (`div`):
            # a double round-trip on epoch-nanos (~1.7e18 > 2^53)
            # silently corrupts the low-order digits.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # µs parquet written with isAdjustedToUTC=false (e.g. by
            # DuckDB) infers as NTZ; normalize so downstream
            # unix_micros()/watermarks see one type. Session tz is
            # pinned UTC (tune), so the wall-clock is preserved.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every table as a temp view (SQL entry point, SURVEY §3.3)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t + suffix)
