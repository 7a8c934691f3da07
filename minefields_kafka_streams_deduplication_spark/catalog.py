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

import os

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


def raw_schema(spark: SparkSession, sf_dir: str, name: str):
    """Footer schema of one fixture file (cached per session+path).

    Shared by the batch reader below and the file streaming source
    (`streaming.source.read_events_stream` — file streams REQUIRE an
    explicit schema), so both entry points agree on the physical layout
    however the driver generated it."""
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), path)
    cached = _SCHEMA_CACHE.get(key)
    if cached is None:
        cached = _SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return cached


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Map whichever physical `ts` the fixture carries to TIMESTAMP (µs).

    The driver has generated events.parquet with three layouts across
    rounds: INT64 TIMESTAMP(NANOS) (reads as bigint nanos under
    nanosAsLong), µs with isAdjustedToUTC=false (reads as NTZ), and
    plain UTC µs. Batch and streaming scans both route through here so
    a fixture regeneration can never skew event-time semantics on one
    path only."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # nanos → µs truncation. MUST use integer division (`div`):
        # a double round-trip on epoch-nanos (~1.7e18 > 2^53)
        # silently corrupts the low-order digits.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Session tz is pinned UTC (tune), so the wall-clock is
        # preserved by the cast.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def dec6(col) -> F.Column:
    """Cast a float column to DECIMAL(18,6) for order-independent sums.

    Float summation order differs between Spark's partial aggregates and
    DuckDB's sequential/segment-tree sums — and across fixture
    regenerations — so a per-group `round(sum(double), 4)` can straddle a
    rounding boundary on one engine and not the other (observed:
    CORRECTNESS_r02 `window_session_sql` hash mismatch with rows+schema
    green). DECIMAL addition is exact and associative, so summing the
    6-decimal cast is identical under any grouping/order; the final
    `round(...).cast("double")` keeps the published schema. No finite
    double sits exactly on a 6-decimal tie (x.xxxxxx5 has no exact binary
    representation), so Spark and DuckDB round the cast identically.

    Oracle mirror: ``round(sum(CAST(x AS DECIMAL(18,6))), s)`` then
    ``CAST(... AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


def round4f(col) -> F.Column:
    """Engine-deterministic 4-decimal rounding of a DIVISION-derived
    double: floor(x*1e4 + 0.5)/1e4.

    `round(double, 4)` is not cross-engine safe on quotients — Spark
    rounds the double's shortest decimal representation HALF_UP while
    DuckDB rounds the binary value, and a quotient can sit within 1 ulp
    of a x.xxxx5 tie (observed at sf0.1 on per-user averages and unit
    prices). floor, multiply and divide are bit-identical IEEE ops on
    both engines, so this form always agrees with the mirrored oracle
    fragment ``floor(x * 10000 + 0.5) / 10000``. Use for ratios/avgs;
    exact-decimal sums keep ``round(sum(dec6(x)), 4)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 10000 + F.lit(0.5)) / 10000.0


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with normalized types."""
    tune(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.schema(raw_schema(spark, sf_dir, name)).parquet(path)
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every table as a temp view (SQL entry point, SURVEY §3.3)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t + suffix)


def fingerprint_dir(prefix: str, src_file: str, suffix: str = "") -> tuple[str, bool]:
    """Fixture-fingerprinted staging directory under /tmp, shared by
    every materialized-state / staged-replay site (stores, upsert sink,
    ordered document staging): the path is keyed on the source file's
    identity (path + mtime + size), so a regenerated fixture gets a
    fresh dir and stale siblings of the same prefix+fixture are swept.
    Returns ``(root, is_ready)`` — ready means a previous build
    completed (``mark_ready``); bounded /tmp usage of one live dir per
    (prefix, fixture, suffix). The sweep matches the suffix too, so two
    call sites sharing a prefix but parameterized differently (e.g.
    ``stage_documents_ordered`` with different ``n_splits`` suffixes)
    never delete each other's ready dirs. Single-process assumption:
    the sweep is not locked against a concurrent builder of the SAME
    (prefix, fixture, suffix) — the driver/test harness runs one
    process per staging root at a time.
    """
    import glob as _glob
    import shutil as _shutil
    import tempfile as _tempfile

    st = os.stat(src_file)
    key = os.path.dirname(src_file).strip("/").replace("/", "_")
    root = os.path.join(
        _tempfile.gettempdir(),
        f"{prefix}_{key}_{st.st_mtime_ns}_{st.st_size}{suffix}",
    )
    if os.path.exists(os.path.join(root, "_READY")):
        return root, True
    import re as _re

    # Only sweep EXACT siblings: same prefix+fixture+suffix, different
    # mtime/size. A bare glob star would let the empty suffix match (and
    # delete) every suffixed variant's ready dir.
    sib = _re.compile(
        _re.escape(f"{prefix}_{key}_") + r"\d+_\d+" + _re.escape(suffix)
    )
    for old in _glob.glob(
        os.path.join(_tempfile.gettempdir(), f"{prefix}_{key}_*{suffix}")
    ):
        if old != root and sib.fullmatch(os.path.basename(old)):
            _shutil.rmtree(old, ignore_errors=True)
    return root, False


def mark_ready(root: str) -> None:
    """Stamp a fingerprint_dir as completely built."""
    with open(os.path.join(root, "_READY"), "w") as fh:
        fh.write("ok")
