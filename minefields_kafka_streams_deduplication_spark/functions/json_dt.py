"""JSON + date/time scalar functions (SURVEY.md §2.8 F2/F4).

The reference's serde layer [R Serdes + JSON POJO mapping] is the
closest analog: parsing a JSON value payload into typed fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "json_extract_props",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
""",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: JSON field extraction — `get_json_object` runs JVM-side (no
    Python). For repeated multi-field access prefer one `from_json` into
    a struct (single parse) — shown in `json_parse_struct`."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "json_parse_struct",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod
FROM events
""",
)
def json_parse_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4b: schema-on-read JSON parse — one `from_json` per row, typed
    struct access afterwards (the scalable pattern for wide JSON)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_mod"),
    )


@query(
    "events_by_weekday",
    oracle="""
SELECT dayname(ts) AS weekday,
       count(*) AS cnt,
       round(avg(value), 4) AS avg_value
FROM events
GROUP BY 1
""",
)
def events_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: date-part extraction. Weekday emitted as its NAME — Spark's
    dayofweek() is 1=Sunday while DuckDB's is 0=Sunday, so names are the
    only portable encoding (SURVEY.md §5.3 family of hazards)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "EEEE").alias("weekday"))
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 4).alias("avg_value"))
    )
