"""Multi-format readers — the serde surface (SURVEY.md §1.1 Serdes row).

The reference's serdes (String/JSON/Avro byte codecs) map to Spark's
format readers + explicit schemas. Parquet is the fixture format;
csv/json are provided for parity with common ingest paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..session import tune

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Schema-explicit reader. Always pass a schema for csv/json in
    production — schema inference is an extra full scan at 100 TB."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format: {fmt}; one of {SUPPORTED_FORMATS}")
    tune(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
