"""JSON source: native scan, explicit schema (dve spark/readers/json.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    multi_line: bool = True,
    encoding: str = "UTF-8",
) -> DataFrame:
    """Read JSON with a declared (usually stringified) schema — no inference."""
    return (
        spark.read.schema(schema)
        .option("multiLine", str(multi_line).lower())
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .json(path)
    )
