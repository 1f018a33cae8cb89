"""Parquet source + refdata loading (dve spark/reference_data.py:32-38)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_parquet_nanos_safe(
    spark: SparkSession,
    path: str,
    *,
    nanos_timestamp_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Read parquet that may contain TIMESTAMP(NANOS) columns.

    Spark has no nanosecond timestamp type and rejects such files outright
    (PARQUET_TYPE_ILLEGAL). This reads them as nano-precision longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and converts the named
    columns to microsecond timestamps — precision loss below 1µs only.

    Dtype-aware: a named column that already loads as a timestamp (the file
    stores µs/ms precision, so ``nanosAsLong`` was a no-op) passes through
    unchanged — the same call works on mixed-precision datasets.
    """
    from pyspark.sql.types import LongType

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    for c in nanos_timestamp_cols:
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(
                c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
            )
    return df


def load_refdata_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
