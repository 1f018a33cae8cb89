"""Parquet source + refdata loading (dve spark/reference_data.py:32-38)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_refdata_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
