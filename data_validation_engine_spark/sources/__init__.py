"""File sources: native Spark scans with the reference readers' semantics."""

from data_validation_engine_spark.sources.csv import read_csv
from data_validation_engine_spark.sources.json import read_json
from data_validation_engine_spark.sources.parquet import (
    read_parquet,
    read_parquet_nanos_safe,
)
from data_validation_engine_spark.sources.xml import read_xml

__all__ = [
    "read_csv",
    "read_json",
    "read_parquet",
    "read_parquet_nanos_safe",
    "read_xml",
]
