"""Sinks: entity parquet, error JSONL, error report, audit tables."""

from data_validation_engine_spark.sinks.entities import write_entities
from data_validation_engine_spark.sinks.errors import write_messages_jsonl
from data_validation_engine_spark.sinks.report import write_error_report

__all__ = ["write_entities", "write_error_report", "write_messages_jsonl"]
