"""ORC source/sink: the second columnar format large estates actually
hold (Hive-era lakes are ORC; parquet-only engines force a conversion
pass before any query). Spark's ORC support is native and feature-parity
with parquet — predicate pushdown, column pruning, vectorized scan —
so this wrapper only pins the house conventions. No reference
counterpart (`/root/reference/src/dve` reads csv/xml/json/parquet);
extension of SURVEY §2.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(
    spark: SparkSession,
    path: str,
    *,
    merge_schema: bool = False,
) -> DataFrame:
    """Native ORC scan. ``merge_schema`` reconciles files whose schemas
    evolved (costs a footer read per file at planning time — leave off
    unless the dataset actually evolved)."""
    return (
        spark.read.option("mergeSchema", str(merge_schema).lower())
        .orc(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "error",
    partition_by: tuple[str, ...] = (),
    compression: str = "zstd",
) -> None:
    """Write ORC with zstd (the modern default: parquet-comparable ratio,
    decode speed well above zlib). ``partition_by`` lays out hive-style
    directories so downstream reads partition-prune."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
