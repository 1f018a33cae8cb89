"""Entity parquet sink (dve engine.py:194-226, spark/backend.py:73-91).

Per entity: drop the internal record index, write
``mode("overwrite").parquet``. At scale, callers can pass partition
columns per entity — a 100 TB entity should land partitioned by its
natural pruning key, not as one flat directory.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame

from data_validation_engine_spark.messages import RECORD_INDEX


def write_entities(
    entities: Mapping[str, DataFrame],
    base_uri: str,
    *,
    partition_by: Mapping[str, list[str]] | None = None,
    keep_record_index: bool = False,
) -> dict[str, str]:
    """Write each entity to ``<base_uri>/<name>``; returns name -> uri."""
    written: dict[str, str] = {}
    for name, df in entities.items():
        out = df
        if not keep_record_index and RECORD_INDEX in df.columns:
            out = df.drop(RECORD_INDEX)
        uri = f"{base_uri.rstrip('/')}/{name}"
        writer = out.write.mode("overwrite")
        cols = (partition_by or {}).get(name)
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(uri)
        written[name] = uri
    return written


def overwrite_partitions(
    df: DataFrame,
    uri: str,
    partition_cols: list[str],
) -> str:
    """Idempotent incremental write: overwrite ONLY the partitions the
    batch touches, leaving every other partition untouched — the
    re-runnable daily-load pattern for a partitioned 100 TB table
    (static overwrite would wipe the whole table; append would
    duplicate rows on retry).

    Uses Spark's dynamic partition-overwrite mode, set per-write via
    the ``partitionOverwriteMode`` DataFrameWriter option (scoped to
    this write — the session config is not mutated). Replaying the
    same batch after a failure converges to the same table state, the
    same idempotence contract as the CDC swap (`streaming/cdc.py`).
    """
    if not partition_cols:
        raise ValueError(
            "overwrite_partitions needs at least one partition column; "
            "use write_entities for whole-table overwrite"
        )
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(uri)
    )
    return uri
