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
