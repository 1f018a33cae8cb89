"""Streaming CDC apply: maintain a materialized parquet table from a
change stream.

``foreachBatch`` is the canonical Structured Streaming pattern for sinks
that need full-batch semantics (merges, upserts, transactional writes):
each micro-batch arrives as an ordinary DataFrame and the batch
:func:`data_validation_engine_spark.merge.apply_changes` operator runs
against the current table state. This composes the engine's incremental
vocabulary with its streaming lift — the same declared semantics, now
continuously maintained.

Durability model (stated, not hidden): the table is a plain parquet
directory, refreshed by write-staging-then-swap. The swap (delete +
rename) is not atomic for concurrent readers — a reader racing the swap
can see a missing directory. That transactionality is precisely what
table formats (Delta/Iceberg) add; on a cluster with one of those
available, replace ``_swap_dirs`` with the format's MERGE. Exactly-once
across restarts holds at micro-batch granularity: Spark replays an
unacknowledged batch, and re-applying the same change set to the same
keys is idempotent for upserts/deletes (apply_changes collapses to
latest-per-key first).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from data_validation_engine_spark.merge import apply_changes

__all__ = ["streaming_apply_changes"]


def _swap_dirs(spark: SparkSession, staging: str, target: str) -> None:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(target)
    src = jvm.org.apache.hadoop.fs.Path(staging)
    fs = dst.getFileSystem(conf)
    if fs.exists(dst):
        fs.delete(dst, True)
    if not fs.rename(src, dst):
        raise IOError(f"rename {staging} -> {target} failed")


def streaming_apply_changes(
    changes: DataFrame,
    table_path: str,
    keys: list[str] | str,
    *,
    op_col: str = "op",
    sequence_col: Optional[str] = None,
    checkpoint: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Start a query that applies a CDC change stream to the parquet
    table at ``table_path`` (created on the first batch if absent, with
    the change schema minus the op/sequence columns).

    Per micro-batch: read the current table, run the batch
    ``apply_changes`` (collapse to latest change per key by
    ``sequence_col``, upsert I/U, delete D), materialise the result to a
    staging directory, swap it in. The merged output is FULLY WRITTEN
    before the current table is touched — overwriting a directory while
    a job is still scanning it corrupts the scan, so the staging hop is
    correctness, not style.

    Scale shape: each batch costs one :func:`merge_upsert`-shaped plan
    (base never shuffles under a broadcast-able change batch — the
    normal CDC case) plus a rewrite of the table. The rewrite is the
    parquet-directory price of MERGE; with a transactional table format
    it becomes a file-level commit. Keep batches coarse (trigger
    intervals, not per-record) so the rewrite amortises.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not changes.isStreaming:
        raise ValueError(
            "streaming_apply_changes needs a streaming changes frame; "
            "use merge.apply_changes directly for batch ledgers"
        )
    drop_cols = [op_col] + ([sequence_col] if sequence_col else [])
    staging = table_path.rstrip("/") + "__staging"

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        target_fields = [
            f for f in batch.schema.fields if f.name not in drop_cols
        ]
        from pyspark.errors import AnalysisException
        from pyspark.sql.types import StructType

        try:
            base = spark.read.parquet(table_path)
        except AnalysisException:
            # first batch: the table does not exist yet. Anything else
            # (corruption, permissions) must propagate and fail the
            # query, not silently restart the table from empty.
            base = spark.createDataFrame([], StructType(target_fields))
        merged = apply_changes(
            base,
            batch,
            keys,
            op_col=op_col,
            sequence_col=sequence_col,
        )
        merged.write.mode("overwrite").parquet(staging)
        _swap_dirs(spark, staging, table_path)

    writer = changes.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
