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
directory, refreshed by a crash-safe three-step swap
(rename target->backup, rename staging->target, delete backup) with
bootstrap recovery from any leftover backup — a crash at ANY point
leaves either the old or the new table recoverable, never an empty
table silently treated as first-batch state. The swap is still not
atomic for CONCURRENT readers (a reader racing the renames can see a
missing directory for an instant); that reader-side transactionality is
precisely what table formats add — with Delta/Iceberg on the cluster,
replace ``_swap_dirs`` with the format's MERGE/commit. Exactly-once
across restarts holds at micro-batch granularity: Spark replays an
unacknowledged batch, and re-applying the same change set is idempotent
(upserts rewrite the same values; with ``sequence_col`` the
newer-sequence guard additionally no-ops stale replays).

Cross-batch ordering: with ``sequence_col`` the maintained table
PERSISTS each row's sequence and a change applies only when its
sequence is >= the stored one — so a file source splitting a ledger
into arbitrarily ordered micro-batches (``availableNow`` does this)
still converges to the same state as one batch ``apply_changes`` over
the whole ledger (given each key's sequences are distinct — exact
cross-batch sequence TIES resolve by arrival order, whereas a single
batch tiebreaks on the remaining columns). Deletes keep their ordering
power through a TOMBSTONE sidecar (``<table>__tombstones``, one
(key, sequence) row per deleted key): a stale change for a deleted key
loses to the tombstone instead of silently re-inserting; a genuinely
newer upsert clears it. Tombstones accumulate one row per deleted key —
at scale, prune them on an out-of-orderness horizon the way table
formats expire their delete files. Table and sidecar swap separately;
a crash between the two swaps is healed by Spark's replay of the
unacknowledged batch (both applications are idempotent).
Without ``sequence_col`` the caller contracts that each key's changes
arrive in order (and at most once per batch) — the batch operator's
duplicate-key guard fails loudly otherwise.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from data_validation_engine_spark.merge import apply_changes, latest_per_key

__all__ = ["streaming_apply_changes"]


def _hpath(spark: SparkSession, p: str):
    return spark._jvm.org.apache.hadoop.fs.Path(p)  # noqa: SLF001


def _fs(spark: SparkSession, p: str):
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    return _hpath(spark, p).getFileSystem(conf)


def _swap_dirs(spark: SparkSession, staging: str, target: str) -> None:
    """Crash-safe directory swap: target->backup, staging->target,
    drop backup. Interrupted at any step, :func:`_recover` restores a
    consistent table on the next batch (or next query start)."""
    fs = _fs(spark, target)
    dst = _hpath(spark, target)
    src = _hpath(spark, staging)
    bak = _hpath(spark, target + "__backup")
    if fs.exists(bak):
        # leftover from a crash after a completed swap
        fs.delete(bak, True)
    if fs.exists(dst) and not fs.rename(dst, bak):
        raise IOError(f"rename {target} -> backup failed")
    if not fs.rename(src, dst):
        raise IOError(f"rename {staging} -> {target} failed")
    if fs.exists(bak):
        fs.delete(bak, True)


def _recover(spark: SparkSession, target: str) -> None:
    """Bootstrap recovery: if a previous swap crashed between moving the
    live table to backup and moving staging in, the backup IS the table —
    restore it. A backup alongside a live table is post-swap debris."""
    fs = _fs(spark, target)
    dst = _hpath(spark, target)
    bak = _hpath(spark, target + "__backup")
    if fs.exists(bak):
        if fs.exists(dst):
            fs.delete(bak, True)
        elif not fs.rename(bak, dst):
            raise IOError(f"restore backup -> {target} failed")


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
    the change schema minus the op column; with ``sequence_col`` the
    sequence is kept as a table column — the cross-batch ordering
    state).

    Per micro-batch: recover any interrupted swap, read the current
    table (an explicit existence check decides first-batch bootstrap —
    a read error on an EXISTING table propagates and fails the query
    rather than silently restarting from empty), run the batch
    ``apply_changes`` (with the stored-sequence guard when
    ``sequence_col`` is set), materialise the result to a staging
    directory, swap it in crash-safely.

    Scale shape: each batch costs one :func:`merge_upsert`-shaped plan
    (base never shuffles under a broadcast-able change batch — the
    normal CDC case) plus a rewrite of the table. The stored-sequence
    guard adds one key-pruned base scan probing the broadcast batch
    keys — bounded by the batch size, no base shuffle. The rewrite is
    the parquet-directory price of MERGE; with a transactional table
    format it becomes a file-level commit. Keep batches coarse (trigger
    intervals, not per-record) so the rewrite amortises.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not changes.isStreaming:
        raise ValueError(
            "streaming_apply_changes needs a streaming changes frame; "
            "use merge.apply_changes directly for batch ledgers"
        )
    staging = table_path.rstrip("/") + "__staging"
    tomb_path = table_path.rstrip("/") + "__tombstones"
    tomb_staging = tomb_path + "__staging"

    def _read_or_empty(spark, path: str, fields) -> DataFrame:
        from pyspark.sql.types import StructType

        # explicit existence check: a read error on an EXISTING table
        # must propagate and fail the query, never silently bootstrap
        if _fs(spark, path).exists(_hpath(spark, path)):
            return spark.read.parquet(path)
        return spark.createDataFrame([], StructType(list(fields)))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession

        _recover(spark, table_path)
        target_fields = [
            f for f in batch.schema.fields if f.name != op_col
        ]
        base = _read_or_empty(spark, table_path, target_fields)
        if sequence_col is None:
            merged = apply_changes(base, batch, keys, op_col=op_col)
            merged.write.mode("overwrite").parquet(staging)
            _swap_dirs(spark, staging, table_path)
            return
        # collapse this batch to latest-per-key, then keep only the
        # changes at-or-above the stored sequence — stale cross-batch
        # arrivals no-op instead of clobbering newer state. "Stored"
        # covers live rows AND tombstones, so a delete's ordering power
        # survives the row it removed. The stored-key scan is key-pruned
        # and probes the broadcast batch keys, so the base never
        # shuffles.
        _recover(spark, tomb_path)
        key_fields = [f for f in target_fields if f.name in keys]
        seq_field = [f for f in batch.schema.fields
                     if f.name == sequence_col]
        tombs = _read_or_empty(
            spark, tomb_path, key_fields + seq_field
        )
        inc = latest_per_key(batch, keys, sequence_col)
        batch_keys = F.broadcast(inc.select(*keys).distinct())
        stored = (
            base.select(*keys, F.col(sequence_col).alias("__stored"))
            .join(batch_keys, keys, "left_semi")
            .unionByName(
                tombs.select(
                    *keys, F.col(sequence_col).alias("__stored")
                ).join(batch_keys, keys, "left_semi")
            )
            .groupBy(*keys)
            .agg(F.max("__stored").alias("__stored"))
        )
        live = (
            inc.join(F.broadcast(stored), keys, "left")
            .where(
                F.col("__stored").isNull()
                | (F.col(sequence_col) >= F.col("__stored"))
            )
            .drop("__stored")
        )
        merged = apply_changes(base, live, keys, op_col=op_col)
        # tombstone maintenance: any surviving change replaces the key's
        # tombstone entry — deletes write a fresh one, upserts clear it
        live_deletes = live.where(F.col(op_col) == "D").select(
            *keys, F.col(sequence_col)
        )
        new_tombs = tombs.join(
            F.broadcast(live.select(*keys).distinct()), keys, "left_anti"
        ).unionByName(live_deletes)
        merged.write.mode("overwrite").parquet(staging)
        new_tombs.write.mode("overwrite").parquet(tomb_staging)
        _swap_dirs(spark, staging, table_path)
        _swap_dirs(spark, tomb_staging, tomb_path)

    writer = changes.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
