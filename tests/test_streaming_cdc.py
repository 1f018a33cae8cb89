"""streaming_apply_changes: CDC table maintenance via foreachBatch."""

from __future__ import annotations

import json

import pytest

from data_validation_engine_spark.streaming import streaming_apply_changes


def _write_ledger(spark, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(
        rows, "op string, id int, name string, bal double, seq int"
    ).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src: str, table: str, ckpt: str) -> None:
    changes = (
        spark.readStream.schema(
            "op string, id int, name string, bal double, seq int"
        ).parquet(src)
    )
    q = streaming_apply_changes(
        changes,
        table,
        ["id"],
        sequence_col="seq",
        checkpoint=ckpt,
        available_now=True,
    )
    q.awaitTermination()


def _table(spark, path: str) -> dict:
    return {
        r.id: (r.name, r.bal)
        for r in spark.read.parquet(path).collect()
    }


def test_cdc_stream_maintains_table_across_drains(spark, tmp_path):
    src = str(tmp_path / "ledger")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # drain 1: bootstrap inserts + one update-then-delete within the batch
    _write_ledger(
        spark,
        src,
        [
            ("I", 1, "alice", 10.0, 1),
            ("I", 2, "bob", 20.0, 1),
            ("U", 2, "bobby", 21.0, 2),
            ("I", 3, "carol", 30.0, 1),
            ("D", 3, None, None, 2),
        ],
    )
    _drain(spark, src, table, ckpt)
    assert _table(spark, table) == {1: ("alice", 10.0), 2: ("bobby", 21.0)}

    # drain 2: the checkpoint must resume past batch 1's files —
    # only the NEW ledger file applies, on top of the maintained state
    _write_ledger(
        spark,
        src,
        [
            ("U", 1, "al", 11.0, 3),
            ("D", 2, None, None, 3),
            ("I", 4, "dave", 40.0, 3),
        ],
    )
    _drain(spark, src, table, ckpt)
    assert _table(spark, table) == {1: ("al", 11.0), 4: ("dave", 40.0)}

    # parity: one batch apply_changes over the FULL ledger ends in the
    # same table (same semantics, maintained incrementally vs replayed)
    from pyspark.sql.types import StructType

    from data_validation_engine_spark.merge import apply_changes

    full = spark.read.parquet(src)
    empty = spark.createDataFrame(
        [], StructType([f for f in full.schema.fields if f.name not in ("op", "seq")])
    )
    replayed = {
        r.id: (r.name, r.bal)
        for r in apply_changes(
            empty, full, ["id"], sequence_col="seq"
        ).collect()
    }
    assert replayed == _table(spark, table)


def test_rejects_batch_frame(spark):
    df = spark.createDataFrame([("I", 1)], "op string, id int")
    with pytest.raises(ValueError, match="streaming changes frame"):
        streaming_apply_changes(
            df, "/tmp/x", ["id"], checkpoint="/tmp/c"
        )
