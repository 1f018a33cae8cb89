"""Versioned parquet tables (sinks/versioned.py)."""

from __future__ import annotations

import pytest

from data_validation_engine_spark.sinks.versioned import (
    list_versions,
    read_table,
    vacuum,
    write_version,
)


def _df(spark, n, tag):
    return spark.range(n).selectExpr("id", f"'{tag}' AS tag")


def test_write_read_publish_cycle(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = write_version(_df(spark, 3, "a"), t)
    assert v1 == 1
    assert read_table(spark, t).count() == 3
    v2 = write_version(_df(spark, 5, "b"), t)
    assert v2 == 2
    out = read_table(spark, t)
    assert out.count() == 5
    assert out.first()["tag"] == "b"
    assert list_versions(spark, t) == [1, 2]


def test_time_travel_and_missing_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_df(spark, 3, "a"), t)
    write_version(_df(spark, 5, "b"), t)
    assert read_table(spark, t, version=1).count() == 3
    with pytest.raises(FileNotFoundError, match="not on disk"):
        read_table(spark, t, version=9)


def test_unpublished_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no published version"):
        read_table(spark, str(tmp_path / "nope"))


def test_crash_between_write_and_publish_is_invisible(spark, tmp_path):
    """Simulate a writer dying after the version dir commit but before
    the pointer move: readers stay on the old version; the next writer
    skips past the orphan number."""
    t = str(tmp_path / "tbl")
    write_version(_df(spark, 3, "a"), t)
    # orphan staging: a full v2 directory with no pointer update
    _df(spark, 99, "crash").write.parquet(f"{t}/v{2:08d}")
    assert read_table(spark, t).count() == 3  # reader unaffected
    v3 = write_version(_df(spark, 7, "c"), t)
    assert v3 == 3  # orphan number not reused
    assert read_table(spark, t).count() == 7


def test_vacuum_keeps_published_and_staging(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i, tag in enumerate(["a", "b", "c", "d"]):
        write_version(_df(spark, i + 1, tag), t)
    removed = vacuum(spark, t, keep_last=2)
    assert removed == [1, 2]
    assert list_versions(spark, t) == [3, 4]
    assert read_table(spark, t).count() == 4
    with pytest.raises(ValueError, match="keep_last"):
        vacuum(spark, t, keep_last=0)


def test_partitioned_write_prunes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id", "id % 4 AS part")
    write_version(df, t, partition_by=("part",))
    back = read_table(spark, t)
    assert back.count() == 100
    plan = (
        back.where("part = 2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "part" in plan
