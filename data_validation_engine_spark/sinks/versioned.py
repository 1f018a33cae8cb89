"""Versioned parquet tables: reader-atomic snapshots without a table
format.

The CDC maintenance sink (`streaming/cdc.py`) documents its honest gap:
a directory SWAP is crash-safe for the writer but a reader that lists
the directory mid-swap can see a torn table — full reader-side
atomicity is what Delta/Iceberg sell. This module closes most of that
gap with the classic version-pointer layout (the same idea as Iceberg's
metadata pointer, public design):

    table/
      v00000001/  (immutable, fully written before publish)
      v00000002/
      _LATEST     (one line: the current version number)

Writers stage the ENTIRE new version directory, then publish it by
rewriting the one-line pointer — readers resolve the pointer first and
then read an immutable directory, so they see the old version or the
new one, never a mixture. The pointer rewrite is the only non-atomic
window (file create/rename semantics vary by filesystem — atomic on
POSIX and HDFS rename, best-effort on object stores); it is one tiny
file, not a directory move, and a reader hitting the window retries.

Time travel falls out for free: old versions stay readable until
:func:`vacuum` removes them — which is also what makes long-running
readers safe (a reader on v7 keeps a complete directory even after v8
publishes). Crash recovery needs NO repair step: an unpublished staging
directory is simply never referenced and the next write overwrites or
ignores it.

No reference counterpart (`/root/reference` writes flat parquet); the
layout follows public table-format designs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"
_VDIR = re.compile(r"^v(\d{8})$")


def _jvm_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ), hpath, jvm


def _read_pointer(spark: SparkSession, table_dir: str) -> int | None:
    fs, _, jvm = _jvm_fs(spark, table_dir)
    ptr = jvm.org.apache.hadoop.fs.Path(f"{table_dir}/{_POINTER}")
    if not fs.exists(ptr):
        return None
    stream = fs.open(ptr)
    try:
        raw = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("ascii")
    finally:
        stream.close()
    return int(raw.strip())


def _write_pointer(spark: SparkSession, table_dir: str, version: int) -> None:
    """Publish by writing the pointer to a temp name and renaming over
    the old one — rename is the atomicity primitive on POSIX/HDFS."""
    fs, _, jvm = _jvm_fs(spark, table_dir)
    hadoop = jvm.org.apache.hadoop.fs
    tmp = hadoop.Path(f"{table_dir}/.{_POINTER}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(f"{version}\n".encode("ascii"))
    finally:
        out.close()
    final = hadoop.Path(f"{table_dir}/{_POINTER}")
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(
            f"versioned table publish failed: rename of {_POINTER} "
            f"in {table_dir}"
        )


def list_versions(spark: SparkSession, table_dir: str) -> list[int]:
    """All fully-written version numbers present on disk, ascending
    (including any newer-than-pointer leftovers from a crashed publish —
    those are invisible to readers but visible here for diagnosis)."""
    fs, hpath, _ = _jvm_fs(spark, table_dir)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        m = _VDIR.match(status.getPath().getName())
        if m and status.isDirectory():
            out.append(int(m.group(1)))
    return sorted(out)


def write_version(
    df: DataFrame,
    table_dir: str,
    *,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Write ``df`` as the next version of ``table_dir`` and publish it.
    Returns the published version number. The version directory is
    complete (parquet job committed) BEFORE the pointer moves; a crash
    anywhere leaves readers on the previous version with no repair
    needed."""
    spark = df.sparkSession
    current = _read_pointer(spark, table_dir)
    on_disk = list_versions(spark, table_dir)
    nxt = max([current or 0, *(on_disk or [0])]) + 1
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(f"{table_dir}/v{nxt:08d}")
    _write_pointer(spark, table_dir, nxt)
    return nxt


def read_table(
    spark: SparkSession,
    table_dir: str,
    *,
    version: int | None = None,
) -> DataFrame:
    """Read the published version (or a pinned ``version`` for time
    travel). Raises with a readable message when the table has never
    been published or the pinned version was vacuumed."""
    v = version if version is not None else _read_pointer(spark, table_dir)
    if v is None:
        raise FileNotFoundError(
            f"versioned table has no published version: {table_dir}"
        )
    if version is not None and version not in list_versions(
        spark, table_dir
    ):
        raise FileNotFoundError(
            f"version {version} not on disk under {table_dir} "
            "(vacuumed or never published)"
        )
    return spark.read.parquet(f"{table_dir}/v{v:08d}")


def vacuum(
    spark: SparkSession, table_dir: str, *, keep_last: int = 2
) -> list[int]:
    """Delete all but the newest ``keep_last`` versions at or below the
    pointer (never the published one, never unpublished staging newer
    than the pointer). Returns the versions removed. Callers own the
    retention-vs-long-reader tradeoff: a reader pinned to a vacuumed
    version loses its files."""
    if keep_last < 1:
        raise ValueError(f"vacuum: keep_last must be >= 1, got {keep_last}")
    current = _read_pointer(spark, table_dir)
    if current is None:
        return []
    published = [v for v in list_versions(spark, table_dir) if v <= current]
    doomed = published[:-keep_last] if len(published) > keep_last else []
    fs, _, jvm = _jvm_fs(spark, table_dir)
    for v in doomed:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{table_dir}/v{v:08d}"), True
        )
    return doomed
