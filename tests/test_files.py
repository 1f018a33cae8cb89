"""Driver-side file-handling service tests (local scheme; s3/dbfs gated)."""

from __future__ import annotations

import pytest

from data_validation_engine_spark.files import (
    copy_file,
    discover_submissions,
    file_digest,
    joinuri,
    list_files,
    move_file,
    open_stream,
    put_file,
    read_text,
    resolve_location,
)


def test_resolve_and_join():
    assert resolve_location("/a/b.json") == ("file", "/a/b.json")
    assert resolve_location("file:///a/b.json") == ("file", "/a/b.json")
    assert resolve_location("s3://bucket/k/f.json") == ("s3", "bucket/k/f.json")
    assert resolve_location("dbfs:/mnt/x.json") == ("dbfs", "/mnt/x.json")
    with pytest.raises(ValueError, match="scheme"):
        resolve_location("ftp://x/y")
    assert joinuri("s3://b/pre/", "sub", "f.json") == "s3://b/pre/sub/f.json"


def test_local_roundtrip(tmp_path):
    src = tmp_path / "in.json"
    src.write_text('{"a": 1}')
    dest = tmp_path / "nested" / "out.json"
    copy_file(str(src), str(dest))
    assert read_text(str(dest)) == '{"a": 1}'
    assert file_digest(str(src)) == file_digest(str(dest))

    moved = tmp_path / "moved.json"
    move_file(str(dest), str(moved))
    assert moved.exists() and not dest.exists()

    with open_stream(str(tmp_path / "w.txt"), "wb") as fh:
        fh.write(b"x")
    assert (tmp_path / "w.txt").read_bytes() == b"x"

    put_file(src, str(tmp_path / "put" / "c.json"))
    names = [p.rsplit("/", 1)[-1] for p in list_files(str(tmp_path), suffix=".json")]
    assert "in.json" in names and "moved.json" in names


def test_discover_submissions(tmp_path):
    (tmp_path / "a.csv").write_text("x")
    (tmp_path / "a.csv.metadata.json").write_text("{}")
    (tmp_path / "b.xml").write_text("x")
    (tmp_path / "b.metadata.json").write_text("{}")  # stem-paired
    (tmp_path / "orphan.csv").write_text("x")
    (tmp_path / "stray.metadata.json").write_text("{}")
    pairs, dead = discover_submissions(str(tmp_path))
    got = {(p.rsplit("/", 1)[-1], m.rsplit("/", 1)[-1]) for p, m in pairs}
    assert got == {
        ("a.csv", "a.csv.metadata.json"),
        ("b.xml", "b.metadata.json"),
    }
    dead_names = {d.rsplit("/", 1)[-1] for d in dead}
    assert dead_names == {"orphan.csv", "stray.metadata.json"}


def test_s3_gated_without_boto3(tmp_path):
    try:
        import boto3  # noqa: F401

        pytest.skip("boto3 installed; gating path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="boto3"):
        put_file(tmp_path / "x", "s3://bucket/key")