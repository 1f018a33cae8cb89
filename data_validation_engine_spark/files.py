"""Driver-side file handling across URI schemes.

Bulk DATA moves through Spark readers/writers (Hadoop FS handles any
configured scheme natively) — this module exists only for the pipeline's
small driver-side metadata files: ``.metadata.json`` discovery, rule-store
and error-detail documents, landing-prefix moves. Parity surface:
dve parser/file_handling/service.py:44-71,108-439 (scheme-dispatch service
with local/S3/DBFS implementations).

Scheme support here: ``file://`` (and bare paths) natively; ``s3://`` via
boto3 when installed; ``dbfs:/`` by path translation to the local FUSE
mount when present. Missing backends raise loudly (import-gated), never
silently no-op.
"""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path
from typing import IO, Iterator
from urllib.parse import urlparse


def resolve_location(uri: str) -> tuple[str, str]:
    """Split a URI into (scheme, path); bare paths are ``file``."""
    parsed = urlparse(str(uri))
    if parsed.scheme in ("", "file"):
        return "file", parsed.path or str(uri)
    if parsed.scheme == "dbfs":
        return "dbfs", parsed.path
    if parsed.scheme in ("s3", "s3a"):
        return "s3", f"{parsed.netloc}/{parsed.path.lstrip('/')}"
    raise ValueError(f"unsupported URI scheme {parsed.scheme!r} in {uri!r}")


def joinuri(base: str, *parts: str) -> str:
    """Join URI components with single slashes (scheme-preserving)."""
    out = str(base).rstrip("/")
    for part in parts:
        out += "/" + str(part).strip("/")
    return out


def _dbfs_local(path: str) -> Path:
    mount = Path("/dbfs")
    if not mount.exists():
        raise FileNotFoundError(
            "dbfs:/ paths need the /dbfs FUSE mount (Databricks runtime); "
            "not present on this machine"
        )
    return mount / path.lstrip("/")


def _s3_client():
    try:
        import boto3  # type: ignore[import-not-found]
    except ImportError as exc:
        raise ImportError(
            "s3:// file handling requires boto3 (not installed); bulk data "
            "paths should go through spark.read/write instead"
        ) from exc
    return boto3.client("s3")


def open_stream(uri: str, mode: str = "rb") -> IO:
    """Open a (small) file for reading/writing on any supported scheme."""
    scheme, path = resolve_location(uri)
    if scheme == "file":
        target = Path(path)
        if "w" in mode or "a" in mode:
            target.parent.mkdir(parents=True, exist_ok=True)
        return open(target, mode)
    if scheme == "dbfs":
        return open(_dbfs_local(path), mode)
    # s3: materialise through a spooled buffer
    import io

    bucket, _, key = path.partition("/")
    client = _s3_client()
    if "r" in mode and "w" not in mode:
        body = client.get_object(Bucket=bucket, Key=key)["Body"].read()
        return io.BytesIO(body) if "b" in mode else io.StringIO(body.decode())
    raise ValueError("s3 writes: use put_file()")


def read_text(uri: str) -> str:
    with open_stream(uri, "rb") as fh:
        return fh.read().decode("utf-8")


def put_file(local_path: str | Path, uri: str) -> None:
    """Upload/copy one local file to the target URI."""
    scheme, path = resolve_location(uri)
    if scheme == "file":
        dest = Path(path)
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(local_path, dest)
        return
    if scheme == "dbfs":
        dest = _dbfs_local(path)
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(local_path, dest)
        return
    bucket, _, key = path.partition("/")
    _s3_client().upload_file(str(local_path), bucket, key)


def copy_file(src_uri: str, dest_uri: str) -> None:
    """Copy a file between URIs (same or different schemes)."""
    s_scheme, s_path = resolve_location(src_uri)
    if s_scheme == "file":
        put_file(s_path, dest_uri)
        return
    if s_scheme == "dbfs":
        put_file(_dbfs_local(s_path), dest_uri)
        return
    with open_stream(src_uri, "rb") as fh:
        data = fh.read()
    d_scheme, d_path = resolve_location(dest_uri)
    if d_scheme in ("file", "dbfs"):
        dest = Path(d_path) if d_scheme == "file" else _dbfs_local(d_path)
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_bytes(data)
        return
    bucket, _, key = d_path.partition("/")
    _s3_client().put_object(Bucket=bucket, Key=key, Body=data)


def move_file(src_uri: str, dest_uri: str) -> None:
    copy_file(src_uri, dest_uri)
    delete_file(src_uri)


def delete_file(uri: str) -> None:
    scheme, path = resolve_location(uri)
    if scheme == "file":
        Path(path).unlink(missing_ok=True)
        return
    if scheme == "dbfs":
        _dbfs_local(path).unlink(missing_ok=True)
        return
    bucket, _, key = path.partition("/")
    _s3_client().delete_object(Bucket=bucket, Key=key)


def list_files(uri: str, *, suffix: str | None = None) -> Iterator[str]:
    """Yield file URIs directly under a prefix (non-recursive for local)."""
    scheme, path = resolve_location(uri)
    if scheme in ("file", "dbfs"):
        base = Path(path) if scheme == "file" else _dbfs_local(path)
        if not base.exists():
            return
        for p in sorted(base.iterdir()):
            if p.is_file() and (suffix is None or p.name.endswith(suffix)):
                yield str(p) if scheme == "file" else f"dbfs:/{p.relative_to('/dbfs')}"
        return
    bucket, _, prefix = path.partition("/")
    client = _s3_client()
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
        for obj in page.get("Contents", []):
            if suffix is None or obj["Key"].endswith(suffix):
                yield f"s3://{bucket}/{obj['Key']}"


def file_digest(uri: str, algorithm: str = "sha256") -> str:
    """Hex digest of a (small, driver-side) file's contents."""
    h = hashlib.new(algorithm)
    with open_stream(uri, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def discover_submissions(
    landing_uri: str, *, metadata_suffix: str = ".metadata.json"
) -> tuple[list[tuple[str, str]], list[str]]:
    """Pair data files with their metadata files under a landing prefix.

    Returns ``(pairs, dead_letters)`` — a data file pairs with
    ``<name><metadata_suffix>``; anything unpaired is dead-lettered
    (parity: dve pipeline/pipeline.py:164-196, pipeline/utils.py:71-79).
    """
    files = list(list_files(landing_uri))
    meta = {f for f in files if f.endswith(metadata_suffix)}
    data = [f for f in files if f not in meta]
    pairs: list[tuple[str, str]] = []
    dead: list[str] = []
    claimed: set[str] = set()
    for f in data:
        m = f + metadata_suffix
        stem = f.rsplit(".", 1)[0]
        m_alt = stem + metadata_suffix
        if m in meta:
            pairs.append((f, m))
            claimed.add(m)
        elif m_alt in meta:
            pairs.append((f, m_alt))
            claimed.add(m_alt)
        else:
            dead.append(f)
    dead.extend(sorted(meta - claimed))
    return pairs, dead
