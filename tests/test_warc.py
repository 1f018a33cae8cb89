"""WARC source (ISO 28500): record framing, HTTP splitting, gzip
members, type filtering, truncation loudness, and composition with the
web chain (extract_html_text → canonicalize_url)."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.sources.warc import read_warc


def _record(
    wtype: str,
    block: bytes,
    *,
    uri: str | None = None,
    rid: str = "<urn:uuid:0>",
) -> bytes:
    head = [
        b"WARC/1.0",
        f"WARC-Type: {wtype}".encode(),
        f"WARC-Record-ID: {rid}".encode(),
        b"WARC-Date: 2026-01-01T00:00:00Z",
        f"Content-Length: {len(block)}".encode(),
    ]
    if uri is not None:
        head.append(f"WARC-Target-URI: {uri}".encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _response_block(html: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html; "
        f"charset=utf-8\r\nContent-Length: {len(html)}\r\n\r\n".encode()
        + html
    )


HTML_A = "<html><body><p>hello &amp; world</p></body></html>".encode()
HTML_B = "<html><body><p>unicode é中</p></body></html>".encode(
    "utf-8"
)


def _mini_records() -> list[bytes]:
    return [
        _record("warcinfo", b"software: test\r\n"),
        _record(
            "request",
            b"GET /a HTTP/1.1\r\nHost: x.example\r\n\r\n",
            uri="http://x.example/a",
        ),
        _record(
            "response",
            _response_block(HTML_A),
            uri="http://x.example/a?utm_source=t&b=2&a=1",
            rid="<urn:uuid:a>",
        ),
        _record(
            "response",
            _response_block(HTML_B, status=404),
            uri="http://X.Example:80/b",
            rid="<urn:uuid:b>",
        ),
    ]


def _mini_warc() -> bytes:
    return b"".join(_mini_records())


def test_framing_http_split_and_type_filter(spark, tmp_path):
    (tmp_path / "t.warc").write_bytes(_mini_warc())
    resp = read_warc(spark, str(tmp_path)).orderBy("record_offset")
    rows = resp.collect()
    assert [r["warc_type"] for r in rows] == ["response", "response"]
    a, b = rows
    assert bytes(a["payload"]) == HTML_A
    assert a["http_status"] == 200
    assert a["http_content_type"] == "text/html; charset=utf-8"
    assert a["payload_length"] == len(HTML_A)
    assert bytes(b["payload"]) == HTML_B and b["http_status"] == 404

    everything = read_warc(spark, str(tmp_path), types=None)
    got = {
        r["warc_type"]: r for r in everything.collect()
    }
    assert set(got) == {"warcinfo", "request", "response"}
    assert bytes(got["warcinfo"]["payload"]) == b"software: test\r\n"
    # request records get the HTTP-block passthrough (not HTTP/ first)
    assert got["request"]["http_status"] is None
    # offsets are the record starts in the byte stream
    offs = sorted(r["record_offset"] for r in everything.collect())
    assert offs[0] == 0 and offs == sorted(set(offs))


def test_gzip_per_record_members(spark, tmp_path):
    # one gzip member per record (the spec's recommended layout)
    gz = b"".join(gzip.compress(p) for p in _mini_records())
    (tmp_path / "t.warc.gz").write_bytes(gz)
    rows = read_warc(spark, str(tmp_path), types=None).collect()
    assert len(rows) == 4
    assert sorted(r["warc_type"] for r in rows) == [
        "request", "response", "response", "warcinfo",
    ]


def test_truncation_and_corruption_are_loud(spark, tmp_path):
    full = _mini_warc()
    (tmp_path / "trunc.warc").write_bytes(full[: len(full) - 40])
    with pytest.raises(Exception, match="truncated|trailer"):
        read_warc(spark, str(tmp_path)).collect()

    for f in tmp_path.glob("*.warc"):
        f.unlink()
    (tmp_path / "junk.warc").write_bytes(b"NOT-A-WARC" + full)
    with pytest.raises(Exception, match="expected a WARC/ version"):
        read_warc(spark, str(tmp_path)).collect()

    # strict=False salvages the intact prefix instead
    for f in tmp_path.glob("*.warc"):
        f.unlink()
    (tmp_path / "trunc.warc").write_bytes(full[: len(full) - 40])
    rows = read_warc(spark, str(tmp_path), strict=False, types=None).collect()
    assert 0 < len(rows) < 4


def test_roundtrip_arbitrary_payload_bytes(spark, tmp_path):
    # framing must survive payloads containing CRLFCRLF and WARC/
    # look-alikes: Content-Length arithmetic, never delimiter search
    evil = b"\r\n\r\nWARC/1.0\r\nContent-Length: 9\r\n\r\n" + bytes(
        range(256)
    )
    data = _record("resource", evil, uri="http://e.example/x") + _record(
        "response", _response_block(HTML_A), uri="http://e.example/y"
    )
    (tmp_path / "e.warc").write_bytes(data)
    rows = {
        r["warc_type"]: r
        for r in read_warc(spark, str(tmp_path), types=None).collect()
    }
    assert bytes(rows["resource"]["payload"]) == evil
    assert bytes(rows["response"]["payload"]) == HTML_A


def test_composes_with_web_chain(spark, tmp_path):
    from data_validation_engine_spark.llmops.web import (
        canonicalize_url,
        extract_html_text,
    )

    (tmp_path / "t.warc").write_bytes(_mini_warc())
    docs = read_warc(spark, str(tmp_path)).select(
        "target_uri",
        F.col("payload").cast("string").alias("html"),
    )
    out = extract_html_text(docs, "html").withColumn(
        "canon", canonicalize_url(F.col("target_uri"))
    )
    got = {r["canon"]: r["text"] for r in out.collect()}
    assert got["http://x.example/a?a=1&b=2"] == "hello & world"
    assert got["http://x.example/b"] == "unicode é中"


def test_header_folding_unfolds(spark, tmp_path):
    # RFC-822 folded header: continuation lines start with space/tab
    block = _response_block(HTML_A)
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:f>\r\n"
        b"WARC-Target-URI: http://fold.example/very/long\r\n"
        b"\t/continued/path\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(block)}\r\n".encode()
    )
    (tmp_path / "f.warc").write_bytes(head + b"\r\n" + block + b"\r\n\r\n")
    row = read_warc(spark, str(tmp_path)).collect()[0]
    assert row["target_uri"] == (
        "http://fold.example/very/long /continued/path"
    )
    assert row["warc_date"] == "2026-01-01T00:00:00Z"


def test_corrupt_gzip_member_loud_and_salvage(spark, tmp_path):
    recs = _mini_records()
    gz = b"".join(gzip.compress(p) for p in recs[:2])
    broken = gzip.compress(recs[2])
    # flip bytes inside the deflate stream of the third member
    broken = broken[:12] + bytes(b ^ 0xFF for b in broken[12:20]) + broken[20:]
    (tmp_path / "c.warc.gz").write_bytes(gz + broken)
    with pytest.raises(Exception, match="corrupt gzip"):
        read_warc(spark, str(tmp_path), types=None).collect()
    rows = read_warc(
        spark, str(tmp_path), types=None, strict=False
    ).collect()
    # salvage keeps the two intact members, drops the broken tail
    assert sorted(r["warc_type"] for r in rows) == ["request", "warcinfo"]


def test_max_bytes_guard(spark, tmp_path):
    (tmp_path / "t.warc").write_bytes(_mini_warc())
    with pytest.raises(Exception, match="max_bytes"):
        read_warc(spark, str(tmp_path), max_bytes=10).collect()
    ok = read_warc(spark, str(tmp_path), max_bytes=1 << 20).count()
    assert ok == 2


def test_chunked_emission_matches_whole(spark, tmp_path):
    # many-record file: tiny chunk budgets must yield identical rows
    recs = b"".join(
        _record(
            "response",
            _response_block(f"<p>doc {i}</p>".encode()),
            uri=f"http://m.example/{i}",
            rid=f"<urn:uuid:{i}>",
        )
        for i in range(25)
    )
    (tmp_path / "m.warc").write_bytes(recs)
    whole = read_warc(spark, str(tmp_path)).orderBy("record_offset")
    tiny = read_warc(
        spark, str(tmp_path), chunk_rows=3, chunk_bytes=200
    ).orderBy("record_offset")
    assert whole.count() == 25
    assert [r.asDict() for r in whole.collect()] == [
        r.asDict() for r in tiny.collect()
    ]


def test_walker_buffer_stays_bounded():
    # memory-shape proof: feeding slice-by-slice never accumulates the
    # whole stream — the walker trims to the unconsumed suffix
    from data_validation_engine_spark.sources.warc import _RecordWalker

    payload = _response_block(b"x" * 2000)
    stream = b"".join(
        _record("response", payload, uri=f"http://b.example/{i}")
        for i in range(200)
    )
    walker = _RecordWalker("mem.warc", None, True)
    rows = []
    peak = 0
    for off in range(0, len(stream), 1024):
        rows.extend(walker.feed(stream[off : off + 1024]))
        peak = max(peak, len(walker.buf))
    rows.extend(walker.finish())
    assert len(rows) == 200
    # peak buffer ~ one record (+ one slice), nowhere near the stream
    assert peak < 3 * (len(payload) + 1024) < len(stream) / 20
    # offsets are absolute despite the trimming
    assert rows[0][1] == 0 and rows[-1][1] > len(stream) - 3000
