"""Mojibake detection + repair (llmops/normalize.py), pinned against
Python's codec round-trip."""

from __future__ import annotations

import pytest

from data_validation_engine_spark.llmops.normalize import (
    MOJIBAKE_MARKERS,
    fix_mojibake,
    mojibake_stats,
)
from data_validation_engine_spark.steps import parse_step
from data_validation_engine_spark.steps.engine import StepEngine


def _break(s: str) -> str:
    """Create mojibake exactly the way the wild does: UTF-8 bytes
    mis-decoded as WHATWG windows-1252 (cp1252 for the 27 defined
    0x80-0x9F printables — the visible "â€™" artifacts — with the 5
    undefined bytes passing through as C1 controls, which is what
    browsers do)."""
    out = []
    for byte in s.encode("utf-8"):
        try:
            out.append(bytes([byte]).decode("windows-1252"))
        except UnicodeDecodeError:
            out.append(chr(byte))
    return "".join(out)


CLEAN = [
    "it’s a café — “nice” one…",
    "naïve piñata über señor",
    "£5 · 30° «quoted»",
]


def test_stats_counts_markers(spark):
    rows = [(i, _break(t)) for i, t in enumerate(CLEAN)] + [
        (10, "plain ascii text"),
        (11, ""),
        (12, None),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r["id"]: r for r in mojibake_stats(df, "text").collect()}
    for i, t in enumerate(CLEAN):
        broken = _break(t)
        expected = sum(broken.count(m) for m in MOJIBAKE_MARKERS)
        assert expected > 0, (i, broken)
        assert out[i]["mojibake_count"] == expected
        assert out[i]["mojibake_frac"] == pytest.approx(
            round(expected / len(broken), 6), abs=1e-9
        )
    assert out[10]["mojibake_count"] == 0
    assert out[10]["mojibake_frac"] == 0.0
    for i in (11, 12):
        assert out[i]["mojibake_count"] == 0
        assert out[i]["mojibake_frac"] is None


def test_fix_recovers_original(spark):
    rows = [(i, _break(t)) for i, t in enumerate(CLEAN)]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r["id"]: r for r in fix_mojibake(df, "text").collect()}
    for i, t in enumerate(CLEAN):
        assert out[i]["mojibake_fixed"] is True
        assert out[i]["text"] == t, (out[i]["text"], t)


def test_fix_guards(spark):
    rows = [
        # emoji: not Latin-1-representable -> untouched (guard 1)
        (1, "mojibake â€™ plus emoji 😀"),
        # legitimate Latin-1 with no markers -> untouched (guard 3)
        (2, "résumé déjà vu"),
        # clean ascii -> untouched
        (3, "nothing to fix here"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {
        r["id"]: r
        for r in fix_mojibake(df, "text", output_col="fixed").collect()
    }
    for i in (1, 2, 3):
        assert out[i]["mojibake_fixed"] is False
        assert out[i]["fixed"] == out[i]["text"]
    assert out[4]["mojibake_fixed"] is False and out[4]["fixed"] is None
    assert out[5]["mojibake_fixed"] is False and out[5]["fixed"] == ""


def test_double_mojibake_one_layer_per_call(spark):
    original = "it’s fine"
    double = _break(_break(original))
    df = spark.createDataFrame([(1, double)], "id int, text string")
    once = fix_mojibake(df, "text").collect()[0]
    assert once["mojibake_fixed"] is True
    assert once["text"] == _break(original)
    twice = fix_mojibake(
        spark.createDataFrame([(1, once["text"])], "id int, text string"),
        "text",
    ).collect()[0]
    assert twice["text"] == original


def test_steps_and_corpus_roundtrip(spark, sf_dir):
    """Declared steps over real documents ∪ broken variants: every
    broken variant repairs back to its source text byte-for-byte,
    clean rows pass through untouched with flag false."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 20 = 0")
        .select("doc_id", "text")
    )
    rows = docs.collect()
    # python-side break (the codec work a foreign system did wrong)
    broken = spark.createDataFrame(
        [(r["doc_id"] + 1000000, _break("café — it’s " + (r["text"] or "")))
         for r in rows],
        "doc_id long, text string",
    )
    eng = StepEngine(spark)
    ents = {"docs": docs.unionByName(broken)}
    eng.evaluate(
        ents,
        config=parse_step(
            {"operation": "mojibake_stats", "entity_name": "docs"}
        ),
    )
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "fix_mojibake",
                "entity_name": "docs",
                "output_column": "fixed",
            }
        ),
    )
    out = ents["docs"].collect()
    by_id = {r["doc_id"]: r for r in out}
    for r in rows:
        clean = by_id[r["doc_id"]]
        assert clean["mojibake_fixed"] is False
        assert clean["fixed"] == clean["text"]
        b = by_id[r["doc_id"] + 1000000]
        assert b["mojibake_count"] > 0
        assert b["mojibake_fixed"] is True
        assert b["fixed"] == "café — it’s " + (r["text"] or "")
