"""Content-defined chunking (llmops/chunking.py chunk_by_content).

Pins the CDC contract: coverage (chunks re-concatenate to the token
stream), length clamps, determinism, and THE property fixed windows
cannot give — boundary stability under edits (a prepended sentence
realigns: later chunks are byte-identical to the unedited document's,
so chunk-level dedup still collapses them)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.chunking import (
    chunk_by_content,
    chunk_documents,
)

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _text(n, phase=0):
    # unique token per position: chunk texts never repeat, so set
    # intersection measures genuine boundary realignment
    return " ".join(
        WORDS[(i * 7 + phase) % len(WORDS)] + str(i * 13 + phase)
        for i in range(n)
    )


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_chunks_cover_document_exactly(spark):
    text = _text(500)
    out = (
        chunk_by_content(_doc(spark, text), "doc_id", "text", target_tokens=32)
        .orderBy("chunk_idx")
        .collect()
    )
    assert len(out) > 3
    rebuilt = " ".join(r["chunk_text"] for r in out)
    assert rebuilt == text
    assert sum(r["n_chunk_tokens"] for r in out) == 500
    assert [r["chunk_idx"] for r in out] == list(range(len(out)))


def test_length_clamps_hold(spark):
    out = chunk_by_content(
        _doc(spark, _text(2000)), "doc_id", "text",
        target_tokens=32, min_tokens=10, max_tokens=60,
    ).collect()
    sizes = [r["n_chunk_tokens"] for r in out]
    # every chunk except possibly the last respects [min, max]
    assert all(10 <= s <= 60 for s in sizes[:-1])
    assert sizes[-1] <= 60
    # mean in the right ballpark for a geometric(1/32) clamped draw
    assert 15 <= sum(sizes) / len(sizes) <= 60


def test_deterministic_and_seed_family(spark):
    doc = _doc(spark, _text(300))
    a = chunk_by_content(doc, "doc_id", "text", target_tokens=24).collect()
    b = chunk_by_content(doc, "doc_id", "text", target_tokens=24).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = chunk_by_content(
        doc, "doc_id", "text", target_tokens=24, seed="other"
    ).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_boundaries_stable_under_prepended_edit(spark):
    """The CDC property: prepend ~40 tokens, the tail chunks realign."""
    base = _text(600)
    edited = _text(40, phase=3) + " " + base

    def chunk_set(text, fn, **kw):
        rows = fn(_doc(spark, text), "doc_id", "text", **kw).collect()
        return {r["chunk_text"] for r in rows}

    cdc_base = chunk_set(base, chunk_by_content, target_tokens=32)
    cdc_edit = chunk_set(edited, chunk_by_content, target_tokens=32)
    shared_cdc = len(cdc_base & cdc_edit)
    # nearly all of the unedited document's chunks survive verbatim
    assert shared_cdc >= len(cdc_base) - 3, (shared_cdc, len(cdc_base))

    # fixed windows, same mean size: the edit shifts every window
    fix_base = chunk_set(base, chunk_documents, chunk_tokens=32)
    fix_edit = chunk_set(edited, chunk_documents, chunk_tokens=32)
    shared_fix = len(fix_base & fix_edit)
    assert shared_fix < shared_cdc
    assert shared_fix <= 2  # 40 % 32 != 0 -> every window is offset


def test_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two three")],
        "doc_id long, text string",
    )
    out = chunk_by_content(df, "doc_id", "text", target_tokens=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # empty docs emit zero rows; the short doc emits one whole chunk
    assert set(by_doc) == {4}
    assert by_doc[4][0]["chunk_text"] == "one two three"
    assert by_doc[4][0]["n_chunk_tokens"] == 3


def test_param_validation(spark):
    df = _doc(spark, "a b c")
    with pytest.raises(ValueError):
        chunk_by_content(df, "doc_id", "text", target_tokens=1)
    with pytest.raises(ValueError):
        chunk_by_content(
            df, "doc_id", "text", target_tokens=8, min_tokens=9, max_tokens=8
        )
    with pytest.raises(ValueError):
        chunk_by_content(df, "doc_id", "text", target_tokens=8, gram=0)


def test_plan_is_shuffle_free(spark):
    df = _doc(spark, _text(100))
    plan = (
        chunk_by_content(df, "doc_id", "text", target_tokens=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_declared_step(spark):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    eng = StepEngine(spark, register_functions=False)
    ents = {"docs": _doc(spark, _text(200))}
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "chunk_by_content",
                "entity_name": "docs",
                "key_column": "doc_id",
                "target_tokens": 16,
                "new_entity_name": "chunks",
            }
        ),
    )
    rows = ents["chunks"].orderBy("chunk_idx").collect()
    assert sum(r["n_chunk_tokens"] for r in rows) == 200
    assert rows[0].asDict().keys() == {
        "doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens",
    }


def _py_cdc_chunks(text, target, lo, hi, gram):
    """Pure-Python reference of the CDC boundary walk."""
    import hashlib

    toks = text.split()
    n = len(toks)
    if n == 0:
        return []
    cand = set()
    for i in range(1, n + 1):
        start = max(i - (gram - 1), 1)
        window = " ".join(toks[start - 1 : i])
        h = int(
            hashlib.md5(f"|cdc|{window}".encode()).hexdigest()[:15], 16
        )
        if h % target == 0:
            cand.add(i)
    cuts = [0]
    for i in range(1, n + 1):
        if i - cuts[-1] >= hi or (i in cand and i - cuts[-1] >= lo):
            cuts.append(i)
    if cuts[-1] != n:
        cuts.append(n)
    return [
        (" ".join(toks[a:b]), b - a)
        for a, b in zip(cuts, cuts[1:])
    ]


def test_property_sweep_matches_python_reference(spark):
    """Seeded random corpus, several (target, min, max, gram) configs,
    ONE collect per config: chunks must partition the token stream in
    order, respect the clamps, and match the pure-Python boundary walk
    row-for-row."""
    import random

    rng = random.Random(7)
    docs = []
    for i in range(60):
        n = rng.randrange(0, 300)
        docs.append(
            (i, " ".join(WORDS[rng.randrange(len(WORDS))] + str(rng.randrange(50))
                          for _ in range(n)))
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for target, lo, hi, gram in ((16, 4, 64, 4), (8, 1, 12, 2), (50, 20, 55, 8)):
        rows = chunk_by_content(
            df, "doc_id", "text", target_tokens=target,
            min_tokens=lo, max_tokens=hi, gram=gram,
        ).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], []).append(r)
        for rid, text in docs:
            want = _py_cdc_chunks(text, target, lo, hi, gram)
            have = sorted(got.get(rid, []), key=lambda r: r["chunk_idx"])
            assert len(have) == len(want), (rid, target)
            for h, (wtext, wn) in zip(have, want):
                assert h["chunk_text"] == wtext and h["n_chunk_tokens"] == wn
            sizes = [h["n_chunk_tokens"] for h in have]
            assert all(s <= hi for s in sizes)
            assert all(s >= lo for s in sizes[:-1]) or len(sizes) == 1
