"""Gopher §A1.2 repetition signals (llmops/gopher.py
gopher_repetition_flags), pinned against a pure-Python reference and
hand-computable cases."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from data_validation_engine_spark.llmops.gopher import (
    gopher_repetition_flags,
)
from data_validation_engine_spark.steps import parse_step
from data_validation_engine_spark.steps.engine import StepEngine


# ---------------------------------------------------------------- python ref
def _words(t):
    return [w for w in re.split(r"\s+", t) if w]


def _items(t, sep_re):
    # Spark trim() strips only ASCII spaces — the reference must match
    out = []
    for x in re.split(sep_re, t):
        s = x.strip(" ")
        if s:
            out.append(s)
    return out


def _dup_beyond_first(items):
    c = Counter(items)
    cnt = sum(v - 1 for v in c.values() if v > 1)
    chars = sum((v - 1) * len(k) for k, v in c.items() if v > 1)
    return cnt, chars


def _grams(ws, n):
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def _top_gram_frac(ws, n, total_chars):
    if len(ws) < n:
        return 0.0
    c = Counter(_grams(ws, n))
    best_c, best_v = 0, ""
    for g in sorted(c):
        if c[g] > best_c:
            best_c, best_v = c[g], g
    if best_c < 2:
        return 0.0
    return best_c * len(best_v) / total_chars


def _dup_cover_frac(ws, n, total_chars):
    if len(ws) < n:
        return 0.0
    gs = _grams(ws, n)
    c = Counter(gs)
    starts = sorted(i + 1 for i, g in enumerate(gs) if c[g] >= 2)
    covered = 0
    a = b = 0
    runs = []
    for s in starts:
        if b == 0:
            a, b = s, s + n - 1
        elif s <= b:
            b = max(b, s + n - 1)
        else:
            runs.append((a, b))
            a, b = s, s + n - 1
    if b > 0:
        runs.append((a, b))
    for a, b in runs:
        covered += sum(len(w) for w in ws[a - 1 : b]) + (b - a)
    return covered / total_chars


def _py_reference(t):
    """Returns the full metric dict, or None values for empty text."""
    if not t:
        return None
    ws = _words(t)
    if not ws:
        return None
    total_chars = sum(len(w) for w in ws) + len(ws) - 1
    lines = _items(t, r"\n")
    paras = _items(t, r"\n{2,}")
    dl_cnt, dl_chars = _dup_beyond_first(lines)
    dp_cnt, dp_chars = _dup_beyond_first(paras)
    line_chars = sum(len(x) for x in lines)
    para_chars = sum(len(x) for x in paras)
    out = {
        "rep_words": len(ws),
        "rep_total_chars": total_chars,
        "rep_dup_lines": dl_cnt,
        "rep_dup_paras": dp_cnt,
        "rep_dup_line_frac": dl_cnt / len(lines) if lines else None,
        "rep_dup_line_char_frac": (
            dl_chars / line_chars if line_chars else None
        ),
        "rep_dup_para_frac": dp_cnt / len(paras) if paras else None,
        "rep_dup_para_char_frac": (
            dp_chars / para_chars if para_chars else None
        ),
    }
    for n in (2, 3, 4):
        out[f"rep_top_{n}gram_frac"] = _top_gram_frac(ws, n, total_chars)
    for n in (5, 6, 7, 8, 9, 10):
        out[f"rep_dup_{n}gram_frac"] = _dup_cover_frac(
            ws, n, total_chars
        )
    return out


METRIC_COLS = [
    "rep_words",
    "rep_total_chars",
    "rep_dup_lines",
    "rep_dup_paras",
    "rep_dup_line_frac",
    "rep_dup_line_char_frac",
    "rep_dup_para_frac",
    "rep_dup_para_char_frac",
    "rep_top_2gram_frac",
    "rep_top_3gram_frac",
    "rep_top_4gram_frac",
] + [f"rep_dup_{n}gram_frac" for n in (5, 6, 7, 8, 9, 10)]


def _assert_matches(row, ref, doc_id):
    for c in METRIC_COLS:
        got, want = row[c], ref[c] if ref else None
        if want is None:
            if c in ("rep_words", "rep_total_chars", "rep_dup_lines",
                     "rep_dup_paras"):
                assert got == 0, (doc_id, c, got)
            else:
                assert got is None, (doc_id, c, got)
        elif isinstance(want, int):
            assert got == want, (doc_id, c, got, want)
        else:
            assert got == pytest.approx(want, abs=1e-6), (
                doc_id, c, got, want,
            )


def test_matches_python_on_corpus(spark, sf_dir):
    """Real documents PLUS adversarial variants: duplicated-line
    rebuilds, self-concatenations (every gram duplicated), and
    whitespace-heavy edges — all 17 metric columns must match the
    reference exactly."""
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 5 = 0")
        .selectExpr("doc_id", "text")
    )
    variants = base.selectExpr(
        "doc_id + 1000000 AS doc_id",
        # self-concatenation separated by a blank line: every line,
        # paragraph and n-gram repeats
        "text || '\\n\\n' || text AS text",
    ).unionByName(
        base.selectExpr(
            "doc_id + 2000000 AS doc_id",
            # first 120 chars repeated 3x on separate lines
            "concat_ws('\\n', substr(text, 1, 120), substr(text, 1, 120),"
            " substr(text, 1, 120)) AS text",
        )
    )
    df = base.unionByName(variants)
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    out = gopher_repetition_flags(df, "text").collect()
    assert len(out) == len(rows)
    checked_dup = 0
    for r in out:
        ref = _py_reference(rows[r["doc_id"]])
        _assert_matches(r, ref, r["doc_id"])
        if ref and ref["rep_dup_5gram_frac"] > 0:
            checked_dup += 1
    assert checked_dup > 0, "no doc exercised the dup-gram cover path"


def test_hand_cases_and_edges(spark):
    rows = [
        (1, "a b\na b\nc d"),
        (2, "x y\n\nx y\n\nz w"),
        (3, "a b a b a b"),
        (4, "q w e r t q w e r t x"),
        (5, "a a a a a a a"),
        (6, ""),
        (7, None),
        (8, "unique words only here today"),
        (9, "   \n\t\n  "),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r["id"]: r for r in gopher_repetition_flags(df, "text").collect()}
    assert out[1]["rep_dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[1]["rep_dup_line_char_frac"] == pytest.approx(
        3 / 9, abs=1e-6
    )
    assert out[2]["rep_dup_para_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # "a b a b a b": top 2-gram "a b" x3, 9 chars of 11
    assert out[3]["rep_top_2gram_frac"] == pytest.approx(
        9 / 11, abs=1e-6
    )
    # two non-overlapping dup 5-gram runs: 9 + 9 chars of 21
    assert out[4]["rep_total_chars"] == 21
    assert out[4]["rep_dup_5gram_frac"] == pytest.approx(
        18 / 21, abs=1e-6
    )
    # overlapping occurrences merge to full coverage
    assert out[5]["rep_dup_5gram_frac"] == 1.0
    # empty/NULL text: integer anchors 0, fracs NULL, fail closed
    for i in (6, 7):
        assert out[i]["rep_words"] == 0
        assert out[i]["rep_dup_line_frac"] is None
        assert out[i]["rep_keep"] is False
    # all-unique doc: top gram count 1 is not repetition
    assert out[8]["rep_top_2gram_frac"] == 0.0
    assert out[8]["rep_keep"] is True
    # whitespace-only text has no words: fail closed like empty
    assert out[9]["rep_words"] == 0 and out[9]["rep_keep"] is False


def test_thresholds_and_flags(spark):
    df = spark.createDataFrame(
        [(1, "spam ham " * 30), (2, "w" + " x y z".join(str(i) for i in range(40)))],
        "id int, text string",
    )
    out = {
        r["id"]: r
        for r in gopher_repetition_flags(df, "text").collect()
    }
    # doc 1 is one repeated bigram: every gram family trips
    assert out[1]["rep_keep"] is False
    assert out[1]["flag_top_2gram"] is False
    assert out[1]["flag_dup_5gram"] is False
    with pytest.raises(ValueError, match="3 thresholds"):
        gopher_repetition_flags(df, "text", max_top_gram_fracs=(0.2,))
    with pytest.raises(ValueError, match="6 thresholds"):
        gopher_repetition_flags(df, "text", max_dup_gram_fracs=(0.1,))


def test_partitioning_invariance(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 25 = 0")
        .select("doc_id", "text")
    )
    a = sorted(
        map(tuple, gopher_repetition_flags(docs, "text").collect())
    )
    b = sorted(
        map(
            tuple,
            gopher_repetition_flags(docs.repartition(7), "text").collect(),
        )
    )
    assert a == b


def test_declared_step(spark):
    eng = StepEngine(spark)
    ents = {
        "docs": spark.createDataFrame(
            [(1, "a b\na b\nc d"), (2, "fine text with variety here")],
            "doc_id int, text string",
        )
    }
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "gopher_repetition_flags",
                "entity_name": "docs",
                "new_entity_name": "flagged",
                "max_dup_line_frac": 0.5,
            }
        ),
    )
    out = {r["doc_id"]: r for r in ents["flagged"].collect()}
    # relaxed threshold: 1/3 dup lines now passes
    assert out[1]["flag_dup_lines"] is True
    assert out[2]["rep_keep"] is True
    # function output and step output agree column-for-column
    fn = gopher_repetition_flags(
        ents["docs"], "text", max_dup_line_frac=0.5
    )
    assert sorted(map(tuple, fn.collect())) == sorted(
        map(tuple, ents["flagged"].collect())
    )
