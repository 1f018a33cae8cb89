"""Round-10 operator budget: sentence-aware chunking, Unicode script
profiling, and the xxhash64 production bucket path — each pinned
against a pure-Python reference (the pytest-first contract; driver
attestation rides the round-11 oracle budget per the freeze rule)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _py_sentences(text: str) -> list[str]:
    # Python re rejects variable-width lookbehind, so the reference
    # replays the boundary as the same capture-group sentinel rewrite
    # the DuckDB oracle uses
    t = text.strip()
    if not t:
        return []
    marked = re.sub(
        r"([.!?][\"'\)\]]?)(\s+)([\"'\(\[]?[A-Z0-9])", "\\1\x1e\\3", t
    )
    return [s.strip() for s in marked.split("\x1e") if s.strip()]


def _py_chunks(text: str, max_tokens: int, overlap: int = 0):
    sents = _py_sentences(text)
    chunks: list[list[int]] = []  # sentence indexes per chunk
    cur_tokens = 0
    for i, s in enumerate(sents):
        t = len(s.split())
        if chunks and cur_tokens > 0 and cur_tokens + t > max_tokens:
            chunks.append([i])
            cur_tokens = t
        elif not chunks:
            chunks.append([i])
            cur_tokens = t
        else:
            chunks[-1].append(i)
            cur_tokens += t
    out = []
    for ci, idxs in enumerate(chunks):
        lead = sents[max(0, idxs[0] - overlap):idxs[0]] if ci else []
        own = [sents[i] for i in idxs]
        out.append(
            {
                "chunk_idx": ci,
                "text": " ".join(lead + own),
                "n_sentences": len(own),
                "n_tokens": sum(len(s.split()) for s in own),
            }
        )
    return out


class TestChunkBySentences:
    TEXT = (
        "One two three. Four five six seven! Eight nine? "
        "Ten eleven twelve thirteen fourteen. Fifteen. "
        "Sixteen seventeen eighteen nineteen twenty twentyone."
    )

    def test_matches_python_reference(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            chunk_by_sentences,
        )

        rows = [("a", self.TEXT), ("b", "Short only."), ("c", None),
                ("d", "")]
        df = spark.createDataFrame(rows, "id string, text string")
        for max_tokens, ov in ((6, 0), (6, 1), (10, 2), (100, 0)):
            got = {
                (r["id"], r["chunk_idx"]): r
                for r in chunk_by_sentences(
                    df, "id", "text",
                    max_tokens=max_tokens, overlap_sentences=ov,
                ).collect()
            }
            want = {}
            for rid, text in rows:
                for c in _py_chunks(text or "", max_tokens, ov):
                    want[(rid, c["chunk_idx"])] = c
            assert set(got) == set(want), (max_tokens, ov)
            for k, w in want.items():
                g = got[k]
                assert g["text"] == w["text"], (k, max_tokens, ov)
                assert g["n_sentences"] == w["n_sentences"]
                assert g["n_tokens"] == w["n_tokens"]

    def test_oversized_sentence_gets_own_chunk(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            chunk_by_sentences,
        )

        # words must start uppercase or the boundary (which requires a
        # sentence-opening next char) never fires after "Tiny."
        df = spark.createDataFrame(
            [("a", "Tiny. " + " ".join(f"W{i}" for i in range(30))
              + ". Tail.")],
            "id string, text string",
        )
        out = chunk_by_sentences(df, "id", "text", max_tokens=5).collect()
        toks = [r["n_tokens"] for r in sorted(out, key=lambda r: r["chunk_idx"])]
        assert toks[0] <= 5 and toks[1] > 5  # oversized kept whole, alone
        assert sum(r["n_sentences"] for r in out) == 3

    def test_zero_shuffle_plan(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            chunk_by_sentences,
        )

        df = spark.createDataFrame(
            [("a", self.TEXT)], "id string, text string"
        )
        plan = (
            chunk_by_sentences(df, "id", "text", max_tokens=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_validation(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            chunk_by_sentences,
        )

        df = spark.createDataFrame([("a", "x")], "id string, text string")
        with pytest.raises(ValueError, match="max_tokens"):
            chunk_by_sentences(df, "id", "text", max_tokens=0)
        with pytest.raises(ValueError, match="overlap"):
            chunk_by_sentences(
                df, "id", "text", max_tokens=5, overlap_sentences=-1
            )


class TestScriptProfile:
    def test_counts_and_dominant(self, spark):
        from data_validation_engine_spark.llmops import script_profile

        rows = [
            ("latin", "Hello world"),
            ("cyr", "Привет мир"),
            ("han", "你好世界 hi"),
            ("mixed", "abcd Привет"),
            ("none", "1234 !!"),
            ("null", None),
            ("kana", "こんにちは カタカナ"),
        ]
        df = spark.createDataFrame(rows, "id string, text string")
        got = {r["id"]: r for r in script_profile(df, "text").collect()}
        assert got["latin"]["script_latin"] == 10
        assert got["latin"]["dominant_script"] == "latin"
        assert got["cyr"]["script_cyrillic"] == 9
        assert got["cyr"]["dominant_script"] == "cyrillic"
        assert got["han"]["script_han"] == 4
        assert got["han"]["script_latin"] == 2
        assert got["han"]["dominant_script"] == "han"
        # tie 4 vs 4? mixed: latin 4, cyrillic 6 -> cyrillic
        assert got["mixed"]["dominant_script"] == "cyrillic"
        assert got["none"]["dominant_script"] == "none"
        assert got["null"]["dominant_script"] == "none"
        assert got["null"]["script_letters"] == 0
        assert got["kana"]["dominant_script"] == "kana"

    def test_tie_breaks_to_first_listed_class(self, spark):
        from data_validation_engine_spark.llmops import script_profile

        df = spark.createDataFrame(
            [("t", "ab Пр")], "id string, text string"
        )
        r = script_profile(df, "text").first()
        assert r["script_latin"] == r["script_cyrillic"] == 2
        assert r["dominant_script"] == "latin"  # first listed wins ties

    def test_zero_shuffle_no_python(self, spark):
        from data_validation_engine_spark.llmops import script_profile

        df = spark.createDataFrame([("a", "hi")], "id string, text string")
        plan = (
            script_profile(df, "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


class TestHashBucketAlgo:
    def test_xxhash64_range_and_determinism(self, spark):
        from data_validation_engine_spark.llmops.split import (
            N_BUCKETS,
            hash_bucket,
        )

        df = spark.range(5000).select(F.col("id"))
        out = df.select(
            hash_bucket(F.col("id"), algo="xxhash64").alias("b")
        )
        stats = out.agg(
            F.min("b"), F.max("b"), F.countDistinct("b")
        ).first()
        assert 0 <= stats[0] and stats[1] < N_BUCKETS
        assert stats[2] > 2000  # spreads, not degenerate
        # deterministic across evaluations and seeds derive new maps
        a = out.collect()
        b = df.select(
            hash_bucket(F.col("id"), algo="xxhash64").alias("b")
        ).collect()
        assert a == b
        seeded = df.select(
            hash_bucket(F.col("id"), seed="exp1", algo="xxhash64").alias("b")
        ).collect()
        assert seeded != a

    def test_md5_path_unchanged_and_validation(self, spark):
        import hashlib

        from data_validation_engine_spark.llmops.split import hash_bucket

        df = spark.createDataFrame([("k1",), ("k2",)], "k string")
        got = {
            r["k"]: r["b"]
            for r in df.select(
                "k", hash_bucket(F.col("k")).alias("b")
            ).collect()
        }
        for k, b in got.items():
            assert b == int(hashlib.md5(k.encode()).hexdigest()[:4], 16)
        with pytest.raises(ValueError, match="algo"):
            hash_bucket(F.col("k"), algo="sha1")


class TestDeclaredSteps:
    def test_chunk_by_sentences_declared(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [("a", "One two three. Four five six seven! Eight nine?")],
            "id string, text string",
        )
        eng = StepEngine(spark, register_functions=False)
        ents = {"docs": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "chunk_by_sentences",
                    "entity_name": "docs",
                    "key_column": "id",
                    "max_tokens": 6,
                    "new_entity_name": "chunks",
                }
            ),
        )
        out = {r["chunk_idx"]: r for r in ents["chunks"].collect()}
        assert out[0]["text"] == "One two three."
        assert out[1]["text"] == "Four five six seven! Eight nine?"

    def test_script_profile_declared(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [("a", "Привет world")], "id string, text string"
        )
        eng = StepEngine(spark, register_functions=False)
        ents = {"docs": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "script_profile",
                    "entity_name": "docs",
                    "new_entity_name": "prof",
                }
            ),
        )
        r = ents["prof"].first()
        assert r["script_cyrillic"] == 6 and r["script_latin"] == 5
        assert r["dominant_script"] == "cyrillic"

    def test_standardize_declared_broadcast_escape(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 5.0)], "g string, v double"
        )
        eng = StepEngine(spark, register_functions=False)
        ents = {"t": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "standardize",
                    "entity_name": "t",
                    "value_column": "v",
                    "group_by": ["g"],
                    "method": "minmax",
                    "broadcast_stats": False,
                    "new_entity_name": "s",
                }
            ),
        )
        plan = ents["s"]._jdf.queryExecution().optimizedPlan().toString()
        assert "broadcast" not in plan.lower()
        got = sorted(r["scaled"] for r in ents["s"].collect())
        assert got == [0.0, 0.0, 1.0]


class TestSelectTokenBudget:
    ROWS = [
        # (id, grp, score, tokens)
        (1, "a", 0.9, 100), (2, "a", 0.8, 150), (3, "a", 0.7, 200),
        (4, "a", 0.6, 50),
        (5, "b", 0.5, 300), (6, "b", 0.4, 300),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "id long, grp string, score double, tokens long"
        )

    def test_absolute_budget_greedy_by_quality(self, spark):
        from data_validation_engine_spark.llmops import select_token_budget

        kept = {
            r["id"]
            for r in select_token_budget(
                self._df(spark), "score", "tokens",
                group_cols=["grp"], budget_tokens=260, tiebreak_col="id",
            ).collect()
        }
        # group a: 100 (cum-before 0) + 150 (100) + 200 (250 < 260,
        # overshoot allowed) — id 4 excluded (cum-before 450)
        # group b: 300 (0) kept, second 300 (300 >= 260) dropped
        assert kept == {1, 2, 3, 5}

    def test_fractional_budget_and_keep_col(self, spark):
        from data_validation_engine_spark.llmops import select_token_budget

        out = {
            r["id"]: r["kept"]
            for r in select_token_budget(
                self._df(spark), "score", "tokens",
                group_cols=["grp"], budget_frac=0.5, tiebreak_col="id",
                keep_col="kept",
            ).collect()
        }
        # group a total 500 -> budget 250: ids 1 (0), 2 (100), 3 (250
        # NOT < 250) ; group b total 600 -> 300: id 5 only
        assert out == {1: True, 2: True, 3: False, 4: False,
                       5: True, 6: False}
        assert len(out) == 6  # audit mode keeps every row

    def test_oversized_best_doc_is_kept(self, spark):
        from data_validation_engine_spark.llmops import select_token_budget

        df = spark.createDataFrame(
            [(1, 0.9, 1000), (2, 0.1, 10)],
            "id long, score double, tokens long",
        )
        kept = {
            r["id"]
            for r in select_token_budget(
                df, "score", "tokens", budget_tokens=100, tiebreak_col="id"
            ).collect()
        }
        assert kept == {1}  # loud overshoot, never an empty selection

    def test_null_guard_and_validation(self, spark):
        import pytest as _pytest

        from data_validation_engine_spark.llmops import select_token_budget

        df = self._df(spark)
        with _pytest.raises(ValueError, match="exactly one"):
            select_token_budget(df, "score", "tokens")
        with _pytest.raises(ValueError, match="budget_frac"):
            select_token_budget(df, "score", "tokens", budget_frac=1.5)
        bad = spark.createDataFrame(
            [(1, None, 10)], "id long, score double, tokens long"
        )
        with _pytest.raises(Exception, match="NULL in column 'score'"):
            select_token_budget(
                bad, "score", "tokens", budget_tokens=5
            ).collect()

    def test_single_shuffle_plan(self, spark):
        from data_validation_engine_spark.llmops import select_token_budget

        plan = (
            select_token_budget(
                self._df(spark), "score", "tokens",
                group_cols=["grp"], budget_tokens=100,
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") <= 1

    def test_declared_step(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = self._df(spark)
        eng = StepEngine(spark, register_functions=False)
        ents = {"docs": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "select_token_budget",
                    "entity_name": "docs",
                    "score_column": "score",
                    "token_column": "tokens",
                    "group_by": ["grp"],
                    "budget_tokens": 260,
                    "tiebreak_column": "id",
                    "new_entity_name": "curated",
                }
            ),
        )
        assert {r["id"] for r in ents["curated"].collect()} == {1, 2, 3, 5}


class TestStreamingParagraphFrequency:
    def test_drained_windows_match_batch(self, spark, tmp_path):
        from data_validation_engine_spark.streaming import (
            read_entity_stream,
            streaming_paragraph_frequency,
        )

        boiler = "subscribe to our newsletter"
        rows = [
            (
                f"2024-01-01 {h:02d}:{m:02d}:00",
                f"body text {h} {m}\n{boiler}"
                if m % 2 == 0
                else f"body text {h} {m}",
            )
            for h in range(4)
            for m in range(0, 60, 13)
        ] + [("2024-01-02 00:00:00", "sentinel closes day one")]
        src = tmp_path / "pf_src"
        batch = spark.createDataFrame(
            rows, "ts string, text string"
        ).selectExpr("CAST(ts AS TIMESTAMP) ts", "text")
        batch.write.parquet(str(src))

        sdf = streaming_paragraph_frequency(
            read_entity_stream(spark, str(src), batch.schema),
            "ts",
            "text",
            window_seconds=3600,
            watermark="1 hour",
        )
        out = str(tmp_path / "pf_out")
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "pf_ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["h"]): (r["para"], r["n_occ"])
            for r in spark.read.parquet(out).collect()
        }
        assert got, "no windows emitted"

        # batch twin over the same construction
        from pyspark.sql import functions as F

        from data_validation_engine_spark.llmops.paragraphs import _norm_col

        want_df = (
            batch.select(
                F.expr(
                    "CAST(FLOOR(unix_timestamp(ts) / 3600) * 3600"
                    " AS BIGINT) AS window_start"
                ),
                F.explode(F.split("text", "\n", -1)).alias("para"),
            )
            .where(F.length(F.trim("para")) >= 1)
            .select(
                "window_start",
                "para",
                F.md5(_norm_col(F.col("para"), normalize=True)).alias("h"),
            )
            .groupBy("window_start", "h")
            .agg(F.min("para").alias("para"), F.count(F.lit(1)).alias("n"))
        )
        want = {
            (r["window_start"], r["h"]): (r["para"], r["n"])
            for r in want_df.collect()
        }
        for k, v in got.items():
            assert want[k] == v, k
        # all four day-1 hourly windows flushed by the sentinel, and the
        # boilerplate hash dominates each window
        assert len({k[0] for k in got}) == 4
        for ws in {k[0] for k in got}:
            top = max(
                (v[1], v[0]) for k, v in got.items() if k[0] == ws
            )
            assert top[1] == boiler


class TestChunkingProperties:
    def test_reassembly_and_accounting_over_generated_corpus(self, spark):
        """Property sweep in ONE Spark action: for a seeded random corpus
        and several budgets, chunks with no overlap must (a) partition
        the sentence sequence in order, (b) have token counts that sum
        to the doc's total, and (c) match the pure-Python greedy
        reference row-for-row."""
        import random

        from data_validation_engine_spark.llmops.chunking import (
            chunk_by_sentences,
        )

        rng = random.Random(42)
        words = ["Alpha", "beta", "gamma", "delta", "nine", "x1", "Q"]
        docs = []
        for i in range(60):
            sents = []
            for _ in range(rng.randrange(0, 9)):
                n = rng.randrange(1, 7)
                s = " ".join(rng.choice(words) for _ in range(n))
                sents.append(s[0].upper() + s[1:] + rng.choice(".!?"))
            docs.append((i, " ".join(sents)))
        df = spark.createDataFrame(docs, "id long, text string")
        for mt in (3, 7, 50):
            rows = chunk_by_sentences(
                df, "id", "text", max_tokens=mt
            ).collect()
            got = {}
            for r in rows:
                got.setdefault(r["id"], []).append(r)
            for rid, text in docs:
                want = _py_chunks(text, mt)
                have = sorted(
                    got.get(rid, []), key=lambda r: r["chunk_idx"]
                )
                assert len(have) == len(want), (rid, mt)
                for h, w in zip(have, want):
                    assert h["text"] == w["text"], (rid, mt)
                    assert h["n_tokens"] == w["n_tokens"]
                # (a)+(b): ov=0 chunks partition the sentences in order
                joined = " ".join(h["text"] for h in have)
                assert joined == " ".join(_py_sentences(text))
                assert sum(h["n_tokens"] for h in have) == sum(
                    len(s.split()) for s in _py_sentences(text)
                )


class TestLateRound10Steps:
    """Declared-step coverage for the session's last operators: the
    JSON rule-program surface stays complete."""

    def test_heavy_hitters_step(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark, register_functions=False)
        ents = {
            "vals": spark.createDataFrame([("a",)] * 30 + [("b",)] * 3,
                                          "v string")
        }
        eng.evaluate(ents, config=parse_step({
            "operation": "heavy_hitters", "entity_name": "vals",
            "value_column": "v", "min_count": 10,
            "new_entity_name": "hh"}))
        assert [tuple(r) for r in ents["hh"].collect()] == [("a", 30)]

    def test_interleave_step(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark, register_functions=False)
        ents = {"mix": spark.createDataFrame(
            [(f"d{i}", "x" if i % 2 else "y") for i in range(20)],
            "doc string, src string")}
        eng.evaluate(ents, config=parse_step({
            "operation": "interleave_sources", "entity_name": "mix",
            "source_column": "src", "weights": {"x": 1.0, "y": 1.0},
            "key_column": "doc", "new_entity_name": "ordered"}))
        assert ents["ordered"].count() == 20
        assert "interleave_order" in ents["ordered"].columns

    def test_anchor_texts_step(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark, register_functions=False)
        ents = {"pages": spark.createDataFrame(
            [(1, '<a href="https://a.ex/">Go &amp; see</a>')],
            "id long, html string")}
        eng.evaluate(ents, config=parse_step({
            "operation": "extract_anchor_texts", "entity_name": "pages",
            "new_entity_name": "anchors"}))
        [r] = ents["anchors"].collect()
        assert r["href"] == "https://a.ex/"
        assert r["anchor_text"] == "Go & see"

    def test_hard_negatives_step(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark, register_functions=False)
        ents = {"vecs": spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in range(5)]
            + [(10 + i, [0.7, 0.714]) for i in range(5)],
            "vec_id long, embedding array<double>")}
        eng.evaluate(ents, config=parse_step({
            "operation": "hard_negative_samples", "entity_name": "vecs",
            "k": 2, "dim": 2, "n_planes": 1,
            "min_cosine": 0.5, "max_cosine": 0.9,
            "new_entity_name": "hards"}))
        assert ents["hards"].count() > 0
