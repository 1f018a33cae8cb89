"""Round-9 session-B operators: temperature corpus mixing."""

from __future__ import annotations

import pytest


class TestTemperatureMix:
    def test_temperature_targets_math(self):
        from data_validation_engine_spark.llmops.split import (
            temperature_targets,
        )

        totals = {"web": 900, "code": 90, "books": 10}
        # alpha=1 reproduces natural shares exactly
        nat = temperature_targets(totals, 1.0)
        assert nat == {"web": 0.9, "code": 0.09, "books": 0.01}
        # alpha<1 compresses the spread strictly toward uniform
        t = temperature_targets(totals, 0.5)
        assert t["web"] < 0.9 and t["books"] > 0.01
        assert abs(sum(t.values()) - 1.0) < 1e-12
        # ordering preserved
        assert t["web"] > t["code"] > t["books"]
        # zero-token sources drop out; empty totals -> empty targets
        assert "dead" not in temperature_targets({**totals, "dead": 0}, 0.5)
        assert temperature_targets({}, 0.5) == {}
        with pytest.raises(ValueError, match="alpha"):
            temperature_targets(totals, 0.0)

    def test_corpus_mix_temperature_path(self, spark):
        from data_validation_engine_spark.llmops.split import (
            corpus_mix,
            temperature_targets,
        )

        rows = (
            [(f"w{i}", "web", 100) for i in range(400)]
            + [(f"c{i}", "code", 100) for i in range(100)]
        )
        df = spark.createDataFrame(rows, "key string, src string, toks int")
        # the temperature path must equal the explicit-targets path fed
        # with the shares it derives
        totals = {"web": 40_000, "code": 10_000}
        explicit = corpus_mix(
            df, "key", "src", "toks",
            temperature_targets(totals, 0.5), 20_000,
        )
        derived = corpus_mix(
            df, "key", "src", "toks", None, 20_000, temperature=0.5
        )
        assert sorted(r.key for r in derived.collect()) == sorted(
            r.key for r in explicit.collect()
        )
        # exactly one of targets/temperature
        with pytest.raises(ValueError, match="exactly one"):
            corpus_mix(df, "key", "src", "toks", None, 10)
        with pytest.raises(ValueError, match="exactly one"):
            corpus_mix(
                df, "key", "src", "toks", {"web": 1.0}, 10, temperature=0.5
            )

    def test_declared_temperature_step(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [(f"k{i}", "a" if i % 5 else "b", 10) for i in range(200)],
            "key string, src string, t int",
        )
        eng = StepEngine(spark, register_functions=False)
        ents = {"corpus": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "corpus_mix",
                    "entity_name": "corpus",
                    "key_column": "key",
                    "label_column": "src",
                    "weight_column": "t",
                    "temperature": 0.5,
                    "budget": 1_000,
                    "new_entity_name": "mixed",
                }
            ),
        )
        kept = ents["mixed"].groupBy("src").count().collect()
        got = {r.src: r["count"] for r in kept}
        # both sources survive and the minority source is over-sampled
        # relative to its natural share under alpha < 1
        assert set(got) == {"a", "b"}


class TestTrainingShards:
    def test_export_manifest_and_determinism(self, spark, tmp_path):
        from data_validation_engine_spark.scale import write_training_shards

        df = spark.createDataFrame(
            [(f"doc{i}", f"text {i}") for i in range(500)],
            "id string, text string",
        )
        d1 = str(tmp_path / "exp1")
        m1 = write_training_shards(df, d1, "id", n_shards=4).collect()
        assert [r["shard"] for r in m1] == [0, 1, 2, 3]
        assert sum(r["n_rows"] for r in m1) == 500
        # shards are equal-sized in expectation (contiguous hash ranges)
        for r in m1:
            assert 60 <= r["n_rows"] <= 190
        # hash ranges are disjoint and ordered: shard k's max < k+1's min
        for a, b in zip(m1, m1[1:]):
            assert a["max_hash"] < b["min_hash"]

        # byte-identical manifest on re-export, even repartitioned
        d2 = str(tmp_path / "exp2")
        m2 = write_training_shards(
            df.repartition(7), d2, "id", n_shards=4
        ).collect()
        assert [tuple(r) for r in m1] == [tuple(r) for r in m2]

        # a different seed is a different epoch order
        d3 = str(tmp_path / "exp3")
        m3 = write_training_shards(
            df, d3, "id", n_shards=4, seed="epoch2"
        ).collect()
        assert [tuple(r) for r in m3] != [tuple(r) for r in m1]

        # in-shard file content is sorted by the shuffle hash
        out = spark.read.parquet(d1)
        rows = out.where("shard = 0").select("__hash").collect()
        hashes = [r["__hash"] for r in rows]
        assert hashes == sorted(hashes)
        # nothing lost or duplicated
        assert sorted(r["id"] for r in out.select("id").collect()) == sorted(
            f"doc{i}" for i in range(500)
        )

    def test_max_records_per_file_and_validation(self, spark, tmp_path):
        import pytest as _pytest

        from data_validation_engine_spark.scale import write_training_shards

        df = spark.createDataFrame(
            [(f"k{i}",) for i in range(200)], "id string"
        )
        dest = str(tmp_path / "chunked")
        m = write_training_shards(
            df, dest, "id", n_shards=2, max_records_per_file=25
        ).collect()
        for r in m:
            # ceil(n_rows/25) files per shard
            assert r["n_files"] == -(-r["n_rows"] // 25)
        with _pytest.raises(ValueError, match="n_shards"):
            write_training_shards(df, dest, "id", n_shards=0)
        with _pytest.raises(ValueError, match="destination"):
            write_training_shards(df, "", "id", n_shards=2)


class TestNormalizeText:
    CASES = [
        ("t1", "ﬁsh ＦＵＬＬ ① ²"),          # ligature, full-width, circled, superscript
        ("t2", "a​b﻿c\x07d"),      # zero-width, BOM, bell
        ("t3", "line1\r\nline2\rline3"),     # CRLF / CR folding
        ("t4", "  a \t  b  \n\n\n\n c  "),   # whitespace collapse
        ("t5", None),                         # NULL stays NULL
        ("t6", "café"),                       # already-NFC text unchanged
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.CASES, "id string, text string")

    def test_nfkc_matches_unicodedata(self, spark):
        import unicodedata

        from data_validation_engine_spark.llmops.normalize import (
            normalize_text,
        )

        got = {
            r["id"]: r["text"]
            for r in normalize_text(
                self._df(spark), "text", form="NFKC", strip_control=False
            ).collect()
        }
        for cid, raw in self.CASES:
            want = (
                unicodedata.normalize("NFKC", raw)
                if raw is not None
                else None
            )
            assert got[cid] == want, cid

    def test_control_strip_and_whitespace(self, spark):
        from data_validation_engine_spark.llmops.normalize import (
            normalize_text,
        )

        out = {
            r["id"]: r["text"]
            for r in normalize_text(
                self._df(spark),
                "text",
                form=None,
                collapse_whitespace=True,
            ).collect()
        }
        assert out["t2"] == "abcd"
        assert out["t3"] == "line1\nline2\nline3"
        assert out["t4"] == "a b\n\nc"
        assert out["t5"] is None

    def test_jvm_only_path_has_no_python(self, spark):
        from data_validation_engine_spark.llmops.normalize import (
            normalize_text,
        )

        df = self._df(spark)
        pure = normalize_text(df, "text", form=None)
        plan = pure._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "Exchange" not in plan
        arrow = normalize_text(df, "text", form="NFKC")
        plan2 = arrow._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan2  # batched, not row-at-a-time

        import pytest as _pytest

        with _pytest.raises(ValueError, match="form"):
            normalize_text(df, "text", form="NFKX")

    def test_declared_step(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark, register_functions=False)
        ents = {"docs": self._df(spark)}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "normalize_text",
                    "entity_name": "docs",
                    "text_column": "text",
                    "lowercase": True,
                    "collapse_whitespace": True,
                    "output_column": "clean",
                    "new_entity_name": "normed",
                }
            ),
        )
        row = {r["id"]: r["clean"] for r in ents["normed"].collect()}
        assert row["t1"] == "fish full 1 2"
        assert row["t5"] is None


class TestCountMinSketch:
    def test_never_undercounts_and_is_tight_when_wide(self, spark):
        from data_validation_engine_spark.llmops.sketch import (
            cms_build,
            cms_query,
        )

        # zipf-ish: value v_i appears i times
        rows = [(f"v{i}",) for i in range(1, 30) for _ in range(i)]
        df = spark.createDataFrame(rows, "val string")
        sketch = cms_build(df, "val", depth=4, width=2048)
        cand = spark.createDataFrame(
            [(f"v{i}",) for i in range(1, 30)] + [("absent",)],
            "val string",
        )
        est = {
            r["val"]: r["n_est"]
            for r in cms_query(
                sketch, cand, "val", depth=4, width=2048
            ).collect()
        }
        for i in range(1, 30):
            assert est[f"v{i}"] >= i  # one-sided
            # 29 distinct values in 4x2048 cells: collisions ~0
            assert est[f"v{i}"] == i
        assert est["absent"] == 0

    def test_merge_equals_union_build(self, spark):
        from data_validation_engine_spark.llmops.sketch import (
            cms_build,
            cms_merge,
        )

        a = spark.createDataFrame(
            [("x",)] * 5 + [("y",)] * 2, "val string"
        )
        b = spark.createDataFrame(
            [("x",)] * 3 + [("z",)] * 7, "val string"
        )
        merged = cms_merge(cms_build(a, "val").union(cms_build(b, "val")))
        direct = cms_build(a.union(b), "val")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_weighted_grouped_and_declared(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [("en", "tok_a", 10), ("en", "tok_a", 5), ("fr", "tok_a", 2)],
            "lang string, tok string, w int",
        )
        eng = StepEngine(spark, register_functions=False)
        ents = {"toks": df, "cand": df.select("lang", "tok").distinct()}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "cms_sketch",
                    "entity_name": "toks",
                    "value_column": "tok",
                    "weight_column": "w",
                    "group_by": ["lang"],
                    "new_entity_name": "sk",
                }
            ),
        )
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "cms_sketch",
                    "mode": "query",
                    "entity_name": "cand",
                    "sketch_name": "sk",
                    "value_column": "tok",
                    "group_by": ["lang"],
                    "new_entity_name": "est",
                }
            ),
        )
        est = {
            (r["lang"], r["tok"]): r["n_est"]
            for r in ents["est"].collect()
        }
        assert est[("en", "tok_a")] == 15
        assert est[("fr", "tok_a")] == 2

        import pytest as _pytest

        with _pytest.raises(ValueError, match="sketch_name"):
            eng.evaluate(
                ents,
                config=parse_step(
                    {
                        "operation": "cms_sketch",
                        "mode": "query",
                        "entity_name": "cand",
                        "value_column": "tok",
                    }
                ),
            )

    def test_cell_count_bounded(self, spark):
        from data_validation_engine_spark.llmops.sketch import cms_build

        df = spark.createDataFrame(
            [(f"v{i}",) for i in range(5000)], "val string"
        )
        sk = cms_build(df, "val", depth=3, width=64)
        assert sk.count() <= 3 * 64


class TestWebIngestion:
    HTML = (
        "<!DOCTYPE html><html><head><title>T</title>"
        "<style>body { color: red; }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- comment --><h1>Header</h1>"
        "<p>Para <b>one</b> &amp; friends.</p>"
        "<ul><li>a</li><li>b</li></ul>"
        "<div>5 &lt; 6 &gt; 4 &nbsp; ok &#39;q&#39;</div>"
        "<p>num &#8212; dash</p></body></html>"
    )

    def test_extract_basic(self, spark):
        from data_validation_engine_spark.llmops.web import (
            extract_html_text,
        )

        df = spark.createDataFrame(
            [("d1", self.HTML), ("d2", None)], "id string, html string"
        )
        out = {
            r["id"]: r["text"]
            for r in extract_html_text(df, "html").collect()
        }
        t = out["d1"]
        assert "Header" in t and "Para one & friends." in t
        assert "color: red" not in t and "not text" not in t
        assert "comment" not in t
        assert "5 < 6 > 4" in t and "'q'" in t
        # block boundaries became line breaks (open+close each emit one,
        # collapsed to a blank line between items)
        assert "a\n\nb" in t
        # basic mode leaves numeric entities; full decodes them
        assert "&#8212;" in t
        assert out["d2"] is None

        full = extract_html_text(df, "html", unescape="full").collect()
        t2 = {r["id"]: r["text"] for r in full}["d1"]
        assert "— dash" in t2 and "&#8212;" not in t2

        import pytest as _pytest

        with _pytest.raises(ValueError, match="unescape"):
            extract_html_text(df, "html", unescape="nope")

    def test_parse_json_column(self, spark):
        from data_validation_engine_spark.llmops.web import (
            parse_json_column,
        )

        df = spark.createDataFrame(
            [
                ("a", '{"url": "http://x", "ts": 5}'),
                ("b", "{broken"),
                ("c", None),
            ],
            "id string, meta string",
        )
        out = {
            r["id"]: r
            for r in parse_json_column(
                df, "meta", "url STRING, ts BIGINT"
            ).collect()
        }
        assert out["a"]["parsed"]["url"] == "http://x"
        assert out["a"]["parsed"]["ts"] == 5 and out["a"]["is_valid"]
        assert out["b"]["parsed"] is None and not out["b"]["is_valid"]
        assert out["c"]["parsed"] is None and out["c"]["is_valid"]

    def test_declared_steps_and_zero_shuffle(self, spark):
        from data_validation_engine_spark.llmops.web import (
            extract_html_text,
            parse_json_column,
        )
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [("d1", self.HTML, '{"lang": "en"}')],
            "id string, html string, meta string",
        )
        plan = extract_html_text(
            df, "html"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "EvalPython" not in plan
        plan2 = parse_json_column(
            df, "meta", "lang STRING"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan2

        eng = StepEngine(spark, register_functions=False)
        ents = {"crawl": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "extract_html_text",
                    "entity_name": "crawl",
                    "html_column": "html",
                    "new_entity_name": "texts",
                }
            ),
        )
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "parse_json",
                    "entity_name": "texts",
                    "json_column": "meta",
                    "json_schema": "lang STRING",
                    "new_entity_name": "typed",
                }
            ),
        )
        row = ents["typed"].first()
        assert row["parsed"]["lang"] == "en" and "Header" in row["text"]


class TestMaterializePacks:
    def test_agrees_with_pack_sequences_and_reassembles(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            materialize_packs,
            pack_sequences,
        )

        # docs with deliberately awkward lengths so several spill
        docs = [
            (f"d{i:02d}", list(range(i * 100, i * 100 + n)))
            for i, n in enumerate([7, 13, 2, 29, 5, 17, 1, 40, 3, 11])
        ]
        df = spark.createDataFrame(
            [(d, ids) for d, ids in docs], "id string, ids array<int>"
        )
        cap, shards = 16, 3
        packs = materialize_packs(
            df, "id", "ids", capacity=cap, n_shards=shards
        ).collect()

        # 1. every non-final pack per shard is exactly full
        by_shard = {}
        for r in packs:
            by_shard.setdefault(r["shard"], []).append(r)
        for sh, rows in by_shard.items():
            rows.sort(key=lambda r: r["pack_idx"])
            assert [r["pack_idx"] for r in rows] == list(range(len(rows)))
            for r in rows[:-1]:
                assert r["n_tokens"] == cap, (sh, r["pack_idx"])
            assert 0 < rows[-1]["n_tokens"] <= cap

        # 2. concatenating each doc's spans across packs reproduces it
        got = {}
        for r in packs:
            for s in r["doc_spans"]:
                piece = r["input_ids"][s["start"] : s["start"] + s["len"]]
                got.setdefault(s["id"], []).append(
                    (r["shard"], r["pack_idx"], s["start"], piece)
                )
        want = dict(docs)
        for did, parts in got.items():
            parts.sort(key=lambda p: p[1])  # pack order within shard
            flat = [t for p in parts for t in p[3]]
            assert flat == want[did], did

        # 3. placement agrees with pack_sequences' arithmetic
        texts = spark.createDataFrame(
            [(d, " ".join("x" for _ in ids)) for d, ids in docs],
            "id string, text string",
        )
        ps = {
            r["id"]: (r["shard"], r["pack_idx"], r["pack_offset"])
            for r in pack_sequences(
                texts, "id", "text", capacity=cap, n_shards=shards
            ).collect()
        }
        for did, parts in got.items():
            first = min(parts, key=lambda p: p[1])
            assert ps[did] == (first[0], first[1], first[2]), did

    def test_padding_and_csv_input(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            materialize_packs,
        )

        df = spark.createDataFrame(
            [("a", "1,2,3"), ("b", "4,5"), ("c", None), ("d", "")],
            "id string, ids_csv string",
        )
        out = materialize_packs(
            df, "id", "ids_csv", capacity=4, n_shards=1, pad_id=0
        ).collect()
        # c (NULL) and d ('' splits to ['']->NULL cast... zero valid) drop
        total = sum(r["n_tokens"] for r in out)
        assert total == 5
        for r in out:
            assert len(r["input_ids"]) == 4  # padded to capacity
        # n_tokens keeps the real count
        last = max(out, key=lambda r: r["pack_idx"])
        assert last["n_tokens"] < 4


class TestErrorSamples:
    def test_bounded_deterministic_and_plan(self, spark):
        from data_validation_engine_spark.messages import Reporting
        from data_validation_engine_spark.sinks.report import error_samples
        from data_validation_engine_spark.steps import StepEngine, parse_step
        from data_validation_engine_spark.steps.sync_filters import (
            apply_sync_filters,
        )

        df = spark.range(100).selectExpr(
            "CAST(id AS INT) AS v", "id AS __record_index__"
        )
        eng = StepEngine(spark, register_functions=False)
        ents = {"t": df}
        msgs = apply_sync_filters(
            ents,
            [
                parse_step(
                    {
                        "operation": "filter",
                        "entity_name": "t",
                        "expression": "v % 2 = 0",
                        "reporting": {
                            "code": "ODD",
                            "message": "odd value {{v}}",
                        },
                    }
                ),
                parse_step(
                    {
                        "operation": "filter",
                        "entity_name": "t",
                        "expression": "v < 90",
                        "reporting": {
                            "code": "BIG",
                            "message": "too big {{v}}",
                        },
                    }
                ),
            ],
        )
        out = error_samples(msgs, per_code=5)
        rows = out.collect()
        by_code = {}
        for r in rows:
            by_code.setdefault(r["error_code"], []).append(
                r["__record_index__"]
            )
        assert len(by_code["ODD"]) == 5
        assert len(by_code["BIG"]) == 5
        # first five failing indices per code, ascending
        assert by_code["ODD"] == [1, 3, 5, 7, 9]
        assert by_code["BIG"] == [90, 91, 92, 93, 94]
        # deterministic under repartitioning
        again = error_samples(
            msgs.repartition(13), per_code=5
        ).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
        # the rank rewrites to WindowGroupLimit below the exchange
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

        import pytest as _pytest

        with _pytest.raises(ValueError, match="per_code"):
            error_samples(msgs, per_code=0)


class TestStreamingCms:
    def test_stream_cells_match_batch(self, spark, tmp_path):
        from data_validation_engine_spark.llmops.sketch import cms_build
        from data_validation_engine_spark.streaming import (
            read_entity_stream,
        )
        from data_validation_engine_spark.streaming.cardinality import (
            streaming_cms_cells,
        )

        rows = [
            (f"2024-01-01 {h:02d}:{m:02d}:00", f"u{(h * 7 + m) % 5}")
            for h in range(6)
            for m in range(0, 60, 7)
        ] + [("2024-01-02 00:00:00", "sentinel")]  # closes all day-1 windows
        src = tmp_path / "cms_src"
        batch = spark.createDataFrame(rows, "ts string, user string").selectExpr(
            "CAST(ts AS TIMESTAMP) ts", "user"
        )
        batch.write.parquet(str(src))

        sdf = streaming_cms_cells(
            read_entity_stream(spark, str(src), batch.schema),
            "ts",
            "user",
            window_seconds=3600,
            depth=3,
            width=64,
            watermark="1 hour",
        )
        out = str(tmp_path / "cms_out")
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "cms_ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["row"], r["col"]): r["n"]
            for r in spark.read.parquet(out).collect()
        }
        assert got, "no windows emitted"

        want_df = cms_build(
            batch.selectExpr(
                "CAST(FLOOR(unix_timestamp(ts) / 3600) * 3600 AS BIGINT)"
                " AS window_start",
                "user",
            ),
            "user",
            group_cols=["window_start"],
            depth=3,
            width=64,
        )
        want = {
            (r["window_start"], r["row"], r["col"]): r["n"]
            for r in want_df.collect()
        }
        # every emitted cell matches batch exactly, and all six day-1
        # hourly windows emitted (the sentinel advanced the watermark)
        for k, v in got.items():
            assert want[k] == v, k
        assert len({k[0] for k in got}) == 6


class TestRandomizedParity:
    """Seeded randomized parity: one Spark job over hundreds of random
    cases per operator, asserted row-by-row against pure-Python
    references (the repo's hypothesis suite stays pure-Python; these
    cover the Spark-side operators with the same breadth)."""

    def test_render_chat_random_conversations(self, spark):
        import random

        from data_validation_engine_spark.llmops.chat import render_chat

        rng = random.Random(42)
        alphabet = "ab é—\t.<|>&#"
        roles = ["user", "assistant", "system", "tool", "", None]
        convs = []
        for i in range(300):
            turns = [
                (
                    rng.choice(roles),
                    None
                    if rng.random() < 0.1
                    else "".join(
                        rng.choice(alphabet)
                        for _ in range(rng.randrange(0, 12))
                    ),
                )
                for _ in range(rng.randrange(0, 6))
            ]
            convs.append((f"c{i}", turns))
        df = spark.createDataFrame(
            convs,
            "id string, conversation array<struct<role string,"
            " content string>>",
        )
        got = {
            r["id"]: r for r in render_chat(df, "id", "conversation").collect()
        }
        for cid, turns in convs:
            text, off = "", 0
            spans = []
            for t, (role, content) in enumerate(turns):
                role = role or ""
                content = content or ""
                text += "<|" + role + "|>\n" + content + "<|end|>\n"
                start = off + len("<|") + len(role) + len("|>\n")
                spans.append((t, role, start, start + len(content)))
                off = start + len(content) + len("<|end|>\n")
            r = got[cid]
            assert r["text"] == text, cid
            assert [
                (s["turn"], s["role"], s["start"], s["end"])
                for s in r["spans"]
            ] == spans, cid
            for (_, content), s in zip(turns, r["spans"]):
                assert text[s["start"] : s["end"]] == (content or "")

    def test_materialize_packs_random_conservation(self, spark):
        import random

        from data_validation_engine_spark.llmops.chunking import (
            materialize_packs,
        )

        rng = random.Random(7)
        docs = [
            (f"d{i:03d}", [rng.randrange(1000) for _ in range(rng.randrange(0, 60))])
            for i in range(250)
        ]
        df = spark.createDataFrame(docs, "id string, ids array<int>")
        for cap in (8, 31, 128):
            rows = materialize_packs(
                df, "id", "ids", capacity=cap, n_shards=5
            ).collect()
            # conservation: every token lands exactly once, in order
            rebuilt = {}
            for r in rows:
                assert len(r["input_ids"]) == r["n_tokens"] <= cap
                for s in r["doc_spans"]:
                    rebuilt.setdefault(s["id"], []).append(
                        (r["pack_idx"], r["input_ids"][s["start"]:s["start"] + s["len"]])
                    )
            for did, ids in docs:
                if not ids:
                    assert did not in rebuilt
                    continue
                parts = sorted(rebuilt[did])
                assert [t for _, p in parts for t in p] == ids, (did, cap)

    def test_cms_random_never_undercounts(self, spark):
        import random
        from collections import Counter

        from data_validation_engine_spark.llmops.sketch import (
            cms_build,
            cms_query,
        )

        rng = random.Random(3)
        vals = [f"v{rng.randrange(40)}" for _ in range(3000)]
        truth = Counter(vals)
        df = spark.createDataFrame([(v,) for v in vals], "val string")
        sk = cms_build(df, "val", depth=3, width=128)
        cand = spark.createDataFrame(
            [(v,) for v in truth], "val string"
        )
        est = {
            r["val"]: r["n_est"]
            for r in cms_query(sk, cand, "val", depth=3, width=128).collect()
        }
        for v, n in truth.items():
            assert est[v] >= n, v

    def test_query_null_group_key_never_undercounts(self, spark):
        # groupBy keeps NULL as a real group; the probe join must be
        # null-safe on group cols or NULL-group probes read n_est=0
        from data_validation_engine_spark.llmops.sketch import (
            cms_build,
            cms_query,
        )

        rows = [("en", "x")] * 5 + [(None, "x")] * 7 + [(None, "y")] * 2
        df = spark.createDataFrame(rows, "lang string, val string")
        sk = cms_build(df, "val", group_cols=["lang"], depth=3, width=64)
        cand = spark.createDataFrame(
            [("en", "x"), (None, "x"), (None, "y"), (None, "z")],
            "lang string, val string",
        )
        est = {
            (r["lang"], r["val"]): r["n_est"]
            for r in cms_query(
                sk, cand, "val", group_cols=["lang"], depth=3, width=64
            ).collect()
        }
        assert est[("en", "x")] >= 5
        assert est[(None, "x")] >= 7
        assert est[(None, "y")] >= 2
        assert est[(None, "z")] >= 0  # absent value still answered


class TestCompressionRatio:
    def test_ratio_matches_zlib_and_separates_quality(self, spark):
        import zlib

        from data_validation_engine_spark.llmops.compress import (
            compression_ratio,
        )

        rows = [
            ("rep", "spam " * 200),
            ("prose", "The quick brown fox jumps over the lazy dog. " * 5
             + "Pack my box with five dozen liquor jugs."),
            ("null", None),
            ("empty", ""),
        ]
        df = spark.createDataFrame(rows, "id string, text string")
        got = {
            r["id"]: r["compression_ratio"]
            for r in compression_ratio(df, "text").collect()
        }
        for cid, text in rows:
            if not text:
                assert got[cid] is None
                continue
            raw = text.encode()
            assert got[cid] == pytest.approx(
                len(zlib.compress(raw, 6)) / len(raw)
            )
        # the quality separation the filter relies on
        assert got["rep"] < 0.1 < got["prose"]

        import pytest as _pytest

        with _pytest.raises(ValueError, match="level"):
            compression_ratio(df, "text", level=0)

    def test_declared_step_arrow_batched(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [("a", "hello world " * 30)], "id string, text string"
        )
        eng = StepEngine(spark, register_functions=False)
        ents = {"docs": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "compression_ratio",
                    "entity_name": "docs",
                    "new_entity_name": "scored",
                }
            ),
        )
        out = ents["scored"]
        assert 0 < out.first()["compression_ratio"] < 1
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan and "Exchange" not in plan


class TestStandardize:
    def test_three_methods_match_python(self, spark):
        import statistics

        from data_validation_engine_spark.llmops.stats import standardize

        vals = {"a": [1.0, 2.0, 3.0, 4.0, 10.0], "b": [5.0, 5.0, 5.0]}
        rows = [
            (g, i, v) for g, vs in vals.items() for i, v in enumerate(vs)
        ] + [("a", 99, None)]
        df = spark.createDataFrame(rows, "g string, i int, v double")

        z = {
            (r["g"], r["i"]): r["scaled"]
            for r in standardize(df, "v", group_cols=["g"]).collect()
        }
        mu = statistics.mean(vals["a"])
        sd = statistics.stdev(vals["a"])
        for i, v in enumerate(vals["a"]):
            assert z[("a", i)] == pytest.approx((v - mu) / sd)
        for i in range(3):
            assert z[("b", i)] == 0.0  # zero spread
        assert z[("a", 99)] is None  # NULL stays NULL

        mm = {
            (r["g"], r["i"]): r["scaled"]
            for r in standardize(
                df, "v", group_cols=["g"], method="minmax"
            ).collect()
        }
        for i, v in enumerate(vals["a"]):
            assert mm[("a", i)] == pytest.approx((v - 1.0) / 9.0)
        assert mm[("b", 0)] == 0.0

        rb = {
            (r["g"], r["i"]): r["scaled"]
            for r in standardize(
                df, "v", group_cols=["g"], method="robust"
            ).collect()
        }
        med = 3.0
        iqr = 4.0 - 2.0  # type-7 quartiles of [1,2,3,4,10]
        for i, v in enumerate(vals["a"]):
            assert rb[("a", i)] == pytest.approx((v - med) / iqr)

        import pytest as _pytest

        with _pytest.raises(ValueError, match="method"):
            standardize(df, "v", method="nope")
        with _pytest.raises(ValueError, match="ddof"):
            standardize(df, "v", ddof=2)

    def test_robust_quoted_name_and_string_numeric(self, spark):
        # robust must use the same casted column as zscore/minmax: a
        # column name needing backticks and a string-typed numeric
        # column both work identically across methods
        from data_validation_engine_spark.llmops.stats import standardize

        df = spark.createDataFrame(
            [("a", "1"), ("a", "2"), ("a", "3"), ("a", "4"), ("a", "10")],
            ["g", "my value"],
        )
        rb = sorted(
            r["scaled"]
            for r in standardize(
                df, "my value", group_cols=["g"], method="robust"
            ).collect()
        )
        med, iqr = 3.0, 2.0
        want = sorted((v - med) / iqr for v in [1, 2, 3, 4, 10])
        assert rb == pytest.approx(want)

    def test_broadcast_stats_escape_flag(self, spark):
        # broadcast_stats=False drops the hard-coded hint so AQE picks
        # the join strategy from the measured stats-frame size
        from data_validation_engine_spark.llmops.stats import standardize

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("b", 3.0)], "g string, v double"
        )
        hinted = standardize(df, "v", group_cols=["g"])
        plain = standardize(df, "v", group_cols=["g"], broadcast_stats=False)
        hp = hinted._jdf.queryExecution().optimizedPlan().toString()
        pp = plain._jdf.queryExecution().optimizedPlan().toString()
        assert "broadcast" in hp.lower()
        assert "broadcast" not in pp.lower()
        # semantics identical either way
        a = sorted(r["scaled"] for r in hinted.collect())
        b = sorted(r["scaled"] for r in plain.collect())
        assert a == pytest.approx(b)

    def test_global_and_declared(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "i int, v double"
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
                    "method": "minmax",
                    "new_entity_name": "s",
                }
            ),
        )
        got = {r["i"]: r["scaled"] for r in ents["s"].collect()}
        assert got[0] == 0.0 and got[9] == 1.0
        # the broadcast stats join never shuffles the data side
        plan = ents["s"]._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


class TestEodToken:
    def test_eod_appended_per_doc_and_conserved(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            materialize_packs,
        )

        docs = [("a", [1, 2, 3]), ("b", [4]), ("c", []), ("d", [5, 6])]
        df = spark.createDataFrame(docs, "id string, ids array<int>")
        rows = materialize_packs(
            df, "id", "ids", capacity=4, n_shards=1, eod_id=99
        ).collect()
        total = sum(r["n_tokens"] for r in rows)
        # 3+1 + 1+1 + 0 + 2+1 = 9 tokens including one EOD per non-empty
        assert total == 9
        rebuilt = {}
        for r in rows:
            for s in r["doc_spans"]:
                rebuilt.setdefault(s["id"], []).append(
                    (r["pack_idx"], list(
                        r["input_ids"][s["start"]:s["start"] + s["len"]]
                    ))
                )
        for did, ids in docs:
            if not ids:
                assert did not in rebuilt
                continue
            flat = [t for _, p in sorted(rebuilt[did]) for t in p]
            assert flat == ids + [99], did  # span covers ids + EOD


class TestSplitSentences:
    def test_segmentation_and_declared(self, spark):
        from data_validation_engine_spark.llmops.paragraphs import (
            split_sentences,
        )
        from data_validation_engine_spark.steps import StepEngine, parse_step

        rows = [
            ("d1", 'One here. Two there! "Three?" Four ends.'),
            ("d2", "no caps here. still one sentence"),
            ("d3", None),
            ("d4", "  "),
            ("d5", "Ends mid"),
        ]
        df = spark.createDataFrame(rows, "id string, text string")
        got = {}
        for r in split_sentences(df, "id", "text").collect():
            got.setdefault(r["id"], []).append(
                (r["sent_idx"], r["sentence"])
            )
        assert [s for _, s in sorted(got["d1"])] == [
            "One here.",
            "Two there!",
            '"Three?"',
            "Four ends.",
        ]
        # caseless continuation does not split
        assert [s for _, s in sorted(got["d2"])] == [
            "no caps here. still one sentence"
        ]
        assert "d3" not in got and "d4" not in got
        assert [s for _, s in sorted(got["d5"])] == ["Ends mid"]

        eng = StepEngine(spark, register_functions=False)
        ents = {"docs": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "split_sentences",
                    "entity_name": "docs",
                    "key_column": "id",
                    "min_chars": 3,
                    "new_entity_name": "sents",
                }
            ),
        )
        assert ents["sents"].count() == sum(
            len(v) for v in got.values()
        )
        plan = ents["sents"]._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestReviewFixes:
    """Regression pins for the round-9 session-B review findings."""

    def test_standardize_null_group_key_scales_correctly(self, spark):
        from data_validation_engine_spark.llmops.stats import standardize

        df = spark.createDataFrame(
            [(None, 1.0), (None, 3.0), ("g", 5.0), ("g", 7.0)],
            "g string, v double",
        )
        out = {
            (r["g"], r["v"]): r["scaled"]
            for r in standardize(
                df, "v", group_cols=["g"], method="minmax"
            ).collect()
        }
        # NULL group is a real group: its rows scale within it, not 0.0
        assert out[(None, 1.0)] == 0.0 and out[(None, 3.0)] == 1.0
        assert out[("g", 5.0)] == 0.0 and out[("g", 7.0)] == 1.0

    def test_temperature_mix_null_labels_dropped_not_crash(self, spark):
        from data_validation_engine_spark.llmops.split import (
            corpus_mix,
            temperature_targets,
        )

        assert temperature_targets({None: 50, "a": 100, "b": None}, 0.5) == {
            "a": 1.0
        }
        df = spark.createDataFrame(
            [("k1", None, 10), ("k2", "a", 10), ("k3", "a", 10)],
            "key string, src string, t int",
        )
        kept = corpus_mix(
            df, "key", "src", "toks" if False else "t", None, 1000,
            temperature=0.5,
        ).collect()
        assert all(r["src"] == "a" for r in kept)

    def test_shard_id_no_overflow_at_large_n_shards(self, spark):
        from data_validation_engine_spark.scale import write_training_shards
        import tempfile

        df = spark.createDataFrame(
            [(f"k{i}",) for i in range(64)], "id string"
        )
        d = tempfile.mkdtemp(prefix="bigshards_")
        m = write_training_shards(df, d + "/e", "id", n_shards=40000)
        rows = m.collect()
        assert all(0 <= r["shard"] < 40000 for r in rows)

    def test_normalize_blank_lines_with_spaces_collapse(self, spark):
        from data_validation_engine_spark.llmops.normalize import (
            normalize_text,
        )

        df = spark.createDataFrame(
            [("x", "p1\n \n \n \np2")], "id string, text string"
        )
        out = normalize_text(
            df, "text", form=None, collapse_whitespace=True
        ).first()["text"]
        assert out == "p1\n\np2"

    def test_cms_counts_null_values(self, spark):
        from data_validation_engine_spark.llmops.sketch import (
            cms_build,
            cms_query,
        )

        df = spark.createDataFrame(
            [(None,)] * 7 + [("x",)] * 3, "val string"
        )
        sk = cms_build(df, "val", depth=3, width=64)
        cand = spark.createDataFrame([(None,), ("x",)], "val string")
        est = {
            r["val"]: r["n_est"]
            for r in cms_query(sk, cand, "val", depth=3, width=64).collect()
        }
        assert est[None] >= 7 and est["x"] >= 3

    def test_pack_csv_corruption_is_loud(self, spark):
        import pytest as _pytest
        from pyspark.errors.exceptions.captured import (
            NumberFormatException,
        )

        from data_validation_engine_spark.llmops.chunking import (
            materialize_packs,
        )

        df = spark.createDataFrame(
            [("a", "1,abc,3")], "id string, ids string"
        )
        with _pytest.raises(NumberFormatException):
            materialize_packs(
                df, "id", "ids", capacity=4, n_shards=1
            ).collect()

    def test_token_mask_plan_folds_offsets_once(self, spark):
        from data_validation_engine_spark.llmops.chat import (
            token_loss_mask,
        )

        df = spark.createDataFrame(
            [("d", "a b c", [])],
            "id string, text string,"
            " mask_spans array<struct<start bigint, end bigint>>",
        )
        out = token_loss_mask(df, "id", "text", "mask_spans")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the offset fold appears once (the staged projection), not once
        # per mask element
        assert plan.count("aggregate(") <= 3
        r = out.first()
        assert list(r["token_starts"]) == [0, 2, 4]
        assert list(r["loss_mask"]) == [False, False, False]


class TestOverwritePartitions:
    def test_only_touched_partitions_replaced(self, spark, tmp_path):
        from data_validation_engine_spark.sinks.entities import (
            overwrite_partitions,
        )

        uri = str(tmp_path / "tbl")
        day1 = spark.createDataFrame(
            [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)],
            "day string, v int",
        )
        overwrite_partitions(day1, uri, ["day"])
        # re-load day 2 with corrected data; day 1 must survive intact
        fix2 = spark.createDataFrame(
            [("2024-01-02", 30), ("2024-01-02", 31)], "day string, v int"
        )
        overwrite_partitions(fix2, uri, ["day"])
        got = {
            (r["day"], r["v"])
            # partition-column inference reads the dir value back as a
            # DATE; compare on its ISO string
            for r in spark.read.parquet(uri)
            .selectExpr("CAST(day AS STRING) day", "v")
            .collect()
        }
        assert got == {
            ("2024-01-01", 1),
            ("2024-01-01", 2),
            ("2024-01-02", 30),
            ("2024-01-02", 31),
        }
        # replaying the same batch converges (idempotent retry)
        overwrite_partitions(fix2, uri, ["day"])
        assert spark.read.parquet(uri).count() == 4

        import pytest as _pytest

        with _pytest.raises(ValueError, match="partition column"):
            overwrite_partitions(day1, uri, [])


class TestStatelessOpsOnStreams:
    def test_normalize_and_html_extract_run_on_a_stream(
        self, spark, tmp_path
    ):
        """The per-row corpus operators are stateless projections, so
        they lift onto Structured Streaming unchanged — pin that the
        plans are actually streamable (no batch-only construct)."""
        from data_validation_engine_spark.llmops.normalize import (
            normalize_text,
        )
        from data_validation_engine_spark.llmops.web import (
            extract_html_text,
            parse_json_column,
        )
        from data_validation_engine_spark.streaming import (
            read_entity_stream,
        )

        src = tmp_path / "stream_src"
        batch = spark.createDataFrame(
            [("a", "<p>Héllo&amp;co</p>", '{"lang":"en"}')],
            "id string, html string, meta string",
        )
        batch.write.parquet(str(src))
        sdf = read_entity_stream(spark, str(src), batch.schema)
        piped = parse_json_column(
            normalize_text(
                extract_html_text(sdf, "html"),
                "text",
                collapse_whitespace=True,
            ),
            "meta",
            "lang STRING",
        )
        assert piped.isStreaming
        out = str(tmp_path / "stream_out")
        q = (
            piped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "stream_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        row = spark.read.parquet(out).first()
        assert row["text"] == "Héllo&co"
        assert row["parsed"]["lang"] == "en" and row["is_valid"]


class TestHeavyHitters:
    def test_identical_to_exact_groupby(self, spark):
        from data_validation_engine_spark.llmops.sketch import heavy_hitters

        # zipf-ish: value v{i} appears ~1000/i times
        rows = [(f"v{i}",) for i in range(1, 40) for _ in range(1000 // i)]
        df = spark.createDataFrame(rows, "val string").repartition(8)
        got = sorted(
            map(tuple, heavy_hitters(df, "val", 100, width=256).collect())
        )
        want = sorted(
            map(
                tuple,
                df.groupBy("val")
                .count()
                .where("count >= 100")
                .selectExpr("val", "count AS n")
                .collect(),
            )
        )
        assert got == want and len(got) == 10  # 1000/i >= 100 for i<=10

    def test_weighted_and_validation(self, spark):
        import pytest as _pytest

        from data_validation_engine_spark.llmops.sketch import heavy_hitters

        df = spark.createDataFrame(
            [("a", 60), ("a", 50), ("b", 10), ("c", 200)],
            "val string, w int",
        )
        got = {
            r["val"]: r["n"]
            for r in heavy_hitters(df, "val", 100, weight_col="w").collect()
        }
        assert got == {"a": 110, "c": 200}
        with _pytest.raises(ValueError):
            heavy_hitters(df, "val", 0)

    def test_screen_prunes_before_the_shuffle(self, spark):
        from data_validation_engine_spark.llmops.sketch import heavy_hitters

        rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(2000)]
        df = spark.createDataFrame(rows, "val string")
        out = heavy_hitters(df, "val", 100, width=4096)
        assert [tuple(r) for r in out.collect()] == [("hot", 500)]
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the filter must sit below the aggregate's exchange
        assert plan.index("Filter") > -1
        assert "CartesianProduct" not in plan
