"""Round-6 second-wave operators: KMV sketch, exact grouped quantiles,
column profiling, blocked fuzzy join, BM25, PageRank — library semantics,
determinism under repartitioning, and step-engine dispatch."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.analytics import (
    grouped_quantiles,
    profile_columns,
)
from data_validation_engine_spark.llmops.graph import pagerank
from data_validation_engine_spark.llmops.linkage import (
    fuzzy_dedup_pairs,
    fuzzy_string_join,
)
from data_validation_engine_spark.llmops.sketch import (
    kmv_distinct,
    kmv_hash,
    kmv_merge,
)
from data_validation_engine_spark.llmops.text import bm25_search
from data_validation_engine_spark.steps.configs import parse_step
from data_validation_engine_spark.steps.engine import StepEngine


def _py_kmv(values, k, seed=""):
    """Reference KMV in pure python over md5."""
    hs = sorted(
        {
            int(hashlib.md5((seed + str(v)).encode()).hexdigest()[:15], 16)
            for v in values
        }
    )
    if len(hs) < k:
        return len(hs), None, float(len(hs))
    kth = hs[k - 1]
    return k, kth, (k - 1) * float(1 << 60) / kth


class TestKmvSketch:
    def test_exact_below_k(self, spark):
        rows = [(0, f"v{i % 7}") for i in range(100)]
        df = spark.createDataFrame(rows, "g int, v string")
        out = kmv_distinct(df, ["g"], "v", k=64).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.n_seen, r.kth_hash, r.approx_distinct) == (7, None, 7.0)

    def test_matches_pure_python_formula(self, spark):
        rows = [(g, f"u{(i * 37) % 500}") for g in (0, 1) for i in range(2000)]
        df = spark.createDataFrame(rows, "g int, v string")
        out = {
            r.g: (r.n_seen, r.kth_hash, r.approx_distinct)
            for r in kmv_distinct(df, ["g"], "v", k=32).collect()
        }
        for g in (0, 1):
            vals = [v for gg, v in rows if gg == g]
            assert out[g] == _py_kmv(vals, 32)

    def test_estimate_accuracy(self, spark):
        true_n = 5000
        rows = [(0, f"item-{i}") for i in range(true_n)] * 3
        df = spark.createDataFrame(rows, "g int, v string")
        est = kmv_distinct(df, ["g"], "v", k=256).collect()[0].approx_distinct
        # k=256 => ~6% relative error at 1 sigma; allow 4 sigma
        assert abs(est - true_n) / true_n < 0.25

    def test_partitioning_invariance(self, spark):
        rows = [(i % 4, f"x{i % 977}") for i in range(5000)]
        df = spark.createDataFrame(rows, "g int, v string")
        a = {
            (r.g, r.n_seen, r.kth_hash, r.approx_distinct)
            for r in kmv_distinct(df, ["g"], "v", k=64).collect()
        }
        b = {
            (r.g, r.n_seen, r.kth_hash, r.approx_distinct)
            for r in kmv_distinct(
                df.repartition(13), ["g"], "v", k=64
            ).collect()
        }
        assert a == b

    def test_merge_equals_global_sketch(self, spark):
        rows = [(0, f"m{i}") for i in range(3000)]
        df = spark.createDataFrame(rows, "g int, v string")
        # shard the data, keep each shard's min-k hash rows, merge
        shard_a = df.where(F.length("v") % 2 == 0)
        shard_b = df.where(F.length("v") % 2 == 1)
        k = 64
        parts = []
        for shard in (shard_a, shard_b):
            hashed = shard.select(
                "g", kmv_hash(F.col("v")).alias("__hv")
            ).distinct()
            from pyspark.sql import Window

            w = Window.partitionBy("g").orderBy("__hv")
            parts.append(
                hashed.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= k)
                .select("g", "__hv")
            )
        merged = kmv_merge(parts[0].unionAll(parts[1]), ["g"], k=k).collect()[0]
        direct = kmv_distinct(df, ["g"], "v", k=k).collect()[0]
        assert (merged.n_seen, merged.kth_hash, merged.approx_distinct) == (
            direct.n_seen,
            direct.kth_hash,
            direct.approx_distinct,
        )

    def test_k_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "g int, v string")
        with pytest.raises(ValueError):
            kmv_distinct(df, ["g"], "v", k=1)


class TestGroupedQuantiles:
    def test_matches_manual_interpolation(self, spark):
        xs = [1.0, 2.0, 3.0, 4.0, 10.0]
        df = spark.createDataFrame([(0, x) for x in xs], "g int, x double")
        r = grouped_quantiles(df, "g", "x", [0.0, 0.5, 0.75, 1.0]).collect()[0]
        assert r.n == 5
        assert (r.q_0, r.q_50, r.q_100) == (1.0, 3.0, 10.0)
        assert r.q_75 == 4.0 + (10.0 - 4.0) * 0.0  # pos = .75*4 = 3.0 exact
        r2 = grouped_quantiles(df, "g", "x", [0.625]).collect()[0]
        # pos = 0.625*4 = 2.5 -> 3 + 0.5*(4-3)
        assert r2.q_62_5 == 3.5

    def test_nulls_and_groups(self, spark):
        rows = [(0, 1.0), (0, None), (0, 3.0), (1, 5.0)]
        df = spark.createDataFrame(rows, "g int, x double")
        out = {r.g: (r.n, r.q_50) for r in grouped_quantiles(df, "g", "x", [0.5]).collect()}
        # n counts rows; percentile ignores nulls
        assert out == {0: (3, 2.0), 1: (1, 5.0)}

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, 1.0)], "g int, x double")
        with pytest.raises(ValueError):
            grouped_quantiles(df, "g", "x", [])
        with pytest.raises(ValueError):
            grouped_quantiles(df, "g", "x", [1.5])


class TestProfileColumns:
    def test_profile_shapes(self, spark):
        rows = [(1, "a", None), (2, "b", 1.5), (2, None, 2.5)]
        df = spark.createDataFrame(rows, "id int, s string, x double")
        out = {r.column: r for r in profile_columns(df).collect()}
        assert set(out) == {"id", "s", "x"}
        assert (out["id"].n_rows, out["id"].n_null, out["id"].n_distinct) == (3, 0, 2)
        assert (out["s"].n_null, out["s"].n_distinct) == (1, 2)
        assert (out["x"].min_value, out["x"].max_value) == ("1.5", "2.5")

    def test_subset_and_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "id int, s string")
        assert profile_columns(df, ["s"]).count() == 1
        with pytest.raises(ValueError):
            profile_columns(df, ["nope"])


class TestFuzzyJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "Smith"), (2, "Jones"), (3, "Taylor"), (4, "Smyth e")],
            "id int, name string",
        )
        right = spark.createDataFrame(
            [(10, "smith"), (11, "jonez"), (12, "tailor"), (13, "smythe"), (14, "zzz")],
            "rid int, rname string",
        )
        return left, right

    def test_blocked_match_set(self, spark):
        left, right = self._frames(spark)
        got = sorted(
            (r.id, r.r_rid, r.distance)
            for r in fuzzy_string_join(
                left, right, "name", "rname", max_distance=2
            ).collect()
        )
        # 'Taylor'~'tailor' d=2 shares block 'ta'; 'Smyth e'~'smythe' d=1
        assert got == [(1, 10, 0), (1, 13, 2), (2, 11, 1), (3, 12, 1), (4, 13, 1)]

    def test_length_bucket_is_result_invariant(self, spark):
        left, right = self._frames(spark)
        base = sorted(
            (r.id, r.r_rid, r.distance)
            for r in fuzzy_string_join(
                left, right, "name", "rname", max_distance=2
            ).collect()
        )
        for width in (1, 2, 3, 10):
            bucketed = sorted(
                (r.id, r.r_rid, r.distance)
                for r in fuzzy_string_join(
                    left,
                    right,
                    "name",
                    "rname",
                    max_distance=2,
                    length_bucket=width,
                ).collect()
            )
            assert bucketed == base, f"width={width}"

    def test_self_dedup_pairs(self, spark):
        df = spark.createDataFrame(
            [(1, "colour"), (2, "color"), (3, "colour"), (4, "flavour")],
            "id int, t string",
        )
        got = sorted(
            (r.id_a, r.id_b, r.distance)
            for r in fuzzy_dedup_pairs(df, "id", "t", max_distance=1).collect()
        )
        assert got == [(1, 2, 1), (1, 3, 0), (2, 3, 1)]

    def test_validation(self, spark):
        left, right = self._frames(spark)
        with pytest.raises(ValueError):
            fuzzy_string_join(left, right, "name", "rname", max_distance=-1)
        with pytest.raises(ValueError):
            fuzzy_string_join(
                left, right, "name", "rname", length_bucket=0
            )


class TestBm25:
    def test_matches_manual_formula(self, spark):
        texts = {
            1: "apple banana apple",
            2: "apple cherry",
            3: "banana banana banana",
            4: "durian elderberry fig",
        }
        df = spark.createDataFrame(
            [(i, t) for i, t in texts.items()], "doc_id int, text string"
        )
        out = {
            r.doc_id: (r.n_terms_hit, r.score)
            for r in bm25_search(df, "doc_id", "text", "apple banana").collect()
        }
        # manual BM25 (k1=1.2, b=0.75, +1 idf)
        n = 4
        dls = {i: len(t.split()) for i, t in texts.items()}
        avgdl = sum(dls.values()) / n
        dfreq = {"apple": 2, "banana": 2}
        tfs = {
            1: {"apple": 2, "banana": 1},
            2: {"apple": 1},
            3: {"banana": 3},
        }
        expect = {}
        for doc, terms in tfs.items():
            ws = []
            for term in sorted(terms):
                tf = terms[term]
                idf = math.log(
                    1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5)
                )
                w = (
                    idf
                    * (tf * 2.2)
                    / (tf + 1.2 * (0.25 + 0.75 * dls[doc] / avgdl))
                )
                ws.append(round(w, 6))
            acc = 0.0
            for w in ws:
                acc += w
            expect[doc] = (len(ws), acc)
        assert out == pytest.approx(expect)
        assert set(out) == {1, 2, 3}  # doc 4 hits no term

    def test_empty_query_rejected(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
        with pytest.raises(ValueError):
            bm25_search(df, "doc_id", "text", "   ")


class TestPageRank:
    def test_against_power_iteration(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 3), (5, 3), (3, 5)]
        df = spark.createDataFrame(edges, "src int, dst int")
        got = {r.node: r.pagerank for r in pagerank(df, iterations=4).collect()}
        # reference power iteration in plain python (sorted-src fold order)
        nodes = sorted({u for e in edges for u in e})
        n = len(nodes)
        out = {}
        for s, d in edges:
            out.setdefault(s, set()).add(d)
        pr = {v: 1.0 / n for v in nodes}
        for _ in range(4):
            new = {}
            for v in nodes:
                acc = 0.0
                for u in sorted(nodes):
                    if v in out.get(u, ()):
                        acc += pr[u] / len(out[u])
                new[v] = (1.0 - 0.85) / n + 0.85 * acc
            pr = new
        assert got == pytest.approx(pr, abs=1e-12)

    def test_partitioning_invariant_bitwise(self, spark):
        import random

        random.seed(11)
        edges = list(
            {
                (random.randrange(40), random.randrange(40))
                for _ in range(300)
            }
        )
        df = spark.createDataFrame(edges, "src int, dst int")
        a = {r.node: r.pagerank for r in pagerank(df, iterations=3).collect()}
        b = {
            r.node: r.pagerank
            for r in pagerank(df.repartition(17), iterations=3).collect()
        }
        assert a == b  # bit-identical, not approx — the ordered fold

    def test_rank_mass_bounded(self, spark):
        # graph with a sink: total rank <= 1 (leaked dangling mass)
        df = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
        total = sum(
            r.pagerank for r in pagerank(df, iterations=5).collect()
        )
        assert 0.0 < total <= 1.0 + 1e-12

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 2)], "src int, dst int")
        with pytest.raises(ValueError):
            pagerank(df, iterations=0)


class TestStepDispatch:
    def test_all_six_steps_run(self, spark):
        eng = StepEngine(spark, register_functions=False)
        docs = spark.createDataFrame(
            [(i, f"term{i % 5} shared word number {i}") for i in range(50)],
            "doc_id int, text string",
        )
        nums = spark.createDataFrame(
            [(i % 3, float(i)) for i in range(60)], "g int, x double"
        )
        edges = spark.createDataFrame(
            [(i, (i * 7) % 20) for i in range(40)], "src int, dst int"
        )
        names = spark.createDataFrame(
            [(1, "smith"), (2, "taylor")], "id int, name string"
        )
        entities = {
            "docs": docs,
            "nums": nums,
            "edges": edges,
            "names_l": names,
            "names_r": names.select(
                F.col("id").alias("rid"), F.col("name").alias("rname")
            ),
        }
        steps = [
            {
                "operation": "approx_distinct",
                "entity_name": "docs",
                "group_by": [],
                "value_column": "text",
                "new_entity_name": "distinct_est",
            },
            {
                "operation": "grouped_quantiles",
                "entity_name": "nums",
                "group_by": ["g"],
                "value_column": "x",
                "new_entity_name": "quants",
            },
            {
                "operation": "profile",
                "entity_name": "docs",
                "new_entity_name": "prof",
            },
            {
                "operation": "fuzzy_join",
                "entity_name": "names_l",
                "right_entity": "names_r",
                "left_column": "name",
                "right_column": "rname",
                "new_entity_name": "linked",
            },
            {
                "operation": "bm25",
                "entity_name": "docs",
                "id_column": "doc_id",
                "query": "shared term1",
                "new_entity_name": "scored",
            },
            {
                "operation": "pagerank",
                "entity_name": "edges",
                "new_entity_name": "ranks",
            },
        ]
        for raw in steps:
            eng.evaluate(entities, config=parse_step(raw))
        assert entities["distinct_est"].collect()[0].n_seen == 50
        assert entities["quants"].count() == 3
        assert entities["prof"].count() == 2
        assert entities["linked"].count() == 2  # exact self matches
        assert entities["scored"].count() == 50  # every doc has 'shared'
        assert entities["ranks"].count() > 0


class TestEncodeTokens:
    def test_frequency_ranked_ids_and_unk(self, spark):
        from data_validation_engine_spark.llmops import (
            build_vocab,
            encode_tokens,
            vocab_ids,
        )

        docs = spark.createDataFrame(
            [
                (1, "b b b a a c"),
                (2, "b a rare"),
                (3, "b"),
            ],
            "doc_id int, text string",
        )
        vocab = build_vocab(docs, "doc_id", "text", min_count=2)
        ids = {r.term: r.token_id for r in vocab_ids(vocab).collect()}
        # b: 5 occurrences -> id 1; a: 3 -> id 2; c/rare below floor
        assert ids == {"b": 1, "a": 2}
        out = {
            r.doc_id: (r.n_tokens, r.n_unk, r.ids_csv)
            for r in encode_tokens(docs, "doc_id", "text", vocab).collect()
        }
        assert out[1] == (6, 1, "1,1,1,2,2,0")
        assert out[2] == (3, 1, "1,2,0")
        assert out[3] == (1, 0, "1")

    def test_order_exact_under_repartition(self, spark):
        from data_validation_engine_spark.llmops import (
            build_vocab,
            encode_tokens,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(f"t{(i * 7 + j) % 13}" for j in range(30)))
             for i in range(200)],
            "doc_id int, text string",
        )
        vocab = build_vocab(docs, "doc_id", "text")
        a = {r.doc_id: r.ids_csv
             for r in encode_tokens(docs, "doc_id", "text", vocab).collect()}
        b = {r.doc_id: r.ids_csv
             for r in encode_tokens(
                 docs.repartition(17), "doc_id", "text", vocab
             ).collect()}
        assert a == b

    def test_step_dispatch(self, spark):
        from data_validation_engine_spark.llmops import build_vocab

        eng = StepEngine(spark, register_functions=False)
        docs = spark.createDataFrame(
            [(1, "x y x"), (2, "y z")], "doc_id int, text string"
        )
        ents = {"docs": docs, "vocab": build_vocab(docs, "doc_id", "text")}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "encode_tokens",
                    "entity_name": "docs",
                    "vocab_entity": "vocab",
                    "id_column": "doc_id",
                    "new_entity_name": "enc",
                }
            ),
        )
        assert ents["enc"].count() == 2


class TestProfileGate:
    def test_thresholds_emit_submission_messages(self, spark):
        from data_validation_engine_spark.messages import MESSAGE_SCHEMA

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, None), (3, "b")], "id int, s string"
        )
        eng = StepEngine(spark, register_functions=False)
        msgs = eng.evaluate(
            {"t": df},
            config=parse_step(
                {
                    "operation": "profile_gate",
                    "entity_name": "t",
                    "max_null_frac": 0.25,
                    "min_distinct": 4,
                    "min_rows": 10,
                }
            ),
        )
        # literals make some fields non-nullable; names+types must match
        # the engine message schema exactly
        assert [(f.name, f.dataType) for f in msgs.schema.fields] == [
            (f.name, f.dataType) for f in MESSAGE_SCHEMA.fields
        ]
        rows = msgs.collect()
        assert all(r.failure_type == "submission" for r in rows)
        kinds = {(r.reporting_field, r.value) for r in rows}
        assert ("s", "0.5") in kinds            # null fraction
        assert ("id", "3") in kinds             # distinct floor
        assert (None, "4") in kinds             # row floor: entity-level
        assert len(rows) == 4

    def test_clean_entity_emits_nothing(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        eng = StepEngine(spark, register_functions=False)
        msgs = eng.evaluate(
            {"t": df},
            config=parse_step(
                {
                    "operation": "profile_gate",
                    "entity_name": "t",
                    "max_null_frac": 0.5,
                    "min_distinct": 2,
                    "min_rows": 1,
                }
            ),
        )
        assert msgs.count() == 0

    def test_no_thresholds_is_noop(self, spark):
        df = spark.createDataFrame([(1,)], "id int")
        eng = StepEngine(spark, register_functions=False)
        msgs = eng.evaluate(
            {"t": df},
            config=parse_step(
                {"operation": "profile_gate", "entity_name": "t"}
            ),
        )
        assert msgs is None


class TestReviewRegressions:
    """Pins for the round-6 self-review findings: NULL handling in the
    sketch/linkage paths and arbitrary column names in profiling."""

    def test_kmv_ignores_null_values(self, spark):
        rows = [(0, f"v{i}") for i in range(50)] + [(0, None)] * 5
        df = spark.createDataFrame(rows, "g int, v string")
        r = kmv_distinct(df, ["g"], "v", k=16).collect()[0]
        clean = kmv_distinct(
            spark.createDataFrame(rows[:50], "g int, v string"),
            ["g"], "v", k=16,
        ).collect()[0]
        # NULLs neither fill a sketch slot nor shift the k-th hash
        assert (r.n_seen, r.kth_hash, r.approx_distinct) == (
            clean.n_seen, clean.kth_hash, clean.approx_distinct,
        )

    def test_fuzzy_join_excludes_null_and_blank_keys(self, spark):
        left = spark.createDataFrame(
            [(1, None), (2, "ab"), (3, "  ")], "id int, name string"
        )
        right = spark.createDataFrame(
            [(10, ""), (11, None), (12, "ab")], "rid int, rname string"
        )
        got = sorted(
            (r.id, r.r_rid, r.distance)
            for r in fuzzy_string_join(
                left, right, "name", "rname", max_distance=1
            ).collect()
        )
        # missing != missing: null/blank keys never match anything (a
        # distance-0 match between absent names would weld unrelated
        # records, and the shared empty block is a quadratic hot spot)
        assert got == [(2, 12, 0)]

    def test_profile_handles_awkward_column_names(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (2, None)],
            ["order id", "weird'name"],
        )
        out = {r.column: r for r in profile_columns(df).collect()}
        assert set(out) == {"order id", "weird'name"}
        assert out["weird'name"].n_null == 1

    def test_quantiles_backticked_value_col(self, spark):
        df = spark.createDataFrame([(0, 1.0), (0, 3.0)], ["g", "the x"])
        r = grouped_quantiles(df, "g", "the x", [0.5]).collect()[0]
        assert r.q_50 == 2.0

    def test_streaming_kmv_survives_null_values(self, spark, tmp_path):
        from data_validation_engine_spark.streaming import (
            read_entity_stream,
            streaming_kmv_distinct,
        )

        src = tmp_path / "null_src"
        src.mkdir()
        batch = spark.createDataFrame(
            [("2024-01-01 00:00:00", 1), ("2024-01-01 00:10:00", None),
             ("2024-01-01 00:20:00", 2)],
            "ts string, user_id int",
        ).selectExpr("CAST(ts AS TIMESTAMP) ts", "user_id")
        batch.write.parquet(str(src), mode="overwrite")
        sdf = streaming_kmv_distinct(
            read_entity_stream(spark, str(src), batch.schema),
            "ts", "user_id", window_seconds=3600, k=4,
        )
        out = str(tmp_path / "null_out")
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck_null"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 1 and rows[0].n_seen == 2  # NULL ignored


class TestFrequentItems:
    def test_exact_heavy_hitters(self, spark):
        from data_validation_engine_spark.llmops import frequent_items

        rows = (
            [(0, "a")] * 5 + [(0, "b")] * 3 + [(0, "c")] * 3 + [(0, "d")]
            + [(1, "z")] * 2 + [(1, "y")]
        )
        df = spark.createDataFrame(rows, "g int, v string")
        out = sorted(
            (r.g, r.rank, r.value, r.n)
            for r in frequent_items(df, "g", "v", 2).collect()
        )
        # count desc, value asc tiebreak: b beats c at 3
        assert out == [
            (0, 1, "a", 5), (0, 2, "b", 3), (1, 1, "z", 2), (1, 2, "y", 1),
        ]

    def test_min_count_floor_and_step(self, spark):
        eng = StepEngine(spark, register_functions=False)
        df = spark.createDataFrame(
            [(0, "a"), (0, "a"), (0, "b")], "g int, v string"
        )
        ents = {"t": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "frequent_items",
                    "entity_name": "t",
                    "group_by": ["g"],
                    "value_column": "v",
                    "k": 5,
                    "min_count": 2,
                    "new_entity_name": "hh",
                }
            ),
        )
        got = [(r.value, r.n) for r in ents["hh"].collect()]
        assert got == [("a", 2)]


class TestProfileDiff:
    def test_added_removed_common_and_delta(self, spark):
        from data_validation_engine_spark.llmops import profile_diff

        left = spark.createDataFrame(
            [(1, "a", 1.0), (2, None, 2.0)], "id int, s string, gone double"
        )
        right = spark.createDataFrame(
            [(1, None), (2, None), (3, "c")],
            ["id", "s"],
        ).withColumn("fresh", F.lit(True))
        out = {r.column: r for r in profile_diff(left, right).collect()}
        assert out["gone"].status == "removed"
        assert out["fresh"].status == "added"
        assert out["id"].status == "common"
        # s: null frac 0.5 -> 2/3
        assert out["s"].null_frac_delta == round(2 / 3 - 0.5, 6)
        assert out["gone"].null_frac_delta is None

    def test_step_dispatch(self, spark):
        eng = StepEngine(spark, register_functions=False)
        a = spark.createDataFrame([(1,)], "id int")
        b = spark.createDataFrame([(1, "x")], "id int, extra string")
        ents = {"old": a, "new": b}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "profile_diff",
                    "entity_name": "old",
                    "target_name": "new",
                    "new_entity_name": "drift",
                }
            ),
        )
        got = {r.column: r.status for r in ents["drift"].collect()}
        assert got == {"id": "common", "extra": "added"}


class TestBinningAndOutliers:
    def test_equi_depth_buckets(self, spark):
        from data_validation_engine_spark.llmops import quantile_buckets

        df = spark.createDataFrame(
            [(0, float(i)) for i in range(12)], "g int, x double"
        )
        out = quantile_buckets(df, "g", "x", 4).collect()
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r.bucket, []).append(r.x)
        # equal population, contiguous ranges
        assert {b: len(v) for b, v in by_bucket.items()} == {
            1: 3, 2: 3, 3: 3, 4: 3,
        }
        assert max(by_bucket[1]) < min(by_bucket[2])
        assert max(by_bucket[3]) < min(by_bucket[4])

    def test_iqr_outliers_per_group(self, spark):
        from data_validation_engine_spark.llmops import outlier_flags

        rows = [(0, float(v)) for v in [10, 11, 12, 13, 14, 100]] + [
            (1, 100.0), (1, 101.0), (1, 99.0)
        ]
        df = spark.createDataFrame(rows, "g int, x double")
        out = {(r.g, r.x): r.is_outlier for r in outlier_flags(df, "g", "x").collect()}
        assert out[(0, 100.0)] is True        # wild for group 0
        assert out[(1, 100.0)] is False       # normal for group 1
        assert sum(out[(0, float(v))] for v in [10, 11, 12, 13, 14]) == 0

    def test_bucket_tiebreak_makes_assignment_total(self, spark):
        from data_validation_engine_spark.llmops import quantile_buckets

        # four identical values straddling the 2-bucket boundary: without
        # a tiebreak WHICH ids land in bucket 1 is partition-dependent;
        # with tiebreak_cols=["id"] the assignment is a total order
        df = spark.createDataFrame(
            [(i, 7.0) for i in range(4)], "id int, x double"
        ).repartition(4)
        out = {
            r.id: r.bucket
            for r in quantile_buckets(
                df, [], "x", 2, tiebreak_cols=["id"]
            ).collect()
        }
        assert out == {0: 1, 1: 1, 2: 2, 3: 2}

    def test_outlier_flags_rejects_helper_collisions(self, spark):
        from data_validation_engine_spark.llmops import outlier_flags

        df = spark.createDataFrame([(0, 1.0, 9)], "g int, x double, __q25 int")
        with pytest.raises(ValueError, match="__q25"):
            outlier_flags(df, "g", "x")
        df2 = spark.createDataFrame([(0, 1.0, 9)], "g int, x double, __g0 int")
        with pytest.raises(ValueError, match="__g0"):
            outlier_flags(df2, "g", "x")

    def test_null_never_outlier_and_steps(self, spark):
        eng = StepEngine(spark, register_functions=False)
        df = spark.createDataFrame(
            [(0, 1.0), (0, 2.0), (0, None), (0, 50.0)], "g int, x double"
        )
        ents = {"t": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "outlier_flags",
                    "entity_name": "t",
                    "group_by": ["g"],
                    "value_column": "x",
                    "new_entity_name": "flagged",
                }
            ),
        )
        flags = {r.x: r.is_outlier for r in ents["flagged"].collect()}
        assert flags[None] is False
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "quantile_buckets",
                    "entity_name": "t",
                    "group_by": ["g"],
                    "value_column": "x",
                    "n_buckets": 2,
                    "new_entity_name": "binned",
                }
            ),
        )
        # NULL values take a NULL bucket; the three real values split
        assert ents["binned"].where("bucket IS NOT NULL").count() == 3
        assert ents["binned"].where("bucket IS NULL AND x IS NULL").count() == 1


class TestWeightedPageRank:
    def test_against_weighted_power_iteration(self, spark):
        edges = [
            (1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0),
        ]
        df = spark.createDataFrame(edges, "src int, dst int, w double")
        got = {
            r.node: r.pagerank
            for r in pagerank(
                df, weight_col="w", iterations=4, checkpoint=False
            ).collect()
        }
        nodes = sorted({u for s, d, _ in edges for u in (s, d)})
        n = len(nodes)
        out = {}
        for s, d, w in edges:
            out.setdefault(s, {})[d] = w
        pr = {v: 1.0 / n for v in nodes}
        for _ in range(4):
            new = {}
            for v in nodes:
                acc = 0.0
                for u in sorted(nodes):
                    if v in out.get(u, {}):
                        acc += pr[u] * out[u][v] / sum(out[u].values())
                new[v] = 0.15 / n + 0.85 * acc
            pr = new
        assert got == pytest.approx(pr, abs=1e-9)

    def test_weighted_matches_unweighted_on_uniform_weights(self, spark):
        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 3)]
        df = spark.createDataFrame(edges, "src int, dst int")
        uw = {r.node: r.pagerank for r in pagerank(df, iterations=3).collect()}
        ww = {
            r.node: r.pagerank
            for r in pagerank(
                df.withColumn("w", F.lit(2.0)),
                weight_col="w",
                iterations=3,
            ).collect()
        }
        assert ww == pytest.approx(uw, abs=1e-12)

    def test_nonpositive_weights_drop_edges(self, spark):
        df = spark.createDataFrame(
            [(1, 2, 1.0), (1, 3, 0.0), (1, 4, -2.0), (1, 5, None)],
            "src int, dst int, w double",
        )
        nodes = {
            r.node
            for r in pagerank(df, weight_col="w", iterations=1).collect()
        }
        assert nodes == {1, 2}  # only the positive-weight edge survives

    def test_weighted_step_dispatch(self, spark):
        eng = StepEngine(spark, register_functions=False)
        ents = {
            "e": spark.createDataFrame(
                [(1, 2, 1.5), (2, 1, 0.5)], "src int, dst int, w double"
            )
        }
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "pagerank",
                    "entity_name": "e",
                    "weight_column": "w",
                    "new_entity_name": "r",
                }
            ),
        )
        assert ents["r"].count() == 2


class TestTriangleCount:
    def test_known_graph(self, spark):
        from data_validation_engine_spark.llmops import triangle_count

        # K4 on {1,2,3,4} (4 triangles, every node in 3) plus a pendant
        # 4-5 edge (closes nothing) plus a disjoint triangle {6,7,8}
        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        edges = k4 + [(4, 5), (6, 7), (7, 8), (6, 8)]
        df = spark.createDataFrame(edges, "src int, dst int")
        got = {r.node: r.n_tri for r in triangle_count(df).collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}

    def test_direction_duplicates_selfloops_ignored(self, spark):
        from data_validation_engine_spark.llmops import triangle_count

        messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3), (3, 2)]
        df = spark.createDataFrame(messy, "src int, dst int")
        got = {r.node: r.n_tri for r in triangle_count(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_against_bruteforce_random_graph(self, spark):
        import itertools
        import random

        from data_validation_engine_spark.llmops import triangle_count

        rng = random.Random(7)
        nodes = list(range(24))
        edges = [
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.25
        ]
        adj = set(edges)
        expected: dict[int, int] = {}
        for x, y, z in itertools.combinations(nodes, 3):
            if (x, y) in adj and (y, z) in adj and (x, z) in adj:
                for v in (x, y, z):
                    expected[v] = expected.get(v, 0) + 1
        df = spark.createDataFrame(edges, "src int, dst int").repartition(5)
        got = {r.node: r.n_tri for r in triangle_count(df).collect()}
        assert got == expected

    def test_declared_step(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark, register_functions=False)
        ents = {
            "edges": spark.createDataFrame(
                [(1, 2), (2, 3), (3, 1)], "a int, b int"
            )
        }
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "triangle_count",
                    "entity_name": "edges",
                    "src_column": "a",
                    "dst_column": "b",
                    "new_entity_name": "tri",
                }
            ),
        )
        assert {(r.node, r.n_tri) for r in ents["tri"].collect()} == {
            (1, 1), (2, 1), (3, 1)
        }

    def test_no_cartesian_in_plan(self, spark):
        from data_validation_engine_spark.llmops import triangle_count

        df = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
        plan = (
            triangle_count(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSampledQuantiles:
    def test_sample_is_deterministic_and_partition_invariant(self, spark):
        from data_validation_engine_spark.llmops import sampled_quantiles

        rows = [(i % 3, float((i * 37) % 1000), f"k{i}") for i in range(3000)]
        df = spark.createDataFrame(rows, "g int, x double, key string")
        a = sorted(
            tuple(r) for r in sampled_quantiles(
                df, "g", "x", "key", [0.5], k=64
            ).collect()
        )
        b = sorted(
            tuple(r) for r in sampled_quantiles(
                df.repartition(17), "g", "x", "key", [0.5], k=64
            ).collect()
        )
        assert a == b

    def test_exact_when_k_covers_group(self, spark):
        from data_validation_engine_spark.llmops import (
            grouped_quantiles,
            sampled_quantiles,
        )

        rows = [(0, float(i), f"k{i}") for i in range(100)]
        df = spark.createDataFrame(rows, "g int, x double, key string")
        approx = sampled_quantiles(
            df, "g", "x", "key", [0.25, 0.5, 0.75], k=1000
        ).collect()[0]
        exact = grouped_quantiles(df, "g", "x", [0.25, 0.5, 0.75]).collect()[0]
        assert (approx.q_25, approx.q_50, approx.q_75) == (
            exact.q_25, exact.q_50, exact.q_75,
        )
        assert approx.n == 100

    def test_estimate_accuracy(self, spark):
        from data_validation_engine_spark.llmops import sampled_quantiles

        rows = [(0, float(i), f"id-{i}") for i in range(20000)]
        df = spark.createDataFrame(rows, "g int, x double, key string")
        r = sampled_quantiles(df, "g", "x", "key", [0.5], k=1024).collect()[0]
        # median of U[0, 20000) ~ 10000; k=1024 => sigma ~ 1.6%; allow 4x
        assert abs(r.q_50 - 10000.0) / 20000.0 < 0.07
        assert r.n == 1024

    def test_mergeable_min_k_law(self, spark):
        from data_validation_engine_spark.llmops import sampled_quantiles

        # min-k of a union == min-k over the union of per-shard min-ks:
        # running the sketch over two shards' SAMPLES equals the global one
        rows = [(0, float((i * 61) % 5000), f"r{i}") for i in range(4000)]
        df = spark.createDataFrame(rows, "g int, x double, key string")
        sh_a = df.where("length(key) % 2 = 0")
        sh_b = df.where("length(key) % 2 = 1")
        from data_validation_engine_spark.llmops.analytics import grouped_topk
        from data_validation_engine_spark.llmops.sketch import kmv_hash

        def mink(frame, k=128):
            hashed = frame.select(
                "g", "x", kmv_hash(F.col("key")).alias("hv")
            )
            return grouped_topk(
                hashed, ["g"], "hv", k, descending=False,
                tiebreak_cols=["x"], rank_col="rnk",
            ).drop("rnk")

        both = mink(sh_a).unionAll(mink(sh_b))
        merged = grouped_topk(
            both, ["g"], "hv", 128, descending=False,
            tiebreak_cols=["x"], rank_col="rnk",
        ).drop("rnk")
        direct = mink(df)
        assert sorted((r.g, r.x) for r in direct.collect()) == sorted(
            (r.g, r.x) for r in merged.collect()
        )

    def test_declared_step_and_validation(self, spark):
        from data_validation_engine_spark.llmops import sampled_quantiles
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [(0, 1.0, "a"), (0, 2.0, "b"), (0, None, "c"), (0, 3.0, None)],
            "g int, x double, key string",
        )
        eng = StepEngine(spark, register_functions=False)
        ents = {"t": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "sampled_quantiles",
                    "entity_name": "t",
                    "group_by": ["g"],
                    "value_column": "x",
                    "key_column": "key",
                    "probs": [0.5],
                    "k": 10,
                    "new_entity_name": "sq",
                }
            ),
        )
        r = ents["sq"].collect()[0]
        # NULL value and NULL key rows are both excluded
        assert (r.n, r.q_50) == (2, 1.5)
        with pytest.raises(ValueError, match="k must be >= 1"):
            sampled_quantiles(df, "g", "x", "key", [0.5], k=0)


class TestQuantizeVectors:
    def test_roundtrip_error_bounded(self, spark):
        from data_validation_engine_spark.llmops import (
            dequantize_col,
            quantize_vectors,
        )

        rows = [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [100.0, -50.0, 0.1, 99.9]),
            (3, [0.0, 0.0, 0.0, 0.0]),     # all-zero -> scale 0, qvec 0
            (4, None),                      # NULL vector -> NULL row
        ]
        df = spark.createDataFrame(rows, "id int, vec array<double>")
        q = quantize_vectors(df, "id", "vec")
        got = {r.id: (r.scale, r.qvec) for r in q.collect()}
        assert got[3] == (0.0, [0, 0, 0, 0])
        assert got[4] == (None, None)
        # max |component| maps to +-127 exactly
        assert max(abs(x) for x in got[2][1]) == 127
        # dequantized error bounded by scale/2 per component
        back = q.where("id IN (1, 2)").select(
            "id",
            dequantize_col(F.col("qvec"), F.col("scale")).alias("approx"),
            "scale",
        ).collect()
        originals = {1: rows[0][1], 2: rows[1][1]}
        for r in back:
            for orig, approx in zip(originals[r.id], r.approx):
                assert abs(orig - approx) <= r.scale / 2 + 1e-12

    def test_zero_shuffle_and_step(self, spark):
        from data_validation_engine_spark.llmops import quantize_vectors
        from data_validation_engine_spark.scale import count_shuffles
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "id int, vec array<double>"
        )
        assert count_shuffles(quantize_vectors(df, "id", "vec")) == 0
        eng = StepEngine(spark, register_functions=False)
        ents = {"embs": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "quantize_vectors",
                    "entity_name": "embs",
                    "id_column": "id",
                    "vector_column": "vec",
                    "new_entity_name": "q",
                }
            ),
        )
        assert ents["q"].columns == ["id", "scale", "qvec"]
        assert ents["q"].schema["qvec"].dataType.simpleString() == "array<tinyint>"


class TestProjectVectors:
    def test_matches_numpy_and_preserves_distances(self, spark):
        import numpy as np

        from data_validation_engine_spark.llmops import (
            project_vectors,
            projection_matrix,
        )

        rng = np.random.RandomState(3)
        vecs = rng.randn(20, 64)
        m = projection_matrix(64, 16)
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(20)],
            "id int, vec array<double>",
        )
        got = {
            r.id: np.array(r.proj)
            for r in project_vectors(df, "id", "vec", m).collect()
        }
        M = np.array(m)
        for i in range(20):
            # ordered fold == numpy within accumulation-order noise
            assert np.allclose(got[i], M @ vecs[i], atol=1e-9)
        # JL property: relative pairwise distances roughly preserved
        # (k=16: loose tolerance, just shaping, not a proof)
        d_in = np.linalg.norm(vecs[0] - vecs[1]) / np.linalg.norm(
            vecs[0] - vecs[2]
        )
        d_out = np.linalg.norm(got[0] - got[1]) / np.linalg.norm(
            got[0] - got[2]
        )
        assert 0.3 < d_out / (d_in * np.sqrt(1.0)) < 3.0

    def test_matrix_deterministic_and_seeded(self, spark):
        from data_validation_engine_spark.llmops import projection_matrix

        a = projection_matrix(8, 4)
        assert a == projection_matrix(8, 4)
        assert a != projection_matrix(8, 4, seed="other")
        assert all(x in (1.0, -1.0) for row in a for x in row)
        with pytest.raises(ValueError):
            projection_matrix(0, 4)

    def test_zero_shuffle_and_declared_step(self, spark):
        from data_validation_engine_spark.llmops import (
            project_vectors,
            projection_matrix,
        )
        from data_validation_engine_spark.scale import count_shuffles
        from data_validation_engine_spark.steps import StepEngine, parse_step

        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0, 4.0])], "id int, vec array<double>"
        )
        m = projection_matrix(4, 2)
        assert count_shuffles(project_vectors(df, "id", "vec", m)) == 0
        eng = StepEngine(spark, register_functions=False)
        ents = {"embs": df}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "project_vectors",
                    "entity_name": "embs",
                    "id_column": "id",
                    "vector_column": "vec",
                    "in_dim": 4,
                    "out_dim": 2,
                    "new_entity_name": "small",
                }
            ),
        )
        row = ents["small"].collect()[0]
        expect = [
            sum(v * h for v, h in zip([1.0, 2.0, 3.0, 4.0], m[i]))
            for i in range(2)
        ]
        assert row.proj == expect
        with pytest.raises(ValueError, match="non-empty"):
            project_vectors(df, "id", "vec", [])


class TestCorpusMix:
    def test_expected_volumes_and_determinism(self, spark):
        from data_validation_engine_spark.llmops import corpus_mix

        rows = (
            [(f"w{i}", "web", 100) for i in range(400)]
            + [(f"c{i}", "code", 100) for i in range(100)]
            + [(f"b{i}", "books", 100) for i in range(20)]
            + [(f"x{i}", "junk", 100) for i in range(50)]
        )
        df = spark.createDataFrame(rows, "key string, src string, toks int")
        targets = {"web": 0.5, "code": 0.3, "books": 0.2}
        out = corpus_mix(df, "key", "src", "toks", targets, budget=20_000)
        kept = out.groupBy("src").count().collect()
        got = {r.src: r["count"] for r in kept}
        # unlisted source dropped entirely
        assert "junk" not in got
        # web: share*budget = 10k of 40k available -> ~25% of 400 rows
        assert 60 <= got.get("web", 0) <= 140
        # code: 6k of 10k -> ~60% of 100
        assert 40 <= got.get("code", 0) <= 80
        # books: 4k wanted, only 2k available -> keep everything
        assert got.get("books", 0) == 20
        # deterministic: identical keep set under repartitioning
        again = corpus_mix(
            df.repartition(7), "key", "src", "toks", targets, budget=20_000
        )
        assert sorted(r.key for r in out.collect()) == sorted(
            r.key for r in again.collect()
        )

    def test_declared_step_and_validation(self, spark):
        from data_validation_engine_spark.llmops.split import mix_fractions
        from data_validation_engine_spark.steps import StepEngine, parse_step

        assert mix_fractions({"a": 100}, {"a": 1.0, "b": 0.5}, 50) == {
            "a": 0.5,
            "b": 0.0,
        }
        with pytest.raises(ValueError, match="budget"):
            mix_fractions({}, {}, -1)
        with pytest.raises(ValueError, match="negative"):
            mix_fractions({}, {"a": -0.1}, 10)

        df = spark.createDataFrame(
            [("k1", "a", 10), ("k2", "b", 10)], "key string, src string, t int"
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
                    "targets": {"a": 1.0},
                    "budget": 1000,
                    "new_entity_name": "mixed",
                }
            ),
        )
        assert [r.key for r in ents["mixed"].collect()] == ["k1"]
