"""Winnowing repeated-span detection (llmops/spans.py)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from data_validation_engine_spark.llmops.spans import (
    shared_span_pairs,
    winnowed_fingerprints,
)


@pytest.fixture()
def plagiarised(spark):
    boiler = "all rights reserved contact us for licensing terms today"
    rows = [
        (1, f"original research text goes here first. {boiler}"),
        # same boilerplate at a DIFFERENT offset — the case doc-anchored
        # stride sampling misses and winnowing guarantees
        (2, f"zz. {boiler} completely different article body follows"),
        (3, "no shared content whatsoever in this one xyzzy"),
        (4, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_winnow(text, width, window):
    t = " ".join(text.lower().split())
    if len(t) < width:
        return set()
    grams = [
        int(
            hashlib.md5(t[i : i + width].encode()).hexdigest()[:15], 16
        )
        for i in range(len(t) - width + 1)
    ]
    if len(grams) < window:
        return {min(grams)}
    return {
        min(grams[j : j + window])
        for j in range(len(grams) - window + 1)
    }


def test_copied_span_detected_at_any_offset(plagiarised):
    # boiler is 57 chars; width 24 + window 8 -> any copy >= 31 chars is
    # guaranteed a shared fingerprint regardless of offset
    got = {
        (r["id_a"], r["id_b"])
        for r in shared_span_pairs(
            plagiarised, "doc_id", "text", width=24, window=8
        ).collect()
    }
    assert (1, 2) in got
    assert all(3 not in p and 4 not in p for p in got)


def test_fingerprints_match_python_reference(plagiarised):
    got = {}
    for r in winnowed_fingerprints(
        plagiarised, "doc_id", "text", width=24, window=8
    ).collect():
        got.setdefault(r["doc_id"], set()).add(r["h"])
    texts = {r["doc_id"]: r["text"] for r in plagiarised.collect()}
    for did, text in texts.items():
        want = _py_winnow(text, 24, 8)
        assert got.get(did, set()) == want, did


def test_min_shared_raises_the_bar(plagiarised):
    lo = shared_span_pairs(
        plagiarised, "doc_id", "text", width=24, window=8, min_shared=1
    ).count()
    hi = shared_span_pairs(
        plagiarised, "doc_id", "text", width=24, window=8, min_shared=99
    ).count()
    assert lo >= 1 and hi == 0


def test_short_docs(plagiarised):
    fps = winnowed_fingerprints(plagiarised, "doc_id", "text", width=24)
    assert fps.where("doc_id = 4").count() == 0  # shorter than width
    # a doc with >=1 gram but < window grams emits exactly one min
    one = winnowed_fingerprints(
        plagiarised.where("doc_id = 4"), "doc_id", "text",
        width=3, window=1000,
    )
    assert one.count() == 1


def test_rejects_bad_params(plagiarised):
    with pytest.raises(ValueError, match="width/window"):
        winnowed_fingerprints(plagiarised, "doc_id", "text", width=0)


def test_pairs_match_duckdb(spark, sf_dir):
    """Engine parity on real testdata (small width so word-soup docs
    actually share spans)."""
    W, WIN, M = 12, 5, 2
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in shared_span_pairs(
            docs, "doc_id", "text", width=W, window=WIN, min_shared=M
        ).collect()
    }
    want = {
        (r[0], r[1]): r[2]
        for r in duckdb.sql(
            f"""
            WITH t AS (
              SELECT doc_id,
                     lower(regexp_replace(text, '\\s+', ' ', 'g')) AS t
              FROM read_parquet('{sf_dir}/documents.parquet')
            ), grams AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, length(t) - {W} + 1),
                       i -> ('0x' || substr(md5(substr(t, i::INT, {W})),
                                            1, 15))::BIGINT
                     ) AS g
              FROM t WHERE length(t) >= {W}
            ), fps AS (
              SELECT DISTINCT doc_id, h
              FROM grams, UNNEST(
                CASE WHEN len(g) >= {WIN} THEN
                  list_transform(
                    generate_series(1, len(g) - {WIN} + 1),
                    j -> list_min(g[j: j + {WIN} - 1])
                  )
                ELSE [list_min(g)] END
              ) u(h)
            )
            SELECT a.doc_id, b.doc_id, count(*) AS n
            FROM fps a JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= {M}
            """
        ).fetchall()
    }
    assert got == want
    assert len(got) > 0, "test corpus produced no pairs — widen params"


def test_pair_plan_is_bounded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        shared_span_pairs(docs, "doc_id", "text", width=12, window=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_shared_spans_declared_step(spark, plagiarised):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    ents = {"docs": plagiarised}
    StepEngine(spark).evaluate(
        ents,
        config=parse_step(
            {
                "operation": "shared_spans",
                "entity_name": "docs",
                "new_entity_name": "pairs",
                "key_column": "doc_id",
                "width": 24,
                "window": 8,
            }
        ),
    )
    got = {(r["id_a"], r["id_b"]) for r in ents["pairs"].collect()}
    assert (1, 2) in got


class TestSharedSpansIncremental:
    def test_cross_pairs_match_batch_and_corpus_never_refingerprints(
        self, spark
    ):
        from data_validation_engine_spark.llmops.spans import (
            shared_span_pairs,
            shared_spans_incremental,
            winnowed_fingerprints,
        )

        span = "the quick brown fox jumps over the lazy dog tonight"
        corpus = spark.createDataFrame(
            [
                (1, "corpus doc one mentions " + span + " in passing"),
                (2, "another corpus doc with nothing shared at all "
                    "beyond plain words"),
                (3, "third corpus doc also quotes " + span + " verbatim"),
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (101, "fresh submission copying " + span + " again"),
                (102, "fresh original text sharing no spans with anyone "
                      "whatsoever here"),
            ],
            "doc_id long, text string",
        )
        index = winnowed_fingerprints(corpus, "doc_id", "text")
        inc = {
            (r["new_id"], r["corpus_id"]): r["n_shared"]
            for r in shared_spans_incremental(
                new, index, "doc_id", "text"
            ).collect()
        }
        # batch over the union, restricted to cross pairs, must agree
        full = {
            (r["id_b"], r["id_a"]): r["n_shared"]
            for r in shared_span_pairs(
                corpus.unionByName(new), "doc_id", "text"
            ).collect()
            if r["id_a"] <= 3 and r["id_b"] >= 101
        }
        assert inc == full
        assert (101, 1) in inc and (101, 3) in inc
        assert all(nid != 102 for nid, _ in inc)

    def test_broadcast_hint_and_escape(self, spark):
        from data_validation_engine_spark.llmops.spans import (
            shared_spans_incremental,
            winnowed_fingerprints,
        )

        corpus = spark.createDataFrame(
            [(1, "a shared span of sufficient length to fingerprint ok")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(9, "a shared span of sufficient length to fingerprint ok")],
            "doc_id long, text string",
        )
        index = winnowed_fingerprints(corpus, "doc_id", "text")
        hinted = shared_spans_incremental(new, index, "doc_id", "text")
        plain = shared_spans_incremental(
            new, index, "doc_id", "text", broadcast_new=False
        )
        hp = hinted._jdf.queryExecution().optimizedPlan().toString()
        pp = plain._jdf.queryExecution().optimizedPlan().toString()
        assert "broadcast" in hp.lower()
        assert "broadcast" not in pp.lower()
        assert hinted.collect() == plain.collect()

    def test_declared_incremental_mode(self, spark):
        from data_validation_engine_spark.llmops.spans import (
            winnowed_fingerprints,
        )
        from data_validation_engine_spark.steps import StepEngine, parse_step

        span = "the quick brown fox jumps over the lazy dog tonight"
        corpus = spark.createDataFrame(
            [(1, "corpus doc quoting " + span + " entirely")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(9, "new doc copying " + span + " again")],
            "doc_id long, text string",
        )
        eng = StepEngine(spark, register_functions=False)
        ents = {
            "batch": new,
            "span_index": winnowed_fingerprints(corpus, "doc_id", "text"),
        }
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "shared_spans",
                    "entity_name": "batch",
                    "key_column": "doc_id",
                    "index_name": "span_index",
                    "new_entity_name": "hits",
                }
            ),
        )
        rows = ents["hits"].collect()
        assert len(rows) == 1
        assert (rows[0]["new_id"], rows[0]["corpus_id"]) == (9, 1)
        assert rows[0]["n_shared"] >= 1

    def test_declared_fingerprints_mode_feeds_the_probe(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        span = "the quick brown fox jumps over the lazy dog tonight"
        eng = StepEngine(spark, register_functions=False)
        ents = {
            "corpus": spark.createDataFrame(
                [(1, "corpus doc quoting " + span + " entirely")],
                "doc_id long, text string",
            ),
            "batch": spark.createDataFrame(
                [(9, "new doc copying " + span + " again")],
                "doc_id long, text string",
            ),
        }
        # JSON program: build the index, then probe it incrementally
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "shared_spans",
                    "entity_name": "corpus",
                    "key_column": "doc_id",
                    "mode": "fingerprints",
                    "new_entity_name": "span_index",
                }
            ),
        )
        assert set(ents["span_index"].columns) == {"doc_id", "h"}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "shared_spans",
                    "entity_name": "batch",
                    "key_column": "doc_id",
                    "index_name": "span_index",
                    "new_entity_name": "hits",
                }
            ),
        )
        rows = ents["hits"].collect()
        assert [(r["new_id"], r["corpus_id"]) for r in rows] == [(9, 1)]

    def test_fingerprints_mode_rejects_index_name(self, spark):
        import pytest as _pytest

        from data_validation_engine_spark.errors import ConfigurationError
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark, register_functions=False)
        ents = {
            "c": spark.createDataFrame(
                [(1, "x")], "doc_id long, text string"
            )
        }
        with _pytest.raises(ConfigurationError, match="fingerprints"):
            eng.evaluate(
                ents,
                config=parse_step(
                    {
                        "operation": "shared_spans",
                        "entity_name": "c",
                        "key_column": "doc_id",
                        "mode": "fingerprints",
                        "index_name": "c",
                    }
                ),
            )
