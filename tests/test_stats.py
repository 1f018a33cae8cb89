"""Drift / regression statistics (llmops/stats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.stats import (
    chi2_drift,
    grouped_regression,
)


class TestChi2Drift:
    def test_identical_samples_zero(self, spark):
        df = spark.createDataFrame(
            [("a",), ("a",), ("b",)], "v string"
        )
        cells = chi2_drift(df, df, "v").collect()
        assert all(r.chi2_ref == 0.0 and r.chi2_cur == 0.0 for r in cells)

    def test_textbook_2x2(self, spark):
        # ref: 30 a / 10 b; cur: 10 a / 30 b -> chi2 total = 20.0
        ref = spark.createDataFrame(
            [("a",)] * 30 + [("b",)] * 10, "v string"
        )
        cur = spark.createDataFrame(
            [("a",)] * 10 + [("b",)] * 30, "v string"
        )
        cells = chi2_drift(ref, cur, "v").collect()
        total = sum(r.chi2_ref + r.chi2_cur for r in cells)
        assert abs(total - 20.0) < 1e-9

    def test_one_sided_value_counts_zero(self, spark):
        ref = spark.createDataFrame([("a",), ("b",)], "v string")
        cur = spark.createDataFrame([("a",)], "v string")
        got = {r.value: (r.n_ref, r.n_cur) for r in chi2_drift(ref, cur, "v").collect()}
        assert got["b"] == (1, 0)

    def test_null_is_a_cell(self, spark):
        ref = spark.createDataFrame([("a",), (None,)], "v string")
        cur = spark.createDataFrame([(None,), (None,)], "v string")
        got = {r.value: (r.n_ref, r.n_cur) for r in chi2_drift(ref, cur, "v").collect()}
        assert got[None] == (1, 2)


class TestGroupedRegression:
    def test_exact_line(self, spark):
        # y = 2x + 1 exactly -> slope 2 (scale cancels), corr 1
        rows = [("g", float(x), 2.0 * x + 1.0) for x in range(1, 6)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        r = grouped_regression(df, ["g"], "x", "y").first()
        assert r.slope == 2.0
        assert r.corr == 1.0
        # intercept is in the scaled domain (scale=100)
        assert r.intercept == 100.0

    def test_degenerate_x_null(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0, 1.0), ("g", 1.0, 2.0)], "g string, x double, y double"
        )
        r = grouped_regression(df, ["g"], "x", "y").first()
        assert r.slope is None and r.corr is None

    def test_sums_partitioning_invariant(self, spark):
        rows = [("g", float(i % 97), float((i * 31) % 113)) for i in range(2000)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        a = grouped_regression(df.repartition(1), ["g"], "x", "y").first()
        b = grouped_regression(df.repartition(16), ["g"], "x", "y").first()
        assert (str(a.sxy), a.slope, a.corr) == (str(b.sxy), b.slope, b.corr)

    def test_anticorrelated(self, spark):
        rows = [("g", float(x), -3.0 * x) for x in range(1, 8)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        r = grouped_regression(df, ["g"], "x", "y").first()
        assert r.slope == -3.0 and r.corr == -1.0


class TestEcdfNormalize:
    def test_basic_grouped(self, spark):
        from data_validation_engine_spark.llmops.stats import ecdf_normalize

        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 4.0), ("h", 9.0)],
            "g string, v double",
        )
        got = {
            (r.g, r.v): r.ecdf
            for r in ecdf_normalize(df, "v", group_cols=["g"]).collect()
        }
        assert got[("g", 1.0)] == 0.25
        assert got[("g", 2.0)] == 0.75  # ties share the cumulative rank
        assert got[("g", 4.0)] == 1.0
        assert got[("h", 9.0)] == 1.0

    def test_row_count_preserved(self, spark):
        from data_validation_engine_spark.llmops.stats import ecdf_normalize

        df = spark.createDataFrame(
            [(i % 7, float(i % 13)) for i in range(200)], "g int, v double"
        )
        assert ecdf_normalize(df, "v", group_cols=["g"]).count() == 200

    def test_max_is_one_globally(self, spark):
        from data_validation_engine_spark.llmops.stats import ecdf_normalize

        df = spark.createDataFrame(
            [(float(i),) for i in range(50)], "v double"
        )
        out = ecdf_normalize(df, "v")
        assert out.agg({"ecdf": "max"}).first()[0] == 1.0


class TestBucketByLength:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_batches_and_waste(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            bucket_by_length,
        )

        # all in one bucket+shard: batch of 2, lengths 1 and 3 -> waste 2,0
        docs = self._docs(spark, ["a", "a b c"])
        out = bucket_by_length(
            docs, "doc_id", "text", batch_size=2, bucket_edges=[10],
            n_shards=1,
        ).collect()
        got = {r.doc_id: (r.bucket, r.batch_idx, r.pad_waste) for r in out}
        assert got[0] == (0, 0, 2)
        assert got[1] == (0, 0, 0)

    def test_bucket_assignment_edges(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            bucket_by_length,
        )

        docs = self._docs(spark, ["a b", "a b c d", "a b c d e"])
        out = bucket_by_length(
            docs, "doc_id", "text", batch_size=8, bucket_edges=[2, 4],
            n_shards=1,
        ).collect()
        got = {r.doc_id: r.bucket for r in out}
        assert got == {0: 0, 1: 1, 2: 2}

    def test_batch_size_bounds_batches(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            bucket_by_length,
        )
        from pyspark.sql import functions as F

        docs = self._docs(spark, ["w"] * 37)
        out = bucket_by_length(
            docs, "doc_id", "text", batch_size=5, bucket_edges=[10],
            n_shards=1,
        )
        sizes = [
            r[0] for r in out.groupBy("batch_idx").count()
            .select("count").collect()
        ]
        assert max(sizes) == 5 and sum(sizes) == 37

    def test_rejects_bad_params(self, spark):
        from data_validation_engine_spark.llmops.chunking import (
            bucket_by_length,
        )
        import pytest as _pt

        docs = self._docs(spark, ["a"])
        with _pt.raises(ValueError):
            bucket_by_length(docs, "doc_id", "text", batch_size=0)
        with _pt.raises(ValueError):
            bucket_by_length(
                docs, "doc_id", "text", batch_size=1, bucket_edges=[-1]
            )


# -- DataSketches HLL profile / rollup (llmops/sketch.py) --------------------


def test_hll_profile_estimates_and_rollup(spark, sf_dir):
    from data_validation_engine_spark.llmops.sketch import (
        hll_profile,
        hll_rollup,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    prof = {
        r["event_type"]: r["n_est"]
        for r in hll_profile(
            events, ["event_type"], "user_id", keep_sketch=False
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(prof) == set(exact)
    for k, est in prof.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])

    # mergeability: per-(type, user-bucket) sketches rolled up to type
    # estimate EXACTLY what the single-pass per-type sketch estimates
    parts = hll_profile(
        events.selectExpr("event_type", "user_id", "user_id % 7 AS shard"),
        ["event_type", "shard"],
        "user_id",
    )
    rolled = {
        r["event_type"]: r["n_est"]
        for r in hll_rollup(parts, ["event_type"]).collect()
    }
    assert rolled == prof


def test_hll_declared_steps(spark, sf_dir):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ents = {
        "events": events.selectExpr(
            "event_type", "user_id", "user_id % 5 AS shard"
        )
    }
    eng = StepEngine(spark)
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "hll_profile",
                "entity_name": "events",
                "new_entity_name": "daily",
                "group_by": ["event_type", "shard"],
                "value_column": "user_id",
            }
        ),
    )
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "hll_profile",
                "mode": "rollup",
                "entity_name": "daily",
                "new_entity_name": "total",
                "group_by": ["event_type"],
                "value_column": "sketch",
            }
        ),
    )
    rolled = {r["event_type"]: r["n_est"] for r in ents["total"].collect()}
    from data_validation_engine_spark.llmops.sketch import hll_profile
    single = {
        r["event_type"]: r["n_est"]
        for r in hll_profile(
            ents["events"], ["event_type"], "user_id", keep_sketch=False
        ).collect()
    }
    assert rolled == single


# -- grouped ROC AUC (llmops/stats.py) ---------------------------------------


class TestGroupedAuc:
    def _auc_pairs(self, pairs):
        """Independent O(n²) reference: P(score_pos > score_neg) + half
        the ties — the definition AUC estimates."""
        pos = [s for s, y in pairs if y == 1]
        neg = [s for s, y in pairs if y == 0]
        if not pos or not neg:
            return None
        wins = sum(
            1.0 if p > n else 0.5 if p == n else 0.0
            for p in pos for n in neg
        )
        return round(wins / (len(pos) * len(neg)), 6)

    def test_matches_pair_counting_with_ties(self, spark):
        from data_validation_engine_spark.llmops.stats import grouped_auc

        pairs = [
            (0.1, 0), (0.4, 0), (0.35, 1), (0.8, 1),
            (0.5, 0), (0.5, 1), (0.5, 1), (0.9, 0), (0.2, 1),
        ]
        df = spark.createDataFrame(
            [("g", s, y) for s, y in pairs], "g string, s double, y int"
        )
        r = grouped_auc(df, "s", "y", group_cols=["g"]).first()
        assert r["auc"] == self._auc_pairs(pairs)
        assert (r["n_pos"], r["n_neg"]) == (5, 4)

    def test_perfect_and_inverted(self, spark):
        from data_validation_engine_spark.llmops.stats import grouped_auc

        perfect = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
        inverted = [(float(i), 0 if i >= 5 else 1) for i in range(10)]
        df = spark.createDataFrame(
            [("p", s, y) for s, y in perfect]
            + [("i", s, y) for s, y in inverted],
            "g string, s double, y int",
        )
        got = {
            r["g"]: r["auc"]
            for r in grouped_auc(df, "s", "y", group_cols=["g"]).collect()
        }
        assert got == {"p": 1.0, "i": 0.0}

    def test_single_class_is_null(self, spark):
        from data_validation_engine_spark.llmops.stats import grouped_auc

        df = spark.createDataFrame(
            [("g", 1.0, 1), ("g", 2.0, 1)], "g string, s double, y int"
        )
        r = grouped_auc(df, "s", "y", group_cols=["g"]).first()
        assert r["auc"] is None and r["n_neg"] == 0

    def test_null_and_nonbinary_fail_loudly(self, spark):
        import pytest as _pt

        from data_validation_engine_spark.llmops.stats import grouped_auc

        bad_null = spark.createDataFrame(
            [("g", None, 1)], "g string, s double, y int"
        )
        with _pt.raises(Exception, match="NULL in column"):
            grouped_auc(bad_null, "s", "y", group_cols=["g"]).collect()
        bad_label = spark.createDataFrame(
            [("g", 1.0, 2)], "g string, s double, y int"
        )
        with _pt.raises(Exception, match="non-binary"):
            grouped_auc(bad_label, "s", "y", group_cols=["g"]).collect()

    def test_matches_duckdb_on_testdata(self, spark, sf_dir):
        import duckdb

        from data_validation_engine_spark.llmops.stats import grouped_auc

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
            "lang", "CAST(n_chars AS DOUBLE) AS s",
            "CAST(doc_id % 2 AS INT) AS y",
        )
        got = {
            r["lang"]: (r["n_pos"], r["n_neg"], r["auc"])
            for r in grouped_auc(docs, "s", "y", group_cols=["lang"]).collect()
        }
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in duckdb.sql(
                f"""
                WITH d AS (
                  SELECT lang, CAST(n_chars AS DOUBLE) s,
                         CAST(doc_id % 2 AS INT) y
                  FROM read_parquet('{sf_dir}/documents.parquet')
                ), per AS (
                  SELECT lang, s, count(*) cnt, sum(y) pos FROM d
                  GROUP BY 1, 2
                ), ranked AS (
                  SELECT *, coalesce(sum(cnt) OVER (
                    PARTITION BY lang ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) cum FROM per
                )
                SELECT lang, sum(pos) np, sum(cnt - pos) nn,
                       CASE WHEN sum(pos) > 0 AND sum(cnt - pos) > 0 THEN
                         round((sum(pos * (2 * cum + cnt + 1))::DOUBLE
                                - sum(pos)::DOUBLE * (sum(pos) + 1))
                               / 2.0 / (sum(pos)::DOUBLE * sum(cnt - pos)),
                               6)
                       END auc
                FROM ranked GROUP BY lang
                """
            ).fetchall()
        }
        assert got == want


def test_grouped_auc_declared_step(spark, sf_dir):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "lang", "CAST(n_chars AS DOUBLE) AS s", "CAST(doc_id % 2 AS INT) AS y"
    )
    ents = {"scored": docs}
    StepEngine(spark).evaluate(
        ents,
        config=parse_step(
            {
                "operation": "grouped_auc",
                "entity_name": "scored",
                "new_entity_name": "auc",
                "score_column": "s",
                "label_column": "y",
                "group_by": ["lang"],
            }
        ),
    )
    rows = ents["auc"].collect()
    assert len(rows) > 0
    assert all(r["auc"] is None or 0.0 <= r["auc"] <= 1.0 for r in rows)
