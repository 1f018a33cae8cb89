"""Round-8 second wave: cluster representatives (dedup survivorship),
keyed pseudonymization, mergeable regression statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestClusterRepresentatives:
    def test_best_score_survives(self, spark):
        from data_validation_engine_spark.llmops.dedup import (
            cluster_representatives,
        )

        df = spark.createDataFrame(
            [
                (1, 10, 0.5),
                (2, 10, 0.9),
                (3, 10, 0.9),   # tie with id 2 -> lower id wins
                (4, 20, 0.1),
            ],
            "doc_id long, cluster long, quality double",
        )
        reps = cluster_representatives(
            df, "cluster", score_col="quality", id_col="doc_id"
        )
        got = {r.cluster: r.doc_id for r in reps.collect()}
        assert got == {10: 2, 20: 4}

    def test_no_score_falls_back_to_min_id(self, spark):
        from data_validation_engine_spark.llmops.dedup import (
            cluster_representatives,
        )

        df = spark.createDataFrame(
            [(5, 1), (3, 1), (9, 2)], "doc_id long, cluster long"
        )
        reps = cluster_representatives(df, "cluster", id_col="doc_id")
        got = {r.cluster: r.doc_id for r in reps.collect()}
        assert got == {1: 3, 2: 9}

    def test_keeps_all_columns_one_row_per_cluster(self, spark):
        from data_validation_engine_spark.llmops.dedup import (
            cluster_representatives,
        )

        df = spark.createDataFrame(
            [(1, 1, "a"), (2, 1, "b"), (3, 2, "c")],
            "doc_id long, cluster long, text string",
        )
        reps = cluster_representatives(df, "cluster", id_col="doc_id")
        assert reps.count() == 2
        assert set(reps.columns) == {"doc_id", "cluster", "text"}


class TestPseudonymize:
    def test_deterministic_and_referential(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark)
        cust = spark.createDataFrame(
            [(1, "alice", 10.0), (2, "bob", 20.0)],
            "id int, name string, bal double",
        )
        orders = spark.createDataFrame(
            [(1, 100), (1, 101), (2, 102)], "id int, okey int"
        )
        ents = {"cust": cust, "orders": orders}
        for ent in ("cust", "orders"):
            eng.evaluate(
                ents,
                config=parse_step(
                    {
                        "operation": "pseudonymize",
                        "entity_name": ent,
                        "columns": ["id"],
                        "salt": "s1",
                    }
                ),
            )
        # same key -> same token across entities (joins still work)
        joined = ents["cust"].join(ents["orders"], "id")
        assert joined.count() == 3
        # tokens are not the raw values
        assert {r.id for r in ents["cust"].collect()} != {"1", "2"}

    def test_salt_changes_tokens(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark)
        base = spark.createDataFrame([(1,)], "id int")
        tokens = []
        for salt in ("a", "b"):
            ents = {"t": base}
            eng.evaluate(
                ents,
                config=parse_step(
                    {
                        "operation": "pseudonymize",
                        "entity_name": "t",
                        "columns": ["id"],
                        "salt": salt,
                    }
                ),
            )
            tokens.append(ents["t"].first().id)
        assert tokens[0] != tokens[1]

    def test_null_stays_null(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark)
        ents = {"t": spark.createDataFrame([(None,), (3,)], "id int")}
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "pseudonymize",
                    "entity_name": "t",
                    "columns": ["id"],
                    "salt": "s",
                }
            ),
        )
        vals = [r.id for r in ents["t"].collect()]
        assert None in vals and len([v for v in vals if v]) == 1


class TestMergeRegressionStats:
    def test_merge_equals_whole(self, spark):
        from data_validation_engine_spark.llmops.stats import (
            grouped_regression,
            merge_regression_stats,
        )

        rows = [("g", float(i % 17), float((i * 7) % 23)) for i in range(500)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        whole = grouped_regression(df, ["g"], "x", "y").first()
        a = grouped_regression(
            df.where("x < 8"), ["g"], "x", "y"
        )
        b = grouped_regression(
            df.where("x >= 8"), ["g"], "x", "y"
        )
        merged = merge_regression_stats(a, b, ["g"]).first()
        assert (
            str(merged.sxy) == str(whole.sxy)
            and merged.slope == whole.slope
            and merged.corr == whole.corr
        )

    def test_one_sided_group_passes_through(self, spark):
        from data_validation_engine_spark.llmops.stats import (
            grouped_regression,
            merge_regression_stats,
        )

        a = grouped_regression(
            spark.createDataFrame(
                [("g", 1.0, 2.0), ("g", 2.0, 4.0)], "g string, x double, y double"
            ),
            ["g"], "x", "y",
        )
        b = grouped_regression(
            spark.createDataFrame(
                [("h", 1.0, 1.0), ("h", 3.0, 2.0)], "g string, x double, y double"
            ),
            ["g"], "x", "y",
        )
        merged = merge_regression_stats(a, b, ["g"])
        assert {r.g for r in merged.collect()} == {"g", "h"}
        assert merged.count() == 2
