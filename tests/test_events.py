"""Event-funnel and cohort-retention analytics (llmops/events.py) plus
the round-8 unpivot/postings additions they shipped with."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.events import (
    funnel_counts,
    retention_cohorts,
    window_funnel,
)

US = 1_000_000
DAY = 86_400_000_000


class TestRetentionCohorts:
    def test_triangle(self, spark):
        # u1 first day 0, active days 0,1,3; u2 first day 1, active 1,1
        rows = [
            (1, 0 * DAY + 5),
            (1, 1 * DAY + 7),
            (1, 3 * DAY + 2),
            (2, 1 * DAY + 1),
            (2, 1 * DAY + 9),
        ]
        df = spark.createDataFrame(rows, "u long, ts_us long")
        got = {
            (r.cohort, r.offset): r.n_users
            for r in retention_cohorts(
                df, "u", "ts_us", period_us=DAY
            ).collect()
        }
        assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1}

    def test_offset_zero_is_cohort_size(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
        )
        ret = retention_cohorts(ev, "user_id", "ts_us", period_us=DAY)
        sizes = ret.where("offset = 0").agg(F.sum("n_users")).first()[0]
        n_users = ev.select("user_id").distinct().count()
        assert sizes == n_users

    def test_plan_no_cartesian(self, spark):
        df = spark.createDataFrame([(1, 5)], "u long, ts_us long")
        plan = retention_cohorts(
            df, "u", "ts_us", period_us=DAY
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestWindowFunnel:
    def _run(self, spark, rows, window_us=100):
        df = spark.createDataFrame(rows, "u long, ts_us long, e string")
        return {
            r.u: (r.stage, r.t_enter_us, r.t_reach_us)
            for r in window_funnel(
                df, "u", "ts_us", "e", ["a", "b", "c"], window_us=window_us
            ).collect()
        }

    def test_full_chain(self, spark):
        got = self._run(spark, [(1, 10, "a"), (1, 20, "b"), (1, 30, "c")])
        assert got[1] == (3, 10, 30)

    def test_window_cuts_chain(self, spark):
        # c lands outside t1+window even though it follows b
        got = self._run(
            spark, [(1, 10, "a"), (1, 20, "b"), (1, 200, "c")]
        )
        assert got[1] == (2, 10, 20)

    def test_anchored_at_first_entry(self, spark):
        # a@0 anchors; the later a@95 would admit b@100 but the funnel
        # is anchored-first-chain (documented; matches the SQL cascade)
        got = self._run(
            spark, [(1, 0, "a"), (1, 95, "a"), (1, 150, "b")]
        )
        assert got[1] == (1, 0, 0)

    def test_out_of_order_steps_dont_count(self, spark):
        got = self._run(spark, [(1, 10, "b"), (1, 20, "a"), (1, 30, "c")])
        # b precedes the anchor; c skips stage 2 (needs b AFTER a)
        assert got[1][0] == 1

    def test_equal_timestamps_tiebreak_by_step(self, spark):
        # a and b at the same instant: struct sort puts step 0 first,
        # the >= cascade admits b — stage 2
        got = self._run(spark, [(1, 10, "a"), (1, 10, "b")])
        assert got[1] == (2, 10, 10)

    def test_non_funnel_user_stage_zero(self, spark):
        got = self._run(spark, [(1, 10, "b"), (1, 20, "c")])
        assert got[1] == (0, None, None)

    def test_counts_monotone(self, spark):
        rows = [
            (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
            (2, 10, "a"), (2, 20, "b"),
            (3, 10, "a"),
            (4, 10, "b"),
        ]
        df = spark.createDataFrame(rows, "u long, ts_us long, e string")
        per = window_funnel(
            df, "u", "ts_us", "e", ["a", "b", "c"], window_us=100
        )
        got = {
            r.stage: (r.n_at_least, r.n_exact, r.lag_sum_us)
            for r in funnel_counts(per, n_steps=3).collect()
        }
        assert got == {1: (3, 1, 0), 2: (2, 1, 10), 3: (1, 1, 20)}

    def test_rejects_single_step(self, spark):
        df = spark.createDataFrame([(1, 10, "a")], "u long, ts_us long, e string")
        with pytest.raises(ValueError, match="at least 2"):
            window_funnel(df, "u", "ts_us", "e", ["a"], window_us=10)

    def test_single_shuffle_plan(self, spark):
        df = spark.createDataFrame(
            [(1, 10, "a")], "u long, ts_us long, e string"
        )
        plan = window_funnel(
            df, "u", "ts_us", "e", ["a", "b"], window_us=10
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 2  # agg partial+final pair


class TestDeclaredSteps:
    def test_unpivot_round_trip(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark)
        ents = {
            "wide": spark.createDataFrame(
                [("x", 1.0, 2.0), ("y", 3.0, None)],
                "k string, a double, b double",
            )
        }
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "unpivot",
                    "entity_name": "wide",
                    "id_columns": ["k"],
                    "value_columns": ["a", "b"],
                    "new_entity_name": "long",
                }
            ),
        )
        got = {
            (r.k, r.variable): r.value for r in ents["long"].collect()
        }
        assert got[("x", "a")] == 1.0 and got[("y", "b")] is None

    def test_funnel_and_retention_steps_dispatch(self, spark):
        from data_validation_engine_spark.steps import StepEngine, parse_step

        eng = StepEngine(spark)
        ents = {
            "ev": spark.createDataFrame(
                [(1, 10, "a"), (1, 20, "b")], "u long, ts_us long, e string"
            )
        }
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "window_funnel",
                    "entity_name": "ev",
                    "user_column": "u",
                    "ts_us_column": "ts_us",
                    "event_column": "e",
                    "steps": ["a", "b"],
                    "window_us": 100,
                    "counts": True,
                    "new_entity_name": "fc",
                }
            ),
        )
        assert ents["fc"].count() == 2
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "retention_cohorts",
                    "entity_name": "ev",
                    "user_column": "u",
                    "ts_us_column": "ts_us",
                    "period_us": DAY,
                    "new_entity_name": "rc",
                }
            ),
        )
        assert ents["rc"].first().n_users == 1


class TestBuildPostings:
    def test_postings_ordered_and_exact(self, spark):
        from data_validation_engine_spark.llmops.text import build_postings

        docs = spark.createDataFrame(
            [(2, "x y x"), (1, "x z"), (3, "x")],
            "doc_id long, text string",
        )
        got = {
            r.term: (r.doc_freq, r.tf_total, r.postings_csv)
            for r in build_postings(docs, "doc_id", "text").collect()
        }
        assert got["x"] == (3, 4, "1:1,2:2,3:1")
        assert got["y"] == (1, 1, "2:1")

    def test_hot_term_guard(self, spark):
        from data_validation_engine_spark.llmops.text import build_postings

        docs = spark.createDataFrame(
            [(i, "the word%d" % i) for i in range(10)],
            "doc_id long, text string",
        )
        terms = {
            r.term
            for r in build_postings(
                docs, "doc_id", "text", max_postings=5
            ).collect()
        }
        assert "the" not in terms and "word3" in terms


class TestStreamingWindowFunnel:
    STEPS = ["view", "click", "purchase"]
    WIN = 3 * 86_400_000_000

    def _final(self, spark, out):
        from pyspark.sql import functions as F

        return {
            r.user_id: (r.stage, r.t_enter_us, r.t_reach_us)
            for r in spark.read.parquet(f"{out}/data")
            .groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("stage", "t_enter_us", "t_reach_us"), "stage"
                ).alias("s")
            )
            .select("user_id", "s.*")
            .collect()
        }

    def _batch(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from data_validation_engine_spark.llmops.events import window_funnel

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        return {
            r.user_id: (r.stage, r.t_enter_us, r.t_reach_us)
            for r in window_funnel(
                ev, "user_id", "ts_us", "event_type", self.STEPS,
                window_us=self.WIN,
            ).collect()
        }

    def test_single_drain_matches_batch(self, spark, sf_dir, tmp_path):
        import tempfile

        from data_validation_engine_spark.streaming import (
            read_entity_stream,
            streaming_window_funnel,
        )

        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        sdf = read_entity_stream(
            spark, sf_dir, schema,
            options={"pathGlobFilter": "events.parquet"},
        )
        out = tempfile.mkdtemp(prefix="dve_sfunnel_")
        q = (
            streaming_window_funnel(
                sdf, "user_id", "ts", "event_type", self.STEPS,
                window_us=self.WIN, watermark="366 days",
            )
            .writeStream.format("parquet")
            .option("path", f"{out}/data")
            .option("checkpointLocation", f"{out}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = self._final(spark, out)
        want = self._batch(spark, sf_dir)
        assert got == want and len(got) > 0

    def test_cross_batch_state_carries(self, spark, sf_dir, tmp_path):
        """Two micro-batches split by event time: the chain anchored in
        batch 1 must deepen in batch 2 via carried state."""
        import tempfile

        from pyspark.sql import functions as F

        from data_validation_engine_spark.streaming import (
            read_entity_stream,
            streaming_window_funnel,
        )

        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        ev = spark.read.schema(schema).parquet(f"{sf_dir}/events.parquet")
        cut = ev.agg(
            F.expr("percentile_approx(unix_micros(ts), 0.5)")
        ).first()[0]
        src = tmp_path / "src"
        src.mkdir()
        ev.where(f"unix_micros(ts) <= {cut}").coalesce(1).write.parquet(
            str(src / "b1.parquet")
        )
        ev.where(f"unix_micros(ts) > {cut}").coalesce(1).write.parquet(
            str(src / "b2.parquet")
        )
        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*/")
        )
        out = tempfile.mkdtemp(prefix="dve_sfunnel2_")
        q = (
            streaming_window_funnel(
                sdf, "user_id", "ts", "event_type", self.STEPS,
                window_us=self.WIN, watermark="366 days",
            )
            .writeStream.format("parquet")
            .option("path", f"{out}/data")
            .option("checkpointLocation", f"{out}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        got = self._final(spark, out)
        want = self._batch(spark, sf_dir)
        assert got == want and len(got) > 0

    def test_rejects_batch_frame(self, spark, sf_dir):
        import pytest as _pt

        from data_validation_engine_spark.errors import ConfigurationError
        from data_validation_engine_spark.streaming import (
            streaming_window_funnel,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        with _pt.raises(ConfigurationError, match="streaming"):
            streaming_window_funnel(
                ev, "user_id", "ts", "event_type", ["a", "b"],
                window_us=1,
            )
