"""Source interleaving by stride scheduling (llmops/split.py
interleave_sources; Waldspurger & Weihl 1995)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.split import interleave_sources


def _corpus(spark, sizes):
    rows = [
        (f"{src}-{i}", src) for src, n in sizes.items() for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc string, src string")


def test_ratios_hold_in_every_prefix(spark):
    df = _corpus(spark, {"web": 600, "code": 300, "wiki": 300})
    out = interleave_sources(
        df, "src", {"web": 2.0, "code": 1.0, "wiki": 1.0}, "doc"
    )
    ordered = [
        r["src"]
        for r in out.orderBy("interleave_order", "src", "doc").collect()
    ]
    # every reasonably sized prefix shows ~2:1:1
    for cut in (40, 100, 400, 1200):
        prefix = ordered[:cut]
        web = prefix.count("web") / cut
        assert 0.42 <= web <= 0.58, (cut, web)
        code = prefix.count("code") / cut
        assert 0.17 <= code <= 0.33, (cut, code)


def test_deterministic_and_seeded(spark):
    df = _corpus(spark, {"a": 50, "b": 50})
    w = {"a": 1.0, "b": 1.0}
    o1 = [r["doc"] for r in interleave_sources(df, "src", w, "doc")
          .orderBy("interleave_order", "src", "doc").collect()]
    o2 = [r["doc"] for r in interleave_sources(df.repartition(7), "src", w, "doc")
          .orderBy("interleave_order", "src", "doc").collect()]
    assert o1 == o2  # partitioning-independent
    o3 = [r["doc"] for r in interleave_sources(df, "src", w, "doc", seed="s2")
          .orderBy("interleave_order", "src", "doc").collect()]
    assert o1 != o3


def test_exhausted_source_just_stops(spark):
    df = _corpus(spark, {"big": 90, "small": 10})
    out = interleave_sources(
        df, "src", {"big": 1.0, "small": 1.0}, "doc"
    )
    ordered = [
        r["src"]
        for r in out.orderBy("interleave_order", "src", "doc").collect()
    ]
    # 1:1 until small runs dry (first ~20 rows alternate), then big only
    assert ordered[:20].count("small") >= 8
    assert set(ordered[-60:]) == {"big"}


def test_unknown_source_fails_loudly(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = _corpus(spark, {"a": 5, "mystery": 5})
    with pytest.raises(SparkRuntimeException, match="not in weights"):
        interleave_sources(df, "src", {"a": 1.0}, "doc").collect()
    with pytest.raises(ValueError):
        interleave_sources(df, "src", {}, "doc")
    with pytest.raises(ValueError):
        interleave_sources(df, "src", {"a": 0.0}, "doc")


def test_plan_has_no_single_partition_data_window(spark):
    df = _corpus(spark, {"a": 100, "b": 100})
    plan = (
        interleave_sources(df, "src", {"a": 1.0, "b": 3.0}, "doc")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the data-side window partitions by (source, bucket); only the
    # 65536-row-bounded offsets frame may single-partition
    assert "CartesianProduct" not in plan
    data_windows = [
        seg for seg in plan.split("Window ")
        if "__lrk" in seg.split("\n")[0] or "row_number" in seg.split("\n")[0]
    ]
    assert all("SinglePartition" not in seg.split("\n")[0] for seg in data_windows)
