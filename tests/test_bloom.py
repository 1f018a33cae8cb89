"""Bloom filter: mergeable approximate set membership (llmops/sketch.py).

Net-new extension (the reference has no sketch surface); semantics per
Bloom 1970. The tests pin the three guarantees the docstrings state:
never a false negative, union-by-OR mergeability, and NULL treated as a
real member — plus the grouped/NULL-group join contract shared with
cms_query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.sketch import (
    bloom_build,
    bloom_merge,
    bloom_might_contain,
)


def _members(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_bloom_no_false_negatives(spark):
    members = [f"doc-{i}" for i in range(200)]
    bloom = bloom_build(_members(spark, members), "v", m_bits=4096, k_hashes=5)
    probes = _members(spark, members)
    out = bloom_might_contain(bloom, probes, "v", m_bits=4096, k_hashes=5)
    assert out.count() == 200
    assert out.where(~F.col("might_contain")).count() == 0


def test_bloom_false_positive_rate_sane(spark):
    members = [f"doc-{i}" for i in range(200)]
    bloom = bloom_build(_members(spark, members), "v", m_bits=4096, k_hashes=5)
    non_members = [f"other-{i}" for i in range(1000)]
    out = bloom_might_contain(
        bloom, _members(spark, non_members), "v", m_bits=4096, k_hashes=5
    )
    fp = out.where(F.col("might_contain")).count()
    # m/n = 20.5, k = 5 -> theoretical fp ~ 0.004; allow 10x headroom
    assert fp <= 40, f"false-positive rate implausibly high: {fp}/1000"


def test_bloom_sparse_and_bounded(spark):
    bloom = bloom_build(
        _members(spark, [f"d{i}" for i in range(50)]),
        "v",
        m_bits=1 << 16,
        k_hashes=5,
    ).collect()
    # sparse: far fewer words than m_bits/63 + 1 = 1041 for 50*5 bits
    assert 0 < len(bloom) <= 250
    assert all(r["bits"] != 0 for r in bloom)
    # 63 bits per word (sign bit never used: cross-engine portability)
    assert all(0 <= r["word"] <= (1 << 16) // 63 for r in bloom)
    assert all(r["bits"] > 0 for r in bloom)


def test_bloom_null_is_a_real_member(spark):
    with_null = spark.createDataFrame(
        [("a",), (None,), ("b",)], "v string"
    )
    bloom = bloom_build(with_null, "v", m_bits=2048, k_hashes=4)
    probe = spark.createDataFrame([(None,), ("a",)], "v string")
    got = {
        (r["v"], r["might_contain"])
        for r in bloom_might_contain(
            bloom, probe, "v", m_bits=2048, k_hashes=4
        ).collect()
    }
    assert (None, True) in got and ("a", True) in got
    # a filter built WITHOUT null should (almost surely) reject it
    no_null = bloom_build(
        _members(spark, ["a", "b"]), "v", m_bits=2048, k_hashes=4
    )
    [r] = bloom_might_contain(
        no_null, probe.where(F.col("v").isNull()), "v",
        m_bits=2048, k_hashes=4,
    ).collect()
    assert r["might_contain"] is False


def test_bloom_merge_equals_build_of_union(spark):
    a = _members(spark, [f"a{i}" for i in range(100)])
    b = _members(spark, [f"b{i}" for i in range(100)])
    merged = bloom_merge(
        bloom_build(a, "v", m_bits=4096).unionByName(
            bloom_build(b, "v", m_bits=4096)
        )
    )
    direct = bloom_build(a.unionByName(b), "v", m_bits=4096)
    m = {(r["word"], r["bits"]) for r in merged.collect()}
    d = {(r["word"], r["bits"]) for r in direct.collect()}
    assert m == d


def test_bloom_grouped_with_null_group_key(spark):
    df = spark.createDataFrame(
        [("en", "x"), ("en", "y"), ("fr", "z"), (None, "w")],
        "lang string, v string",
    )
    bloom = bloom_build(
        df, "v", group_cols=["lang"], m_bits=2048, k_hashes=4
    )
    probes = spark.createDataFrame(
        [("en", "x"), ("en", "z"), ("fr", "z"), (None, "w"), (None, "x")],
        "lang string, v string",
    )
    out = bloom_might_contain(
        bloom, probes, "v", group_cols=["lang"], m_bits=2048, k_hashes=4
    )
    got = {
        (r["lang"], r["v"]): r["might_contain"] for r in out.collect()
    }
    assert got[("en", "x")] is True
    assert got[("fr", "z")] is True
    # NULL group key reads ITS OWN filter (never-false-negative holds)
    assert got[(None, "w")] is True
    # cross-group probes are (almost surely) rejected at this fill
    assert got[("en", "z")] is False
    assert got[(None, "x")] is False


def test_bloom_validates_params(spark):
    import pytest

    df = _members(spark, ["a"])
    with pytest.raises(ValueError):
        bloom_build(df, "v", m_bits=0)
    with pytest.raises(ValueError):
        bloom_build(df, "v", k_hashes=0)


def test_bloom_plan_has_no_cartesian(spark):
    members = _members(spark, [f"d{i}" for i in range(50)])
    bloom = bloom_build(members, "v", m_bits=2048)
    out = bloom_might_contain(bloom, members, "v", m_bits=2048)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_declared_step_lifecycle(spark):
    """build -> merge -> query through the JSON rule-program surface:
    a decontamination pre-screen declared entirely as steps."""
    from data_validation_engine_spark.steps import StepEngine, parse_step

    eng = StepEngine(spark, register_functions=False)
    batch1 = _members(spark, [f"bench-{i}" for i in range(50)])
    batch2 = _members(spark, [f"bench-{i}" for i in range(50, 100)])
    probes = _members(
        spark, ["bench-3", "bench-77", "clean-1", "clean-2"]
    )
    ents = {"b1": batch1, "b2": batch2, "probe": probes}
    for name in ("b1", "b2"):
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "bloom_filter",
                    "entity_name": name,
                    "value_column": "v",
                    "m_bits": 4096,
                    "new_entity_name": f"bf_{name}",
                }
            ),
        )
    ents["bf_all"] = ents["bf_b1"].unionByName(ents["bf_b2"])
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "bloom_filter",
                "mode": "merge",
                "entity_name": "bf_all",
                "new_entity_name": "bf",
            }
        ),
    )
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "bloom_filter",
                "mode": "query",
                "entity_name": "probe",
                "bloom_name": "bf",
                "value_column": "v",
                "m_bits": 4096,
                "new_entity_name": "flagged",
            }
        ),
    )
    got = {r["v"]: r["might_contain"] for r in ents["flagged"].collect()}
    assert got["bench-3"] is True and got["bench-77"] is True
    assert got["clean-1"] is False and got["clean-2"] is False

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bloom_name"):
        eng.evaluate(
            ents,
            config=parse_step(
                {
                    "operation": "bloom_filter",
                    "mode": "query",
                    "entity_name": "probe",
                    "value_column": "v",
                }
            ),
        )
