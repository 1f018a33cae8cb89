"""End-to-end dischema pipeline tests (planets-style shape over synthetic
nation/region data): contract + refdata + rule store + sync filters +
complex rule -> entities + messages + audit rows."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.dischema import load_dischema, parse_dischema
from data_validation_engine_spark.pipeline import run_pipeline

SF_DIR = "/root/testdata/sf0.001"

RULESET = {
    "field_under_limit": {
        "description": "Ensure a field is under a parameterised limit.",
        "type": "filter",
        "parameter_defaults": {"limit": 1000},
        "rule_config": {
            "entity": "{{entity}}",
            "name": "under_{{field}}",
            "expression": "{{field}} IS NOT NULL AND {{field}} < {{limit}}",
            "failure_message": "{{failure_message or 'Field over limit'}}",
            "error_code": "{{error_code|default(('high_' + field).upper())}}",
            "reporting_field": "{{field}}",
        },
    },
    "add_and_drop_marker": {
        "description": "Add a marker column, filter on it, drop it.",
        "type": "complex_rule",
        "parameter_defaults": {},
        "rule_config": {
            "rules": [
                {
                    "operation": "add",
                    "entity": "{{entity}}",
                    "column_name": "marker",
                    "expression": "1",
                }
            ],
            "filters": [
                {
                    "entity": "{{entity}}",
                    "name": "marker_is_one",
                    "expression": "marker == 1",
                }
            ],
            "post_filter_rules": [
                {
                    "operation": "remove",
                    "entity": "{{entity}}",
                    "column_name": "marker",
                }
            ],
        },
    },
}

DISCHEMA = {
    "contract": {
        "types": {
            "ShortName": {
                "callable": "constr",
                "constraints": {"min_length": 1, "max_length": 30},
            }
        },
        "datasets": {
            "customers": {
                "fields": {
                    "c_custkey": "int",
                    "c_name": "ShortName",
                    "c_nationkey": "int",
                    "c_acctbal": "float",
                },
                "key_field": "c_custkey",
                "mandatory_fields": ["c_custkey", "c_name"],
                "reader_config": {".csv": {"reader": "SparkCSVReader"}},
            }
        },
    },
    "transformations": {
        "parameters": {"min_bal": -500},
        "reference_data": {
            "nations": {"type": "filename", "filename": "nation.parquet"}
        },
        "rule_stores": [
            {"store_type": "json", "filename": "test_ruleset.json"}
        ],
        "rules": [
            {
                "operation": "left_join",
                "entity": "customers",
                "target": "refdata_nations",
                "join_condition": (
                    "customers.c_nationkey == refdata_nations.n_nationkey"
                ),
                "new_columns": {"refdata_nations.n_name": "nation_name"},
            }
        ],
        "filters": [
            {
                "entity": "customers",
                "name": "bal_floor",
                "expression": "c_acctbal > {{min_bal}}",
                "error_code": "LOW_BAL",
                "failure_message": "balance below {{min_bal}}",
                "reporting_field": "c_custkey",
            },
            {
                "rule_name": "field_under_limit",
                "parameters": {"entity": "customers", "field": "c_acctbal"},
            },
        ],
        "post_filter_rules": [
            {
                "operation": "group_by",
                "entity": "customers",
                "group_by": {"nation_name": "nation_name"},
                "agg_columns": {
                    "count(1)": "n_customers",
                    "round(sum(c_acctbal), 2)": "total_bal",
                },
                "new_entity_name": "by_nation",
            }
        ],
        "complex_rules": [
            {"rule_name": "add_and_drop_marker", "parameters": {"entity": "customers"}}
        ],
    },
}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory, spark):
    """Dischema file + rule store + CSV input + refdata, staged on disk."""
    root = tmp_path_factory.mktemp("pipeline_e2e")
    (root / "test_ruleset.json").write_text(json.dumps(RULESET))
    (root / "dischema.json").write_text(json.dumps(DISCHEMA))

    # stage refdata (filename-relative)
    nations = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    nations.write.mode("overwrite").parquet(str(root / "nation.parquet"))

    # CSV input with deterministic dirt: customer 7 has no name (mandatory
    # violation), customer 13 has junk acctbal (type violation)
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    dirty = cust.selectExpr(
        "CAST(c_custkey AS STRING) AS c_custkey",
        "CASE WHEN c_custkey = 7 THEN NULL ELSE c_name END AS c_name",
        "CAST(c_nationkey AS STRING) AS c_nationkey",
        "CASE WHEN c_custkey = 13 THEN 'junk' "
        "ELSE CAST(c_acctbal AS STRING) END AS c_acctbal",
    )
    pdf = dirty.toPandas()
    csv_path = root / "customers.csv"
    pdf.to_csv(csv_path, index=False)
    return root


@pytest.fixture(scope="module")
def result(spark, workspace, tmp_path_factory):
    work = tmp_path_factory.mktemp("pipeline_work")
    return run_pipeline(
        spark,
        workspace / "dischema.json",
        {"customers": str(workspace / "customers.csv")},
        work,
        refdata_base_path=str(workspace),
        audit_path=str(work / "audit"),
        submission_info={
            "dataset_id": "test",
            "file_name": "customers.csv",
            "file_extension": ".csv",
            "submission_method": "test",
            "submitting_org": "X26",
            "reporting_period_start": "2024-04-01",
            "reporting_period_end": "2025-03-31",
            "file_size": 1,
            "datetime_received": __import__("datetime").datetime(2026, 1, 1),
        },
    )


def test_dischema_requires_base_dir_for_rule_stores():
    from data_validation_engine_spark.errors import ConfigurationError

    with pytest.raises(ConfigurationError, match="base_dir"):
        parse_dischema(DISCHEMA)


def test_dischema_structure(workspace):
    ds = load_dischema(workspace / "dischema.json")
    assert [r.name for r in ds.rules] == ["add_and_drop_marker", "root"]
    root = ds.rules[-1]
    assert len(root.pre_sync) == 1 and len(root.post_sync) == 1
    assert len(ds.sync_filters) == 3  # marker + bal_floor + rule-store filter
    assert ds.refdata["nations"].type == "filename"
    # templated rule-store filter resolved upfront
    codes = {f.reporting.code for f in ds.sync_filters}
    assert "HIGH_C_ACCTBAL" in codes and "LOW_BAL" in codes


def test_dependency_order_enforced(workspace):
    bad = json.loads(json.dumps(DISCHEMA))
    bad["transformations"]["complex_rules"] = [
        {"rule_name": "needs_dep", "parameters": {}}
    ]
    store = dict(RULESET)
    store["needs_dep"] = {
        "type": "complex_rule",
        "dependencies": ["not_added_yet"],
        "rule_config": {"rules": [], "filters": [], "post_filter_rules": []},
    }
    from data_validation_engine_spark.errors import ConfigurationError

    d = workspace / "dep_check"
    d.mkdir(exist_ok=True)
    (d / "test_ruleset.json").write_text(json.dumps(store))
    (d / "dischema.json").write_text(json.dumps(bad))
    with pytest.raises(ConfigurationError, match="dependencies"):
        load_dischema(d / "dischema.json")


def test_pipeline_succeeds(result):
    assert result.success
    assert set(result.entities) == {"customers", "by_nation"}


def test_contract_violations_rejected(spark, result):
    custs = result.entities["customers"]
    keys = {r["c_custkey"] for r in custs.select("c_custkey").collect()}
    assert 7 not in keys  # missing mandatory name
    assert 13 not in keys  # junk balance
    msgs = result.messages
    codes = {
        r["error_code"]
        for r in msgs.where("failure_type = 'record'").select("error_code").distinct().collect()
    }
    assert "MISSING_MANDATORY_VALUE" in codes


def test_filters_applied_with_templated_code(result):
    # rule-store filter default error code: ('high_' + field).upper()
    codes = {
        r["error_code"]
        for r in result.messages.select("error_code").distinct().collect()
    }
    assert "HIGH_C_ACCTBAL" in codes  # templated default
    assert "LOW_BAL" in codes  # concrete filter with {{min_bal}} global
    survivors = result.entities["customers"]
    bal = survivors.agg(
        F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi")
    ).first()
    assert bal["lo"] > -500 and bal["hi"] < 1000


def test_complex_rule_ran_and_cleaned_up(result):
    assert "marker" not in result.entities["customers"].columns


def test_post_filter_aggregate_entity(result):
    by_nation = result.entities["by_nation"]
    assert by_nation.count() > 0
    assert set(by_nation.columns) == {"nation_name", "n_customers", "total_bal"}


def test_audit_rows_written(spark, result, tmp_path_factory):
    # audit lives in the same work dir the result was built with
    from data_validation_engine_spark.sinks.audit import AuditLog

    # reconstruct from the result's errors_dir sibling
    from pathlib import Path

    audit = AuditLog(spark, str(Path(result.errors_dir).parent / "audit"))
    status = audit.latest_status(result.submission_id).first()
    assert status["status"] == "completed"
    stats = audit.read("submission_statistics").first()
    assert stats["number_record_rejections"] == result.statistics["n_record_rejections"]
    assert result.statistics["n_record_rejections"] >= 2


def test_process_landing_end_to_end(spark, workspace, tmp_path_factory):
    """Landing discovery: pair + move + audit + run; dead-letter strays."""
    import shutil

    from data_validation_engine_spark.pipeline import process_landing
    from data_validation_engine_spark.sinks.audit import AuditLog

    root = tmp_path_factory.mktemp("landing")
    landing = root / "landing"
    landing.mkdir()
    shutil.copy(workspace / "customers.csv", landing / "customers.csv")
    (landing / "customers.csv.metadata.json").write_text(
        json.dumps({"dataset_id": "test", "file_name": "customers.csv"})
    )
    (landing / "stray.csv").write_text("a,b\n1,2\n")

    results = process_landing(
        spark,
        workspace / "dischema.json",
        str(landing),
        root / "out",
        refdata_base_path=str(workspace),
        audit_path=str(root / "audit"),
        write_report=False,
    )
    assert len(results) == 1 and results[0].success
    # landing emptied; pair moved under processed/<submission_id>/
    assert list(landing.iterdir()) == []
    processed = root / "out" / "processed" / results[0].submission_id
    assert (processed / "customers.csv").exists()
    assert (root / "out" / "dead_letter" / "stray.csv").exists()
    audit = AuditLog(spark, str(root / "audit"))
    t = audit.read("transfers").first()
    assert t["submission_id"] == results[0].submission_id
    assert t["report_name"] == "customers.csv"


def test_process_landing_thread_pool_fan_out(spark, workspace, tmp_path_factory):
    """max_workers > 1 maps submissions over a thread pool (reference
    concurrency model, dve pipeline/pipeline.py:950-977): three
    submissions at max_workers=2 produce per-submission audit rows and
    outputs identical to the sequential run."""
    import shutil

    from data_validation_engine_spark.pipeline import process_landing
    from data_validation_engine_spark.sinks.audit import AuditLog

    def stage(root):
        landing = root / "landing"
        landing.mkdir()
        for i in range(3):
            shutil.copy(workspace / "customers.csv", landing / f"c{i}.csv")
            (landing / f"c{i}.csv.metadata.json").write_text(
                json.dumps({"dataset_id": "test", "file_name": f"c{i}.csv"})
            )
        return landing

    def run(root, workers):
        return process_landing(
            spark,
            workspace / "dischema.json",
            str(stage(root)),
            root / "out",
            refdata_base_path=str(workspace),
            audit_path=str(root / "audit"),
            write_report=False,
            max_workers=workers,
        )

    seq_root = tmp_path_factory.mktemp("landing_seq")
    par_root = tmp_path_factory.mktemp("landing_par")
    seq = run(seq_root, 1)
    par = run(par_root, 2)

    assert len(par) == 3 and all(r.success for r in par)
    # same outputs as sequential, submission by submission
    for s, p in zip(seq, par):
        assert p.statistics == s.statistics
        assert sorted(p.entities) == sorted(s.entities)
        for name in p.entities:
            assert p.entities[name].count() == s.entities[name].count()
    # per-submission audit rows: 3 transfers, 3 completed statuses
    audit = AuditLog(spark, str(par_root / "audit"))
    transfers = audit.read("transfers").collect()
    assert {t["submission_id"] for t in transfers} == {
        r.submission_id for r in par
    }
    for r in par:
        assert audit.latest_status(r.submission_id).first()["status"] == "completed"

    # result order follows discovery order regardless of completion order
    def landed_names(root, results):
        out = []
        for r in results:
            d = root / "out" / "processed" / r.submission_id
            out.append(
                sorted(
                    f.name for f in d.iterdir()
                    if not f.name.endswith(".metadata.json")
                )[0]
            )
        return out

    assert landed_names(par_root, par) == landed_names(seq_root, seq)


def test_empty_input_flows_through(spark, workspace, tmp_path_factory):
    """Empty-entity handling: a header-only CSV produces empty (not failed)
    entities and no messages (SURVEY hard-parts watch list)."""
    from data_validation_engine_spark.pipeline import run_pipeline

    root = tmp_path_factory.mktemp("empty_input")
    empty_csv = root / "customers.csv"
    empty_csv.write_text("c_custkey,c_name,c_nationkey,c_acctbal\n")
    res = run_pipeline(
        spark,
        workspace / "dischema.json",
        {"customers": str(empty_csv)},
        root / "work",
        refdata_base_path=str(workspace),
        write_report=False,
    )
    assert res.success
    assert res.entities["customers"].count() == 0
    assert res.entities["by_nation"].count() == 0
    assert res.messages.where("failure_type = 'record'").count() == 0


def test_cache_originals_exposes_pre_rule_copies(spark, workspace, tmp_path_factory):
    """cache_originals keeps an Original<entity> snapshot through rules
    (dve pipeline.py:581-586)."""
    bad = json.loads(json.dumps(DISCHEMA))
    bad["contract"]["cache_originals"] = True
    d = workspace / "originals"
    d.mkdir(exist_ok=True)
    (d / "test_ruleset.json").write_text(json.dumps(RULESET))
    (d / "dischema.json").write_text(json.dumps(bad))
    work = tmp_path_factory.mktemp("originals_work")
    res = run_pipeline(
        spark,
        d / "dischema.json",
        {"customers": str(workspace / "customers.csv")},
        work,
        refdata_base_path=str(workspace),
        write_report=False,
    )
    assert res.success
    assert "Originalcustomers" in res.entities
    # the original copy has no rule-added columns
    assert "nation_name" not in res.entities["Originalcustomers"].columns
    assert "nation_name" in res.entities["customers"].columns


def test_rejection_survives_entity_rename(spark, workspace, tmp_path_factory):
    """Contract-rejected records must still be dropped from entities that
    were RENAMED during business rules: rejection matches rows by their
    (origin, record index) lineage, not the entity's current name."""
    renamed = json.loads(json.dumps(DISCHEMA))
    renamed["transformations"]["post_filter_rules"].append(
        {
            "operation": "rename_entity",
            "entity": "customers",
            "new_entity_name": "clients",
        }
    )
    d = workspace / "renamed"
    d.mkdir(exist_ok=True)
    (d / "test_ruleset.json").write_text(json.dumps(RULESET))
    (d / "dischema.json").write_text(json.dumps(renamed))
    work = tmp_path_factory.mktemp("renamed_work")
    res = run_pipeline(
        spark,
        d / "dischema.json",
        {"customers": str(workspace / "customers.csv")},
        work,
        refdata_base_path=str(workspace),
        write_report=False,
    )
    assert res.success
    assert "clients" in res.entities and "customers" not in res.entities
    keys = {r["c_custkey"] for r in res.entities["clients"].select("c_custkey").collect()}
    assert 7 not in keys  # missing mandatory name — rejected post-rename
    assert 13 not in keys  # junk balance — rejected post-rename
    # hidden lineage columns never reach the written outputs
    assert not any(c.startswith("__") for c in res.entities["clients"].columns)


def test_missing_entity_fails_critically(spark, workspace, tmp_path_factory):
    work = tmp_path_factory.mktemp("pipeline_missing")
    res = run_pipeline(
        spark,
        workspace / "dischema.json",
        {},
        work,
        refdata_base_path=str(workspace),
    )
    assert not res.success
    codes = {r["error_code"] for r in res.messages.collect()}
    assert codes == {"MISSING_ENTITY"}


def test_rule_message_rejection_survives_entity_rename(
    spark, workspace, tmp_path_factory
):
    """Record failures emitted by business RULES after a rename must still
    drop records at final write: messages carry the row's origin lineage
    (__origin_entity__), not the entity's name at notify time (ADVICE r3)."""
    doc = json.loads(json.dumps(DISCHEMA))
    doc["transformations"]["post_filter_rules"].extend(
        [
            {
                "operation": "rename_entity",
                "entity": "customers",
                "new_entity_name": "clients",
            },
            {
                "operation": "notify",
                "entity": "clients",
                "expression": "c_custkey = 8",
                "reporting": {
                    "code": "BAD_ONE",
                    "message": "custkey eight flagged post-rename",
                    "emit": "record_failure",
                },
            },
        ]
    )
    d = workspace / "rule_renamed"
    d.mkdir(exist_ok=True)
    (d / "test_ruleset.json").write_text(json.dumps(RULESET))
    (d / "dischema.json").write_text(json.dumps(doc))
    work = tmp_path_factory.mktemp("rule_renamed_work")
    res = run_pipeline(
        spark,
        d / "dischema.json",
        {"customers": str(workspace / "customers.csv")},
        work,
        refdata_base_path=str(workspace),
        write_report=False,
    )
    assert res.success
    msgs = res.messages.where(F.col("error_code") == "BAD_ONE").collect()
    assert len(msgs) == 1
    # the message carries the row's ORIGIN entity, so stage-5 rejection
    # (keyed on origin + index) still matches after the rename
    assert msgs[0]["original_entity"] == "customers"
    keys = {
        r["c_custkey"]
        for r in res.entities["clients"].select("c_custkey").collect()
    }
    assert 8 not in keys


def test_cache_originals_snapshots_exempt_from_rejection(
    spark, workspace, tmp_path_factory
):
    """Original* snapshots are the BEFORE-rules picture: the reference
    explicitly skips them at record rejection (dve pipeline.py:614-625), so
    contract-rejected rows must still be present in the snapshot output
    while being dropped from the live entity (ADVICE r3)."""
    doc = json.loads(json.dumps(DISCHEMA))
    doc["contract"]["cache_originals"] = True
    d = workspace / "originals"
    d.mkdir(exist_ok=True)
    (d / "test_ruleset.json").write_text(json.dumps(RULESET))
    (d / "dischema.json").write_text(json.dumps(doc))
    work = tmp_path_factory.mktemp("originals_work")
    res = run_pipeline(
        spark,
        d / "dischema.json",
        {"customers": str(workspace / "customers.csv")},
        work,
        refdata_base_path=str(workspace),
        write_report=False,
    )
    assert res.success
    assert "Originalcustomers" in res.entities
    snap_keys = {
        r["c_custkey"]
        for r in res.entities["Originalcustomers"].select("c_custkey").collect()
    }
    live_keys = {
        r["c_custkey"]
        for r in res.entities["customers"].select("c_custkey").collect()
    }
    # contract-rejected rows (7: missing name, 13: junk balance) stay in
    # the snapshot but are dropped from the live entity
    assert {7, 13} <= snap_keys
    assert not ({7, 13} & live_keys)
    # hidden lineage columns never reach the written snapshot
    assert not any(
        c.startswith("__") for c in res.entities["Originalcustomers"].columns
    )


def test_error_aggregates_artifact(result, spark):
    """Stage 6 persists the per-(entity, code) aggregate frame as a parquet
    audit artifact stamped with the submission id (the reference publishes
    the same frame: dve pipeline/pipeline.py:730-746)."""
    assert result.error_aggregates_path is not None
    agg = spark.read.parquet(result.error_aggregates_path)
    assert set(agg.columns) == {
        "entity",
        "error_code",
        "failure_type",
        "n_errors",
        "n_records",
        "submission_id",
    }
    rows = {r["error_code"]: r for r in agg.collect()}
    # the fixture's known dirt is aggregated: contract violations + filters
    assert "MISSING_MANDATORY_VALUE" in rows
    assert rows["MISSING_MANDATORY_VALUE"]["n_errors"] >= 1
    assert all(
        r["submission_id"] == result.submission_id for r in rows.values()
    )
    # aggregate counts reconcile with the raw message feed
    n_msgs = result.messages.count()
    assert sum(r["n_errors"] for r in rows.values()) == n_msgs


def test_runtime_templating_binds_at_evaluation(
    spark, workspace, tmp_path_factory
):
    """templating_strategy: runtime defers Jinja rendering to evaluation
    time, so a variable with no config-time value binds per submission via
    run_pipeline(runtime_variables=...) (reference strategy:
    dve backends/base/rules.py:572-594)."""
    from data_validation_engine_spark.errors import ConfigurationError

    doc = json.loads(json.dumps(DISCHEMA))
    doc["transformations"]["templating_strategy"] = "runtime"
    # a filter whose threshold is ONLY known at run time
    doc["transformations"]["filters"].append(
        {
            "entity": "customers",
            "name": "runtime_floor",
            "expression": "c_custkey <> {{banned_key}}",
            "error_code": "BANNED_{{banned_key}}",
            "failure_message": "runtime-banned customer",
            "reporting_field": "c_custkey",
        }
    )
    d = workspace / "runtime_tpl"
    d.mkdir(exist_ok=True)
    (d / "test_ruleset.json").write_text(json.dumps(RULESET))
    (d / "dischema.json").write_text(json.dumps(doc))

    ds = load_dischema(d / "dischema.json")
    # parse kept the rules deferred: nothing typed yet, raw dicts present
    assert ds.templating_strategy == "runtime"
    assert all(not r.pre_sync and not r.sync_filters for r in ds.rules)
    assert any(r.raw_filters for r in ds.rules)

    work = tmp_path_factory.mktemp("runtime_tpl_work")
    res = run_pipeline(
        spark,
        d / "dischema.json",
        {"customers": str(workspace / "customers.csv")},
        work,
        refdata_base_path=str(workspace),
        write_report=False,
        runtime_variables={"banned_key": 8},
    )
    assert res.success
    codes = {r["error_code"] for r in res.messages.collect()}
    assert "BANNED_8" in codes  # code itself templated at evaluation time
    keys = {
        r["c_custkey"]
        for r in res.entities["customers"].select("c_custkey").collect()
    }
    assert 8 not in keys

    # upfront dischemas must refuse runtime variables (their templates are
    # already rendered — silently ignoring them would be a trap)
    upfront = load_dischema(workspace / "dischema.json")
    with pytest.raises(ConfigurationError, match="runtime"):
        upfront.resolve({"banned_key": 8})


def test_process_landing_binds_submission_metadata_at_runtime(
    spark, workspace, tmp_path_factory
):
    """Under the runtime templating strategy, landing orchestration binds
    each submission's metadata as the `submission` template variable, so
    rules can reference e.g. {{submission.dataset_id}} per file."""
    import shutil

    from data_validation_engine_spark.pipeline import process_landing

    doc = json.loads(json.dumps(DISCHEMA))
    doc["transformations"]["templating_strategy"] = "runtime"
    doc["transformations"]["rules"].append(
        {
            "operation": "add",
            "entity": "customers",
            "column_name": "dataset_tag",
            "expression": "'{{submission.dataset_id}}'",
        }
    )
    d = workspace / "landing_runtime"
    d.mkdir(exist_ok=True)
    (d / "test_ruleset.json").write_text(json.dumps(RULESET))
    (d / "dischema.json").write_text(json.dumps(doc))

    root = tmp_path_factory.mktemp("landing_runtime_root")
    landing = root / "landing"
    landing.mkdir()
    shutil.copy(workspace / "customers.csv", landing / "customers.csv")
    (landing / "customers.csv.metadata.json").write_text(
        json.dumps({"dataset_id": "cohort_42", "file_name": "customers.csv"})
    )
    results = process_landing(
        spark,
        d / "dischema.json",
        str(landing),
        root / "out",
        refdata_base_path=str(workspace),
        write_report=False,
    )
    assert len(results) == 1 and results[0].success
    tags = {
        r["dataset_tag"]
        for r in results[0].entities["customers"].select("dataset_tag").collect()
    }
    assert tags == {"cohort_42"}
