"""End-to-end pipeline runner: dischema + input files -> validated outputs.

The composition layer over the stage operators (shape parity with the
reference's production entry point ``cluster_pipeline_run``,
dve pipeline/pipeline.py:950-977, minus its per-submission thread pool —
submissions here are independent function calls; Spark job submission is
thread-safe, so callers can fan out with their own executor):

1. **audit received** (dve pipeline/pipeline.py:260-318) — mint a
   submission id, append audit rows.
2. **file transformation** (pipeline.py:320-424) — per contract dataset,
   read the submitted file stringified via the configured reader; write the
   ``transform/`` parquet checkpoint. Entity presence checks (missing file,
   unsupported extension, unconfigured extras) emit critical submission
   messages (dve backends/base/contract.py:227-315).
3. **data contract** (pipeline.py:426-544) — reload ``transform/``, add
   ``__record_index__``, run the expression-compiled contract; write
   ``data_contract/`` parquet + stage errors JSONL.
4. **business rules** (pipeline.py:546-728) — entity manager with lazy
   refdata + ``refdata_dve_submission_info``; pre-sync steps per rule, ONE
   sync-filter stage for all rules, post-sync steps; cross-stage record
   rejection by anti-join on the record index; write final parquet.
5. **error report** (pipeline.py:801-948) — aggregate the message feed
   distributed, write the report + submission statistics audit rows.

The parquet checkpoints between stages are deliberate barriers (error
isolation + restartability); *within* a stage everything is one fused lazy
plan.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from data_validation_engine_spark.contract.apply import (
    apply_contract,
    reject_records,
    reject_records_by_origin,
)
from data_validation_engine_spark.contract.index import add_record_index
from data_validation_engine_spark.dischema import Dischema, load_dischema
from data_validation_engine_spark.entities import EntityManager
from data_validation_engine_spark.messages import (
    MESSAGE_SCHEMA,
    MessageCollector,
    ORIGIN_ENTITY,
    RECORD_INDEX,
)
from data_validation_engine_spark.sinks.audit import AuditLog, new_submission_id
from data_validation_engine_spark.sinks.errors import (
    write_literal_messages_jsonl,
    write_messages_jsonl,
)
from data_validation_engine_spark.sinks.report import (
    error_aggregates,
    write_error_report,
)
from data_validation_engine_spark.sources.csv import CSVOptions, read_csv
from data_validation_engine_spark.sources.json import read_json
from data_validation_engine_spark.sources.xml import read_xml
from data_validation_engine_spark.steps.engine import StepEngine
from data_validation_engine_spark.steps.sync_filters import apply_sync_filters

from pyspark.sql import types as T


def _critical_row(
    entity: str,
    code: str,
    message: str,
    *,
    informational: bool = False,
) -> dict:
    """The literal dict of a submission-level message — the driver-side
    unit the presence/XSD early-return paths write without a Spark job
    (r14 optimization, sinks/errors.py write_literal_messages_jsonl)."""
    return {
        "entity": entity,
        "original_entity": entity,
        RECORD_INDEX: None,
        "error_code": code,
        "error_message": message,
        "error_location": None,
        "failure_type": "submission",
        "is_informational": informational,
        "category": "submission",
        "reporting_field": None,
        "value": None,
        "record_json": None,
    }


def _critical(
    spark: SparkSession,
    entity: str,
    code: str,
    message: str,
    *,
    informational: bool = False,
) -> DataFrame:
    row = _critical_row(entity, code, message, informational=informational)
    return spark.createDataFrame([row], MESSAGE_SCHEMA)


@dataclass
class PipelineResult:
    submission_id: str
    success: bool
    entities: dict[str, DataFrame] = field(default_factory=dict)
    entity_paths: dict[str, str] = field(default_factory=dict)
    messages: Optional[DataFrame] = None
    errors_dir: Optional[str] = None
    report_path: Optional[str] = None
    error_aggregates_path: Optional[str] = None
    statistics: dict[str, int] = field(default_factory=dict)


def _stringified_schema(names: list[str]) -> T.StructType:
    return T.StructType([T.StructField(n, T.StringType(), True) for n in names])


def read_submitted_file(
    spark: SparkSession,
    path: str,
    field_names: list[str],
    reader_config: dict[str, Any],
    *,
    stringified: "T.StructType | None" = None,
) -> DataFrame:
    """Dispatch one submitted file to the configured reader, stringified.

    ``stringified`` is the structure-preserving all-strings schema (nested
    arrays/structs with string leaves) — required for JSON/XML entities
    with nested models; flat entities default to one string per field.
    """
    ext = Path(path).suffix.lower()
    cfg = reader_config.get(ext) or reader_config.get(ext.lstrip(".")) or {}
    kwargs = dict(cfg.get("kwargs", {}))
    kwargs.pop("rules_location", None)
    reader_name = (cfg.get("reader") or "").lower()

    if ext == ".csv" or "csv" in reader_name:
        opt_names = {f.name for f in CSVOptions.__dataclass_fields__.values()}
        options = CSVOptions(
            **{k: v for k, v in kwargs.items() if k in opt_names}
        )
        return read_csv(spark, path, field_names, options)
    if ext == ".json" or "json" in reader_name:
        df = read_json(
            spark,
            path,
            stringified or _stringified_schema(field_names),
            multi_line=bool(kwargs.get("multi_line", True)),
        )
        return df
    if ext == ".xml" or "xml" in reader_name:
        from data_validation_engine_spark.sources.xml import conform_to_schema

        df = read_xml(
            spark,
            path,
            kwargs.get("record_tag", "record"),
            root_tag=kwargs.get("root_tag"),
            explode_record_tag=bool(kwargs.get("root_tag")),
            n_records_to_read=kwargs.get("n_records_to_read"),
        )
        target = stringified or _stringified_schema(field_names)
        return conform_to_schema(df, target)
    if ext in (".parquet", ""):
        df = spark.read.parquet(path)
        return df.select(
            *[F.col(f"`{n}`").cast("string").alias(n) for n in field_names]
        )
    raise ValueError(f"unsupported file extension {ext!r} for {path}")


def run_pipeline(
    spark: SparkSession,
    dischema: Dischema | str | Path,
    input_files: dict[str, str],
    working_dir: str | Path,
    *,
    refdata_base_path: str | None = None,
    audit_path: str | None = None,
    submission_id: str | None = None,
    submission_info: dict[str, Any] | None = None,
    write_report: bool = True,
    runtime_variables: dict[str, Any] | None = None,
) -> PipelineResult:
    """Run transform -> contract -> rules -> report for one submission.

    ``runtime_variables`` bind per-submission template variables for a
    ``templating_strategy: runtime`` dischema (rendered at evaluation
    time, not at config parse).
    """
    if not isinstance(dischema, Dischema):
        dischema = load_dischema(dischema)
    dischema = dischema.resolve(runtime_variables)
    work = Path(working_dir)
    errors_dir = work / "errors"
    submission_id = submission_id or new_submission_id()
    audit = AuditLog(spark, audit_path) if audit_path else None
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)

    def audit_status(status: str, result: str | None = None) -> None:
        if audit:
            audit.append(
                "processing_status",
                [
                    {
                        "submission_id": submission_id,
                        "date_updated": now.date(),
                        "time_updated": now,
                        "status": status,
                        "job_run_id": None,
                        "submission_result": result,
                    }
                ],
            )

    # -- stage 1: audit received -------------------------------------------
    audit_status("received")
    if audit and submission_info:
        audit.append(
            "submission_info",
            [
                {
                    "submission_id": submission_id,
                    "date_updated": now.date(),
                    "time_updated": now,
                    **submission_info,
                }
            ],
        )

    collector = MessageCollector()
    contract = dischema.contract
    datasets = {e.name: e for e in contract.datasets} if contract else {}

    # -- entity presence checks (dve backends/base/contract.py:227-315) ----
    # r14 optimization (guide §5): presence/XSD failures are a handful of
    # DRIVER-LITERAL rows; ``boot_rows`` tracks them so the early-return
    # paths write the feed driver-side (write_literal_messages_jsonl —
    # layout-identical to the distributed writer) instead of paying a
    # ~0.75s Spark write job for 2-3 rows. The collector still carries
    # the frames every continuing path unions downstream.
    boot_rows: list[dict] = []
    missing = set(datasets) - set(input_files)
    extra = set(input_files) - set(datasets)
    for name in sorted(missing):
        boot_rows.append(
            _critical_row(
                name,
                "MISSING_ENTITY",
                f"no file submitted for declared entity {name!r}",
            )
        )
    for name in sorted(extra):
        row = _critical_row(
            name,
            "UNEXPECTED_ENTITY",
            f"file submitted for undeclared entity {name!r}",
        )
        boot_rows.append(row)
        collector.add(spark.createDataFrame([row], MESSAGE_SCHEMA))
    if missing:
        msgs = write_literal_messages_jsonl(
            spark, boot_rows, str(errors_dir / "file_transformation")
        )
        audit_status("failed", "critical")
        return PipelineResult(
            submission_id=submission_id,
            success=False,
            messages=msgs,
            errors_dir=str(errors_dir),
        )

    # -- stage 2: file transformation (stringified checkpoint) -------------
    from data_validation_engine_spark.contract.compile import (
        stringified_schema,
    )
    from data_validation_engine_spark.sources.xml import (
        XSDValidationError,
        validate_xsd,
    )

    transform_counts: dict[str, Observation] = {}
    for name, entity_contract in datasets.items():
        path = input_files[name]
        ext = Path(path).suffix.lower()
        cfg = entity_contract.reader_config.get(ext) or {}
        kwargs = dict(cfg.get("kwargs", {}))
        if kwargs.get("xsd_location"):
            xsd = kwargs["xsd_location"]
            if dischema.base_dir and not Path(xsd).is_absolute():
                xsd = str(Path(dischema.base_dir) / xsd)
            try:
                validate_xsd(path, xsd)
            except XSDValidationError as exc:
                boot_rows.append(
                    _critical_row(
                        name,
                        kwargs.get("xsd_error_code", "XSD_VALIDATION_FAILED"),
                        kwargs.get("xsd_error_message", str(exc)),
                    )
                )
                # every message so far is a driver literal (presence +
                # XSD rows) — same fast path as the presence return
                msgs = write_literal_messages_jsonl(
                    spark, boot_rows, str(errors_dir / "file_transformation")
                )
                audit_status("failed", "critical")
                return PipelineResult(
                    submission_id=submission_id,
                    success=False,
                    messages=msgs,
                    errors_dir=str(errors_dir),
                )
            except ImportError as exc:
                # no XSD backend in this runtime: surface it in the error
                # feed (informational) rather than skipping silently
                row = _critical_row(
                    name, "XSD_NOT_VALIDATED", str(exc), informational=True
                )
                boot_rows.append(row)
                collector.add(
                    spark.createDataFrame([row], MESSAGE_SCHEMA)
                )

        field_names = [f.name for f in entity_contract.fields]
        df = read_submitted_file(
            spark,
            path,
            field_names,
            entity_contract.reader_config,
            stringified=stringified_schema(entity_contract),
        )
        # record_count rides the write action via an Observation instead
        # of a later re-scan-and-count of every transform checkpoint
        # (SURVEY §7: observe metrics replace count-based checks) — at
        # 100 TB the saved pass is a full table scan per entity
        obs = Observation(f"transform_rows_{name}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        df.write.mode("overwrite").parquet(str(work / "transform" / name))
        transform_counts[name] = obs

    # -- stage 3: data contract --------------------------------------------
    # Reference-faithful rejection timing: the contract emits messages and
    # CASTS every record (failed values become nulls); records are dropped
    # only at the final write via the scoped anti-join, so derived entities
    # and notifications built during business rules still see failed
    # records (dve spark/contract.py:120-199, rejection at
    # pipeline.py:614-637).
    contract_messages = MessageCollector()
    for name, entity_contract in datasets.items():
        raw = spark.read.parquet(str(work / "transform" / name))
        indexed = add_record_index(raw)
        typed, messages = apply_contract(
            entity_contract, indexed, drop_failed_records=False
        )
        typed.write.mode("overwrite").parquet(str(work / "data_contract" / name))
        contract_messages.add(messages)
    # lazy checkpoint BEFORE the JSONL write: the write is this frame's
    # first action and materialises the blocks, so the all_messages
    # union below reuses them instead of re-running the whole contract
    # validation DAG a second time (r13, guide §1.2 — the message feed
    # is error-sized, never corpus-sized)
    contract_msgs = contract_messages.union_or_empty(spark).localCheckpoint(
        eager=False
    )
    write_messages_jsonl(contract_msgs, str(errors_dir / "data_contract"))
    collector.add(contract_msgs)

    # -- stage 4: business rules -------------------------------------------
    # every row carries its contract-entity lineage (a constant literal per
    # entity — free under constant folding) so final rejection matches rows
    # by (origin, index) even after rename/copy/union reshuffles the
    # entity NAMESPACE
    entities = EntityManager(
        {
            name: spark.read.parquet(
                str(work / "data_contract" / name)
            ).withColumn(ORIGIN_ENTITY, F.lit(name))
            for name in datasets
        },
        spark=spark,
        refdata=dischema.refdata,
        refdata_base_path=refdata_base_path,
    )
    original_snapshots: set[str] = set()
    if dischema.cache_originals:
        for name in list(datasets):
            entities[f"Original{name}"] = entities[name]
            original_snapshots.add(f"Original{name}")
    if submission_info:
        entities.add_refdata_frame(
            "dve_submission_info",
            spark.createDataFrame([submission_info]),
        )

    engine = StepEngine(spark)
    rule_messages = MessageCollector()
    success = True
    try:
        try:
            for rule in dischema.rules:
                for step in rule.pre_sync:
                    rule_messages.add(engine.evaluate(entities, config=step))
            # ONE sync stage across all rules (validate-all-then-drop)
            rule_messages.add(
                apply_sync_filters(entities, list(dischema.sync_filters))
            )
            for rule in dischema.rules:
                for step in rule.post_sync:
                    rule_messages.add(engine.evaluate(entities, config=step))
        except Exception as exc:
            collector.add(
                _critical(
                    spark,
                    "submission",
                    "PROCESSING_ERROR",
                    f"business rules failed: {type(exc).__name__}: {exc}",
                )
            )
            success = False

        # same lazy-checkpoint-then-write as the contract feed: the
        # rules DAG (joins/steps over the entities) is not re-run when
        # all_messages unions it below
        rule_msgs = rule_messages.union_or_empty(spark).localCheckpoint(
            eager=False
        )
        write_messages_jsonl(rule_msgs, str(errors_dir / "business_rules"))
        collector.add(rule_msgs)
        # lazy checkpoint: all_messages feeds MANY downstream actions (the
        # per-entity rejection anti-joins, the report collect, the
        # error-aggregates write, the statistics aggregate) — materialise
        # the union once at the first consumer instead of re-running the
        # whole message DAG per action
        all_messages = collector.union_or_empty(spark).localCheckpoint(
            eager=False
        )

        result = PipelineResult(
            submission_id=submission_id,
            success=success,
            errors_dir=str(errors_dir),
            messages=all_messages,
        )
        if not success:
            audit_status("failed", "critical")
            return result

        # -- stage 5: record rejection + final entity write ----------------
        for name in list(entities):
            df = entities[name]
            if name in original_snapshots:
                # pre-rule snapshots are written as-is: the reference
                # explicitly skips entities marked original at rejection
                # (dve pipeline/pipeline.py:614-625), and the lineage
                # columns would otherwise route the copy through
                # reject_records_by_origin and drop contract-rejected rows
                # from the "before rules" picture
                df = df.drop(RECORD_INDEX, ORIGIN_ENTITY)
            elif RECORD_INDEX in df.columns:
                if ORIGIN_ENTITY in df.columns:
                    # row-level lineage: reject (origin, index) pairs, so
                    # renamed/copied/unioned entities still drop the records
                    # their contract messages refer to
                    df = reject_records_by_origin(df, all_messages)
                    df = df.drop(RECORD_INDEX, ORIGIN_ENTITY)
                else:
                    # no lineage column: scope rejection to THIS entity's
                    # messages — record indexes are per-entity sequences, so
                    # an unscoped anti-join would reject unrelated rows that
                    # merely share an index value
                    df = reject_records(
                        df,
                        all_messages.where(F.col("original_entity") == name),
                    )
                    df = df.drop(RECORD_INDEX)
            elif ORIGIN_ENTITY in df.columns:
                df = df.drop(ORIGIN_ENTITY)
            out = work / "business_rules" / name
            df.write.mode("overwrite").parquet(str(out))
            result.entity_paths[name] = str(out)
            result.entities[name] = spark.read.parquet(str(out))
    finally:
        # unpersist integrity-check caches on EVERY path — a failure in the
        # rules stage otherwise leaks cached blocks across process_landing
        # loop iterations
        engine.cleanup()

    # -- stage 6: error report + statistics --------------------------------
    if write_report:
        result.report_path = write_error_report(
            all_messages, str(work / "error_report")
        )
    # error_aggregates audit artifact: per (entity, code) counts persisted
    # as parquet next to the report, stamped with the submission id — the
    # reference publishes the same frame for auditing
    # (dve pipeline/pipeline.py:730-746, 801-948); written unconditionally
    # (it is the machine-readable artifact; the report is the human one)
    agg_path = work / "audit" / "error_aggregates.parquet"
    error_aggregates(all_messages).withColumn(
        "submission_id", F.lit(submission_id)
    ).write.mode("overwrite").parquet(str(agg_path))
    result.error_aggregates_path = str(agg_path)
    stats_row = all_messages.select(
        F.count(F.lit(1)).alias("n_messages"),
        F.count_distinct(
            F.when(
                (F.col("failure_type") == "record")
                & ~F.col("is_informational"),
                F.concat_ws(
                    "/",
                    F.col("original_entity"),
                    F.col(RECORD_INDEX).cast("string"),
                ),
            )
        ).alias("n_record_rejections"),
        F.count(F.when(F.col("is_informational"), 1)).alias("n_warnings"),
    ).first()
    # record_count = records RECEIVED (transform-stage rows), matching the
    # reference's statistics semantics; the counts were observed on the
    # stage-2 write actions themselves — no re-scan
    received = sum(
        int(transform_counts[name].get["rows"]) for name in datasets
    )
    result.statistics = {
        "n_messages": stats_row["n_messages"],
        "record_count": received,
        "n_record_rejections": stats_row["n_record_rejections"],
        "n_warnings": stats_row["n_warnings"],
    }
    if audit:
        audit.append(
            "submission_statistics",
            [
                {
                    "submission_id": submission_id,
                    "date_updated": now.date(),
                    "time_updated": now,
                    "record_count": received,
                    "number_submission_rejections": 0,
                    "number_record_rejections": result.statistics[
                        "n_record_rejections"
                    ],
                    "number_warnings": result.statistics["n_warnings"],
                }
            ],
        )
    audit_status("completed", "success")
    return result


def process_landing(
    spark: SparkSession,
    dischema: Dischema | str | Path,
    landing_dir: str,
    working_root: str | Path,
    *,
    entity_name: str | None = None,
    refdata_base_path: str | None = None,
    audit_path: str | None = None,
    write_report: bool = True,
    runtime_variables: dict[str, Any] | None = None,
    max_workers: int = 1,
) -> list[PipelineResult]:
    """Process every submission waiting under a landing prefix.

    Shape parity with the reference's discovery + audit-received stages
    (dve pipeline/pipeline.py:164-318): pair each data file with its
    ``.metadata.json``, mint a submission id, move the pair to
    ``processed/<submission_id>/`` (audited as a ``transfers`` row), then
    run the pipeline per submission. Unpaired files are dead-lettered to
    ``dead_letter/``.

    ``max_workers > 1`` fans submissions out over a thread pool, the
    reference's concurrency model (dve pipeline/pipeline.py:950-977,
    ``ThreadPoolExecutor(max_workers=7)``). Threads are the right unit
    here: each worker just SUBMITS Spark jobs (scheduling across the
    cluster is Spark's), and job submission is thread-safe. Submissions
    are fully independent — ids are uuid4, working dirs are per-id, and
    audit appends land as distinct files. Result order follows discovery
    order regardless of completion order.

    ``entity_name`` names the dischema dataset each data file feeds; with
    one declared dataset it is inferred.
    """
    import json as _json

    from data_validation_engine_spark.files import (
        discover_submissions,
        move_file,
        read_text,
    )

    if not isinstance(dischema, Dischema):
        dischema = load_dischema(dischema)
    if entity_name is None:
        names = [e.name for e in dischema.contract.datasets] if dischema.contract else []
        if len(names) != 1:
            raise ValueError(
                "entity_name is required when the dischema declares "
                f"{len(names)} datasets"
            )
        entity_name = names[0]

    working_root = Path(working_root)
    audit = AuditLog(spark, audit_path) if audit_path else None
    pairs, dead = discover_submissions(landing_dir)
    for f in dead:
        move_file(f, str(working_root / "dead_letter" / Path(f).name))

    def _process_one(pair: tuple[str, str]) -> PipelineResult:
        data_uri, meta_uri = pair
        submission_id = new_submission_id()
        processed = working_root / "processed" / submission_id
        data_dest = str(processed / Path(data_uri).name)
        meta_dest = str(processed / Path(meta_uri).name)
        move_file(data_uri, data_dest)
        move_file(meta_uri, meta_dest)
        try:
            submission_info = _json.loads(read_text(meta_dest))
        except ValueError:
            submission_info = {}
        if audit:
            now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            audit.append(
                "transfers",
                [
                    {
                        "submission_id": submission_id,
                        "date_updated": now.date(),
                        "time_updated": now,
                        "report_name": Path(data_uri).name,
                        "transfer_id": submission_id,
                        "transfer_method": "landing_move",
                        "recipient": data_dest,
                    }
                ],
            )
        return run_pipeline(
            spark,
            dischema,
            {entity_name: data_dest},
            working_root / "work" / submission_id,
            refdata_base_path=refdata_base_path,
            audit_path=audit_path,
            submission_id=submission_id,
            submission_info=submission_info or None,
            write_report=write_report,
            # runtime-strategy dischemas can bind per-submission values:
            # shared runtime_variables plus the submission's own
            # metadata under `submission` (e.g. {{submission.file_name}})
            runtime_variables=(
                {
                    **(runtime_variables or {}),
                    "submission": dict(submission_info or {}),
                }
                if dischema.templating_strategy == "runtime"
                else runtime_variables
            ),
        )

    if max_workers > 1 and len(pairs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        # Failure semantics mirror the sequential path as closely as a
        # pool allows: on the first submission failure (in discovery
        # order) every not-yet-started submission is cancelled and the
        # error propagates. In-flight submissions cannot be interrupted
        # — their side effects (file moves, audit rows) may still land,
        # exactly as the reference's per-submission fan-out allows
        # (dve pipeline/pipeline.py:957-975).
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            futures = [pool.submit(_process_one, pair) for pair in pairs]
            results: list[PipelineResult] = []
            try:
                for fut in futures:
                    results.append(fut.result())
            except BaseException:
                for fut in futures:
                    fut.cancel()
                raise
            return results
    return [_process_one(pair) for pair in pairs]
