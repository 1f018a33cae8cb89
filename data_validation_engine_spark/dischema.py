"""Top-level dischema loader: one JSON document -> a runnable program.

Parses the reference's full configuration language
(dve configuration/v1/__init__.py:169-353):

- ``contract``: entity schemas + types + reader config (delegates to
  :mod:`contract.spec`).
- ``transformations``: global ``parameters``, ``reference_data``,
  ``rule_stores`` (external JSON files of reusable parameterised rules,
  dve configuration/v1/rule_stores/models.py:12-59), ``rules`` /
  ``filters`` / ``post_filter_rules`` (composed into the implicit "root"
  rule, dve configuration/v1/__init__.py:298-306), and ``complex_rules``
  (rule-store references with dependency-order validation,
  dve configuration/v1/__init__.py:284-296).

Templating is resolved UPFRONT (the reference's default strategy): each
resolved step/filter dict is Jinja-rendered with merged
``{**globals, **locals}`` before being parsed into a typed config.

The loader accepts the reference's key names verbatim (``entity``,
``target``, ``filter_rule``, ...) and translates to this engine's typed
configs, so existing dischema files run unchanged.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

from data_validation_engine_spark.contract.spec import Contract, parse_contract
from data_validation_engine_spark.entities import RefDataConfig
from data_validation_engine_spark.errors import ConfigurationError
from data_validation_engine_spark.messages import Reporting
from data_validation_engine_spark.steps.configs import (
    AnyStep,
    DeferredFilter,
    parse_step,
)
from data_validation_engine_spark.templating import template_object

# reference config key -> engine config key (dve configuration/v1/steps.py)
_KEY_RENAMES = {
    "entity": "entity_name",
    "target": "target_name",
    "filter_rule": "expression",
}
# reference-only keys with no engine-side meaning (or engine-default behaviour)
_DROPPED_KEYS = {"name", "description", "deprecation_message"}

_FAILURE_TYPE_TO_EMIT = {
    "record": "record_failure",
    "submission": "submission_failure",
    "integrity": "critical_failure",
    "critical": "critical_failure",
}


def translate_step(config: dict[str, Any]) -> AnyStep:
    """Translate one reference-style step dict into a typed engine config."""
    out: dict[str, Any] = {}
    for key, value in config.items():
        if key in _DROPPED_KEYS:
            continue
        key = _KEY_RENAMES.get(key, key)
        out[key] = value
    op = out.get("operation")
    if op in ("remove_entity", "remove_entities"):
        names = out.pop("entity_name", out.pop("entity_names", None))
        if isinstance(names, str):
            names = [names]
        out = {"operation": "remove_entity", "entity_names": tuple(names or ())}
    if op == "one_to_one_join":
        out["operation"] = "join"
    if op == "join_header":
        # the engine's header join always enforces the 1-row constraint
        out.pop("perform_integrity_check", None)
    return parse_step(out)


def _truthy(value: Any) -> bool:
    if isinstance(value, str):
        return value.strip().lower() in ("true", "1", "yes")
    return bool(value)


def translate_filter(config: dict[str, Any]) -> DeferredFilter:
    """Translate a reference ``ConcreteFilterConfig`` dict into a
    :class:`DeferredFilter` (dve configuration/v1/filters.py:13-48)."""
    failure_type = config.get("failure_type", "record")
    if _truthy(config.get("is_informational", False)):
        emit = "warning"
    else:
        emit = _FAILURE_TYPE_TO_EMIT.get(failure_type, "record_failure")

    reporting_field = config.get("reporting_field")
    if isinstance(reporting_field, list):
        # the reference permits a list of reporting fields; the message
        # payload carries them all via record_json — keep the first as the
        # scalar reporting key
        reporting_field = reporting_field[0] if reporting_field else None

    reporting = Reporting(
        code=config.get("error_code") or "UNKNOWN",
        message=config.get("failure_message") or "",
        emit=emit,
        location=config.get("error_location"),
        reporting_field=reporting_field,
        reporting_entity_override=config.get("reporting_entity"),
        original_entity_override=config.get("original_entity_override"),
        category=config.get("category", "Bad value"),
    )
    return DeferredFilter(
        entity_name=config["entity"],
        new_entity_name=config.get("new_entity_name"),
        expression=config["expression"],
        reporting=reporting,
    )


@dataclass(frozen=True)
class RuleProgram:
    """One rule: ordered pre-sync steps, sync filters, post-sync steps.

    Under the ``runtime`` templating strategy the typed tuples stay empty
    and the raw (store-resolved, untemplated) step dicts are kept instead,
    together with the rule's merged local variables —
    :meth:`Dischema.resolve` templates and parses them at evaluation time
    (reference: dve backends/base/rules.py:572-594, per-step
    ``step.template(...)`` when ``templating_strategy == "runtime"``).
    """

    name: str
    pre_sync: tuple[AnyStep, ...] = ()
    sync_filters: tuple[DeferredFilter, ...] = ()
    post_sync: tuple[AnyStep, ...] = ()
    raw_pre_sync: tuple[dict, ...] = ()
    raw_filters: tuple[tuple[dict, dict], ...] = ()
    raw_post_sync: tuple[dict, ...] = ()
    variables: dict = field(default_factory=dict)


@dataclass(frozen=True)
class Dischema:
    """A fully-resolved dischema document."""

    contract: Optional[Contract]
    refdata: dict[str, RefDataConfig] = field(default_factory=dict)
    parameters: dict[str, Any] = field(default_factory=dict)
    rules: tuple[RuleProgram, ...] = ()
    cache_originals: bool = False
    error_details_uri: Optional[str] = None
    base_dir: Optional[str] = None
    """Directory of the dischema file — relative resources (rule stores,
    XSDs, error details) resolve against it."""
    templating_strategy: str = "upfront"
    """``upfront`` (default): templates render once at parse time.
    ``runtime``: raw step dicts are kept and rendered per rule at
    evaluation time via :meth:`resolve`, so variables can be bound per
    submission (reference: dve backends/base/rules.py:572-594)."""

    def resolve(
        self, runtime_variables: Optional[dict[str, Any]] = None
    ) -> "Dischema":
        """Materialise typed steps for a ``runtime``-strategy dischema.

        Each raw step/filter dict is Jinja-rendered with
        ``{**globals, **rule locals, **runtime_variables}`` and parsed into
        its typed config; the returned dischema behaves like an upfront one.
        Upfront dischemas pass through unchanged; handing them runtime
        variables is an error (their templates are already rendered — the
        variables could never apply).
        """
        from dataclasses import replace

        if self.templating_strategy != "runtime":
            if runtime_variables:
                raise ConfigurationError(
                    "runtime_variables require templating_strategy="
                    "'runtime' (this dischema is 'upfront': its templates "
                    "were already rendered at parse time)"
                )
            return self
        rt = dict(runtime_variables or {})
        resolved: list[RuleProgram] = []
        for rule in self.rules:
            variables = {**rule.variables, **rt}
            pre = tuple(
                translate_step(template_object(s, variables))
                for s in rule.raw_pre_sync
            )
            sync = tuple(
                translate_filter(template_object(cfg, {**f_vars, **rt}))
                for cfg, f_vars in rule.raw_filters
            )
            post = tuple(
                translate_step(template_object(s, variables))
                for s in rule.raw_post_sync
            )
            resolved.append(
                RuleProgram(
                    name=rule.name,
                    pre_sync=pre,
                    sync_filters=sync,
                    post_sync=post,
                )
            )
        return replace(
            self, rules=tuple(resolved), templating_strategy="upfront"
        )

    @property
    def sync_filters(self) -> tuple[DeferredFilter, ...]:
        """Every sync filter across all rules, in rule order (the sync stage
        evaluates them together)."""
        out: list[DeferredFilter] = []
        for rule in self.rules:
            out.extend(rule.sync_filters)
        return tuple(out)


class _RuleStore:
    """Loaded rule-store specs, keyed by rule name (later stores override)."""

    def __init__(self) -> None:
        self.specs: dict[str, dict[str, Any]] = {}

    def load(self, path: Path) -> None:
        doc = json.loads(path.read_text())
        if not isinstance(doc, dict):
            raise ConfigurationError(
                f"rule store {path} must contain a mapping at the root"
            )
        self.specs.update(doc)

    def get(self, name: str, expected_type: str) -> dict[str, Any]:
        spec = self.specs.get(name)
        if spec is None:
            raise ConfigurationError(f"unknown rule-store rule {name!r}")
        if spec.get("type") != expected_type:
            raise ConfigurationError(
                f"rule {name!r} is a {spec.get('type')!r}, expected "
                f"{expected_type!r}"
            )
        return spec


def _resolve_filter(
    config: dict[str, Any],
    store: _RuleStore,
    variables: dict[str, Any],
) -> tuple[dict[str, Any], dict[str, Any]]:
    """Resolve a filter entry (concrete or rule-store reference) to a
    concrete filter dict + its local template variables."""
    local_vars = dict(variables)
    depth = 0
    while "rule_name" in config:
        if depth > 16:
            raise ConfigurationError("rule-store filter reference cycle")
        spec = store.get(config["rule_name"], "filter")
        # NOTE: keys other than rule_name/parameters on a business-filter
        # reference are ignored (reference pydantic drops extras) — template
        # defaults inside the spec win, matching reference behaviour.
        local_vars.update(spec.get("parameter_defaults", {}))
        local_vars.update(config.get("parameters", {}))
        config = spec["rule_config"]
        depth += 1
    return config, local_vars


def parse_dischema(
    doc: dict[str, Any], *, base_dir: str | Path | None = None
) -> Dischema:
    """Parse a dischema document (rule stores resolve relative to
    ``base_dir``)."""
    contract_cfg = doc.get("contract", {})
    error_details: dict[str, Any] = {}
    if contract_cfg.get("error_details"):
        if base_dir is None:
            raise ConfigurationError(
                "dischema declares error_details but no base_dir was given"
            )
        error_details = json.loads(
            (Path(base_dir) / contract_cfg["error_details"]).read_text()
        )
    contract = (
        parse_contract(doc, error_details=error_details)
        if contract_cfg.get("datasets")
        else None
    )
    tx = doc.get("transformations", {})
    globals_ = dict(tx.get("parameters", {}))

    store = _RuleStore()
    for store_cfg in tx.get("rule_stores", []):
        if store_cfg.get("store_type", "json") != "json":
            raise ConfigurationError(
                f"unsupported rule store type {store_cfg.get('store_type')!r}"
            )
        if base_dir is None:
            raise ConfigurationError(
                "dischema has rule stores but no base_dir was given"
            )
        store.load(Path(base_dir) / store_cfg["filename"])

    def _refdata_location(cfg: dict[str, Any]) -> str:
        if cfg.get("type") == "table":
            # reference shape: database + table_name (or a full table name)
            if cfg.get("table_name"):
                db = cfg.get("database")
                return (
                    f"{db}.{cfg['table_name']}" if db else cfg["table_name"]
                )
            return cfg.get("table", "")
        return (
            cfg.get("filename") or cfg.get("uri") or cfg.get("location", "")
        )

    refdata = {
        name: RefDataConfig(
            name=name,
            type=cfg.get("type", "uri"),
            location=_refdata_location(cfg),
            format=cfg.get("format", "parquet"),
        )
        for name, cfg in tx.get("reference_data", {}).items()
    }

    templating_strategy = str(
        tx.get("templating_strategy", "upfront")
    ).lower()
    if templating_strategy not in ("upfront", "runtime"):
        raise ConfigurationError(
            f"unsupported templating_strategy {templating_strategy!r}"
        )

    def build_rule(
        name: str,
        rules_cfg: list[dict],
        filters_cfg: list[dict],
        post_cfg: list[dict],
        local_vars: dict[str, Any],
    ) -> RuleProgram:
        variables = {**globals_, **local_vars}
        if templating_strategy == "runtime":
            # keep raw dicts; rule-store references still resolve now
            # (structure is config-time), only STRING rendering is deferred
            raw_filters = tuple(
                _resolve_filter(f, store, variables) for f in filters_cfg
            )
            return RuleProgram(
                name=name,
                raw_pre_sync=tuple(rules_cfg),
                raw_filters=raw_filters,
                raw_post_sync=tuple(post_cfg),
                variables=variables,
            )
        pre = tuple(
            translate_step(template_object(s, variables)) for s in rules_cfg
        )
        sync = []
        for f in filters_cfg:
            resolved, f_vars = _resolve_filter(f, store, variables)
            sync.append(translate_filter(template_object(resolved, f_vars)))
        post = tuple(
            translate_step(template_object(s, variables)) for s in post_cfg
        )
        return RuleProgram(
            name=name, pre_sync=pre, sync_filters=tuple(sync), post_sync=post
        )

    rules: list[RuleProgram] = []
    added: set[str] = set()
    for index, complex_cfg in enumerate(tx.get("complex_rules", [])):
        rule_name = complex_cfg["rule_name"]
        spec = store.get(rule_name, "complex_rule")
        deps = set(spec.get("dependencies", []))
        missing = deps - added
        if missing:
            raise ConfigurationError(
                f"missing dependencies {sorted(missing)} required by complex "
                f"rule {rule_name!r} (index {index})"
            )
        local_vars = dict(spec.get("parameter_defaults", {}))
        local_vars.update(complex_cfg.get("parameters", {}))
        rule_config = spec.get("rule_config", {})
        rules.append(
            build_rule(
                rule_name,
                rule_config.get("rules", []),
                rule_config.get("filters", []),
                rule_config.get("post_filter_rules", []),
                local_vars,
            )
        )
        added.add(rule_name)

    rules.append(
        build_rule(
            "root",
            tx.get("rules", []),
            tx.get("filters", []),
            tx.get("post_filter_rules", []),
            {},
        )
    )

    return Dischema(
        contract=contract,
        refdata=refdata,
        parameters=globals_,
        rules=tuple(rules),
        cache_originals=bool(contract_cfg.get("cache_originals", False)),
        error_details_uri=contract_cfg.get("error_details"),
        base_dir=str(base_dir) if base_dir is not None else None,
        templating_strategy=templating_strategy,
    )


def load_dischema(path: str | Path) -> Dischema:
    """Load a dischema JSON file (rule stores resolve next to it)."""
    path = Path(path)
    return parse_dischema(json.loads(path.read_text()), base_dir=path.parent)
