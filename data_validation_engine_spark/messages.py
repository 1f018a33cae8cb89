"""Feedback messages as DataFrames.

The reference engine materialises per-row feedback via a driver-side row
loop (dve spark/rules.py:400-420 ``toLocalIterator`` + Jinja per record) —
that collapses at scale. Here messages are ordinary DataFrames with a fixed
schema; per-row message templates compile to native Column expressions
(``concat``), so message generation is distributed, codegen'd, and written
once per stage with ``df.write.json``.

Message taxonomy parity: dve core_engine/message.py:136-198
(entity/record/failure_type/error code/message/location/informational).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce
from typing import Literal

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORD_INDEX = "__record_index__"
"""Stable 1-based per-file record index column (dve core_engine/constants.py:3)."""

ORIGIN_ENTITY = "__origin_entity__"
"""Hidden row-level lineage column: the contract entity a row's
``__record_index__`` belongs to. A constant literal per source entity, it
rides through renames/copies/unions so final record rejection matches
``(origin, index)`` pairs instead of trusting the entity's current NAME —
renamed/copied entities would otherwise never match their messages'
``original_entity`` and contract-rejected records would silently survive."""

FailureType = Literal["record", "integrity", "submission"]

MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType(), False),
        T.StructField("original_entity", T.StringType(), True),
        T.StructField(RECORD_INDEX, T.LongType(), True),
        T.StructField("error_code", T.StringType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("error_location", T.StringType(), True),
        T.StructField("failure_type", T.StringType(), True),
        T.StructField("is_informational", T.BooleanType(), False),
        T.StructField("category", T.StringType(), True),
        T.StructField("reporting_field", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("record_json", T.StringType(), True),
    ]
)

_TEMPLATE_VAR = re.compile(r"\{\{\s*([A-Za-z_][A-Za-z0-9_.]*)\s*\}\}")


def compile_message_template(
    template: str,
    columns: list[str],
    extra_vars: dict[str, Column] | None = None,
) -> Column:
    """Compile a ``"text {{col}} text"`` template to a Column expression.

    ``{{col}}`` references to existing columns render as the column value
    (cast to string); ``extra_vars`` supplies non-column variables (e.g.
    ``__error_value`` in contract error-detail overrides); unknown names are
    preserved verbatim, matching the reference's preserve-undefined
    templating (dve templating.py:14-22). Runs entirely JVM-side — one
    ``concat`` per template.
    """
    lower_cols = {c.lower(): c for c in columns}
    extra = {k.lower(): v for k, v in (extra_vars or {}).items()}
    parts: list[Column] = []
    pos = 0
    for m in _TEMPLATE_VAR.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        actual = lower_cols.get(name.lower())
        if name.lower() in extra:
            parts.append(
                F.coalesce(extra[name.lower()].cast("string"), F.lit(""))
            )
        elif actual is not None:
            parts.append(F.coalesce(F.col(f"`{actual}`").cast("string"), F.lit("")))
        else:
            parts.append(F.lit(m.group(0)))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)


# -- the `location` mini-language -------------------------------------------

def parse_location(location: str) -> tuple[str | None, list[str] | str]:
    """Parse a message ``location`` selector into (root, fields).

    Grammar (parity: dve backends/metadata/reporting.py:138-158):
    ``field`` / ``{A,B}`` / ``root.field`` / ``root.{A,B}`` / ``root.*`` /
    ``*``. At most one nesting level; ``fields`` is ``'*'`` or a name list.
    """
    splits = location.split(".")
    if len(splits) > 2:
        raise ValueError("location nesting must be a maximum of one level")
    fields: list[str] | str = [
        f.strip() for f in splits[-1].strip("{}").split(",") if f.strip()
    ]
    if fields and fields[0] == "*":
        fields = "*"
    root = splits[0] if len(splits) == 2 else None
    return root, fields


def location_value_col(
    df: DataFrame,
    location: str | None,
    *,
    max_values: int = 10,
    value_separator: str = ", ",
) -> Column:
    """The message ``value`` column for a ``location`` selector.

    Selects the offending value(s) from the record as a display string:
    scalars render directly; struct selections render ``field=value``
    pairs; array-of-struct selections render one pair-string per element,
    sorted, truncated to ``max_values`` with an ``only first N shown``
    suffix (parity: dve core_engine/message.py:282-467). Pure Column
    expressions over the entity frame.
    """
    if location is None:
        return F.lit(None).cast("string")
    root, fields = parse_location(location)
    schema = {f.name: f.dataType for f in df.schema.fields}

    def pairs(prefix: Column | None, names: list[str]) -> Column:
        cols = []
        for n in sorted(names):
            v = (
                prefix.getField(n)
                if prefix is not None
                else F.col(f"`{n}`")
            )
            cols.append(
                F.concat(
                    F.lit(f"{n}="),
                    F.coalesce(v.cast("string"), F.lit("None")),
                )
            )
        return F.concat_ws(value_separator, *cols)

    if root is None:
        if fields == "*":
            return F.to_json(F.struct("*"))
        if len(fields) == 1:
            return F.col(f"`{fields[0]}`").cast("string")
        return pairs(None, list(fields))

    if root not in schema:
        return F.lit(None).cast("string")
    root_col = F.col(f"`{root}`")
    root_type = schema[root]

    if isinstance(root_type, T.ArrayType):
        elem = root_type.elementType
        if fields == "*" or not isinstance(elem, T.StructType):
            rendered = F.transform(
                root_col, lambda s: F.coalesce(s.cast("string"), F.lit("None"))
            )
        else:
            names = [f for f in fields if f in {sf.name for sf in elem.fields}]
            rendered = F.transform(root_col, lambda s: pairs(s, names))
        sorted_vals = F.array_sort(rendered)
        truncated = F.concat_ws(
            value_separator, F.slice(sorted_vals, 1, max_values)
        )
        return F.when(root_col.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(
                F.size(sorted_vals) > max_values,
                F.concat(
                    truncated,
                    F.lit(f"{value_separator}only first {max_values} shown"),
                ),
            ).otherwise(truncated)
        )

    if isinstance(root_type, T.StructType):
        if fields == "*":
            return F.to_json(root_col)
        names = [f for f in fields if f in {sf.name for sf in root_type.fields}]
        return F.when(
            root_col.isNull(), F.lit(None).cast("string")
        ).otherwise(pairs(root_col, names))

    return root_col.cast("string")


@dataclass(frozen=True)
class Reporting:
    """How a filter/notification reports failures.

    Parity with dve backends/metadata/reporting.py (code, message template,
    emit level, location, reporting field, entity overrides).
    """

    code: str = "UNKNOWN"
    message: str = ""
    emit: Literal[
        "record_failure",
        "submission_failure",
        "critical_failure",
        "warning",
        "info",
    ] = "record_failure"
    location: str | None = None
    reporting_field: str | None = None
    reporting_entity_override: str | None = None
    original_entity_override: str | None = None
    category: str | None = None

    @property
    def failure_type(self) -> str:
        if self.emit == "submission_failure":
            return "submission"
        if self.emit == "critical_failure":
            # parity: dve reporting.py maps critical_failure -> integrity
            return "integrity"
        return "record"

    @property
    def is_informational(self) -> bool:
        return self.emit in ("warning", "info")


def original_entity_col(
    df: DataFrame, entity_name: str, reporting: Reporting
) -> Column:
    """The ``original_entity`` a message should carry.

    Priority: explicit override > the row's ``__origin_entity__`` lineage
    (so rule-emitted record failures still reject rows after
    rename/copy/union — the same survival contract/apply.py gives contract
    messages) > the entity's current name.
    """
    if reporting.original_entity_override:
        return F.lit(reporting.original_entity_override)
    if ORIGIN_ENTITY in df.columns:
        return F.coalesce(
            F.col(ORIGIN_ENTITY).cast("string"), F.lit(entity_name)
        )
    return F.lit(entity_name)


def messages_for_failures(
    entity_name: str,
    df: DataFrame,
    predicate: Column,
    reporting: Reporting,
    *,
    include_record_json: bool = True,
    exclude_columns: tuple[str, ...] = (),
) -> DataFrame:
    """Build the messages DataFrame for rows of ``df`` failing ``predicate``.

    ``predicate`` is the *pass* condition: a message is emitted where it is
    null or false. ``exclude_columns`` are hidden helper columns: usable by
    the predicate but omitted from the message payload/template. Fully
    distributed — the caller unions message frames and writes once.
    """
    failed = df.where(~F.coalesce(predicate.cast("boolean"), F.lit(False)))
    cols = [c for c in df.columns if c not in exclude_columns]
    idx = (
        F.col(RECORD_INDEX).cast("long")
        if RECORD_INDEX in cols
        else F.lit(None).cast("long")
    )
    reporting_field_col = (
        F.col(f"`{reporting.reporting_field}`").cast("string")
        if reporting.reporting_field and reporting.reporting_field in cols
        else F.lit(None).cast("string")
    )
    record_json = (
        F.to_json(
            F.struct(
                *[
                    F.col(f"`{c}`")
                    for c in cols
                    if c not in (RECORD_INDEX, ORIGIN_ENTITY)
                ]
            )
        )
        if include_record_json
        else F.lit(None).cast("string")
    )
    if reporting.location:
        value_col = location_value_col(df, reporting.location)
    elif reporting.reporting_field and reporting.reporting_field in cols:
        value_col = F.col(f"`{reporting.reporting_field}`").cast("string")
    else:
        value_col = F.lit(None).cast("string")
    return failed.select(
        F.lit(reporting.reporting_entity_override or entity_name).alias("entity"),
        original_entity_col(df, entity_name, reporting).alias(
            "original_entity"
        ),
        idx.alias(RECORD_INDEX),
        F.lit(reporting.code).alias("error_code"),
        compile_message_template(reporting.message, cols).alias("error_message"),
        F.lit(reporting.location).cast("string").alias("error_location"),
        F.lit(reporting.failure_type).alias("failure_type"),
        F.lit(reporting.is_informational).alias("is_informational"),
        F.lit(reporting.category).cast("string").alias("category"),
        reporting_field_col.alias("reporting_field"),
        value_col.alias("value"),
        record_json.alias("record_json"),
    )


def messages_for_checks(
    entity_name: str,
    df: DataFrame,
    checks: list[tuple[Column, Reporting]],
    *,
    include_record_json: bool = True,
    exclude_columns: tuple[str, ...] = (),
) -> DataFrame:
    """Build ONE messages frame for many checks in a single scan of ``df``.

    Each check is a ``(pass_predicate, reporting)`` pair; a message row is
    produced for every (record, check) where the predicate is null or false.
    Implementation: one ``array_compact(array(when(...)))`` of per-check
    message structs + a single ``explode`` — N checks cost one scan, not N
    (the pattern contract/apply.py uses for field checks; fixes the
    scan-per-filter shape the reference inherits from its per-filter
    Notification loop, dve backends/base/rules.py:356-555).
    """
    if not checks:
        return empty_messages(df.sparkSession)
    cols = [c for c in df.columns if c not in exclude_columns]
    idx = (
        F.col(RECORD_INDEX).cast("long")
        if RECORD_INDEX in cols
        else F.lit(None).cast("long")
    )
    record_json = (
        F.to_json(
            F.struct(
                *[
                    F.col(f"`{c}`")
                    for c in cols
                    if c not in (RECORD_INDEX, ORIGIN_ENTITY)
                ]
            )
        )
        if include_record_json
        else F.lit(None).cast("string")
    )

    def _struct(reporting: Reporting) -> Column:
        reporting_field_col = (
            F.col(f"`{reporting.reporting_field}`").cast("string")
            if reporting.reporting_field and reporting.reporting_field in cols
            else F.lit(None).cast("string")
        )
        if reporting.location:
            value_col = location_value_col(df, reporting.location)
        elif reporting.reporting_field and reporting.reporting_field in cols:
            value_col = F.col(f"`{reporting.reporting_field}`").cast("string")
        else:
            value_col = F.lit(None).cast("string")
        return F.struct(
            F.lit(reporting.reporting_entity_override or entity_name).alias(
                "entity"
            ),
            original_entity_col(df, entity_name, reporting).alias(
                "original_entity"
            ),
            F.lit(reporting.code).alias("error_code"),
            compile_message_template(reporting.message, cols).alias(
                "error_message"
            ),
            F.lit(reporting.location).cast("string").alias("error_location"),
            F.lit(reporting.failure_type).alias("failure_type"),
            F.lit(reporting.is_informational).alias("is_informational"),
            F.lit(reporting.category).cast("string").alias("category"),
            reporting_field_col.alias("reporting_field"),
            value_col.alias("value"),
        )

    failed_structs = [
        F.when(
            ~F.coalesce(pred.cast("boolean"), F.lit(False)), _struct(reporting)
        )
        for pred, reporting in checks
    ]
    exploded = df.select(
        idx.alias(RECORD_INDEX),
        record_json.alias("record_json"),
        F.explode(F.array_compact(F.array(*failed_structs))).alias("__m"),
    )
    return exploded.select(
        F.col("__m.entity").alias("entity"),
        F.col("__m.original_entity").alias("original_entity"),
        F.col(RECORD_INDEX),
        F.col("__m.error_code").alias("error_code"),
        F.col("__m.error_message").alias("error_message"),
        F.col("__m.error_location").alias("error_location"),
        F.col("__m.failure_type").alias("failure_type"),
        F.col("__m.is_informational").alias("is_informational"),
        F.col("__m.category").alias("category"),
        F.col("__m.reporting_field").alias("reporting_field"),
        F.col("__m.value").alias("value"),
        F.col("record_json"),
    )


def empty_messages(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], MESSAGE_SCHEMA)


def union_messages(frames: list[DataFrame]) -> DataFrame | None:
    """Union message frames (all share MESSAGE_SCHEMA)."""
    frames = [f for f in frames if f is not None]
    if not frames:
        return None
    return reduce(lambda a, b: a.unionByName(b), frames)


@dataclass
class MessageCollector:
    """Accumulates message DataFrames across steps of a rule program."""

    frames: list[DataFrame] = field(default_factory=list)

    def add(self, df: DataFrame | None) -> None:
        if df is not None:
            self.frames.append(df)

    def union(self) -> DataFrame | None:
        return union_messages(self.frames)

    def union_or_empty(self, spark: SparkSession) -> DataFrame:
        return self.union() or empty_messages(spark)
