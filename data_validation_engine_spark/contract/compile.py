"""Compile field specs to Spark types, cast expressions, and check predicates.

This is the engine's replacement for the reference's per-row pydantic
validation (dve spark/contract.py:129-135): every declared check becomes a
native boolean Column expression over the *stringified* input, and every
cast becomes a SQL expression (TRIM + cast, regex-guarded
TRY_TO_TIMESTAMP for formatted dates — design parity with
dve spark_helpers.py:516-621 — TRANSFORM for arrays, STRUCT recursion for
nested models). Everything stays inside whole-stage codegen.

The two-phase model is preserved: read stringified -> validate -> cast
(dve backends/utilities.py:84-116 "string-in, validate, cast").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from data_validation_engine_spark.contract.spec import EntityContract, FieldSpec
from data_validation_engine_spark.functions.library import (
    nhs_mod11_sql,
    normalise_postcode_sql,
    valid_postcode_sql,
)

DEFAULT_DECIMAL = (38, 18)

# strptime directive -> Spark (Java) datetime pattern
# (semantics parity: dve spark_helpers.py:103-116)
_STRPTIME_TO_SPARK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%z": "XX",
    "%Z": "z",
    "%%": "%",
}

# strptime directive -> regex fragment (dve backends/utilities.py:33-45)
_STRPTIME_TO_REGEX = {
    "%Y": r"[0-9]{4}",
    "%y": r"[0-9]{2}",
    "%m": r"[0-9]{2}",
    "%d": r"[0-9]{2}",
    "%H": r"[0-9]{2}",
    "%M": r"[0-9]{2}",
    "%S": r"[0-9]{2}",
    "%f": r"[0-9]{1,6}",
    "%z": r"(\+|-)?[0-9]+(\.[0-9]*)?",
    "%Z": r"[A-Z]{0,3}",
    "%%": "%",
}

_REGEX_SPECIALS = set(".^$*+?()[]{}|\\")

DEFAULT_DATE_FORMAT = "%Y-%m-%d"
DEFAULT_DATETIME_FORMATS = ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S")


def strptime_to_spark_format(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            token = fmt[i : i + 2]
            mapped = _STRPTIME_TO_SPARK.get(token)
            if mapped is None:
                raise ValueError(f"unsupported strptime directive {token!r}")
            out.append(mapped)
            i += 2
        else:
            ch = fmt[i]
            # quote literal letters for the Java pattern language
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def strptime_to_regex(fmt: str) -> str:
    out, i = ["^"], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            token = fmt[i : i + 2]
            frag = _STRPTIME_TO_REGEX.get(token)
            if frag is None:
                raise ValueError(f"unsupported strptime directive {token!r}")
            out.append(frag)
            i += 2
        else:
            ch = fmt[i]
            out.append("\\" + ch if ch in _REGEX_SPECIALS else ch)
            i += 1
    out.append("$")
    return "".join(out)


# -- Spark types -------------------------------------------------------------

def spark_type(field: FieldSpec) -> T.DataType:
    if field.model is not None:
        inner: T.DataType = T.StructType(
            [T.StructField(f.name, spark_type(f), True) for f in field.model]
        )
    else:
        base = field.base_type
        if base == "decimal":
            cons = field.effective_constraints
            p = int(cons.get("max_digits", DEFAULT_DECIMAL[0]))
            s = int(cons.get("decimal_places", DEFAULT_DECIMAL[1]))
            inner = T.DecimalType(p, s)
        else:
            inner = {
                "string": T.StringType(),
                "bigint": T.LongType(),
                "double": T.DoubleType(),
                "boolean": T.BooleanType(),
                "date": T.DateType(),
                "timestamp": T.TimestampType(),
                "binary": T.BinaryType(),
            }[base]
    if field.is_array:
        return T.ArrayType(inner, True)
    return inner


def typed_schema(entity: EntityContract) -> T.StructType:
    return T.StructType(
        [T.StructField(f.name, spark_type(f), True) for f in entity.fields]
    )


def stringified_type(field: FieldSpec) -> T.DataType:
    """The all-strings shape of a field (structure preserved, leaves str)."""
    if field.model is not None:
        inner: T.DataType = T.StructType(
            [T.StructField(f.name, stringified_type(f), True) for f in field.model]
        )
    else:
        inner = T.StringType()
    if field.is_array:
        return T.ArrayType(inner, True)
    return inner


def stringified_schema(entity: EntityContract) -> T.StructType:
    return T.StructType(
        [T.StructField(f.name, stringified_type(f), True) for f in entity.fields]
    )


# -- cast expressions --------------------------------------------------------

def _sql_type(field: FieldSpec) -> str:
    base = field.base_type
    if base == "decimal":
        cons = field.effective_constraints
        p = int(cons.get("max_digits", DEFAULT_DECIMAL[0]))
        s = int(cons.get("decimal_places", DEFAULT_DECIMAL[1]))
        return f"DECIMAL({p},{s})"
    return {
        "string": "STRING",
        "bigint": "BIGINT",
        "double": "DOUBLE",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
        "binary": "BINARY",
    }[base]


def _quote(name: str) -> str:
    if "." in name or name.startswith("`") or name == "x":
        return name  # already a path/lambda variable
    return f"`{name}`"


def _datetime_cast_sql(expr: str, fmt: str, target: str) -> str:
    """Regex-guarded formatted parse: wrong shape -> NULL, not an error."""
    # quote-escape: Java patterns quote literal letters as 'T', which must
    # survive embedding in a SQL single-quoted string
    spark_fmt = strptime_to_spark_format(fmt).replace("'", "\\'")
    regex = strptime_to_regex(fmt).replace("\\", "\\\\")
    parse = f"TRY_TO_TIMESTAMP(TRIM({expr}), '{spark_fmt}')"
    if target == "DATE":
        parse = f"CAST({parse} AS DATE)"
    return (
        f"CASE WHEN TRIM({expr}) RLIKE '{regex}' THEN {parse} ELSE NULL END"
    )


def _scalar_cast_sql(field: FieldSpec, expr: str) -> str:
    base = field.base_type
    cons = field.effective_constraints
    if base == "date":
        fmt = cons.get("date_format", DEFAULT_DATE_FORMAT)
        return _datetime_cast_sql(expr, fmt, "DATE")
    if base == "timestamp":
        formats = cons.get("formats") or list(DEFAULT_DATETIME_FORMATS)
        if isinstance(formats, str):
            formats = [formats]
        branches = [_datetime_cast_sql(expr, f, "TIMESTAMP") for f in formats]
        return f"COALESCE({', '.join(branches)})"
    if base == "string":
        out = f"TRIM({expr})"
        if field.type_name.lower() == "postcode":
            out = normalise_postcode_sql(out)
        if cons.get("curtail_length"):
            out = f"SUBSTRING({out}, 1, {int(cons['curtail_length'])})"
        return out
    return f"TRY_CAST(TRIM({expr}) AS {_sql_type(field)})"


# -- contract-side value functions -------------------------------------------
# (dve metadata_parser/function_library.py:35-62, wrapped per-field; here
# each function is a SQL rewrite of the stringified value, applied in
# declared order before the cast)

def _sql_str(value: str) -> str:
    return "'" + str(value).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _regex_literal(value: str) -> str:
    """Escape a literal delimiter for Spark's regex-based SPLIT."""
    out = []
    for ch in str(value):
        out.append("\\" + ch if ch in _REGEX_SPECIALS else ch)
    return "".join(out)


def function_sql(name: str, expr: str, kwargs: dict) -> str:
    """One contract function as a SQL rewrite (null/blank passes through,
    matching the reference's ``_nullcheck`` wrapper)."""
    null_ok = f"{expr} IS NULL OR TRIM({expr}) = ''"
    if name == "normalise":
        if kwargs.get("capitalize"):
            body = (
                f"CONCAT(UPPER(SUBSTRING({expr}, 1, 1)), "
                f"LOWER(SUBSTRING({expr}, 2)))"
            )
        else:
            body = expr
        return f"CASE WHEN {null_ok} THEN NULL ELSE {body} END"
    if name == "exclude_word":
        word = _sql_str(str(kwargs["word"]).lower())
        return (
            f"CASE WHEN {null_ok} THEN NULL "
            f"WHEN LOWER({expr}) LIKE CONCAT('%', {word}, '%') THEN NULL "
            f"ELSE {expr} END"
        )
    if name == "split":
        sep = _sql_str(_regex_literal(kwargs["split_on"]))
        keep = int(kwargs.get("keep", 0))
        if keep >= 0:
            pick = f"GET(SPLIT({expr}, {sep}), {keep})"
        else:
            pick = f"TRY_ELEMENT_AT(SPLIT({expr}, {sep}), {keep})"
        return f"CASE WHEN {null_ok} THEN NULL ELSE {pick} END"
    if name == "static_key":
        return "'1'"
    raise ValueError(f"unknown contract function {name!r}")


def apply_functions_sql(field: FieldSpec, expr: str) -> str:
    for fn in field.functions:
        expr = function_sql(fn["name"], expr, fn.get("kwargs", {}))
    return expr


def function_checks(field: FieldSpec, expr: str) -> list[CompiledCheck]:
    """Failure checks for functions that can reject a value (``split`` with
    an out-of-range index -> record error, dve function_wrapper.py:48-201)."""
    checks: list[CompiledCheck] = []
    running = expr
    for fn in field.functions:
        if fn["name"] == "split":
            transformed = function_sql("split", running, fn.get("kwargs", {}))
            null_ok = f"{running} IS NULL OR TRIM({running}) = ''"
            checks.append(
                CompiledCheck(
                    field=field.name,
                    category="function",
                    code="FUNCTION_SPLIT_FAILED",
                    message=fn.get(
                        "error_message", f"split failed for {field.name}"
                    ),
                    predicate_sql=(
                        f"(({null_ok}) OR ({transformed}) IS NOT NULL)"
                    ),
                )
            )
        running = function_sql(fn["name"], running, fn.get("kwargs", {}))
    return checks


def cast_sql(field: FieldSpec, expr: str | None = None) -> str:
    """SQL expression casting the stringified field to its declared type."""
    expr = expr if expr is not None else _quote(field.name)
    if field.functions and not field.is_array and field.model is None:
        expr = apply_functions_sql(field, expr)
    if field.is_array:
        element = FieldSpec(
            name=field.name,
            type_name=field.type_name,
            constraints=field.constraints,
            is_array=False,
            model=field.model,
        )
        return f"TRANSFORM({expr}, x -> {cast_sql(element, 'x')})"
    if field.model is not None:
        members = ", ".join(
            f"{cast_sql(sub, f'{expr}.{_quote(sub.name)}')} AS {_quote(sub.name)}"
            for sub in field.model
        )
        return f"STRUCT({members})"
    return _scalar_cast_sql(field, expr)


# -- check predicates --------------------------------------------------------

@dataclass(frozen=True)
class CompiledCheck:
    """One validation check: message fields + a pass-predicate SQL string.

    ``level`` / ``informational`` / ``reporting_entity`` carry error-detail
    overrides (contract/error_details.py); ``message`` may be a
    ``{{field}}`` / ``{{__error_value}}`` template, compiled to a Column at
    message-build time.
    """

    field: str
    category: str  # e.g. missing | type | constraint | domain | function
    code: str
    message: str
    predicate_sql: str  # boolean SQL over the stringified entity; null==fail
    level: str = "record"
    informational: bool = False
    reporting_entity: str | None = None
    value_expr: str | None = None
    """SQL for the offending value ({{__error_value}} / message 'value'):
    the leaf value for scalar and struct checks, the FIRST FAILING ELEMENT
    for array checks (parity with the reference's error-location value
    extraction, dve message.py:54-64)."""

    @property
    def value_sql(self) -> str:
        if self.value_expr is not None:
            return self.value_expr
        root = self.field.split(".", 1)[0]
        return f"CAST(`{root}` AS STRING)"


def _not_blank(expr: str) -> str:
    return f"({expr} IS NOT NULL AND TRIM(CAST({expr} AS STRING)) <> '')"


def _scalar_checks(field: FieldSpec, expr: str) -> list[tuple[str, str, str]]:
    """(category, code, predicate) triples for one scalar value expression.

    Predicates PASS null inputs (missing-ness is the mandatory check's job):
    every predicate is of shape ``value IS NULL OR <valid>``.
    """
    base = field.base_type
    cons = field.effective_constraints
    tname = field.type_name.lower()
    null_ok = f"{expr} IS NULL OR TRIM({expr}) = ''"
    checks: list[tuple[str, str, str]] = []

    def add(category: str, code: str, valid: str) -> None:
        checks.append((category, code, f"({null_ok} OR ({valid}))"))

    # type-shape checks
    if base in ("bigint", "double", "decimal"):
        add("type", "INVALID_NUMBER", f"TRY_CAST(TRIM({expr}) AS {_sql_type(field)}) IS NOT NULL")
    elif base == "boolean":
        add("type", "INVALID_BOOLEAN", f"TRY_CAST(TRIM({expr}) AS BOOLEAN) IS NOT NULL")
    elif base == "date" or base == "timestamp":
        add("type", "INVALID_DATE", f"({_scalar_cast_sql(field, expr)}) IS NOT NULL")

    # string-shape constraints
    trimmed = f"TRIM({expr})"
    if cons.get("min_length") is not None:
        add("constraint", "TOO_SHORT", f"LENGTH({trimmed}) >= {int(cons['min_length'])}")
    if cons.get("max_length") is not None:
        add("constraint", "TOO_LONG", f"LENGTH({trimmed}) <= {int(cons['max_length'])}")
    if cons.get("regex"):
        pattern = str(cons["regex"]).replace("\\", "\\\\").replace("'", "\\'")
        add("constraint", "REGEX_MISMATCH", f"{trimmed} RLIKE '{pattern}'")

    # numeric/date range constraints
    cast_expr = _scalar_cast_sql(field, expr)
    for key, op in (("ge", ">="), ("gt", ">"), ("le", "<="), ("lt", "<")):
        if cons.get(key) is not None:
            bound = cons[key]
            bound_sql = f"'{bound}'" if isinstance(bound, str) else str(bound)
            add("constraint", f"OUT_OF_RANGE_{key.upper()}", f"({cast_expr}) {op} {bound_sql}")

    # timezone constraint for formatted datetimes
    # (parity: dve metadata_parser/domain_types.py:348-433 forbid/permit/
    # require; detection is a suffix regex over the raw string)
    if base == "timestamp" and cons.get("timezone"):
        tz_mode = str(cons["timezone"]).lower()
        tz_regex = r"([+-][0-9]{2}:?[0-9]{2}|[+-][0-9]{4}|Z)\\s*$"
        if tz_mode == "forbid":
            add("constraint", "TIMEZONE_FORBIDDEN", f"NOT ({trimmed} RLIKE '{tz_regex}')")
        elif tz_mode == "require":
            add("constraint", "TIMEZONE_REQUIRED", f"{trimmed} RLIKE '{tz_regex}'")
        elif tz_mode != "permit":
            raise ValueError(f"unsupported timezone constraint {tz_mode!r}")

    # domain types
    if tname in ("nhsnumber", "permissivenhsno"):
        add("domain", "INVALID_NHS_NUMBER", nhs_mod11_sql(expr))
    elif tname == "postcode":
        add("domain", "INVALID_POSTCODE", valid_postcode_sql(expr))
    elif tname == "orgid":
        add("domain", "INVALID_ORG_ID", f"{expr} RLIKE '^[A-Z0-9]{{3,5}}$'")
    elif tname == "alphanumeric":
        n = int(cons.get("length", cons.get("max_length", 255)))
        add("domain", "NOT_ALPHANUMERIC", f"{trimmed} RLIKE '^[a-zA-Z0-9]{{1,{n}}}$'")
    elif tname == "identifier":
        n = int(cons.get("length", cons.get("max_length", 255)))
        add("domain", "INVALID_IDENTIFIER", f"{trimmed} RLIKE '^[a-zA-Z0-9_-]{{1,{n}}}$'")
    elif tname == "reportingperiodstart":
        add("domain", "NOT_PERIOD_START", f"({cast_expr}) = DATE_TRUNC('MONTH', {cast_expr})")
    elif tname == "reportingperiodend":
        add("domain", "NOT_PERIOD_END", f"({cast_expr}) = LAST_DAY({cast_expr})")

    return checks


def compile_checks(entity: EntityContract) -> list[CompiledCheck]:
    """All validation checks for an entity over its stringified DataFrame."""
    checks: list[CompiledCheck] = []
    for field in entity.fields:
        name = field.name
        quoted = _quote(name)
        # validate the SAME value expression cast_sql casts: contract value
        # functions rewrite the stringified value BEFORE checks run, so a
        # split-extracted number can't fail INVALID_NUMBER on the raw value
        # and an exclude_word'ed mandatory field fails MISSING (not a
        # silent null) — the reference runs functions in the pydantic
        # validator chain with coercion (dve function_wrapper.py:48-201)
        if field.functions and not field.is_array and field.model is None:
            checked = apply_functions_sql(field, quoted)
        else:
            checked = quoted
        mandatory = field.mandatory or name in entity.mandatory_fields
        if mandatory:
            pred = (
                f"SIZE({quoted}) > 0" if field.is_array else _not_blank(checked)
            )
            if checked is not quoted:
                # a value nulled by a FAILING function (split out-of-range)
                # already gets its FUNCTION_* error; the reference's
                # validator chain raises there and never reaches the
                # missing check (dve function_wrapper.py:48-201), so
                # suppress the duplicate MISSING message for those rows.
                # Functions that null by DESIGN (exclude_word) still fall
                # through to MISSING, matching pydantic's none-not-allowed.
                fn_fail = [
                    f"NOT ({c.predicate_sql})"
                    for c in function_checks(field, quoted)
                ]
                if fn_fail:
                    pred = f"({pred}) OR ({' OR '.join(fn_fail)})"
            checks.append(
                CompiledCheck(
                    field=name,
                    category="missing",
                    code="MISSING_MANDATORY_VALUE",
                    message=f"Mandatory field {name} missing",
                    predicate_sql=pred,
                )
            )
        if field.model is not None:
            # nested struct: check each leaf (arrays checked element-wise)
            for sub in field.model:
                if field.is_array:
                    sub_checks = _scalar_checks(sub, f"s.{_quote(sub.name)}")

                    def wrap(pred: str, q: str = quoted) -> str:
                        return (
                            f"({q} IS NULL OR FORALL(TRANSFORM({q}, "
                            f"s -> {pred}), p -> p))"
                        )

                    def val(pred: str, sub_q: str, q: str = quoted) -> str:
                        # first failing element's leaf value
                        return (
                            f"GET(ARRAY_COMPACT(TRANSFORM({q}, s -> "
                            f"CASE WHEN NOT COALESCE(({pred}), FALSE) THEN "
                            f"CAST(s.{sub_q} AS STRING) END)), 0)"
                        )

                else:
                    sub_checks = _scalar_checks(sub, f"{quoted}.{_quote(sub.name)}")

                    def wrap(pred: str, q: str = quoted) -> str:
                        return pred

                    def val(pred: str, sub_q: str, q: str = quoted) -> str:
                        return f"CAST({q}.{sub_q} AS STRING)"

                for cat, code, pred in sub_checks:
                    checks.append(
                        CompiledCheck(
                            field=f"{name}.{sub.name}",
                            category=cat,
                            code=code,
                            message=f"Field {name}.{sub.name} failed {code}",
                            predicate_sql=wrap(pred),
                            value_expr=val(pred, _quote(sub.name)),
                        )
                    )
        elif field.is_array:
            for cat, code, pred in _scalar_checks(
                FieldSpec(
                    name=name,
                    type_name=field.type_name,
                    constraints=field.constraints,
                ),
                "x",
            ):
                elem_pred = (
                    f"({quoted} IS NULL OR FORALL(TRANSFORM({quoted}, "
                    f"x -> {pred}), p -> p))"
                )
                checks.append(
                    CompiledCheck(
                        field=name,
                        category=cat,
                        code=code,
                        message=f"Field {name} failed {code}",
                        predicate_sql=elem_pred,
                        value_expr=(
                            f"GET(ARRAY_COMPACT(TRANSFORM({quoted}, x -> "
                            f"CASE WHEN NOT COALESCE(({pred}), FALSE) THEN "
                            f"CAST(x AS STRING) END)), 0)"
                        ),
                    )
                )
        else:
            for cat, code, pred in _scalar_checks(field, checked):
                checks.append(
                    CompiledCheck(
                        field=name,
                        category=cat,
                        code=code,
                        message=f"Field {name} failed {code}",
                        predicate_sql=pred,
                    )
                )
            checks.extend(function_checks(field, quoted))

    if entity.error_details:
        # lazy import: error_details.py imports CompiledCheck from here
        from data_validation_engine_spark.contract.error_details import (
            apply_error_details,
            parse_error_details,
        )

        checks = apply_error_details(
            checks, parse_error_details(entity.error_details)
        )
    return checks
