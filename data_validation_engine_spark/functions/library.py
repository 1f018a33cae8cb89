"""Shipped scalar function library.

Every function the reference ships as a row-at-a-time Python UDF
(dve core_engine/functions/implementations.py:11-200, auto-registered at
dve spark/rules.py:80-104) is re-expressed here as a **pure SQL expression**
and registered as a Spark SQL scalar UDF (``CREATE OR REPLACE TEMPORARY
FUNCTION ... RETURN <expr>``). SQL UDFs are inlined by Catalyst into the
calling plan — whole-stage-codegen'd, no Python worker round trip — so rule
expressions like ``over_10(gravity)`` keep the reference's spelling at
JVM speed.

A `register_python_udf` escape hatch remains for genuinely imperative user
extensions (Arrow-vectorised pandas_udf preferred).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# test ODS codes: the reference embeds a lookup list
# (functions/implementations.py:49-143); kept as a SQL array literal
_VALID_ODS_CODES = (
    "EE142976 EE144430 EE143473 EE148112 EE142863 EE147862 EE142472 EE141208 "
    "EE143149 EE140862 EE140319 EE144899 EE144475 EE141850 EE147934 EE141068 "
    "EE143825 EE147805 EE143489 EE146813 EE145703 EE148295 EE140156 EE145502 "
    "EE148396 EE144126 EE145590 EE141566 EE142081 EE143640 EE144911 EE145935 "
    "EE145279 EE143156 EE146556 EE140781 EE144734 EE144841 EE140419 EE140040 "
    "EE147342 EE143330 EE140926 EE146438 EE142137 EE143856 EE141067 EE148534 "
    "EE141310 EE146899 EE146996 EE147487 EE148447 EE144311 EE142147 EE147605 "
    "EE142117 EE144087 EE147326 EE147614 EE143703 EE146135 EE140782 EE143603 "
    "EE143554 EE146659 EE140321 EE141185 EE147648 EE144527 EE142680 EE141620 "
    "EE145274 EE146251 EE148209 EE142574 EE148162 EE143118 EE142977 EE147798 "
    "EE147902 EE145780 EE146992 EE142916 EE144777 EE146935 EE145586 EE144570 "
    "EE147122 EE140874 EE141338 EE143244"
).split()

POSTCODE_PATTERN = r"^[a-zA-Z]{1,2}[0-9]([a-zA-Z]?|[0-9]?)\\ [0-9][a-zA-Z]{2}$"
"""UK postcode shape after normalisation (dve domain_types.py:32)."""

NULL_POSTCODES = ("tba", "tbc", "na", "n/a", "no valid")


def _nhs_checksum_sql(nhs: str) -> str:
    """SQL for the NHS mod-11 checksum over a clean 10-digit string.

    Digit i (1-based, first 9) is weighted 11-i; checksum = 11 - mod11 with
    mod11==0 -> 0 and mod11==1 -> invalid (never matches a 0-9 check digit).
    Spec: https://datadictionary.nhs.uk/attributes/nhs_number.html
    (dve domain_types.py:134-142).
    """
    weighted = " + ".join(
        f"CAST(SUBSTRING({nhs}, {i}, 1) AS INT) * {11 - i}" for i in range(1, 10)
    )
    return (
        f"(11 - (CASE WHEN ({weighted}) % 11 = 0 THEN 11 "
        f"ELSE ({weighted}) % 11 END)) = CAST(SUBSTRING({nhs}, 10, 1) AS INT)"
    )


NHS_CLEAN_SQL = "REGEXP_REPLACE(CAST({x} AS STRING), '[ -]', '')"

NHS_MOD11_SQL = (
    "CASE WHEN {clean} RLIKE '^[0-9]{{10}}$' THEN ({checksum}) ELSE FALSE END"
)


def nhs_mod11_sql(x: str) -> str:
    """Full NHS-number validity check as one SQL boolean expression."""
    clean = NHS_CLEAN_SQL.format(x=x)
    return NHS_MOD11_SQL.format(clean=clean, checksum=_nhs_checksum_sql(clean))


def nhs_mod11_expr(col: str) -> Column:
    return F.expr(nhs_mod11_sql(f"`{col}`"))


def normalise_postcode_sql(x: str) -> str:
    """Postcode normalisation: strip spaces, null sentinel values, re-insert
    the single space before the final 3 chars, uppercase
    (dve domain_types.py:183-191)."""
    stripped = f"REPLACE(CAST({x} AS STRING), ' ', '')"
    nulls = ", ".join(f"'{v}'" for v in NULL_POSTCODES)
    return (
        f"CASE WHEN {stripped} = '' OR LOWER({stripped}) IN ({nulls}) THEN NULL "
        f"ELSE UPPER(CONCAT(SUBSTRING({stripped}, 1, LENGTH({stripped}) - 3), "
        f"' ', SUBSTRING({stripped}, -3))) END"
    )


def normalise_postcode_expr(col: str) -> Column:
    return F.expr(normalise_postcode_sql(f"`{col}`"))


def valid_postcode_sql(x: str) -> str:
    """Is the (normalised) postcode shaped like a UK postcode?"""
    norm = normalise_postcode_sql(x)
    return f"({norm}) RLIKE '{POSTCODE_PATTERN}'"


def valid_postcode_expr(col: str) -> Column:
    return F.expr(valid_postcode_sql(f"`{col}`"))


# name -> (parameter signature, return type, body expression)
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "over_10k": ("x DOUBLE", "BOOLEAN", "x > 10000"),
    "over_1k": ("x DOUBLE", "BOOLEAN", "x > 1000"),
    "under_10k": ("x DOUBLE", "BOOLEAN", "x < 10000"),
    "under_5k": ("x DOUBLE", "BOOLEAN", "x < 5000"),
    "over_5": ("x DOUBLE", "BOOLEAN", "x > 5"),
    "over_10": ("x DOUBLE", "BOOLEAN", "x > 10"),
    "x_not_greater_than_y": ("x DOUBLE, y DOUBLE", "BOOLEAN", "x <= y"),
    "date_in_current_financial_year": (
        "test_date DATE",
        "BOOLEAN",
        # reference semantics: >= April 1 of the current calendar year
        # (functions/implementations.py:41-44)
        "test_date >= make_date(year(current_date()), 4, 1)",
    ),
    "is_valid_ods_code": (
        "check_ods_code STRING",
        "BOOLEAN",
        "COALESCE(check_ods_code IN ("
        + ", ".join(f"'{c}'" for c in _VALID_ODS_CODES)
        + "), FALSE)",
    ),
    "is_valid_national_org": (
        "check_org_code STRING",
        "BOOLEAN",
        "COALESCE(check_org_code IN ('ORG01', 'ORG02'), FALSE)",
    ),
    "check_correct_numeric_signage": (
        "val DOUBLE, expected_sign STRING",
        "BOOLEAN",
        "CASE WHEN val IS NULL THEN NULL "
        "WHEN expected_sign = '+/-' THEN TRUE "
        "WHEN expected_sign = '+' THEN val >= 0 "
        "WHEN expected_sign = '-' THEN val <= 0 "
        "ELSE NULL END",
    ),
    "number_matches_within_tolerance": (
        "comparator DOUBLE, number DOUBLE, tolerance DOUBLE",
        "BOOLEAN",
        "ABS(number - comparator) <= ABS(tolerance)",
    ),
    "number_matches_within_percentage": (
        "comparator DOUBLE, number DOUBLE, percentage DOUBLE",
        "BOOLEAN",
        "ABS(number - comparator) <= ABS(comparator * percentage)",
    ),
    "nhsno_mod11_check": ("nhs_no STRING", "BOOLEAN", nhs_mod11_sql("nhs_no")),
    # URL anatomy for corpus provenance filtering (RefinedWeb-style
    # blocklists key on host/registrable domain). parse_url is JVM-native;
    # url_domain is the NAIVE last-two-labels registrable domain — correct
    # for .com/.org etc., wrong for multi-label suffixes like .co.uk
    # (documented; a public-suffix-list join is the precise path).
    "url_host": (
        "url STRING",
        "STRING",
        # try_parse_url: NULL on malformed input (plain parse_url THROWS
        # under Spark 4 ANSI) — a blocklist filter must not abort on one
        # garbage URL
        "lower(try_parse_url(url, 'HOST'))",
    ),
    "url_domain": (
        "url STRING",
        "STRING",
        "CASE WHEN try_parse_url(url, 'HOST') IS NULL THEN NULL "
        "WHEN size(split(lower(try_parse_url(url, 'HOST')), '\\\\.')) < 2 "
        "THEN lower(try_parse_url(url, 'HOST')) "
        "ELSE array_join(slice(split(lower(try_parse_url(url, 'HOST')), "
        "'\\\\.'), -2, 2), '.') END",
    ),
    "url_path": ("url STRING", "STRING", "try_parse_url(url, 'PATH')"),
    "normalise_postcode": (
        "pc STRING",
        "STRING",
        normalise_postcode_sql("pc"),
    ),
    "is_valid_postcode": ("pc STRING", "BOOLEAN", valid_postcode_sql("pc")),
}


def register_all_functions(spark: SparkSession) -> None:
    """Register the library as temporary SQL UDFs (idempotent).

    SQL UDFs are expanded inline by the analyzer — they cost nothing at
    runtime vs writing the expression by hand, unlike the reference's
    Python-UDF registration (dve spark_helpers.py:276-288).
    """
    if getattr(spark, "_dve_functions_registered", False):
        return
    for name, (params, rtype, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {rtype} RETURN {body}"
        )
    try:
        spark._dve_functions_registered = True  # noqa: SLF001
    except AttributeError:  # pragma: no cover
        pass


def register_python_udf(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: str,
    *,
    vectorised: bool = False,
) -> None:
    """Escape hatch for user extensions the SQL surface can't express.

    ``vectorised=True`` registers an Arrow-batched pandas UDF (10-100x the
    throughput of a row-at-a-time Python UDF); ``fn`` then receives/returns
    ``pd.Series``.
    """
    if vectorised:
        spark.udf.register(name, F.pandas_udf(fn, return_type))
    else:
        spark.udf.register(name, F.udf(fn, return_type))


def register_python_udtf(
    spark: SparkSession,
    name: str,
    cls: type,
    return_type: str,
) -> None:
    """Escape hatch for user-defined TABLE functions (Spark 3.5+
    ``udtf``): ``cls`` is a plain class with an ``eval(self, ...)``
    generator yielding output tuples; registered, it is callable in any
    rule SQL as ``name(...)`` in the FROM clause (including LATERAL
    joins against entity columns).

    The reference's only table-generating construct is explode inside
    the XML reader (dve spark/readers/xml.py:181) — this extends the
    §2.6 function surface to set-returning user logic (e.g. custom
    tokenisers, span extractors) without touching engine code. Executes
    in the Python worker (Arrow-batched rows): like register_python_udf
    this is the deliberate slow path — prefer built-in generators
    (explode/posexplode/inline/stack) whenever they can express the
    shape.
    """
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register(name, _udtf(cls, returnType=return_type))
