"""XML source: Spark 4 native XML scan with the reference's rowTag/rootTag
semantics (dve spark/readers/xml.py:60-212).

- ``record_tag`` -> the XML source's ``rowTag``.
- When records are nested under a wrapping root entity the reference reads
  the root as the row and explodes the record array
  (dve spark/readers/xml.py:181); ``explode_record_tag`` reproduces that.
- Namespace prefixes are stripped from column names after the scan (the
  reference retries the parse with namespace handling; the native source
  keeps local names when ``ignoreNamespace`` is on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class XSDValidationError(ValueError):
    """The submitted XML file failed XSD validation."""


def validate_xsd(path: str, xsd_location: str) -> None:
    """Validate an XML file against an XSD (driver-side, pre-scan).

    Parity with the reference's reader hook
    (dve backends/readers/xml.py:120-122, xmllint/lxml-based; books fixture
    ``TESTXSDERROR``). Requires ``lxml`` or ``xmlschema`` — neither ships in
    this container, so the capability is import-gated: with a library
    present the file is validated and failures raise
    :class:`XSDValidationError`; without one, requesting XSD validation
    raises ``ImportError`` loudly rather than skipping silently.
    """
    try:
        from lxml import etree  # type: ignore[import-not-found]

        xsd = etree.XMLSchema(etree.parse(xsd_location))
        doc = etree.parse(path)
        if not xsd.validate(doc):
            raise XSDValidationError(
                f"{path} failed XSD validation against {xsd_location}: "
                f"{xsd.error_log.last_error}"
            )
        return
    except ImportError:
        pass
    try:
        import xmlschema  # type: ignore[import-not-found]

        schema = xmlschema.XMLSchema(xsd_location)
        if not schema.is_valid(path):
            raise XSDValidationError(
                f"{path} failed XSD validation against {xsd_location}"
            )
        return
    except ImportError:
        pass
    raise ImportError(
        "XSD validation requires lxml or xmlschema; neither is installed "
        "(install one, or drop xsd_location to skip validation)"
    )


def read_xml(
    spark: SparkSession,
    path: str,
    record_tag: str,
    *,
    schema: T.StructType | None = None,
    root_tag: str | None = None,
    explode_record_tag: bool = False,
    n_records_to_read: int | None = None,
    xsd_location: str | None = None,
) -> DataFrame:
    """Read XML records.

    With ``explode_record_tag`` the scan uses ``root_tag`` as the row and
    explodes the ``record_tag`` array column (for wrapped documents whose
    header attributes live on the root). With ``xsd_location`` the file is
    XSD-validated before the scan (see :func:`validate_xsd`).
    """
    if xsd_location is not None:
        validate_xsd(path, xsd_location)
    row_tag = root_tag if explode_record_tag and root_tag else record_tag
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("ignoreNamespace", "true")
        .option("mode", "PERMISSIVE")
    )
    if schema is not None and not explode_record_tag:
        reader = reader.schema(schema)
    df = reader.load(path)

    if explode_record_tag:
        if record_tag not in df.columns:
            raise ValueError(
                f"record tag {record_tag!r} not found under root "
                f"{row_tag!r}; columns: {df.columns}"
            )
        others = [c for c in df.columns if c != record_tag]
        record_type = dict(zip(df.columns, df.schema))[record_tag].dataType
        record_col = (
            F.explode(F.col(f"`{record_tag}`"))
            if isinstance(record_type, T.ArrayType)
            else F.col(f"`{record_tag}`")
        )
        df = df.select(*others, record_col.alias(record_tag)).select(
            *others, f"`{record_tag}`.*"
        )

    df = _strip_namespace_prefixes(df)
    if n_records_to_read is not None:
        df = df.limit(n_records_to_read)
    return df


def _conform_col(col, actual: T.DataType | None, target: T.DataType):
    """Recursively reshape an inferred column to the declared type:
    by-NAME struct field matching (inference orders fields
    alphabetically, so positional casts would scramble values), single
    struct -> 1-element array promotion when the contract declares an
    array, missing fields null-filled, scalar leaves cast."""
    if isinstance(target, T.ArrayType):
        if isinstance(actual, T.ArrayType):
            return F.transform(
                col, lambda x: _conform_col(x, actual.elementType, target.elementType)
            )
        # declared array, single value inferred: promote to 1-element array
        inner = _conform_col(col, actual, target.elementType)
        return F.when(col.isNull(), F.lit(None).cast(target)).otherwise(
            F.array(inner)
        )
    if isinstance(target, T.StructType):
        if not isinstance(actual, T.StructType):
            return F.lit(None).cast(target)
        actual_fields = {f.name: f.dataType for f in actual.fields}
        members = []
        for f in target.fields:
            if f.name in actual_fields:
                members.append(
                    _conform_col(
                        col.getField(f.name), actual_fields[f.name], f.dataType
                    ).alias(f.name)
                )
            else:
                members.append(F.lit(None).cast(f.dataType).alias(f.name))
        return F.when(col.isNull(), F.lit(None).cast(target)).otherwise(
            F.struct(*members)
        )
    return col.cast(target)


def conform_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Reshape an inferred (XML/JSON) frame to a declared schema.

    This is the reader-side "template-row shaping" of the reference
    (dve backends/readers/xml.py struct/array coercion), done as pure
    Column expressions: name-matched struct rebuilds, struct->array
    promotion, null fill for missing fields, leaf casts.
    """
    actual = {f.name: f.dataType for f in df.schema.fields}
    return df.select(
        *[
            _conform_col(
                F.col(f"`{f.name}`") if f.name in actual else F.lit(None),
                actual.get(f.name),
                f.dataType,
            ).alias(f.name)
            for f in schema.fields
        ]
    )


def _strip_namespace_prefixes(df: DataFrame) -> DataFrame:
    renames = {}
    for c in df.columns:
        if ":" in c:
            renames[c] = c.split(":", 1)[1]
    if not renames:
        return df
    return df.select(
        *[
            F.col(f"`{c}`").alias(renames.get(c, c))
            for c in df.columns
        ]
    )
