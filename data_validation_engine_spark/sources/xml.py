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
