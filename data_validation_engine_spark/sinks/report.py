"""Error report sink (dve reporting/excel_report.py:24-345).

Aggregates are computed distributed (groupBy — never a driver-side
dataframe library); only the final small summary lands on the driver.
Excel output requires openpyxl (not in this container) — gated behind an
import-try with a CSV fallback so the report is always produced.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def error_aggregates(messages: DataFrame) -> DataFrame:
    """Per (entity, error code) counts — the machine-readable audit
    artifact (engine-native column names; the report sheets use the
    reference-shaped frames below)."""
    return (
        messages.groupBy("entity", "error_code", "failure_type")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.count_distinct(F.col("__record_index__")).alias("n_records"),
        )
        .orderBy("entity", "error_code")
    )


def report_type_col() -> "F.Column":
    """The reference's report category (dve reporting/constants.py:8-22):
    informational -> Warning, record failures -> Record Rejection,
    everything else (submission/integrity) -> File Rejection."""
    return (
        F.when(F.col("is_informational"), F.lit("Warning"))
        .when(F.col("failure_type") == "record", F.lit("Record Rejection"))
        .otherwise(F.lit("File Rejection"))
    )


def report_detail_unsorted(messages: DataFrame) -> DataFrame:
    """The detail-sheet projection without the output sort — the writer's
    single-collect fast path sorts driver-side instead (same keys)."""
    return messages.select(
        F.col("entity").alias("Table"),
        report_type_col().alias("Type"),
        F.col("error_code").alias("Error_Code"),
        F.col("error_location").alias("Data_Item"),
        F.col("error_message").alias("Error"),
        F.col("__record_index__").alias("Record_Index"),
        F.col("value").alias("Value"),
        F.col("reporting_field").alias("ID"),
        F.col("category").alias("Category"),
    )


def report_detail(messages: DataFrame) -> DataFrame:
    """Reference-shaped error detail sheet (ERROR_SCHEMA, dve
    reporting/error_report.py:16-26): Table/Type/Error_Code/Data_Item/
    Error/Record_Index/Value/ID/Category, sorted by Type."""
    return report_detail_unsorted(messages).orderBy(
        "Type", "Table", "Record_Index"
    )


def report_aggregates(messages: DataFrame) -> DataFrame:
    """Reference-shaped aggregates sheet (AGGREGATE_SCHEMA +
    calculate_aggregates, dve reporting/error_report.py:28-36,115-140):
    counts per Type/Table/Data_Item/Category/Error_Code, Type ascending
    then Count descending."""
    return (
        messages.select(
            report_type_col().alias("Type"),
            F.col("entity").alias("Table"),
            F.col("error_location").alias("Data_Item"),
            F.col("category").alias("Category"),
            F.col("error_code").alias("Error_Code"),
        )
        .groupBy("Type", "Table", "Data_Item", "Category", "Error_Code")
        .agg(F.count(F.lit(1)).alias("Count"))
        .orderBy(F.col("Type").asc(), F.col("Count").desc())
    )


REPORT_CATEGORIES = ("File Rejection", "Record Rejection", "Warning")


def report_summary(messages: DataFrame) -> DataFrame:
    """Summary sheet: one row per report category in the reference's
    heading order, zero-filled so all three rows are always present
    (dve SummaryItems row_headings, reporting/excel_report.py)."""
    spark = messages.sparkSession
    headings = spark.createDataFrame(
        [(c,) for c in REPORT_CATEGORIES], "Type string"
    )
    counts = (
        messages.select(report_type_col().alias("Type"))
        .groupBy("Type")
        .agg(F.count(F.lit(1)).alias("Count"))
    )
    return (
        headings.join(counts, on="Type", how="left")
        .select("Type", F.coalesce("Count", F.lit(0)).alias("Count"))
        .orderBy("Type")
    )


def write_error_report(
    messages: DataFrame,
    out_path: str,
    *,
    max_detail_rows: int = 100_000,
    output_format: str = "auto",
) -> str:
    """Write the error report; returns the path written.

    ``output_format``: ``"auto"`` uses openpyxl when available (xlsx:
    summary + detail + aggregates sheets) and falls back to CSVs in a
    directory; ``"xlsx"`` forces the workbook (raising ImportError loudly
    if openpyxl is missing); ``"csv"`` forces the directory of CSVs.
    """
    if output_format not in ("auto", "xlsx", "csv"):
        raise ValueError(f"unknown report output_format: {output_format!r}")
    # One Spark job for the whole report in the common case: collect the
    # UNSORTED detail projection once (cap + 1 rows to detect truncation)
    # and derive all three sheets driver-side — the aggregates and summary
    # are groupings of columns the detail sheet already carries, and the
    # report is a driver-sized artifact by definition (the reference's
    # report is a spreadsheet). Only when the cap is exceeded does the
    # original three-query distributed path run: there the aggregates must
    # cover ALL messages, not the truncated detail, and the sorted LIMIT
    # keeps the reference's deterministic first-N-by-type truncation.
    unsorted = report_detail_unsorted(messages).limit(max_detail_rows + 1)
    detail = unsorted.toPandas()
    if len(detail) <= max_detail_rows:
        detail = detail.sort_values(
            ["Type", "Table", "Record_Index"],
            na_position="first",
            kind="mergesort",
        ).reset_index(drop=True)
        # dropna=False: Spark groupBy keys keep nulls
        aggregates = (
            detail.groupby(
                ["Type", "Table", "Data_Item", "Category", "Error_Code"],
                dropna=False,
                as_index=False,
            )
            .size()
            .rename(columns={"size": "Count"})
            .sort_values(
                ["Type", "Count"],
                ascending=[True, False],
                kind="mergesort",
            )
            .reset_index(drop=True)
        )
        summary = (
            detail["Type"]
            .value_counts()
            .reindex(REPORT_CATEGORIES)
            .fillna(0)
            .astype("int64")
            .rename_axis("Type")
            .reset_index(name="Count")
            .sort_values("Type", kind="mergesort")
            .reset_index(drop=True)
        )
    else:
        aggregates = report_aggregates(messages).toPandas()
        detail = report_detail(messages).limit(max_detail_rows).toPandas()
        summary = report_summary(messages).toPandas()

    use_xlsx = output_format == "xlsx"
    if output_format == "auto":
        try:
            import openpyxl  # noqa: F401

            use_xlsx = True
        except ImportError:
            use_xlsx = False

    if use_xlsx:
        import openpyxl  # noqa: F401 - loud ImportError when forced
        import pandas as pd

        path = out_path if out_path.endswith(".xlsx") else out_path + ".xlsx"
        with pd.ExcelWriter(path, engine="openpyxl") as writer:
            summary.to_excel(writer, sheet_name="summary", index=False)
            detail.to_excel(writer, sheet_name="errors", index=False)
            aggregates.to_excel(writer, sheet_name="aggregates", index=False)
        return path
    out_dir = Path(out_path.removesuffix(".xlsx"))
    out_dir.mkdir(parents=True, exist_ok=True)
    summary.to_csv(out_dir / "summary.csv", index=False)
    detail.to_csv(out_dir / "errors.csv", index=False)
    aggregates.to_csv(out_dir / "aggregates.csv", index=False)
    return str(out_dir)


def error_samples(
    messages: DataFrame, *, per_code: int = 10
) -> DataFrame:
    """The human-review companion to :func:`error_aggregates`: the first
    ``per_code`` messages per (entity, error_code), chosen by ascending
    record index (deterministic — a rerun shows the same examples).

    Aggregates say HOW MANY rows failed; a reviewer triaging a failed
    submission needs to see a few ACTUAL failing messages per code
    without pulling the full error feed (which at 100 TB can be most of
    the table). One shuffle on (entity, error_code); the rank rewrites
    to WindowGroupLimit, so each map task forwards at most ``per_code``
    rows per key — the output is bounded by codes x per_code regardless
    of corpus size. The reference's report lists every error row
    (reporting/excel_report.py builds the full detail sheet); sampling
    is the scale-safe extension of the same artifact.
    """
    if per_code <= 0:
        raise ValueError(f"per_code must be positive, got {per_code}")
    from pyspark.sql import Window

    w = Window.partitionBy("entity", "error_code").orderBy(
        F.col("__record_index__").asc_nulls_last(),
        F.col("error_message").asc_nulls_last(),
    )
    return (
        messages.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= per_code)
        .drop("__rank")
    )
