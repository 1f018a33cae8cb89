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
    """Per (entity, error code) counts — the report's aggregates sheet."""
    return (
        messages.groupBy("entity", "error_code", "failure_type")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.count_distinct(F.col("__record_index__")).alias("n_records"),
        )
        .orderBy("entity", "error_code")
    )


def write_error_report(
    messages: DataFrame,
    out_path: str,
    *,
    max_detail_rows: int = 100_000,
) -> str:
    """Write the error report; returns the path written.

    Uses openpyxl when available (xlsx: summary + detail + aggregates
    sheets), else CSVs in a directory.
    """
    aggregates = error_aggregates(messages).toPandas()
    detail = (
        messages.select(
            "entity",
            "__record_index__",
            "error_code",
            "error_message",
            "error_location",
            "failure_type",
            "is_informational",
            "reporting_field",
        )
        .limit(max_detail_rows)
        .toPandas()
    )
    summary = (
        messages.groupBy("failure_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )

    try:
        import openpyxl  # noqa: F401

        path = out_path if out_path.endswith(".xlsx") else out_path + ".xlsx"
        import pandas as pd

        with pd.ExcelWriter(path, engine="openpyxl") as writer:
            summary.to_excel(writer, sheet_name="summary", index=False)
            detail.to_excel(writer, sheet_name="errors", index=False)
            aggregates.to_excel(writer, sheet_name="aggregates", index=False)
        return path
    except ImportError:
        out_dir = Path(out_path.removesuffix(".xlsx"))
        out_dir.mkdir(parents=True, exist_ok=True)
        summary.to_csv(out_dir / "summary.csv", index=False)
        detail.to_csv(out_dir / "errors.csv", index=False)
        aggregates.to_csv(out_dir / "aggregates.csv", index=False)
        return str(out_dir)
