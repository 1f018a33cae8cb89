"""Scalar function library (native Column expressions, SQL-registered)."""

from data_validation_engine_spark.functions.library import (
    nhs_mod11_expr,
    normalise_postcode_expr,
    register_all_functions,
    register_python_udf,
    register_python_udtf,
    valid_postcode_expr,
)

__all__ = [
    "nhs_mod11_expr",
    "normalise_postcode_expr",
    "register_all_functions",
    "register_python_udf",
    "register_python_udtf",
    "valid_postcode_expr",
]
