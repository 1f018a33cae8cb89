"""Data contract: declared schemas, native-expression validation, casting."""

from data_validation_engine_spark.contract.apply import apply_contract
from data_validation_engine_spark.contract.index import add_record_index
from data_validation_engine_spark.contract.spec import (
    Contract,
    EntityContract,
    FieldSpec,
    parse_contract,
)

__all__ = [
    "Contract",
    "EntityContract",
    "FieldSpec",
    "add_record_index",
    "apply_contract",
    "parse_contract",
]
