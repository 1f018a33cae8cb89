"""Entity namespace: named DataFrames + protected reference data.

An "entity" is a named table (Spark DataFrame). A rule program operates on a
mutable mapping of entities; reference data is exposed read-only under a
``refdata_`` name prefix and loaded lazily on first access.

Reference parity: dve backends/base/core.py:59-124 (refdata prefix
protection), backends/base/reference_data.py:37-87 (table/filename/uri
discriminated loaders), spark/reference_data.py:32-38.
"""

from __future__ import annotations

from collections.abc import Iterator, MutableMapping
from dataclasses import dataclass
from typing import Literal

from pyspark.sql import DataFrame, SparkSession

from data_validation_engine_spark.errors import ConstraintError

REFDATA_PREFIX = "refdata_"


@dataclass(frozen=True)
class RefDataConfig:
    """Where one reference-data table lives.

    ``type`` discriminates: ``table`` (catalog table name), ``filename``
    (path relative to ``base_path``), ``uri`` (absolute path/URI). Format
    applies to file-based refdata (parquet default — columnar, prunable).
    """

    name: str
    type: Literal["table", "filename", "uri"] = "uri"
    location: str = ""
    format: str = "parquet"

    def load(self, spark: SparkSession, base_path: str | None = None) -> DataFrame:
        if self.type == "table":
            return spark.table(self.location)
        path = self.location
        if self.type == "filename":
            if not base_path:
                raise ConstraintError(
                    f"refdata {self.name!r} is file-relative but no base path given",
                    constraint="filename refdata requires a base path",
                )
            path = base_path.rstrip("/") + "/" + self.location
        return spark.read.format(self.format).load(path)


class EntityManager(MutableMapping[str, DataFrame]):
    """Dict of entity DataFrames with lazily-loaded, write-protected refdata.

    Names starting with ``refdata_`` resolve through the refdata loaders;
    assigning or deleting them raises :class:`ConstraintError`. Everything
    is lazy: entities are unmaterialised DataFrame plans, refdata loads on
    first read (and is cached as the plan, not the data — Catalyst decides
    materialisation).
    """

    def __init__(
        self,
        entities: dict[str, DataFrame] | None = None,
        *,
        spark: SparkSession | None = None,
        refdata: dict[str, RefDataConfig] | None = None,
        refdata_base_path: str | None = None,
        extra_refdata: dict[str, DataFrame] | None = None,
    ):
        self._entities: dict[str, DataFrame] = dict(entities or {})
        self._spark = spark
        self._refdata_cfg = dict(refdata or {})
        self._refdata_base_path = refdata_base_path
        # pre-resolved refdata frames (e.g. injected submission info)
        self._refdata_loaded: dict[str, DataFrame] = dict(extra_refdata or {})

    # -- refdata -----------------------------------------------------------
    @staticmethod
    def is_refdata(name: str) -> bool:
        return name.startswith(REFDATA_PREFIX)

    def _load_refdata(self, name: str) -> DataFrame:
        if name in self._refdata_loaded:
            return self._refdata_loaded[name]
        short = name[len(REFDATA_PREFIX) :]
        cfg = self._refdata_cfg.get(name) or self._refdata_cfg.get(short)
        if cfg is None:
            raise KeyError(name)
        if self._spark is None:
            raise ConstraintError(
                f"no SparkSession available to load refdata {name!r}",
                constraint="EntityManager needs spark= to lazy-load refdata",
            )
        df = cfg.load(self._spark, self._refdata_base_path)
        self._refdata_loaded[name] = df
        return df

    def add_refdata_frame(self, name: str, df: DataFrame) -> None:
        """Register an already-built DataFrame as refdata (read-only)."""
        if not self.is_refdata(name):
            name = REFDATA_PREFIX + name
        self._refdata_loaded[name] = df

    # -- MutableMapping ----------------------------------------------------
    def __getitem__(self, name: str) -> DataFrame:
        if self.is_refdata(name):
            return self._load_refdata(name)
        return self._entities[name]

    def __setitem__(self, name: str, df: DataFrame) -> None:
        if self.is_refdata(name):
            raise ConstraintError(
                f"cannot overwrite reference data entity {name!r}",
                constraint="refdata_* entities are read-only",
            )
        self._entities[name] = df

    def __delitem__(self, name: str) -> None:
        if self.is_refdata(name):
            raise ConstraintError(
                f"cannot delete reference data entity {name!r}",
                constraint="refdata_* entities are read-only",
            )
        del self._entities[name]

    def __iter__(self) -> Iterator[str]:
        return iter(self._entities)

    def __len__(self) -> int:
        return len(self._entities)

    def __contains__(self, name: object) -> bool:
        if isinstance(name, str) and self.is_refdata(name):
            if name in self._refdata_loaded:
                return True
            short = name[len(REFDATA_PREFIX) :]
            return name in self._refdata_cfg or short in self._refdata_cfg
        return name in self._entities
