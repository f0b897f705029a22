"""Tiny name → dataset catalog, dict/JSON/TOML backed.

Parity: ``LocalCatalog`` / ``DatasetSpec``
(reference: src/polars_incremental/catalog.py:14-129).  On Spark a dataset
can additionally be registered as a temp view so SQL can address it by name.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .errors import MissingOptionError
from .sources.base import DeltaSource, FilesSource


@dataclass(frozen=True)
class DatasetSpec:
    name: str
    format: str
    path: str
    options: dict[str, Any] = field(default_factory=dict)

    def to_source(self) -> FilesSource | DeltaSource:
        if self.format == "delta":
            return DeltaSource(path=self.path)
        return FilesSource(
            path=self.path,
            file_format=self.format,
            options=dict(self.options),
        )

    def to_schema_evolution(self):
        """Build a SchemaEvolution from schema-related dataset options, if any.

        Recognized options (reference catalog.py:62 / schema.py:498-551):
        ``schema_mode``, ``rescue_mode``, ``rescue_column``, ``schema``.
        Returns None when no schema option is present.
        """
        from .schema import SchemaEvolution

        keys = {"schema_mode", "rescue_mode", "rescue_column", "schema"}
        if not keys & set(self.options):
            return None
        return SchemaEvolution.from_options(
            {
                "mode": self.options.get("schema_mode", "add_new_columns"),
                "rescue_mode": self.options.get("rescue_mode", "none"),
                "rescue_column": self.options.get("rescue_column", "_rescued"),
                "schema": self.options.get("schema"),
            }
        )

    def read(self, spark: SparkSession) -> DataFrame:
        if self.format == "delta":
            return spark.read.format("delta").options(**self.options).load(self.path)
        reader = spark.read.options(**self.options)
        if self.format == "parquet":
            return reader.parquet(self.path)
        if self.format == "csv":
            return reader.option("header", "true").option("inferSchema", "true").csv(self.path)
        if self.format in ("json", "ndjson"):
            return reader.json(self.path)
        return reader.format(self.format).load(self.path)


class LocalCatalog:
    def __init__(self, datasets: dict[str, DatasetSpec] | None = None) -> None:
        self._datasets: dict[str, DatasetSpec] = dict(datasets or {})

    # ------------------------------------------------------------- loading
    @classmethod
    def from_dict(cls, payload: dict[str, dict[str, Any]]) -> "LocalCatalog":
        datasets = {}
        for name, spec in payload.items():
            if "path" not in spec:
                raise MissingOptionError(f"dataset {name!r} missing required 'path'")
            datasets[name] = DatasetSpec(
                name=name,
                format=spec.get("format", "parquet"),
                path=spec["path"],
                options=dict(spec.get("options", {})),
            )
        return cls(datasets)

    @classmethod
    def from_file(cls, path: str) -> "LocalCatalog":
        _, ext = os.path.splitext(path)
        with open(path, "rb") as handle:
            if ext.lower() == ".toml":
                import tomllib

                payload = tomllib.load(handle)
            else:
                payload = json.load(handle)
        return cls.from_dict(payload)

    # -------------------------------------------------------------- access
    def register(self, spec: DatasetSpec) -> None:
        self._datasets[spec.name] = spec

    def get(self, name: str) -> DatasetSpec:
        if name not in self._datasets:
            raise KeyError(f"dataset {name!r} not in catalog (have: {sorted(self._datasets)})")
        return self._datasets[name]

    def names(self) -> list[str]:
        return sorted(self._datasets)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return self.get(name).read(spark)

    def register_views(self, spark: SparkSession, names: list[str] | None = None) -> None:
        """Expose catalog datasets to spark.sql as temp views."""
        for name in names or self.names():
            self.read(spark, name).createOrReplaceTempView(name)
