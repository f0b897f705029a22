"""Cross-batch job state: atomic JSON / parquet blobs under ``<checkpoint>/state``.

Parity: ``JobState`` (reference: src/polars_incremental/state.py:14-92).
JSON blobs hold small scalars (watermarks, counters, seen-id digests);
parquet blobs hold tabular state (rolling aggregates).  Parquet state is
written by Spark so it stays distributed — the driver never materializes it.

For high-cardinality streaming state prefer the native path
(``withWatermark`` + ``dropDuplicates`` / ``applyInPandasWithState``); this
store is for planned-mode pipelines and small job-level facts.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .checkpoints.types import atomic_write_json, read_json


class JobState:
    def __init__(self, state_dir: str) -> None:
        self.dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _json_path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.json")

    def _parquet_path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.parquet")

    # ---------------------------------------------------------------- json
    def save_json(self, key: str, value: Any) -> None:
        atomic_write_json(self._json_path(key), {"value": value})

    def load_json(self, key: str, default: Any = None) -> Any:
        payload = read_json(self._json_path(key))
        return default if payload is None else payload.get("value", default)

    # ------------------------------------------------------------- parquet
    def save_parquet(self, key: str, df: DataFrame) -> None:
        """Atomic swap: write to a staging dir, then rename over the old one."""
        final = self._parquet_path(key)
        staging = final + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        df.write.mode("overwrite").parquet(staging)
        backup = final + ".old"
        if os.path.exists(final):
            os.replace(final, backup) if os.path.isfile(final) else shutil.move(final, backup)
        os.replace(staging, final)
        if os.path.exists(backup):
            shutil.rmtree(backup, ignore_errors=True)

    def load_parquet(self, spark: SparkSession, key: str) -> DataFrame | None:
        path = self._parquet_path(key)
        if not os.path.exists(path):
            return None
        return spark.read.parquet(path)

    # ---------------------------------------------------------------- misc
    def exists(self, key: str) -> bool:
        return os.path.exists(self._json_path(key)) or os.path.exists(self._parquet_path(key))

    def delete(self, key: str) -> None:
        for path in (self._json_path(key), self._parquet_path(key)):
            if os.path.isfile(path):
                os.unlink(path)
            elif os.path.isdir(path):
                shutil.rmtree(path)

    def keys(self) -> list[str]:
        out = set()
        for name in os.listdir(self.dir):
            stem, ext = os.path.splitext(name)
            if ext in (".json", ".parquet"):
                out.add(stem)
        return sorted(out)
