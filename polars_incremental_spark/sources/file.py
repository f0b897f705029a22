"""Planned-mode file source: plan → read → commit (+ clean_source).

Parity: ``FileSource`` (reference: src/polars_incremental/sources/file.py:71-174).
Reading is a plain multi-path ``spark.read`` so Catalyst gets the full file
list at once (parallel scan, pushdown, pruning) rather than per-file loops.
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..checkpoints.file import FileStreamCheckpoint, list_files
from ..checkpoints.types import BatchInfo
from ..errors import UnsupportedFormatError
from .base import FilesSource

logger = logging.getLogger(__name__)


class FileSource:
    """A ``FilesSource`` spec bound to a checkpoint directory."""

    def __init__(self, spec: FilesSource, checkpoint_dir: str) -> None:
        self.spec = spec
        self.checkpoint = FileStreamCheckpoint(checkpoint_dir)
        self.format = spec.resolved_format()

    # ------------------------------------------------------------ planning
    def plan_batch(self) -> BatchInfo | None:
        listing = list_files(
            self.spec.path, pattern=self.spec.pattern, recursive=self.spec.recursive
        )
        return self.checkpoint.plan_batch(
            listing,
            start_offset=self.spec.start_offset,
            max_files=self.spec.max_files_per_trigger,
            max_bytes=self.spec.max_bytes_per_trigger,
            max_file_age_seconds=self.spec.max_file_age,
            allow_overwrites=self.spec.allow_overwrites,
        )

    # ------------------------------------------------------------- reading
    def read_batch(self, spark: SparkSession, batch: BatchInfo) -> DataFrame:
        return read_files(
            spark,
            batch.files,
            self.format,
            options=self.spec.options,
            schema=self.spec.schema,
        )

    # ------------------------------------------------------------- commit
    def commit_batch(self, batch: BatchInfo, metadata: dict[str, Any] | None = None) -> None:
        self.checkpoint.commit_batch(batch, metadata)
        if self.spec.clean_source:
            self._clean_source_files(batch.files)

    def _clean_source_files(self, files: list[str]) -> None:
        mode = self.spec.clean_source
        for path in files:
            try:
                if mode == "delete":
                    os.unlink(path)
                elif mode == "archive":
                    archive_dir = self.spec.clean_source_archive_dir
                    if not archive_dir:
                        raise ValueError(
                            "clean_source='archive' requires clean_source_archive_dir"
                        )
                    rel = os.path.relpath(path, self.spec.path)
                    dest = os.path.join(archive_dir, rel)
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    shutil.move(path, dest)
            except FileNotFoundError:
                logger.warning("clean_source: file already gone: %s", path)


def read_files(
    spark: SparkSession,
    files: list[str],
    file_format: str,
    *,
    options: dict[str, Any] | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Multi-file read for one micro-batch, one Spark scan per batch."""
    options = options or {}
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    if not files:
        raise ValueError("read_files called with an empty file list")
    if file_format == "parquet":
        return reader.options(**options).parquet(*files)
    if file_format == "orc":
        return reader.options(**options).orc(*files)
    if file_format == "csv":
        opts = {"header": "true", "inferSchema": "false" if schema else "true", **options}
        return reader.options(**opts).csv(files)
    if file_format == "json":
        # whole-document JSON (array or object per file), like pl.read_json
        return reader.options(multiLine="true", **options).json(files)
    if file_format == "ndjson":
        return reader.options(**options).json(files)
    if file_format == "text":
        return reader.options(**options).text(files)
    if file_format == "avro":
        try:
            return reader.format("avro").options(**options).load(files)
        except Exception:  # spark-avro jar absent: pure-Python fallback
            from .formats import read_avro_fallback

            return read_avro_fallback(spark, files)
    if file_format == "excel":
        return _read_excel(spark, files, options)
    raise UnsupportedFormatError(f"unsupported file format {file_format!r}")


def _read_excel(spark: SparkSession, files: list[str], options: dict[str, Any]) -> DataFrame:
    """Excel via pandas bridge (no spark-excel jar in OSS Spark).

    Driver-side read per file is acceptable: Excel files are small by nature;
    the resulting DataFrame is distributed immediately.
    """
    try:
        import pandas as pd
    except ImportError as exc:  # pragma: no cover
        raise UnsupportedFormatError("excel requires pandas") from exc
    frames = []
    for path in files:
        try:
            frames.append(pd.read_excel(path, **options))
        except ImportError:  # no engine (openpyxl): stdlib zip+xml fallback
            from .formats import read_xlsx_fallback

            return read_xlsx_fallback(spark, files)
    merged = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    return spark.createDataFrame(merged)
