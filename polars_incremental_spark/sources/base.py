"""Declarative source specs + format inference.

Parity: ``FilesSource`` / ``DeltaSource`` / ``AutoSource`` configs and the
format sniffer (reference: src/polars_incremental/source.py:19-94,
sources/base.py:48-107).  Specs are plain dataclasses; binding one to a
checkpoint directory yields a concrete planned-mode source.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from ..errors import UnsupportedFormatError

SUPPORTED_FILE_FORMATS = {"parquet", "csv", "json", "ndjson", "avro", "excel", "text", "orc"}

_EXTENSION_FORMATS = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".ndjson": "ndjson",
    ".jsonl": "ndjson",
    ".avro": "avro",
    ".xlsx": "excel",
    ".xls": "excel",
    ".txt": "text",
    ".orc": "orc",
}


@dataclass(frozen=True)
class FilesSource:
    """Incremental file-directory source (parquet/csv/json/ndjson/avro/excel)."""

    path: str
    file_format: str | None = None
    pattern: str | None = None
    recursive: bool = True
    max_files_per_trigger: int | None = None
    max_bytes_per_trigger: int | None = None
    max_file_age: float | None = None  # seconds
    start_offset: str | None = None  # earliest | latest | timestamp:<iso|epoch>
    allow_overwrites: bool = False
    clean_source: str | None = None  # None | "delete" | "archive"
    clean_source_archive_dir: str | None = None
    options: dict[str, Any] = field(default_factory=dict)  # reader options (header, sep, …)
    schema: str | None = None  # DDL string for schema-on-read formats

    def with_checkpoint(self, checkpoint_dir: str):
        from .file import FileSource

        return FileSource(self, checkpoint_dir)

    def resolved_format(self) -> str:
        fmt = infer_source_format(self.path, self.file_format, self.pattern)
        if fmt not in SUPPORTED_FILE_FORMATS:
            raise UnsupportedFormatError(f"unsupported file format {fmt!r}")
        return fmt


@dataclass(frozen=True)
class DeltaSource:
    """Incremental Delta-table source (snapshot + log tail + optional CDF)."""

    path: str
    start_offset: str | None = None  # snapshot | latest | earliest
    starting_version: int | None = None
    starting_timestamp: str | None = None
    max_files_per_trigger: int | None = 1000
    max_bytes_per_trigger: int | None = None
    ignore_deletes: bool = False
    ignore_changes: bool = False
    read_change_feed: bool = False

    def with_checkpoint(self, checkpoint_dir: str):
        from .delta import DeltaSourceImpl

        return DeltaSourceImpl(self, checkpoint_dir)


@dataclass(frozen=True)
class AutoSource:
    """Format-sniffing source: Delta if a _delta_log exists, else by extension."""

    path: str
    options: dict[str, Any] = field(default_factory=dict)

    def resolve(self) -> FilesSource | DeltaSource:
        if os.path.isdir(os.path.join(self.path, "_delta_log")):
            return DeltaSource(path=self.path)
        return FilesSource(path=self.path, options=dict(self.options))

    def with_checkpoint(self, checkpoint_dir: str):
        return self.resolve().with_checkpoint(checkpoint_dir)


def infer_source_format(
    path: str, file_format: str | None = None, pattern: str | None = None
) -> str:
    """Sniff the file format: explicit > pattern extension > path extension > dir scan > parquet."""
    if file_format:
        return file_format.lower()
    for probe in (pattern, path):
        if probe:
            _, ext = os.path.splitext(probe)
            if ext.lower() in _EXTENSION_FORMATS:
                return _EXTENSION_FORMATS[ext.lower()]
    if os.path.isdir(path):
        if os.path.isdir(os.path.join(path, "_delta_log")):
            return "delta"
        for name in sorted(os.listdir(path)):
            _, ext = os.path.splitext(name)
            if ext.lower() in _EXTENSION_FORMATS:
                return _EXTENSION_FORMATS[ext.lower()]
    return "parquet"
