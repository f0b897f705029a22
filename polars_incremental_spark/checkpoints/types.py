"""Checkpoint primitives: batch descriptors + atomic JSON persistence.

Shape parity with the reference's checkpoint types
(reference: src/polars_incremental/checkpoints/types.py:10-63) — the
offset/commit JSON layout is deliberately Spark-shaped (offsets/ and
commits/ sequence files under a checkpoint dir), so the same layout is
reused for the planned-mode driver here.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class BatchInfo:
    """A planned file micro-batch: which files constitute batch ``batch_id``."""

    batch_id: int
    files: list[str]
    created_at: float = 0.0
    # extra planner metadata (e.g. file sizes, mtimes) — not part of identity
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> dict[str, Any]:
        return {
            "batch_id": self.batch_id,
            "files": list(self.files),
            "created_at": self.created_at,
            "metadata": self.metadata,
        }

    @classmethod
    def from_json(cls, payload: dict[str, Any]) -> "BatchInfo":
        return cls(
            batch_id=int(payload["batch_id"]),
            files=list(payload.get("files", [])),
            created_at=float(payload.get("created_at", 0.0)),
            metadata=dict(payload.get("metadata", {})),
        )


def atomic_write_json(path: str, payload: dict[str, Any]) -> None:
    """Write JSON atomically: tmpfile in the same dir + fsync + rename + dir fsync.

    Guarantees a reader never observes a torn offset/commit file, which is the
    crash-consistency contract the whole checkpoint protocol relies on.
    """
    directory = os.path.dirname(path)
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, prefix=".tmp_", suffix=".json")
    try:
        with os.fdopen(fd, "w") as handle:
            json.dump(payload, handle, separators=(",", ":"), default=str)
            handle.flush()
            os.fsync(handle.fileno())
        os.replace(tmp, path)
        dir_fd = os.open(directory, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_json(path: str) -> dict[str, Any] | None:
    if not os.path.exists(path):
        return None
    with open(path) as handle:
        return json.load(handle)
