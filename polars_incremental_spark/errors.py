"""Error taxonomy for the incremental pipeline.

Mirrors the reference's engine-agnostic hierarchy
(reference: src/polars_incremental/errors.py:1-42) so that user code
catching stage-specific failures ports over unchanged.
"""

from __future__ import annotations


class SparkIncrementalError(Exception):
    """Base class for every error raised by this library."""


class PlanningError(SparkIncrementalError):
    """Raised when planning the next micro-batch fails."""


class ReaderError(SparkIncrementalError):
    """Raised when the user reader callback fails."""


class TransformError(SparkIncrementalError):
    """Raised when the user transform callback fails."""


class WriterError(SparkIncrementalError):
    """Raised when the user writer callback fails."""


class CommitError(SparkIncrementalError):
    """Raised when committing a completed batch fails."""


class MissingOptionError(SparkIncrementalError):
    """Raised when a required source/sink option is absent."""


class UnsupportedFormatError(SparkIncrementalError):
    """Raised for file formats the source layer cannot read."""


class ChangeDataFeedError(SparkIncrementalError):
    """Raised when CDC reads hit deletes without change-data files."""


class SchemaEvolutionError(SparkIncrementalError):
    """Raised when a batch's schema violates the configured policy."""


class PipelineLockError(SparkIncrementalError):
    """Raised when the per-checkpoint single-writer lock cannot be acquired."""


class ConstraintViolationError(WriterError):
    """Raised when a write would violate a table CHECK constraint."""


class CandidateVolumeError(TransformError):
    """Raised when an exact pair-enumeration operator's pre-flight
    candidate estimate exceeds its budget — the corpus needs the banded
    (LSH) path or a tighter ``max_doc_freq`` cap, not a silent
    hours-long join."""
