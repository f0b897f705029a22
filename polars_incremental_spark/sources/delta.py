"""Delta-table source: thin option mapping onto the delta-spark streaming source.

Parity: ``DeltaSource`` planning/reading/CDF
(reference: src/polars_incremental/sources/delta.py:14-73,
checkpoints/delta.py:32-1040).  The reference hand-rolls a Delta-log tailer
(~1000 LoC); on Spark the delta-spark streaming source implements the whole
contract natively (snapshot + log tail + CDF, reservoir offsets, maxFiles/
maxBytes caps, ignoreDeletes/ignoreChanges, startingVersion/Timestamp), so
this module is deliberately just option plumbing, gated on the package being
present (it is not bundled in every environment).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from ..errors import MissingOptionError, UnsupportedFormatError

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming import DataStreamReader

    from .base import DeltaSource


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def require_delta() -> None:
    if not delta_available():
        raise UnsupportedFormatError(
            "Delta Lake support requires the delta-spark package on the classpath; "
            "it is not installed in this environment"
        )


class DeltaSourceImpl:
    """A ``DeltaSource`` spec bound to a checkpoint directory (native mode only)."""

    def __init__(self, spec: "DeltaSource", checkpoint_dir: str) -> None:
        require_delta()
        self.spec = spec
        self.checkpoint_dir = checkpoint_dir

    def read_stream(self, spark: "SparkSession"):
        return build_delta_stream_reader(spark, self.spec).load(self.spec.path)


def build_delta_stream_reader(spark: "SparkSession", spec: "DeltaSource") -> "DataStreamReader":
    """Map the declarative spec onto delta-spark streaming-source options."""
    require_delta()
    reader = spark.readStream.format("delta")
    if spec.max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", spec.max_files_per_trigger)
    if spec.max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", spec.max_bytes_per_trigger)
    if spec.ignore_deletes:
        reader = reader.option("ignoreDeletes", "true")
    if spec.ignore_changes:
        reader = reader.option("ignoreChanges", "true")
    if spec.read_change_feed:
        reader = reader.option("readChangeFeed", "true")
    if spec.starting_version is not None and spec.starting_timestamp is not None:
        raise MissingOptionError("set only one of starting_version / starting_timestamp")
    if spec.starting_version is not None:
        reader = reader.option("startingVersion", spec.starting_version)
    elif spec.starting_timestamp is not None:
        reader = reader.option("startingTimestamp", spec.starting_timestamp)
    elif spec.start_offset == "earliest":
        reader = reader.option("startingVersion", 0)
    elif spec.start_offset == "latest":
        reader = reader.option("startingVersion", "latest")
    # default ("snapshot") = delta-spark's initial-snapshot behavior
    return reader
