"""Delta-table source: planned-mode log tailer + native option mapping.

Parity: ``DeltaSource`` planning/reading/CDF
(reference: src/polars_incremental/sources/delta.py:14-73,
checkpoints/delta.py:32-1040).  Two paths:

- **planned mode** (always available): ``DeltaSourceImpl`` plans batches
  through the jar-less log tailer in ``checkpoints/delta.py`` (snapshot /
  log-tail / CDF, start offsets, table-id guard) and reads data files with
  plain parallel parquet scans.
- **native mode** (delta-spark on the classpath): ``read_stream`` /
  ``build_delta_stream_reader`` map the spec onto the delta-spark streaming
  source, which implements the same contract natively.
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
    """A ``DeltaSource`` spec bound to a planned-mode Delta checkpoint.

    Planning/commit ride the jar-less log tailer
    (``checkpoints/delta.DeltaTableCheckpoint``); reading is a plain
    multi-file ``spark.read.parquet`` so Catalyst scans the batch in
    parallel.  CDF batches inject ``_change_type`` / ``_commit_version`` /
    ``_commit_timestamp`` exactly as delta-spark's ``readChangeFeed`` does
    (reference sources/delta.py:14-32).
    """

    def __init__(self, spec: "DeltaSource", checkpoint_dir: str) -> None:
        from ..checkpoints.delta import DeltaTableCheckpoint

        self.spec = spec
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint = DeltaTableCheckpoint(checkpoint_dir, spec.path)

    # ------------------------------------------------------------ planned API
    def plan_batch(self):
        return self.checkpoint.plan_batch(self.spec)

    def read_batch(self, spark: "SparkSession", batch):
        from pyspark.sql import functions as F

        if not batch.files:
            return _empty_snapshot_frame(spark, self.spec.path)
        entries = batch.metadata.get("entries")
        import json as _json

        from pyspark.sql.types import StructType

        from ..checkpoints.delta import DeltaLog
        from ..sinks.deltalog import _column_mapping

        # ONE log replay per batch serves both the mapping and the scan
        # schema (table_metadata is an O(commits) walk — a long-lived
        # stream must not pay it twice per micro-batch)
        meta = DeltaLog(self.spec.path).table_metadata() or {}
        mapping = _column_mapping(meta)

        def pinned_reader():
            """Scan pinned to the logged schema (PHYSICAL names on mapped
            tables) with basePath for partition reconstruction — footer
            inference would leak hidden materialized row-id columns from
            rewritten files and wobble types across files."""
            reader = spark.read.option("basePath", self.spec.path)
            if not meta.get("schemaString"):
                return reader
            parsed = _json.loads(meta["schemaString"])
            if mapping:
                for f in parsed.get("fields", []):
                    f["name"] = mapping.get(f["name"], f["name"])
            return reader.schema(StructType.fromJson(parsed))

        if not self.spec.read_change_feed or not entries:
            df = pinned_reader().parquet(*batch.files)
            if mapping:
                # rename physical -> CURRENT logical names (same contract
                # as delta-spark streaming with schema tracking: a
                # mid-stream rename surfaces the new name from the next
                # batch on)
                inverse = {p: l for l, p in mapping.items()}
                return df.select(
                    *[
                        F.col(f"`{c}`").alias(inverse.get(c, c))
                        for c in df.columns
                    ]
                )
            return df
        # CDF read: group per (commit_version, injected change_type) so each
        # group gets its commit metadata columns attached once
        groups: dict[tuple, list[dict]] = {}
        for entry in entries:
            key = (entry["commit_version"], entry["commit_timestamp_ms"], entry["change_type"])
            groups.setdefault(key, []).append(entry)
        cdf_inverse = {p: l for l, p in (mapping or {}).items()}
        out = None
        for (version, ts_ms, change_type), group in sorted(groups.items(), key=lambda kv: kv[0][:2]):
            paths = [e.get("abs_path") or self._abs(e["path"]) for e in group]
            if change_type is not None:
                # add-fallback inserts are DATA files: pin + basePath, or
                # partitioned tables lose their partition columns and
                # rewritten files leak hidden columns (the batch
                # read_change_feed twin's rule)
                df = pinned_reader().parquet(*paths)
            else:
                # cdc files materialize EVERY column and carry
                # _change_type in-file
                df = spark.read.parquet(*paths)
            if cdf_inverse:
                # mapped table: cdc/add parquet carries PHYSICAL data
                # columns; the CDF metadata columns (_change_type, ...)
                # aren't table columns and pass through unchanged
                df = df.select(
                    *[
                        F.col(f"`{c}`").alias(cdf_inverse.get(c, c))
                        for c in df.columns
                    ]
                )
            if change_type is not None and "_change_type" not in df.columns:
                df = df.withColumn("_change_type", F.lit(change_type))
            if "_commit_version" not in df.columns:
                df = df.withColumn("_commit_version", F.lit(version).cast("long"))
            if "_commit_timestamp" not in df.columns:
                df = df.withColumn("_commit_timestamp", F.timestamp_millis(F.lit(ts_ms)))
            out = df if out is None else out.unionByName(df, allowMissingColumns=True)
        return out

    def commit_batch(self, batch, metadata=None) -> None:
        self.checkpoint.commit_batch(batch, metadata)

    def _abs(self, rel_path: str) -> str:
        import os

        return os.path.join(self.spec.path, rel_path)

    # ------------------------------------------------------------ native API
    def read_stream(self, spark: "SparkSession"):
        """Native Structured Streaming path — requires the delta-spark jar."""
        require_delta()
        return build_delta_stream_reader(spark, self.spec).load(self.spec.path)


def _empty_snapshot_frame(spark: "SparkSession", table_path: str):
    import json

    from pyspark.sql.types import StructType

    from ..checkpoints.delta import DeltaLog

    meta = DeltaLog(table_path).table_metadata() or {}
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    return spark.createDataFrame([], schema)


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
