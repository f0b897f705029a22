"""Native-mode execution: Structured Streaming with Spark's own checkpoint logs.

This is the preferred execution path (SURVEY §7.1): Spark's file/Delta
streaming sources already implement offset planning, commit logs, batch
caps, maxFileAge and cleanSource natively; the planned-mode driver in
``pipeline.py`` exists only for the features Spark lacks (overwrite
re-queueing, timestamp start offsets for files, writer-metadata commits).

``run_native`` wires: readStream(spec) → transform(df) →
writeStream.foreachBatch(writer) .trigger(availableNow) — at-least-once,
exactly-once with idempotent ``batch_{id}`` sinks.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from ..errors import UnsupportedFormatError
from ..pipeline import call_with_context
from ..sources.base import DeltaSource, FilesSource
from ..state import JobState
import os


def build_stream_reader(spark: SparkSession, spec: FilesSource | DeltaSource):
    """Map a declarative source spec onto a DataStreamReader."""
    if isinstance(spec, DeltaSource):
        from ..sources.delta import build_delta_stream_reader

        return build_delta_stream_reader(spark, spec).load(spec.path)

    fmt = spec.resolved_format()
    if fmt in ("excel",):
        raise UnsupportedFormatError("excel is batch-only; use the planned-mode Pipeline")
    if spec.start_offset == "latest" and spec.max_file_age is None:
        # latestFirst alone only REORDERS (newest first) — every historical
        # file would still be ingested.  maxFileAge is what actually skips
        # pre-existing files; without it, 'latest' semantics need the
        # planned-mode Pipeline (checkpoint min_mtime_ns).
        raise UnsupportedFormatError(
            "start_offset='latest' on a native file stream requires "
            "max_file_age (Spark can only skip old files by age); use the "
            "planned-mode Pipeline for exact latest semantics"
        )
    reader = spark.readStream.format("json" if fmt == "ndjson" else fmt)
    if spec.schema:
        reader = reader.schema(spec.schema)
    else:
        # streaming file sources require a schema; infer from existing files
        static = spark.read.options(**spec.options)
        probe_path = spec.path
        if fmt == "parquet":
            inferred = static.parquet(probe_path).schema
        elif fmt == "csv":
            inferred = static.option("header", "true").option("inferSchema", "true").csv(probe_path).schema
        elif fmt in ("json", "ndjson"):
            inferred = static.json(probe_path).schema
        else:
            inferred = static.format(fmt).load(probe_path).schema
        reader = reader.schema(inferred)
    if spec.max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", spec.max_files_per_trigger)
    if spec.max_file_age is not None:
        reader = reader.option("maxFileAge", f"{int(spec.max_file_age)}s")
    if spec.clean_source:
        reader = reader.option("cleanSource", spec.clean_source)
        if spec.clean_source_archive_dir:
            reader = reader.option("sourceArchiveDir", spec.clean_source_archive_dir)
    if spec.start_offset == "latest":
        reader = reader.option("latestFirst", "true")
    for key, value in spec.options.items():
        reader = reader.option(key, value)
    if fmt == "csv":
        reader = reader.option("header", spec.options.get("header", "true"))
    load_path = spec.path
    if spec.pattern:
        load_path = os.path.join(spec.path, "**", spec.pattern) if spec.recursive else os.path.join(spec.path, spec.pattern)
    return reader.load(load_path)


def run_native(
    spark: SparkSession,
    spec: FilesSource | DeltaSource,
    checkpoint_dir: str,
    writer: Callable[..., Any],
    *,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
    timeout_s: float | None = None,
    expectations: list | None = None,
    quarantine_writer: Callable[..., Any] | None = None,
) -> None:
    """One Structured Streaming query over the spec; blocks until drained
    (``available_now``) or until ``timeout_s``.

    ``expectations`` (expectations.py) apply per micro-batch inside
    ``foreachBatch`` — same semantics as the planned Pipeline: drop /
    quarantine gate the written rows, a violated fail-rule raises inside
    the batch so Structured Streaming does NOT commit the epoch and the
    batch replays (the engine's own retry), and warn counts flow to the
    ``quarantine_writer``-visible context metadata.
    """
    df = build_stream_reader(spark, spec)
    if transform is not None:
        df = transform(df)
    state = JobState(os.path.join(checkpoint_dir, "state"))

    def _foreach_batch(batch_df: DataFrame, batch_id: int) -> None:
        context = {"batch_id": batch_id, "state": state, "spark": spark}
        batch_exps = None
        if expectations:
            from ..expectations import BatchExpectations

            batch_exps = BatchExpectations(list(expectations))
            batch_df = batch_exps.apply(batch_df)
        call_with_context(writer, [batch_df], context)
        if batch_exps is not None:
            batch_exps.enforce()  # raises -> epoch not committed -> replay
            quarantined = batch_exps.quarantined
            if quarantined is not None and quarantine_writer is not None:
                call_with_context(quarantine_writer, [quarantined], context)

    stream_writer = (
        df.writeStream.foreachBatch(_foreach_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        stream_writer = stream_writer.trigger(availableNow=True)
    elif processing_time:
        stream_writer = stream_writer.trigger(processingTime=processing_time)
    query = stream_writer.start()
    if available_now:
        query.awaitTermination()
    elif timeout_s is not None:
        query.awaitTermination(timeout_s)
        query.stop()
