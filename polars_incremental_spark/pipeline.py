"""The incremental Pipeline: plan → read → schema-evolve → transform → write → commit.

Parity: ``Pipeline`` / ``RunResult`` / context-kwarg injection / lock
(reference: src/polars_incremental/pipeline.py:33-434).  This is the
planned-mode driver loop: the checkpoint plans file batches (offset WAL
before read, commit after write), user callbacks receive Spark DataFrames,
and only injection/locking/commit bookkeeping runs on the driver — all data
movement stays inside Spark jobs.

For sources Spark streams natively (no overwrite detection or timestamp
start-offsets needed), prefer ``streaming.native.run_native`` which rides
Structured Streaming's own offset/commit logs.
"""

from __future__ import annotations

import inspect
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from .checkpoints.types import BatchInfo
from .errors import (
    CommitError,
    PipelineLockError,
    PlanningError,
    ReaderError,
    TransformError,
    WriterError,
)
from .observability import PipelineObserver, StageTimer
from .schema import SchemaEvolution
from .sources.base import AutoSource, DeltaSource, FilesSource
from .state import JobState

LOCK_DISABLE_ENV = "SPARK_INCREMENTAL_DISABLE_LOCK"
LOCK_TIMEOUT_ENV = "SPARK_INCREMENTAL_LOCK_TIMEOUT"


@dataclass(frozen=True)
class RunResult:
    batches: int


def call_with_context(fn: Callable, positional: list[Any], context: dict[str, Any]) -> Any:
    """Invoke a user callback, passing context kwargs only if its signature accepts them.

    Same introspection contract as the reference (pipeline.py:108-159): a
    writer ``def w(df)`` and a writer ``def w(df, batch_id, state)`` both work.
    ``**kwargs`` in the signature receives the full context.
    """
    sig = inspect.signature(fn)
    params = sig.parameters
    accepts_var_kw = any(p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values())
    if accepts_var_kw:
        return fn(*positional, **context)
    names = set(params)
    kwargs = {k: v for k, v in context.items() if k in names}
    return fn(*positional, **kwargs)


class PipelineLock:
    """Per-checkpoint single-writer lock (fcntl.flock, blocking with timeout)."""

    def __init__(self, checkpoint_dir: str, timeout_s: float | None = None) -> None:
        self.path = os.path.join(checkpoint_dir, ".pipeline.lock")
        self.timeout_s = timeout_s if timeout_s is not None else float(
            os.environ.get(LOCK_TIMEOUT_ENV, "30")
        )
        self._fd: int | None = None

    def __enter__(self) -> "PipelineLock":
        if os.environ.get(LOCK_DISABLE_ENV):
            return self
        import fcntl

        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self._fd = os.open(self.path, os.O_CREAT | os.O_RDWR)
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                fcntl.flock(self._fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                os.write(self._fd, str(os.getpid()).encode())
                return self
            except BlockingIOError:
                if time.monotonic() >= deadline:
                    os.close(self._fd)
                    self._fd = None
                    raise PipelineLockError(
                        f"could not acquire pipeline lock {self.path} within {self.timeout_s}s"
                    ) from None
                time.sleep(0.05)

    def __exit__(self, *_exc) -> None:
        if self._fd is not None:
            import fcntl

            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None


@dataclass(frozen=True)
class Pipeline:
    """Frozen pipeline config.  ``reader`` defaults to the source's batch read;
    ``writer`` is required and may return a metadata dict stored in the commit."""

    source: FilesSource | DeltaSource | AutoSource | str
    checkpoint_dir: str
    writer: Callable[..., Any]
    reader: Callable[..., DataFrame] | None = None
    transform: Callable[..., DataFrame] | None = None
    schema_evolution: SchemaEvolution | None = None
    observer: PipelineObserver | None = None
    lock_timeout_s: float | None = None
    reader_options: dict[str, Any] = field(default_factory=dict)

    # ----------------------------------------------------------------- run
    def run(
        self,
        spark: SparkSession,
        *,
        loop: bool = False,
        sleep: float = 1.0,
        max_batches: int | None = None,
        sleep_when_idle: float | None = None,
        max_idle_loops: int | None = None,
    ) -> RunResult:
        """Process available batches.  ``loop=False`` drains until idle once
        (like ``trigger(availableNow)``); ``loop=True`` keeps polling forever
        unless ``max_idle_loops`` bounds consecutive idle polls."""
        source_impl = self._resolve_source()
        state = JobState(os.path.join(self.checkpoint_dir, "state"))
        batches = 0
        idle_loops = 0
        with PipelineLock(self.checkpoint_dir, self.lock_timeout_s):
            while True:
                ran = self._run_one_batch(spark, source_impl, state)
                if ran:
                    batches += 1
                    idle_loops = 0
                    if max_batches is not None and batches >= max_batches:
                        break
                    continue
                # idle
                if not loop:
                    break
                idle_loops += 1
                if max_idle_loops is not None and idle_loops >= max_idle_loops:
                    break
                time.sleep(sleep_when_idle if sleep_when_idle is not None else sleep)
        return RunResult(batches=batches)

    # ------------------------------------------------------------ internals
    def _resolve_source(self):
        spec = self.source
        if isinstance(spec, str):
            spec = AutoSource(path=spec, options=dict(self.reader_options))
        if isinstance(spec, AutoSource):
            spec = spec.resolve()
        if isinstance(spec, DeltaSource):
            raise PlanningError(
                "planned-mode Pipeline supports file sources; use "
                "streaming.native.run_native for Delta sources"
            )
        return spec.with_checkpoint(self.checkpoint_dir)

    def _run_one_batch(self, spark: SparkSession, source_impl, state: JobState) -> bool:
        observer = self.observer

        with StageTimer(observer, "plan", None):
            try:
                batch: BatchInfo | None = source_impl.plan_batch()
            except Exception as exc:
                raise PlanningError(str(exc)) from exc
        if batch is None:
            return False
        if observer:
            observer.on_batch_planned(batch.batch_id, len(batch.files))

        context = {
            "batch": batch,
            "batch_id": batch.batch_id,
            "files": list(batch.files),
            "state": state,
            "spark": spark,
        }

        with StageTimer(observer, "read", batch.batch_id):
            try:
                if self.reader is not None:
                    df = call_with_context(self.reader, [list(batch.files)], context)
                else:
                    df = source_impl.read_batch(spark, batch)
            except Exception as exc:
                raise ReaderError(str(exc)) from exc

        if self.schema_evolution is not None:
            with StageTimer(observer, "schema", batch.batch_id):
                df = self.schema_evolution.apply(df, source_impl.checkpoint)

        if self.transform is not None:
            with StageTimer(observer, "transform", batch.batch_id):
                try:
                    df = call_with_context(self.transform, [df], context)
                except Exception as exc:
                    raise TransformError(str(exc)) from exc

        with StageTimer(observer, "write", batch.batch_id):
            try:
                writer_result = call_with_context(self.writer, [df], context)
            except Exception as exc:
                raise WriterError(str(exc)) from exc
        metadata = writer_result if isinstance(writer_result, dict) else {}

        with StageTimer(observer, "commit", batch.batch_id):
            try:
                source_impl.commit_batch(batch, metadata)
            except Exception as exc:
                raise CommitError(str(exc)) from exc
        if observer:
            observer.on_batch_committed(batch.batch_id, metadata)
        return True
