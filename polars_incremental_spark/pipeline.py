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
LOCK_STALE_ENV = "SPARK_INCREMENTAL_LOCK_STALE_SECONDS"
LOCK_MODE_ENV = "SPARK_INCREMENTAL_LOCK_MODE"


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
    """Per-checkpoint single-writer lock (reference pipeline.py:162-283).

    Two modes:

    - ``flock`` (default): ``fcntl.flock`` on a lockfile — the kernel releases
      it automatically when the holder dies, so no staleness handling needed.
    - ``file`` (``SPARK_INCREMENTAL_LOCK_MODE=file`` or filesystems without
      flock): O_EXCL create with a unique ``pid=``/``acquired_at=``/``nonce=``
      token and stale-lock TAKEOVER — a lock whose holder PID is dead (or, when
      no PID is readable, whose age exceeds ``stale_seconds``, env
      ``SPARK_INCREMENTAL_LOCK_STALE_SECONDS``, default 300) is broken, so a
      SIGKILLed run cannot wedge the checkpoint.  A lock whose holder PID is
      alive is NEVER age-broken: a long Spark batch must not lose its lock to a
      newly started run.  Takeover goes through an ATOMIC RENAME to a unique
      break-name — only one contender can move a given stale file, and the only
      unlink ever issued targets that private name, so a waiter that lost the
      takeover race can never delete another waiter's freshly created lock.
      After creating its lock file the acquirer re-reads it and only treats the
      lock as held if its own token survived; exit unlinks only on token match.
      Residual window: three processes racing one takeover can displace a
      just-created lock (restore is attempted via ``os.link``, which never
      clobbers); eliminating even that needs an atomic compare-and-unlink the
      filesystem doesn't offer — use the default ``flock`` mode where the
      kernel provides real revocation-free ownership.
    """

    def __init__(
        self,
        checkpoint_dir: str,
        timeout_s: float | None = None,
        *,
        mode: str | None = None,
        stale_seconds: float | None = None,
    ) -> None:
        self.path = os.path.join(checkpoint_dir, ".pipeline.lock")
        self.timeout_s = timeout_s if timeout_s is not None else float(
            os.environ.get(LOCK_TIMEOUT_ENV, "30")
        )
        self.mode = mode or os.environ.get(LOCK_MODE_ENV, "flock")
        self.stale_seconds = (
            stale_seconds
            if stale_seconds is not None
            else float(os.environ.get(LOCK_STALE_ENV, "300"))
        )
        self._fd: int | None = None
        self._owns_file = False
        self._token: str | None = None

    # ------------------------------------------------------------ stale check
    def _read_lock(self) -> str | None:
        try:
            with open(self.path) as handle:
                return handle.read()
        except OSError:
            return None

    def _is_stale(self, content: str | None) -> bool:
        """A file-mode lock is stale if its holder PID is dead, or (when no
        PID is readable) its age exceeds ``stale_seconds``.  A lock held by a
        LIVE pid is never stale regardless of age — a long-running batch must
        not have its lock broken by a newcomer."""
        if self.stale_seconds <= 0 or content is None:
            return False
        pid: int | None = None
        acquired_at: float | None = None
        for line in content.splitlines():
            key, _, value = line.strip().partition("=")
            if key == "pid" and value.isdigit():
                pid = int(value)
            elif key == "acquired_at":
                try:
                    acquired_at = float(value)
                except ValueError:
                    pass
        if pid is not None:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                return True  # holder is gone
            except OSError:
                return False
            return False  # holder alive: never age-break
        if acquired_at is not None:
            return time.time() - acquired_at >= self.stale_seconds
        try:
            return time.time() - os.stat(self.path).st_mtime >= self.stale_seconds
        except OSError:
            return False

    # --------------------------------------------------------------- acquire
    def __enter__(self) -> "PipelineLock":
        if os.environ.get(LOCK_DISABLE_ENV):
            return self
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        deadline = time.monotonic() + self.timeout_s
        if self.mode == "file":
            return self._acquire_file(deadline)
        return self._acquire_flock(deadline)

    def _acquire_flock(self, deadline: float) -> "PipelineLock":
        import fcntl

        self._fd = os.open(self.path, os.O_CREAT | os.O_RDWR)
        while True:
            try:
                fcntl.flock(self._fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                os.ftruncate(self._fd, 0)
                os.write(
                    self._fd,
                    f"pid={os.getpid()}\nacquired_at={time.time()}\n".encode(),
                )
                return self
            except BlockingIOError:
                if time.monotonic() >= deadline:
                    os.close(self._fd)
                    self._fd = None
                    raise PipelineLockError(
                        f"could not acquire pipeline lock {self.path} within {self.timeout_s}s"
                    ) from None
                time.sleep(0.05)

    def _acquire_file(self, deadline: float) -> "PipelineLock":
        import uuid

        token = (
            f"pid={os.getpid()}\nacquired_at={time.time()}\nnonce={uuid.uuid4().hex}\n"
        )
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                os.close(fd)
                # Verify ownership: a waiter racing on a stale judgement may
                # have unlinked this freshly created file and replaced it with
                # its own.  Only the process whose token survives holds the
                # lock; the loser just retries.
                if self._read_lock() == token:
                    self._token = token
                    self._owns_file = True
                    return self
            except FileExistsError:
                content = self._read_lock()
                if content == token:
                    # Our own token is at the path: a displacer moved our
                    # fresh lock away, saw it wasn't the stale file it read,
                    # and restored it via os.link.  The nonce makes the token
                    # unforgeable, so this file is ours — reclaim instead of
                    # spinning against our own live PID forever.
                    self._token = token
                    self._owns_file = True
                    return self
                if self._is_stale(content):
                    # Takeover by atomic rename: only one contender can move
                    # the stale file to its private break-name, and the only
                    # unlink below targets that private name — a waiter that
                    # lost this race can no longer delete a fresh lock that
                    # has since appeared at `path`.
                    broke = f"{self.path}.break-{uuid.uuid4().hex}"
                    try:
                        os.rename(self.path, broke)
                    except OSError:
                        continue  # someone else broke it first; retry create
                    try:
                        with open(broke) as handle:
                            moved = handle.read()
                    except OSError:
                        moved = None
                    if moved != content:
                        # we moved a FRESH lock created between read and
                        # rename: restore it if the path is still free
                        # (os.link fails rather than clobbering a newer lock)
                        try:
                            os.link(broke, self.path)
                        except OSError:
                            pass
                    try:
                        os.unlink(broke)
                    except FileNotFoundError:
                        pass
                    continue
                if time.monotonic() >= deadline:
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
        if self._owns_file:
            # Unlink only our own lock file: if a (pathological) takeover
            # replaced it, removing the new holder's lock would let a third
            # process acquire concurrently.
            if self._read_lock() == self._token:
                try:
                    os.unlink(self.path)
                except FileNotFoundError:
                    pass
            self._owns_file = False
            self._token = None


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
    # DLT-style data-quality gates (expectations.py): applied between
    # transform and write; counts ride the writer's own action via
    # DataFrame.observe (no extra scan), metrics land in the commit
    # metadata under "expectations", and a violated fail-rule aborts the
    # batch BEFORE commit so it replays
    # NOTE on 'fail' expectations: by default violations are detected from
    # metrics observed during the WRITER'S action, so the violating batch
    # has already reached the sink when the failure raises — safe only for
    # the documented batch-id-keyed idempotent-writer contract (the replay
    # overwrites the same batch).  A plain-append writer would duplicate
    # the bad batch on every retry; set eager_fail_expectations=True to pay
    # one extra scan per batch and raise BEFORE the writer runs.
    expectations: list[Any] | None = None
    quarantine_writer: Callable[..., Any] | None = None
    eager_fail_expectations: bool = False

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
        unless ``max_idle_loops`` bounds consecutive idle polls.

        Session-cache hygiene: each batch runs inside an
        ``operator_cache_scope`` — intermediates the operator library
        persists during the transform (LSH postings, verify candidates,
        ANN sketches, …) are released once the batch commits (or fails),
        so a long-lived loop never accumulates corpus-sized cached frames
        across micro-batches.  A transform that wants a cache to SURVIVE
        batches must persist it outside the transform callback."""
        from .cache import operator_cache_scope

        source_impl = self._resolve_source()
        state = JobState(os.path.join(self.checkpoint_dir, "state"))
        batches = 0
        idle_loops = 0
        with PipelineLock(self.checkpoint_dir, self.lock_timeout_s):
            while True:
                with operator_cache_scope(spark):
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

        batch_exps = None
        if self.expectations:
            from .expectations import BatchExpectations

            with StageTimer(observer, "expectations", batch.batch_id):
                batch_exps = BatchExpectations(list(self.expectations))
                df = batch_exps.apply(df)
                if self.eager_fail_expectations and any(
                    e.action == "fail" for e in batch_exps.expectations
                ):
                    # one extra scan, but a violated fail-rule raises
                    # BEFORE the writer publishes anything — required for
                    # non-idempotent (plain-append) writers
                    batch_exps.enforce(batch_exps.precheck_fail_rules())

        with StageTimer(observer, "write", batch.batch_id):
            try:
                writer_result = call_with_context(self.writer, [df], context)
            except Exception as exc:
                raise WriterError(str(exc)) from exc
        metadata = writer_result if isinstance(writer_result, dict) else {}

        if batch_exps is not None:
            with StageTimer(observer, "expectations", batch.batch_id):
                # metrics resolved by the writer's action; a violated
                # fail-rule raises HERE — before commit_batch — so the
                # batch is not marked done and replays on the next run
                exp_metrics = batch_exps.enforce()
                metadata = {**metadata, "expectations": exp_metrics}
                quarantined = batch_exps.quarantined
                if quarantined is not None and self.quarantine_writer is not None:
                    try:
                        call_with_context(
                            self.quarantine_writer, [quarantined], context
                        )
                    except Exception as exc:
                        raise WriterError(
                            f"quarantine writer failed: {exc}"
                        ) from exc

        with StageTimer(observer, "commit", batch.batch_id):
            try:
                source_impl.commit_batch(batch, metadata)
            except Exception as exc:
                raise CommitError(str(exc)) from exc
        if observer:
            observer.on_batch_committed(batch.batch_id, metadata)
        return True
