"""Session-scoped lifecycle for operator-persisted intermediates.

Several operators persist an intermediate frame that the RETURNED lazy
plan still references (LSH postings / band entries, verify candidate
pairs, SimHash signatures, the banded ANN sketch).  The persist is load-
bearing — without it the corpus would be re-shingled once per plan branch
— but a bare ``df.persist()`` has no owner: the caller gets a lazy
DataFrame, materializes it, and the cached blocks stay in the session
until LRU eviction.  A long-lived session running hundreds of micro-
batches through these operators accumulates corpus-sized cached frames
and eventually thrashes (measured: d6 at 16.1s in-suite vs 1.86s isolated
under memory-tight executors — SCALING.md round 9).

This module gives every such persist an owner:

- Operators call :func:`scoped_persist` instead of ``df.persist()``.  The
  frame is persisted AND registered against its SparkSession.  The call
  is idempotent on the PLAN: a frame whose logical plan is already in the
  CacheManager (a composed operator re-wrapping an intermediate its
  caller already scoped, or a user-persisted input) is returned as-is —
  no double persist (which fires "Asked to cache already cached data"
  WARNs and masks real double-persist bugs) and no second registration
  (release keeps exactly one owner per plan; a user-persisted input is
  never unpersisted out from under the user).
- Whoever drives materialization — the Pipeline's micro-batch loop,
  bench.py's per-query loop, a user notebook — calls
  :func:`release_operator_caches` (or wraps work in
  :func:`operator_cache_scope`) once the results are materialized.
  Unpersisting after materialization is always CORRECT (Spark lazily
  recomputes if the plan is re-executed); the registry just makes the
  release reachable without threading every intermediate back to the
  caller.

Scope membership is tracked by per-registration token, NOT by list
index: a :func:`release_operator_caches` call inside a scope, or two
concurrent scopes on one SparkSession (two Pipelines sharing a session),
can remove or interleave registrations, and an index-based "everything
after position N" slice would then release another scope's live caches
or let late registrations escape (ADVICE r10).  Tokens make exit exactly
"registrations that appeared during this scope and are still present".

The reference engine never leaks state across batches — its run loop
(reference pipeline.py:286-434) is stateless between iterations; session-
cache hygiene is this engine's equivalent contract.

Error paths still unpersist eagerly at the raise site (don't wait for a
release that may never come); a second unpersist via the registry is a
no-op.
"""

from __future__ import annotations

import itertools
import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
# keyed by id(SparkSession) — sessions are few and long-lived; entries are
# dropped on release, and a stopped session's stale dict costs only the
# Python plan objects (unpersist on a dead context is swallowed below).
# Inner dict: registration token -> frame, insertion-ordered.
_SCOPED: dict[int, dict[int, DataFrame]] = {}
# Handles to fire at the NEXT release point (not the current one): the
# iterative operators' KEPT final checkpoints register here when their
# stale rounds release — the kept blocks must outlive the owning query's
# release (the caller may still re-execute the returned plan), but they
# are dead the moment the harness moves on to the next query / micro-
# batch (round-11 verdict: late-suite queries sat on 12 accumulated kept
# RDDs).  Drained at the START of every release point.
_DEFERRED_NEXT: dict[int, dict[int, object]] = {}
_TOKENS = itertools.count(1)


def _is_plan_cached(df: DataFrame) -> bool:
    """True if ``df``'s logical plan is already in the CacheManager.
    ``Dataset.storageLevel`` is a CacheManager lookup on the analyzed
    plan, so this also catches an equal-plan frame cached via a different
    Python object."""
    try:
        sl = df.storageLevel
        return bool(sl.useMemory or sl.useDisk or sl.useOffHeap)
    except Exception:
        # Connect-mode / stopped-context edge: fall back to persisting —
        # worst case is the pre-round-11 WARN, never a lost registration.
        return False


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and register it for a later
    :func:`release_operator_caches`.  Drop-in for ``df.persist()`` inside
    operators whose returned plan references the cached frame.

    Idempotent: an already-cached plan is returned unchanged — whoever
    first persisted it (an enclosing scoped_persist, or the user) keeps
    sole ownership of the release.  On that path ``storage_level`` is a
    no-op by design: the first owner's level stands (re-persisting at a
    different level would require an unpersist that races the owner); a
    mismatch emits a warning rather than silently differing.

    Check-then-persist runs under the module lock so two threads scoping
    the same plan concurrently cannot double-persist / double-register
    (the second thread sees the first's CacheManager entry)."""
    with _LOCK:
        if _is_plan_cached(df):
            if storage_level is not None:
                try:
                    if df.storageLevel != storage_level:
                        import warnings

                        warnings.warn(
                            "scoped_persist: plan already cached at "
                            f"{df.storageLevel}; requested {storage_level} "
                            "ignored (first owner keeps its level)",
                            stacklevel=2,
                        )
                except Exception:
                    pass
            return df
        out = (
            df.persist(storage_level)
            if storage_level is not None
            else df.persist()
        )
        _SCOPED.setdefault(id(df.sparkSession), {})[next(_TOKENS)] = out
    return out


def register_release_handle(spark: SparkSession, handle) -> None:
    """Register a non-DataFrame release target (anything exposing
    ``unpersist(blocking=...)``) for the next
    :func:`release_operator_caches` — e.g. the intermediate
    localCheckpoint blocks an iterative operator's
    ``iterutils.CheckpointChain`` retires (they are not Dataset caches,
    so ``scoped_persist`` cannot carry them)."""
    with _LOCK:
        _SCOPED.setdefault(id(spark), {})[next(_TOKENS)] = handle


def register_release_next(spark: SparkSession, handle) -> None:
    """Register a release target that fires at the release point AFTER the
    current one — the lifecycle of an iterative operator's KEPT final
    checkpoint: its owning query's release must leave it alive (the
    returned plan references it), the next query's release frees it."""
    with _LOCK:
        _DEFERRED_NEXT.setdefault(id(spark), {})[next(_TOKENS)] = handle


def _drain_deferred(spark: SparkSession | None) -> list:
    """Pop and return every deferred-to-next-release handle (for the
    session, or all sessions).  Callers fire these FIRST at each release
    point, before the point's own registrations."""
    with _LOCK:
        if spark is not None:
            return list(_DEFERRED_NEXT.pop(id(spark), {}).values())
        out = [h for v in _DEFERRED_NEXT.values() for h in v.values()]
        _DEFERRED_NEXT.clear()
        return out


def scoped_cache_count(spark: SparkSession | None = None) -> int:
    """Number of operator-persisted frames currently registered (for the
    given session, or across all sessions)."""
    with _LOCK:
        if spark is not None:
            return len(_SCOPED.get(id(spark), ()))
        return sum(len(v) for v in _SCOPED.values())


def release_operator_caches(
    spark: SparkSession | None = None, *, blocking: bool = False
) -> int:
    """Unpersist every registered operator intermediate (for ``spark``, or
    for all sessions when ``None``) and clear the registry.  Returns the
    number of frames released.  Safe to call at any time: frames whose
    results were already materialized simply free their blocks; frames
    still pending recompute lazily if re-executed."""
    frames = _drain_deferred(spark)  # previous release point's kept blocks
    with _LOCK:
        if spark is not None:
            frames += list(_SCOPED.pop(id(spark), {}).values())
        else:
            frames += [f for v in _SCOPED.values() for f in v.values()]
            _SCOPED.clear()
    released = 0
    for f in frames:
        try:
            f.unpersist(blocking=blocking)
            released += 1
        except Exception:
            # stopped context / already-released frame — hygiene call,
            # never let cleanup fail the batch
            pass
    return released


def gc_jvm_residue(spark: SparkSession) -> None:
    """Nudge dead JVM state — above all SQL broadcast blocks — to free
    NOW instead of at the next natural driver GC.

    Broadcast-hash-join relations are created inside the planner, not by
    user code, so no Python-side handle exists to own them the way
    ``scoped_persist`` owns operator caches; they free when the driver
    JVM garbage-collects the dead ``Broadcast`` objects and the
    ContextCleaner ships ``RemoveBroadcast`` to the executors.  Under
    memory-tight executors that lag is real working-set pressure:
    round-11 adjudicated ~450 MB of ContextCleaner-decayed broadcast
    residue squeezing s3's 7.6M-pair working set inside s7
    (local-cluster in-suite 137.9s vs 65.5s isolated).

    A Python ``gc.collect()`` first releases py4j references to dead
    plans (their JVM counterparts become collectable), then a driver
    ``System.gc()`` lets the ContextCleaner's (blocking by default)
    cleanup drain.  Harness-scoped by design: per-query / per-batch
    loops call this AFTER :func:`release_operator_caches`, outside any
    timed section; it is deliberately not part of the release itself
    because a forced driver GC pause is the wrong default for
    low-latency micro-batch loops."""
    import gc as _gc

    _gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        # Connect-mode / stopped context: nothing reachable to nudge
        pass


@contextmanager
def operator_cache_scope(
    spark: SparkSession, *, blocking: bool = False
) -> Iterator[None]:
    """Release, on exit, every operator cache registered for ``spark``
    DURING the scope (pre-existing registrations are left alone — nested
    and concurrent scopes compose, and a mid-scope
    :func:`release_operator_caches` simply leaves less for exit to do).
    The canonical per-micro-batch / per-query pattern::

        with operator_cache_scope(spark):
            result = minhash_lsh_pairs(docs)
            result.write.parquet(out)   # materialize inside the scope
    """
    sid = id(spark)
    with _LOCK:
        before = set(_SCOPED.get(sid, ()))
    try:
        yield
    finally:
        deferred = _drain_deferred(spark)  # previous point's kept blocks
        with _LOCK:
            frames = _SCOPED.get(sid, {})
            new = [
                (t, f) for t, f in frames.items() if t not in before
            ]
            for t, _f in new:
                frames.pop(t, None)
            if not frames:
                _SCOPED.pop(sid, None)
        for f in deferred + [f for _t, f in new]:
            try:
                f.unpersist(blocking=blocking)
            except Exception:
                pass
