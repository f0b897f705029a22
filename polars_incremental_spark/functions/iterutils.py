"""Lineage truncation for driver-side iterative operators.

Every bounded-loop operator (pagerank, connected_components, LSH index
compaction) must cut its lineage once per round or the logical plan doubles
per iteration and Catalyst re-optimization dominates after ~10 rounds.  Two
ways to cut it, chosen by the caller:

- ``localCheckpoint()`` (default): blocks live on the EXECUTORS only.
  Cheapest, right for local mode and short interactive runs — but on a real
  cluster an executor loss mid-iteration kills the job, because the
  truncated lineage cannot recompute the lost blocks.
- ``checkpoint()`` with a reliable ``checkpoint_dir`` (HDFS/S3/…): blocks
  are written to fault-tolerant storage, so a 1000-executor run survives
  preemptions and node loss at the cost of one distributed write per round.
  This is the 100 TB setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iter_checkpoint(
    df: DataFrame, checkpoint_dir: str | None, *, eager: bool = True
) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint()`` into
    ``checkpoint_dir`` when given, else executor-local ``localCheckpoint()``.

    ``setCheckpointDir`` is idempotent per SparkContext; calling it with the
    same directory every round is a no-op, and distinct operators may point
    at distinct directories (last one wins for subsequent calls, which is
    fine — each ``checkpoint()`` resolves the dir at call time).

    ``eager=False`` truncates the lineage NOW (the plan becomes a
    LogicalRDD either way) but defers materialization to the first
    downstream action.  For fixed-iteration loops with no per-round
    convergence probe this removes one JOB per round — under real
    executors each eager in-loop checkpoint paid scheduling plus a
    node-sized network shuffle per round, the barrier premium
    SCALING_DATA_r08 measured at 1.8-2.4x on the iterative queries.
    Loops that read a per-round Observation (connected_components, BFS's
    frontier-empty probe) must keep ``eager=True`` — the observation only
    resolves when the observed plan executes."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)


def persistent_rdd_ids(spark) -> set[int]:
    """JVM-side ids of every RDD currently registered persistent (the
    ``getPersistentRDDs`` map — localCheckpoint marks its RDD persistent
    AT CALL TIME, eager or lazy, so an id-diff around the call attributes
    the checkpoint's blocks exactly)."""
    out = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        out.add(int(it.next()._1()))
    return out


def unpersist_rdd_ids(spark, ids, *, blocking: bool = False) -> int:
    """Unpersist the JVM RDDs with these ids, skipping ids already gone
    and ids with ZERO cached partitions (a lazy localCheckpoint that was
    never materialized must keep its storage level — clearing it would
    fail the checkpoint assertion at its eventual first action; leaving
    it costs nothing today and reverts to the old GC lifecycle).
    Returns how many were released."""
    if not ids:
        return 0
    wanted = set(ids)
    jsc = spark.sparkContext._jsc.sc()
    cached = set()
    for info in jsc.getRDDStorageInfo():
        if info.numCachedPartitions() > 0:
            cached.add(int(info.id()))
    released = 0
    it = jsc.getPersistentRDDs().iterator()
    handles = []
    while it.hasNext():
        kv = it.next()
        rid = int(kv._1())
        if rid in wanted and rid in cached:
            handles.append(kv._2())
    for h in handles:
        try:
            h.unpersist(blocking)
            released += 1
        except Exception:
            pass
    return released


class CheckpointChain:
    """Deterministic lifecycle for a LOOP of ``iter_checkpoint`` calls.

    Each round's local checkpoint caches executor blocks that previously
    lived until JVM GC collected the Dataset — measured at 20-37 stale
    persisted RDDs / 0.25-1.2 GB of storage residue mid-suite (round-11
    sf1 instrumentation), a GC-timing-dependent eviction pressure on
    whatever runs next.  The chain records each checkpoint's JVM RDD ids
    at creation (an id-diff around the call — exact, because
    ``localCheckpoint`` registers its RDD persistent synchronously) and
    releases every round's blocks EXCEPT the final one through the
    operator cache registry, i.e. at the same owned point the rest of the
    operator's persists release (after the caller materializes).  The
    final checkpoint stays alive so the RETURNED plan re-executes freely;
    intermediates are never referenced again once the final round's
    blocks exist.

    Single-session loops only (the id-diff window is the checkpoint call
    itself; concurrent persists from ANOTHER thread inside that window
    would be misattributed — the engine's Pipeline is single-writer by
    lock, and operators are driver-side loops).
    """

    def __init__(self, spark, checkpoint_dir: str | None = None) -> None:
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self._rounds: list[set[int]] = []

    def next(self, df: DataFrame, *, eager: bool = True) -> DataFrame:
        before = persistent_rdd_ids(self.spark)
        out = iter_checkpoint(df, self.checkpoint_dir, eager=eager)
        ids = persistent_rdd_ids(self.spark) - before
        self._rounds.append(ids)
        # ride the ids on the frame so defer_release(keep=...) can map the
        # RETURNED plan's checkpoints back to their rounds
        out._pis_chain_ids = ids  # noqa: SLF001
        return out

    def defer_release(self, *, keep: "DataFrame | tuple | list" = ()) -> None:
        """Hand the loop's checkpoint blocks to the operator cache
        registry (cache.py): they free at the owner's release point — per
        bench query, per Pipeline micro-batch — instead of at JVM GC.

        ``keep`` lists the chain frames the RETURNED plan still
        references (they must outlive release so the caller can
        re-execute the result).  Default: the LAST ``next()`` frame.
        Call once, at loop end."""
        if not self._rounds:
            return
        if isinstance(keep, DataFrame):
            keep = (keep,)
        if keep:
            keep_ids = set().union(
                *(getattr(k, "_pis_chain_ids", set()) for k in keep)
            )
        else:
            keep_ids = set(self._rounds[-1])
        stale = set().union(*self._rounds) - keep_ids
        if stale:
            from ..cache import register_release_handle

            register_release_handle(self.spark, _RddReleaseHandle(self.spark, stale))
        self._rounds = [keep_ids]


class _RddReleaseHandle:
    """Duck-typed registry entry: release_operator_caches calls
    ``unpersist(blocking=...)`` on whatever is registered."""

    def __init__(self, spark, ids: set[int]) -> None:
        self.spark = spark
        self.ids = ids

    def unpersist(self, blocking: bool = False) -> None:
        unpersist_rdd_ids(self.spark, self.ids, blocking=blocking)
