"""Concurrent-writer storm on the jar-less Delta log at sf0.1-scale.

16 threads hammer one table: half blind-append (the path that rebases and
retries internally), half MERGE INTO disjoint key ranges (the path that
surfaces CommitConflictError for caller-level retry, like delta-spark's
ConcurrentModificationException contract).  Pins that under real
contention:

- every append's rows land exactly once (no lost commits, no duplicates)
- every merge's effect is present (disjoint ranges -> deterministic final
  state regardless of commit order)
- the version chain is contiguous with exactly one commit per logical op
- caller-level merge retries stay bounded
"""

import threading

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.sinks.delta import read_table, write_table
from polars_incremental_spark.sinks.deltalog import (
    CommitConflictError,
    merge_into,
    write_delta_fallback,
)

N_APPENDERS = 8
N_MERGERS = 8
APPEND_ROWS = 200
MERGE_SPAN = 100
MAX_RETRIES_PER_MERGE = 40


def test_append_merge_storm_no_lost_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    base_n = 5000  # documents-table scale at sf0.1
    write_table(
        spark.range(base_n).selectExpr("id", "CAST(0 AS LONG) AS v"), path
    )
    errors: list = []
    retry_counts: list[int] = []
    lock = threading.Lock()

    def appender(t: int) -> None:
        try:
            df = spark.range(
                1_000_000 + t * APPEND_ROWS, 1_000_000 + (t + 1) * APPEND_ROWS
            ).selectExpr("id", "CAST(0 AS LONG) AS v")
            write_delta_fallback(df, path, mode="append")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def merger(t: int) -> None:
        lo = t * MERGE_SPAN
        src = spark.range(lo, lo + MERGE_SPAN).selectExpr(
            "id", f"CAST({t + 1} AS LONG) AS v"
        )
        tries = 0
        try:
            while True:
                tries += 1
                try:
                    merge_into(
                        spark,
                        path,
                        src,
                        keys=["id"],
                        when_matched_update={"v": "src.v"},
                        when_not_matched_insert=False,
                    )
                    break
                except CommitConflictError:
                    if tries >= MAX_RETRIES_PER_MERGE:
                        raise
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)
        with lock:
            retry_counts.append(tries - 1)

    threads = [
        threading.Thread(target=appender, args=(t,)) for t in range(N_APPENDERS)
    ] + [threading.Thread(target=merger, args=(t,)) for t in range(N_MERGERS)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert errors == [], errors[:3]

    # one commit per logical op, contiguous chain
    log = DeltaLog(path)
    versions = log.versions()
    n_ops = 1 + N_APPENDERS + N_MERGERS
    assert versions == list(range(n_ops)), (
        f"expected {n_ops} contiguous versions, got {len(versions)}"
    )
    merge_commits = 0
    for v in versions:
        for a in log.actions(v):
            if "commitInfo" in a and a["commitInfo"].get("operation") == "MERGE":
                merge_commits += 1
    assert merge_commits == N_MERGERS, "a merge double-committed or vanished"

    rows = {r["id"]: r["v"] for r in read_table(spark, path).collect()}
    assert len(rows) == base_n + N_APPENDERS * APPEND_ROWS, "lost/dup rows"
    for t in range(N_MERGERS):
        lo = t * MERGE_SPAN
        for probe in (lo, lo + MERGE_SPAN // 2, lo + MERGE_SPAN - 1):
            assert rows[probe] == t + 1, f"merge {t} effect lost at id {probe}"
    # untouched base rows keep v=0
    assert rows[N_MERGERS * MERGE_SPAN] == 0
    assert rows[1_000_000] == 0

    total_retries = sum(retry_counts)
    assert total_retries <= N_MERGERS * MAX_RETRIES_PER_MERGE
