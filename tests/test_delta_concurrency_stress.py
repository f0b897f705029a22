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

import pytest

# round-13 test tiering: multi-writer storm campaign - slow tier
pytestmark = pytest.mark.slow

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


def test_32_writer_storm_row_tracking_ict(spark, tmp_path):
    """32 threads (16 appenders + 12 mergers + 4 OPTIMIZE compactions) on
    a table with ROW TRACKING + IN-COMMIT TIMESTAMPS enabled — the
    feature set where concurrency is hardest: row-tracked appends
    allocate id ranges so they must NOT blind-rebase (each loser retries
    at caller level), OPTIMIZE rewrites whole snapshots under mergers'
    feet, and every commit must stamp a strictly monotone ICT.

    Pins: no lost commits, every row id unique, every add carries
    baseRowId, ICTs strictly increase along the version chain, retries
    stay bounded."""
    from polars_incremental_spark.maintenance import optimize_delta_table
    from polars_incremental_spark.sinks.deltalog import (
        enable_in_commit_timestamps,
        enable_row_tracking,
        read_delta_fallback,
    )

    path = str(tmp_path / "t")
    base_n = 20_000
    write_table(
        spark.range(base_n).selectExpr("id", "CAST(0 AS LONG) AS v"), path
    )
    enable_row_tracking(path)
    enable_in_commit_timestamps(path)

    n_app, n_mrg, n_opt = 16, 12, 4
    max_tries = 80
    errors: list = []
    retry_counts: list[int] = []
    lock = threading.Lock()

    def with_retries(fn) -> int:
        tries = 0
        while True:
            tries += 1
            try:
                fn()
                return tries - 1
            except CommitConflictError:
                if tries >= max_tries:
                    raise

    def appender(t: int) -> None:
        df = spark.range(
            1_000_000 + t * APPEND_ROWS, 1_000_000 + (t + 1) * APPEND_ROWS
        ).selectExpr("id", "CAST(0 AS LONG) AS v")
        try:
            r = with_retries(
                lambda: write_delta_fallback(df, path, mode="append")
            )
            with lock:
                retry_counts.append(r)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def merger(t: int) -> None:
        lo = t * MERGE_SPAN
        src = spark.range(lo, lo + MERGE_SPAN).selectExpr(
            "id", f"CAST({t + 1} AS LONG) AS v"
        )
        try:
            r = with_retries(
                lambda: merge_into(
                    spark,
                    path,
                    src,
                    keys=["id"],
                    when_matched_update={"v": "src.v"},
                    when_not_matched_insert=False,
                )
            )
            with lock:
                retry_counts.append(r)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def optimizer(_t: int) -> None:
        try:
            r = with_retries(lambda: optimize_delta_table(spark, path))
            with lock:
                retry_counts.append(r)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = (
        [threading.Thread(target=appender, args=(t,)) for t in range(n_app)]
        + [threading.Thread(target=merger, args=(t,)) for t in range(n_mrg)]
        + [threading.Thread(target=optimizer, args=(t,)) for t in range(n_opt)]
    )
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == [], errors[:3]

    log = DeltaLog(path)
    versions = log.versions()
    # 1 create + 2 enables + one commit per logical op, contiguous
    assert versions == list(range(3 + n_app + n_mrg + n_opt))

    # ICTs strictly monotone along the chain (spec requirement)
    icts = [log.commit_timestamp_ms(v) for v in versions[3:]]
    assert all(b > a for a, b in zip(icts, icts[1:])), "ICT not monotone"

    # every add committed AFTER enablement carries a baseRowId (v0's
    # original add predates the feature; the enable commit backfilled it
    # with a dataChange=false re-add), and so does every LIVE file
    for v in versions[3:]:
        for a in log.actions(v):
            if "add" in a:
                assert "baseRowId" in a["add"], f"unstamped add at v{v}"
    for a in log.snapshot_files(versions[-1]):
        assert "baseRowId" in a, "live file without baseRowId"
    df = read_delta_fallback(spark, path, row_ids=True)
    n_rows = base_n + n_app * APPEND_ROWS
    assert df.count() == n_rows, "lost/dup rows"
    assert df.select("_row_id").distinct().count() == n_rows, "row id collision"

    rows = {r["id"]: r["v"] for r in read_table(spark, path).collect()}
    for t in range(n_mrg):
        lo = t * MERGE_SPAN
        for probe in (lo, lo + MERGE_SPAN - 1):
            assert rows[probe] == t + 1, f"merge {t} effect lost"
    assert sum(retry_counts) <= (n_app + n_mrg + n_opt) * max_tries
