"""Fault-injection run under local-cluster: prove task-retry idempotence
and executor-loss recovery END TO END, not just at the checkpoint-replay
unit level.

Three escalating faults, each injected exactly once via a flag file:

1. ``raise`` — a task throws on its first attempt; Spark retries the
   task (spark.task.maxFailures=4 outside local[]), attempt 2 succeeds.
2. ``worker-exit`` — the PYTHON worker process hard-exits mid-partition;
   the executor JVM survives, the task fails and retries.
3. ``executor-kill`` — the task SIGKILLs its own executor JVM (found via
   /proc ancestry); the standalone Worker reports the loss, the scheduler
   resubmits the dead executor's tasks, the Worker relaunches a fresh
   executor.

After all three, the aggregate over the transformed data must be EXACT —
retried partitions must not double-count — and a Delta-log append written
through the faulty lineage must hold exactly the expected rows.

Run: python tools/fault_injection.py   (exit 0 = all faults recovered)
Invoked by tests/test_fault_injection.py as a subprocess (the session
needs a local-cluster master, which cannot coexist with the test
session's local[] JVM).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAG_DIR = tempfile.mkdtemp(prefix="fault_flags_")


def _make_faulty(fault: str, hot_partition: int):
    # self-contained closure: runs inside executor python workers
    flag_dir = FLAG_DIR

    def fn(it):
        import os as _os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        inject = ctx.partitionId() == hot_partition and ctx.attemptNumber() == 0
        if inject:
            flag = _os.path.join(flag_dir, fault)
            try:
                fd = _os.open(flag, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
                _os.close(fd)
            except FileExistsError:
                inject = False
        for pdf in it:
            if inject:
                if fault.startswith("raise"):
                    raise RuntimeError("injected task failure")
                if fault == "worker-exit":
                    _os._exit(137)  # kill the python worker mid-task
                if fault == "executor-kill":
                    # walk up: python worker -> pyspark.daemon -> executor JVM
                    pid = _os.getppid()
                    for _ in range(4):
                        with open(f"/proc/{pid}/comm") as fh:
                            comm = fh.read().strip()
                        if comm == "java":
                            _os.kill(pid, 9)
                            break
                        with open(f"/proc/{pid}/stat") as fh:
                            pid = int(fh.read().split()[3])
                    import time as _t

                    _t.sleep(5)  # die with the JVM, not after yielding rows
            yield pdf.assign(y=pdf.id * 2)

    return fn


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_MASTER", "local-cluster[2,4,3072]")
    from polars_incremental_spark.session import get_spark
    from polars_incremental_spark.sinks.deltalog import (
        read_delta_fallback,
        write_delta_fallback,
    )

    spark = get_spark("fault-injection")
    n, parts = 100_000, 8
    expect_sum = (n - 1) * n  # sum of 2*id over range(n)

    for fault in ("raise", "worker-exit", "executor-kill"):
        df = spark.range(0, n, 1, parts).mapInPandas(
            _make_faulty(fault, hot_partition=3), "id long, y long"
        )
        got = df.groupBy().sum("y").collect()[0][0]
        cnt = df.count()
        assert got == expect_sum and cnt == n, (
            f"{fault}: sum {got} (want {expect_sum}), count {cnt} (want {n})"
            " — retry double-counted or dropped rows"
        )
        assert os.path.exists(os.path.join(FLAG_DIR, fault)), (
            f"{fault}: fault was never injected — the test proved nothing"
        )
        print(f"  {fault}: recovered, exact result", file=sys.stderr)

    # exactly-once through the Delta-log writer with a faulty lineage:
    # the staged-files + atomic-commit protocol must hold the exact rows
    table = tempfile.mkdtemp(prefix="fault_delta_") + "/t"
    df = spark.range(0, n, 1, parts).mapInPandas(
        _make_faulty("raise-write", hot_partition=5), "id long, y long"
    )
    write_delta_fallback(df, table)
    assert os.path.exists(os.path.join(FLAG_DIR, "raise-write"))
    back = read_delta_fallback(spark, table)
    assert back.count() == n
    assert back.groupBy().sum("y").collect()[0][0] == expect_sum
    print("  delta-write under injected fault: exactly-once", file=sys.stderr)
    print("OK")


if __name__ == "__main__":
    main()
