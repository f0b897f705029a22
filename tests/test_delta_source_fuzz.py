"""Randomized exactly-once fuzz of the jar-less Delta streaming tailer.

A writer randomly appends, compacts (dataChange=false), checkpoints and
expires the log of a Delta table while a planned Pipeline(DeltaSource)
consumer drains it incrementally — with injected consumer crashes.  The
consumer must deliver every appended row exactly once: compaction commits
are skipped (their adds re-state existing rows), log checkpoints/expiry
must not disturb the tail position, and crash-replay re-reads only the
uncommitted batch.
"""

import random

import pytest

from polars_incremental_spark.pipeline import Pipeline
from polars_incremental_spark.sinks.delta import write_table
from polars_incremental_spark.sinks.deltalog import (
    checkpoint_log,
    compact_fallback,
    expire_log,
    write_delta_fallback,
)
from polars_incremental_spark.sources.base import DeltaSource


@pytest.mark.parametrize("seed", [11, 29])
def test_tailer_exactly_once_under_compaction_and_cleanup(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    first = [(0, 0), (1, 1)]
    write_table(spark.createDataFrame(first, "k long, v long"), path)
    appended = dict(first)
    next_key = 10

    consumed: list[tuple[int, int]] = []
    crash = {"armed": False}

    def writer(df, batch_id):
        rows = [(r["k"], r["v"]) for r in df.collect()]
        if crash["armed"] and rng.random() < 0.5:
            crash["armed"] = False
            raise RuntimeError("injected consumer crash")
        consumed.extend(rows)

    pipe = Pipeline(
        source=DeltaSource(path, ignore_changes=True),
        checkpoint_dir=cp,
        writer=writer,
    )

    def drain():
        for _ in range(20):
            try:
                if pipe.run(spark).batches == 0:
                    return
            except Exception:
                continue
        pytest.fail("tailer never drained")

    for step in range(10):
        op = rng.choice(["append", "append", "compact", "checkpoint", "drain"])
        if op == "append":
            n = rng.randint(1, 3)
            rows = [(next_key + i, rng.randint(0, 9)) for i in range(n)]
            next_key += n
            appended.update(dict(rows))
            write_delta_fallback(
                spark.createDataFrame(rows, "k long, v long"), path, mode="append"
            )
        elif op == "compact":
            compact_fallback(spark, path, target_partitions=1)
        elif op == "checkpoint":
            checkpoint_log(path)
            if rng.random() < 0.5:
                expire_log(path)
        elif op == "drain":
            crash["armed"] = rng.random() < 0.6
            drain()

    crash["armed"] = False
    drain()
    assert sorted(consumed) == sorted(appended.items()), (
        f"seed={seed}: consumed {len(consumed)} rows, "
        f"expected {len(appended)} exactly once"
    )
