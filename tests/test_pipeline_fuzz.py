"""Randomized exactly-once fuzz of the planned Pipeline WAL.

Files land in random-sized waves; the writer crashes at random batches;
after every crash the pipeline simply reruns.  Regardless of the
crash/restart interleaving, the final output must contain every input row
EXACTLY once (idempotent per-batch sink + offset/commit WAL), and batch
ids must be contiguous.  This is the reference engine's central promise
(checkpointing C1-C9 + pipeline P2/P3) under adversarial scheduling.
"""

import os
import random

import pytest

# round-13 test tiering: randomized fuzz/stress campaign — slow tier
# (directed tests + the DuckDB oracle gate cover the same operators)
pytestmark = pytest.mark.slow


from polars_incremental_spark import FilesSource, Pipeline, WriterError, write_parquet_batch


@pytest.mark.parametrize("seed", [3, 19])
def test_crashy_writer_exactly_once(spark, tmp_path, seed):
    rng = random.Random(seed)
    land = str(tmp_path / "land")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(land)

    next_id = 0
    landed: set[int] = set()

    def land_wave():
        nonlocal next_id
        n = rng.randint(1, 30)
        rows = [(next_id + i,) for i in range(n)]
        next_id += n
        landed.update(r[0] for r in rows)
        spark.createDataFrame(rows, "id long").coalesce(1).write.parquet(
            f"{land}/wave_{next_id}"
        )

    crashes = {"left": 0}
    seen_batches = []

    def writer(df, batch_id):
        if crashes["left"] > 0 and rng.random() < 0.5:
            crashes["left"] -= 1
            raise RuntimeError("injected crash before write")
        write_parquet_batch(df, out, batch_id)
        seen_batches.append(batch_id)
        if crashes["left"] > 0 and rng.random() < 0.3:
            crashes["left"] -= 1
            raise RuntimeError("injected crash AFTER write, before commit")

    pipe = Pipeline(
        source=FilesSource(path=land, max_files_per_trigger=2),
        checkpoint_dir=cp,
        writer=writer,
    )

    for wave in range(6):
        land_wave()
        crashes["left"] = rng.randint(0, 2)
        # drain, retrying through every injected crash: done when a run
        # completes cleanly with nothing left to process
        drained = False
        for _ in range(40):
            try:
                res = pipe.run(spark)
            except WriterError:
                continue
            if res.batches == 0:
                drained = True
                break
        assert drained, "pipeline never drained"

    got = sorted(
        r["id"]
        for r in spark.read.parquet(f"{out}/batch_*").collect()
    )
    assert got == sorted(landed), (
        f"seed={seed}: exactly-once violated "
        f"(missing={set(landed) - set(got)}, dup={len(got) - len(set(got))})"
    )
    # batch ids contiguous from 0 (each id written at least once; replays
    # rewrite the same directory idempotently)
    assert set(seen_batches) == set(range(max(seen_batches) + 1))
