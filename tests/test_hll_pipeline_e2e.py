"""Persisted HLL register store under the checkpointed pipeline:
crash-replay e2e (the novelty-curve example's failure-mode twin).

The writer folds each batch's user ids into the HLL index and THEN
crashes, before commit_batch — the framework replays the same batch id
on restart, and the store must (a) refuse the re-fold via the folded-id
ledger, and (b) be register-identical to an uninterrupted control run
(max-merge idempotence is the backstop even if the ledger were lost).
"""

from __future__ import annotations

import os

import pytest

from polars_incremental_spark import Pipeline, WriterError
from polars_incremental_spark.functions import sketches as sk


def _regs(spark, index):
    return sorted(
        (r["src"], tuple((e["j"], e["r"]) for e in r["hll_regs"]))
        for r in sk.read_hll_index(spark, index)[0].collect()
    )


def _land(spark, work, landing, wave_no, rows):
    df = spark.createDataFrame(rows, "event_id long, user_id string")
    df = df.selectExpr("event_id", "user_id", "'crawl' AS src")
    stage = os.path.join(work, f"stage{wave_no}")
    df.coalesce(1).write.parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    os.rename(
        os.path.join(stage, part), os.path.join(landing, f"wave{wave_no}.parquet")
    )


WAVES = [
    [(i, f"u{i % 400}") for i in range(800)],
    [(i, f"u{200 + (i % 400)}") for i in range(800)],
]


def _run(spark, work, *, crash_batch=None):
    """Run both waves through a checkpointed pipeline; optionally raise in
    the writer AFTER the HLL fold of ``crash_batch`` (pre-commit crash).
    Returns (index_path, fold_results, curve)."""
    landing = os.path.join(work, "landing")
    index = os.path.join(work, "hll_index")
    os.makedirs(landing)
    folds: list[tuple[int, bool]] = []
    curve: list[int] = []
    crashed = {"done": False}

    def writer(df, batch_id):
        folded = sk.update_hll_index(
            df, index, group_cols=["src"], value_col="user_id", batch_id=batch_id
        )
        folds.append((batch_id, folded))
        if crash_batch == batch_id and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash AFTER fold, BEFORE commit")
        curve.append(
            int(
                sk.hll_index_distinct(spark, index).collect()[0]["approx_distinct"]
            )
        )
        return {}

    pipe = Pipeline(
        source=landing, checkpoint_dir=os.path.join(work, "ckpt"), writer=writer
    )
    for wave_no, rows in enumerate(WAVES):
        _land(spark, work, landing, wave_no, rows)
        if crash_batch is not None and not crashed["done"]:
            with pytest.raises(WriterError):
                pipe.run(spark)
            # restart with a FRESH pipeline object: same batch id replays
            pipe = Pipeline(
                source=landing,
                checkpoint_dir=os.path.join(work, "ckpt"),
                writer=writer,
            )
        pipe.run(spark)
    return index, folds, curve


@pytest.mark.slow  # round-13 tiering: long randomized/property probe
def test_hll_store_crash_replay_matches_control(spark, tmp_path):
    ctrl = tmp_path / "control"
    cr = tmp_path / "crashed"
    ctrl.mkdir()
    cr.mkdir()
    idx_c, folds_c, curve_c = _run(spark, str(ctrl))
    idx_x, folds_x, curve_x = _run(spark, str(cr), crash_batch=0)

    # the replayed batch folded once (True) then was refused (False)
    assert folds_c == [(0, True), (1, True)]
    assert folds_x == [(0, True), (0, False), (1, True)]
    # curve identical to the uninterrupted run, and monotone
    assert curve_x == curve_c
    assert curve_c == sorted(curve_c)
    # registers bit-identical across the crash/replay
    assert _regs(spark, idx_x) == _regs(spark, idx_c)
