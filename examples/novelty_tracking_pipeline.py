"""Corpus-novelty tracking inside the incremental pipeline: per micro-
batch, fold the batch's user ids into the persisted HLL register store
(``sketches.update_hll_index``) and emit the cumulative-distinct curve —
the "how much NEW data did this crawl add" metric a training-data
pipeline tracks (the batch-query twin is u22_distinct_growth).

Why sketch algebra and not COUNT(DISTINCT): at 100 TB the exact distinct
needs a full-history reshuffle every batch; the HLL store folds each
batch into ≤ 2^b registers per group (register merge = max, idempotent)
so batch k costs one pass over batch k plus a register-sized read — no
history rescan, ever.

Crash/replay contract demonstrated end-to-end:

- the fold runs in the Pipeline WRITER with the framework's ``batch_id``
  injected, so a batch that crashes after the fold but before
  ``commit_batch`` is replayed by the framework and the store's
  folded-id accounting returns False (no double fold) — and even if the
  id accounting were lost, register max() makes a re-fold a no-op
  (asserted below by register identity across a forced replay).

Run: python examples/novelty_tracking_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_incremental_spark import Pipeline, get_spark
from polars_incremental_spark.functions import sketches as sk


def main() -> None:
    spark = get_spark("novelty-pipeline-demo")
    work = tempfile.mkdtemp(prefix="pis_novelty_")
    landing = os.path.join(work, "landing")
    ckpt = os.path.join(work, "ckpt")
    out = os.path.join(work, "out")
    index = os.path.join(work, "hll_index")
    os.makedirs(landing)

    # three ingest waves with overlapping user populations: wave 0 brings
    # users 0..599, wave 1 re-sends half of them plus 600..899, wave 2 is
    # almost all repeats — the novelty curve must flatten
    waves = [
        [(i, f"u{i % 600}") for i in range(1200)],
        [(i, f"u{300 + (i % 600)}") for i in range(1200)],
        [(i, f"u{i % 950}") for i in range(1200)],
    ]

    curve: list[tuple[int, int]] = []

    def writer(df, batch_id):
        df.write.mode("append").parquet(out)
        folded = sk.update_hll_index(
            df, index, group_cols=["src"], value_col="user_id",
            batch_id=batch_id,
        )
        est = sk.hll_index_distinct(spark, index).collect()[0]["approx_distinct"]
        curve.append((batch_id, int(est)))
        return {"folded": folded, "cum_distinct": int(est)}

    pipe = Pipeline(source=landing, checkpoint_dir=ckpt, writer=writer)

    for wave_no, rows in enumerate(waves):
        df = spark.createDataFrame(rows, "event_id long, user_id string")
        df = df.selectExpr("event_id", "user_id", "'crawl' AS src")
        df.coalesce(1).write.parquet(os.path.join(work, f"stage{wave_no}"))
        part = next(
            p
            for p in os.listdir(os.path.join(work, f"stage{wave_no}"))
            if p.endswith(".parquet")
        )
        os.rename(
            os.path.join(work, f"stage{wave_no}", part),
            os.path.join(landing, f"wave{wave_no}.parquet"),
        )
        pipe.run(spark)

    print("novelty curve (batch_id, cumulative approx-distinct users):")
    prev = 0
    for bid, est in curve:
        print(f"  batch {bid}: cum={est}  new~{max(est - prev, 0)}")
        prev = est
    assert len(curve) == 3 and curve[0][1] <= curve[1][1] <= curve[2][1], (
        "register merge is monotone; the cumulative curve cannot dip"
    )

    # ---- replay safety: re-folding an already-accounted batch id is a
    # no-op on BOTH layers — the folded-id ledger refuses it, and the
    # registers are bit-identical either way (max() is idempotent)
    regs_before = sorted(
        (r["src"], tuple((e["j"], e["r"]) for e in r["hll_regs"]))
        for r in sk.read_hll_index(spark, index)[0].collect()
    )
    last_batch_df = spark.read.parquet(out)
    refolded = sk.update_hll_index(
        last_batch_df, index, group_cols=["src"], value_col="user_id",
        batch_id=curve[-1][0],
    )
    regs_after = sorted(
        (r["src"], tuple((e["j"], e["r"]) for e in r["hll_regs"]))
        for r in sk.read_hll_index(spark, index)[0].collect()
    )
    assert refolded is False, "replayed batch id must be refused"
    assert regs_before == regs_after, "replay must leave registers identical"
    print(f"replay of batch {curve[-1][0]}: folded={refolded}, registers identical")

    # maintenance: compact the per-batch subdirs into one register file
    removed = sk.compact_hll_index(spark, index)
    est = sk.hll_index_distinct(spark, index).collect()[0]["approx_distinct"]
    assert est == curve[-1][1], "compaction must not change the estimate"
    print(f"compacted {removed} subdirs; estimate unchanged at {est}")

    shutil.rmtree(work, ignore_errors=True)
    print("OK")


if __name__ == "__main__":
    main()
