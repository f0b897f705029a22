"""Quality-gated incremental pipeline demo (DLT-style expectations).

Lands a batch with mixed-quality rows, runs a checkpointed Pipeline with
four expectations — a warn counter, a drop gate, a quarantine gate with a
dead-letter sink, and a fail rule — then shows the violation metrics
recorded in the commit metadata and the replay behavior of a failed batch.

Run: python examples/quality_gated_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_incremental_spark import (
    ExpectationViolationError,
    FilesSource,
    Pipeline,
    expect,
    expect_or_drop,
    expect_or_fail,
    expect_or_quarantine,
    get_spark,
    write_parquet_batch,
)


def main() -> None:
    spark = get_spark("quality-gate-demo")
    work = tempfile.mkdtemp(prefix="pis_qg_")
    land, ckpt, out, dead = (
        os.path.join(work, d) for d in ("landing", "ckpt", "out", "dead")
    )

    rows = [
        (1, "alice", 34.0, "web"),
        (2, "bob", -3.0, "web"),        # negative amount -> dropped
        (3, "", 12.0, "app"),           # empty name -> quarantined
        (4, "dora", None, "app"),       # NULL amount passes (SQL CHECK rule)
        (5, "eve", 120.0, "kiosk"),     # unknown channel -> warn only
    ]
    spark.createDataFrame(
        rows, "id long, name string, amount double, channel string"
    ).coalesce(1).write.parquet(os.path.join(land, "drop_1.parquet"))

    def writer(df, batch_id):
        write_parquet_batch(df, out, batch_id)
        return {"rows_written": df.count()}

    def dead_letter(df, batch_id):
        write_parquet_batch(df, dead, batch_id)

    pipe = Pipeline(
        source=FilesSource(path=land),
        checkpoint_dir=ckpt,
        writer=writer,
        quarantine_writer=dead_letter,
        expectations=[
            expect("known_channel", "channel IN ('web', 'app')"),
            expect_or_drop("positive_amount", "amount > 0"),
            expect_or_quarantine("has_name", "length(name) > 0"),
            expect_or_fail("id_present", "id IS NOT NULL"),
        ],
    )
    pipe.run(spark)

    print("written:", sorted(
        r["id"] for r in spark.read.parquet(os.path.join(out, "batch_0")).collect()
    ))
    print("dead-lettered:", sorted(
        r["id"] for r in spark.read.parquet(os.path.join(dead, "batch_0")).collect()
    ))

    # a batch violating the fail-rule aborts BEFORE the checkpoint commit
    spark.createDataFrame(
        [(None, "mallory", 1.0, "web")],
        "id long, name string, amount double, channel string",
    ).coalesce(1).write.parquet(os.path.join(land, "drop_2.parquet"))
    try:
        pipe.run(spark)
    except ExpectationViolationError as exc:
        print("fail-rule aborted the batch:", exc)
    # the bad batch is NOT committed — it replays until fixed or relaxed
    try:
        pipe.run(spark)
    except ExpectationViolationError:
        print("replayed and failed again, as designed")

    shutil.rmtree(work)


if __name__ == "__main__":
    main()
