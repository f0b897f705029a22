"""Two Structured Streaming pipelines that keep an incremental JOIN MV
fresh — the two-stream twin of examples/streaming_mv.py.

Shape: an orders stream and a customer-updates stream each land batches
into their own Delta base (jar-less log writer) inside ``foreachBatch``,
and the SAME micro-batch hook refreshes the counted join MV
(``mv.refresh_join_mv``) from both bases' change feeds.  The refresh is
the delta-join decomposition L₂⋈R₂ − L₁⋈R₁ = ΔL⋈R₂ + L₁⋈ΔR under signed
multiplicity counting (mv.py): the left stream's batches exercise the
ΔL⋈R₂ term, the right stream's the L₁⋈ΔR term, and both fold through the
same three-clause MERGE.

Crash-safety is the agg example's argument verbatim: base appends are
replay-keyed by the stream's own checkpoint, the MV MERGE carries both
base versions as an atomic watermark, and ``refresh_join_mv`` no-ops
when the watermark already covers both heads — so a crash or batch
replay anywhere double-folds nothing.

Run: python examples/streaming_join_mv.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_incremental_spark import get_spark
from polars_incremental_spark.mv import create_join_mv, read_join_mv, refresh_join_mv
from polars_incremental_spark.sinks.deltalog import write_delta_fallback


def _land(spark, rows, schema, landing: str, name: str, work: str) -> None:
    """Stage one parquet FILE at the landing top level (file streams do
    not recurse into subdirectories)."""
    stage = os.path.join(work, f"stage_{name}")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    os.rename(os.path.join(stage, part), os.path.join(landing, f"{name}.parquet"))


def main() -> None:
    spark = get_spark("streaming-join-mv-demo")
    work = tempfile.mkdtemp(prefix="pis_stream_jmv_")
    orders_landing = os.path.join(work, "orders_landing")
    cust_landing = os.path.join(work, "cust_landing")
    orders, cust = os.path.join(work, "orders"), os.path.join(work, "cust")
    mv = os.path.join(work, "orders_by_segment")
    os.makedirs(orders_landing)
    os.makedirs(cust_landing)

    # seed both bases + the counted join MV
    write_delta_fallback(
        spark.createDataFrame(
            [(1, 100), (2, 200)], "cust_id long, amount long"
        ),
        orders,
    )
    write_delta_fallback(
        spark.createDataFrame(
            [(1, "gold"), (2, "silver"), (3, "gold")],
            "cust_id long, segment string",
        ),
        cust,
    )
    create_join_mv(spark, orders, cust, mv, on=["cust_id"])

    def fold(base_path: str):
        def inner(batch_df, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            write_delta_fallback(batch_df, base_path, mode="append")
            res = refresh_join_mv(spark, mv)
            print(f"{os.path.basename(base_path)} batch {batch_id}: {res}")

        return inner

    def drain(landing: str, schema: str, base_path: str, ckpt: str) -> None:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
            .writeStream.foreachBatch(fold(base_path))
            .option("checkpointLocation", os.path.join(work, ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    try:
        # left-stream batches: new orders join the CURRENT customer dim
        _land(
            spark,
            [(1, 30), (3, 70)],
            "cust_id long, amount long",
            orders_landing,
            "orders0",
            work,
        )
        drain(orders_landing, "cust_id long, amount long", orders, "ockpt")
        # an order for a customer that does not exist yet: joins nothing
        _land(
            spark,
            [(4, 55)],
            "cust_id long, amount long",
            orders_landing,
            "orders1",
            work,
        )
        drain(orders_landing, "cust_id long, amount long", orders, "ockpt")
        # right-stream batch: the customer arriving makes the EXISTING
        # unmatched order appear in the join — the L₁⋈ΔR delta term
        _land(
            spark,
            [(4, "bronze")],
            "cust_id long, segment string",
            cust_landing,
            "cust0",
            work,
        )
        drain(cust_landing, "cust_id long, segment string", cust, "cckpt")

        got = sorted(
            (r["cust_id"], r["amount"], r["segment"])
            for r in read_join_mv(spark, mv).collect()
        )
        expected = sorted(
            [
                (1, 100, "gold"),
                (1, 30, "gold"),
                (2, 200, "silver"),
                (3, 70, "gold"),
                (4, 55, "bronze"),
            ]
        )
        assert got == expected, got
        print("join MV state:", got)
        print("streaming join MV converged to the exact join")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
