"""Incremental MV maintenance over a base table whose writer NEVER
enabled the change data feed — the round-11 capability.

Real Delta's ``table_changes`` (and this engine's ``read_change_feed``
by default) refuses a commit that removes data without change-data
files: the reader cannot know which rows disappeared.  In practice many
tables are written by jobs that never set ``delta.enableChangeDataFeed``
— and an MV over such a base was stuck with full recompute the moment a
DELETE or UPDATE landed.

``read_change_feed(reconstruct_removes=True)`` closes that: a
remove-bearing commit is diffed against ITSELF — its removed files
re-read as they stood in the prior snapshot (deletion vectors applied)
versus the files it added; the bag difference is exactly the commit's
deletes and inserts, at change-volume cost (the commit's touched files,
never a snapshot scan).  Updates surface as delete+insert unless the
table is ROW-TRACKED, in which case the two sides join on the stable
``_row_id`` and update pre/postimages pair exactly.  The MV refresh
paths opt in automatically (their +1/−1 fold is representation-
independent), so this script needs no special MV API — it simply runs
DML without ``write_cdf`` and refreshes.

Demonstrated below, each asserted against a full recompute:

1. aggregate MV over a CDF-less base through DELETE + UPDATE,
2. counted join MV through two-sided CDF-less DML,
3. the row-tracked variant (paired update images in the feed),
4. the fail-closed case: vacuum the removed file away and the refresh
   raises instead of guessing.

Run: python examples/mv_over_cdfless_base.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_incremental_spark import get_spark
from polars_incremental_spark.errors import ChangeDataFeedError
from polars_incremental_spark.mv import (
    create_agg_mv,
    create_join_mv,
    read_join_mv,
    refresh_agg_mv,
    refresh_join_mv,
)
from polars_incremental_spark.sinks.deltalog import (
    delete_where,
    enable_row_tracking,
    read_change_feed,
    read_delta_fallback,
    update_where,
    vacuum_fallback,
    write_delta_fallback,
)


def main() -> None:
    spark = get_spark("mv-cdfless-demo")
    work = tempfile.mkdtemp(prefix="pis_cdfless_")
    base = os.path.join(work, "orders")
    agg_mv = os.path.join(work, "revenue_mv")

    # A base table written WITHOUT delta.enableChangeDataFeed — the
    # common case for tables produced by jobs that never planned for CDC.
    write_delta_fallback(
        spark.range(10_000).select(
            F.col("id").alias("order_id"),
            (F.col("id") % 7).cast("string").alias("region"),
            (F.col("id") % 997 * 1.5).alias("amount"),
        ),
        base,
    )

    # ---- 1. aggregate MV through CDF-less DELETE + UPDATE -------------
    create_agg_mv(spark, base, agg_mv, group_cols=["region"], sum_cols=["amount"])
    delete_where(spark, base, "order_id % 10 = 3")  # no write_cdf
    update_where(spark, base, "order_id % 10 = 4", {"amount": "amount * 2"})
    res = refresh_agg_mv(spark, base, agg_mv)
    print(f"agg refresh over CDF-less DML: {res}")
    got = {
        r["region"]: (r["cnt"], round(r["sum_amount"], 4))
        for r in read_delta_fallback(spark, agg_mv).collect()
    }
    want = {
        r["region"]: (r["cnt"], round(r["sum_amount"], 4))
        for r in read_delta_fallback(spark, base)
        .groupBy("region")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("amount").alias("sum_amount"),
        )
        .collect()
    }
    assert got == want, "agg MV must equal recompute"
    print("  agg MV == full recompute: OK")

    # ---- 2. counted join MV, two-sided CDF-less DML --------------------
    left, right, jmv = (
        os.path.join(work, "l"),
        os.path.join(work, "r"),
        os.path.join(work, "jmv"),
    )
    write_delta_fallback(
        spark.range(500).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("lval")
        ),
        left,
    )
    write_delta_fallback(
        spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 10.0).alias("rval")
        ),
        right,
    )
    create_join_mv(spark, left, right, jmv, on=["k"])
    delete_where(spark, left, "lval % 3 = 0")  # no write_cdf
    update_where(spark, right, "k < 10", {"rval": "rval + 1"})
    res = refresh_join_mv(spark, jmv)
    print(f"join refresh over CDF-less DML: {res}")
    got_n = read_join_mv(spark, jmv).count()
    want_n = (
        read_delta_fallback(spark, left)
        .join(read_delta_fallback(spark, right), "k")
        .count()
    )
    assert got_n == want_n, (got_n, want_n)
    print(f"  join MV bag == recomputed join ({got_n} rows): OK")

    # ---- 3. row-tracked base: paired update images ---------------------
    rt = os.path.join(work, "rt")
    write_delta_fallback(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ),
        rt,
    )
    enable_row_tracking(rt)
    v = update_where(spark, rt, "k < 5", {"v": "v + 100"})["version"]
    feed = read_change_feed(
        spark, rt, starting_version=v, ending_version=v, reconstruct_removes=True
    )
    types = dict(
        (r["_change_type"], r["cnt"])
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("cnt")).collect()
    )
    print(f"row-tracked reconstructed feed types: {types}")
    assert types == {"update_preimage": 5, "update_postimage": 5}
    print("  paired update images without CDF: OK")

    # ---- 4. fail-closed: vacuumed change data cannot be reconstructed --
    gone = os.path.join(work, "gone")
    write_delta_fallback(
        spark.range(10).select(F.col("id").alias("k")), gone
    )
    delete_where(spark, gone, "k = 1")
    vacuum_fallback(gone, retention_hours=0.0)
    try:
        read_change_feed(spark, gone, starting_version=1, reconstruct_removes=True)
        raise AssertionError("expected ChangeDataFeedError")
    except ChangeDataFeedError as e:
        print(f"  vacuumed history fails closed: OK ({str(e)[:60]}...)")

    shutil.rmtree(work, ignore_errors=True)
    print("ALL OK")


if __name__ == "__main__":
    main()
