"""Incremental materialized views over the jar-less Delta path.

An aggregate MV (revenue per region) and a join MV (orders x customers)
refresh from their base tables' CHANGE DATA FEEDS — cost tracks the change
volume, never the base size, and each refresh is one atomic commit whose
userMetadata carries the watermark (crash anywhere = clean no-op).

Run: python examples/incremental_mv.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_incremental_spark import get_spark
from polars_incremental_spark.mv import (
    create_agg_mv,
    create_join_mv,
    read_join_mv,
    refresh_agg_mv,
    refresh_join_mv,
)
from polars_incremental_spark.sinks.deltalog import (
    delete_where,
    read_delta_fallback,
    update_where,
    write_delta_fallback,
)


def main() -> None:
    spark = get_spark("incremental-mv-demo")
    work = tempfile.mkdtemp(prefix="pis_mv_")
    sales = os.path.join(work, "sales")
    mv = os.path.join(work, "revenue_by_region")

    write_delta_fallback(
        spark.createDataFrame(
            [("eu", 100), ("eu", 50), ("us", 200)], "region string, amount long"
        ),
        sales,
    )
    print("create:", create_agg_mv(spark, sales, mv, group_cols=["region"], sum_cols=["amount"]))
    read_delta_fallback(spark, mv).orderBy("region").show()

    # appends, a CDF delete, and a group-migrating update — then ONE refresh
    write_delta_fallback(
        spark.createDataFrame([("apac", 70), ("eu", 25)], "region string, amount long"),
        sales,
        mode="append",
    )
    delete_where(spark, sales, "region = 'us'", write_cdf=True)
    update_where(spark, sales, "amount = 70", {"region": "'eu'"}, write_cdf=True)
    print("refresh:", refresh_agg_mv(spark, sales, mv))
    read_delta_fallback(spark, mv).orderBy("region").show()  # us gone, apac folded into eu

    # ---- join MV: multiplicity-counted delta-join maintenance ----
    orders = os.path.join(work, "orders")
    customers = os.path.join(work, "customers")
    jmv = os.path.join(work, "orders_enriched")
    write_delta_fallback(
        spark.createDataFrame([(1, 10), (2, 20)], "cust long, total long"), orders
    )
    write_delta_fallback(
        spark.createDataFrame([(1, "ada")], "cust long, name string"), customers
    )
    print("join mv:", create_join_mv(spark, orders, customers, jmv, on=["cust"]))
    write_delta_fallback(
        spark.createDataFrame([(2, "bob")], "cust long, name string"),
        customers,
        mode="append",
    )
    write_delta_fallback(
        spark.createDataFrame([(2, 25)], "cust long, total long"), orders, mode="append"
    )
    # deletes/updates fold through the SIGNED delta-join (counting IVM)
    delete_where(spark, orders, "total = 10", write_cdf=True)
    print("join refresh:", refresh_join_mv(spark, jmv))
    read_join_mv(spark, jmv).orderBy("cust", "total").show()

    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
