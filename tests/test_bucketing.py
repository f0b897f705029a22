"""Bucketed-table co-location: the shuffle is paid at write, not per query.

Asserts from the PHYSICAL PLAN (not assumption) that a sort-merge join of
two same-bucket-count tables and a groupBy on the bucket key run with zero
shuffle exchanges, while the identical unbucketed join shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.functions import bucketing as B


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    B.write_bucketed(orders, "t_b_orders", bucket_cols=["o_orderkey"], n_buckets=4)
    B.write_bucketed(
        lineitem, "t_b_lineitem", bucket_cols=["l_orderkey"], n_buckets=4
    )
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS t_b_orders")
    spark.sql("DROP TABLE IF EXISTS t_b_lineitem")


def test_bucketed_join_has_zero_shuffle_exchanges(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    unbucketed = orders.hint("merge").join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    )
    assert B.n_shuffle_exchanges(unbucketed) > 0
    j = B.bucketed_join(
        spark, "t_b_orders", "t_b_lineitem", [("o_orderkey", "l_orderkey")]
    )
    assert B.n_shuffle_exchanges(j) == 0
    assert j.count() == unbucketed.count()  # same result, no shuffle


def test_bucketed_agg_has_zero_shuffle_exchanges(spark, bucketed_tables):
    agg = (
        spark.table("t_b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert B.n_shuffle_exchanges(agg) == 0
    # spot-check one group against the raw table
    _, lineitem = bucketed_tables
    key = lineitem.select("l_orderkey").first()["l_orderkey"]
    expect = (
        lineitem.filter(F.col("l_orderkey") == key)
        .agg(F.sum("l_quantity"))
        .first()[0]
    )
    got = agg.filter(F.col("l_orderkey") == key).first()["qty"]
    assert got == expect


def test_bucketed_join_same_name_keys(spark, bucketed_tables):
    """String / shared-name forms of `on` work and stay shuffle-free."""
    orders, _ = bucketed_tables
    renamed = orders.withColumnRenamed("o_orderkey", "k").select("k", "o_totalprice")
    B.write_bucketed(renamed, "t_b_k1", bucket_cols=["k"], n_buckets=4)
    B.write_bucketed(
        renamed.select("k", F.col("o_totalprice").alias("p2")),
        "t_b_k2",
        bucket_cols=["k"],
        n_buckets=4,
    )
    try:
        j = B.bucketed_join(spark, "t_b_k1", "t_b_k2", "k")
        assert B.n_shuffle_exchanges(j) == 0
        assert j.count() == orders.count()
        j2 = B.bucketed_join(spark, "t_b_k1", "t_b_k2", ["k"])
        assert B.n_shuffle_exchanges(j2) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_b_k1")
        spark.sql("DROP TABLE IF EXISTS t_b_k2")


def test_write_bucketed_validation(spark, bucketed_tables):
    orders, _ = bucketed_tables
    with pytest.raises(ValueError, match="n_buckets"):
        B.write_bucketed(orders, "t_bad", bucket_cols=["o_orderkey"], n_buckets=0)
    with pytest.raises(ValueError, match="bucket_cols"):
        B.write_bucketed(orders, "t_bad", bucket_cols=[], n_buckets=4)
