"""Skew-mitigation helper tests: salted joins and two-phase aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_incremental_spark.functions import skew


def test_salted_join_equals_plain_join(spark):
    # one hot key (90% of rows) + a tail
    large = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, k * 100) for k in range(2, 12)],
        ["k", "v"],
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 12)], ["k", "name"])
    plain = {(r["k"], r["v"], r["name"]) for r in large.join(small, ["k"]).collect()}
    salted = {
        (r["k"], r["v"], r["name"])
        for r in skew.salted_join(large, small, ["k"], n_salts=8).collect()
    }
    assert salted == plain
    assert len(salted) == 100


def test_salted_join_left_outer(spark):
    large = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "dim1")], ["k", "name"])
    out = {
        (r["k"], r["name"])
        for r in skew.salted_join(large, small, ["k"], n_salts=4, how="left").collect()
    }
    assert out == {(1, "dim1"), (2, None)}


def test_salt_spreads_hot_key(spark):
    hot = spark.createDataFrame([(1,)] * 1000, ["k"])
    n_buckets = (
        skew.with_salt(hot, 16).select("__salt").distinct().count()
    )
    assert n_buckets > 1  # a single key occupies many salt buckets


def test_two_phase_collect_list(spark):
    df = spark.createDataFrame([("a", i) for i in range(50)] + [("b", 1)], ["k", "v"])
    out = {
        r["k"]: sorted(r["vs"])
        for r in skew.two_phase_agg(
            df,
            ["k"],
            [F.collect_list("v").alias("vs")],
            [F.flatten(F.collect_list("vs")).alias("vs")],
            n_salts=8,
        ).collect()
    }
    assert out["a"] == list(range(50)) and out["b"] == [1]


def test_two_phase_apply_in_pandas_matches_plain(spark):
    """Salted two-phase custom Python aggregation equals the one-shot
    groupBy().applyInPandas on a hot-keyed frame (round-8 helper)."""
    import pandas as pd

    rows = [("hot", float(i)) for i in range(500)] + [
        ("c" + str(i), float(i)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])

    def moments(pdf):
        return pd.DataFrame(
            {
                "k": [pdf["k"].iloc[0]],
                "n": [len(pdf)],
                "s": [float(pdf["v"].sum())],
            }
        )

    got = {
        r["k"]: (r["n"], round(r["s"], 6))
        for r in skew.two_phase_apply_in_pandas(
            df,
            ["k"],
            moments,
            "k string, n long, s double",
            [F.sum("n").alias("n"), F.sum("s").alias("s")],
            n_salts=8,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], round(r["s"], 6))
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want and got["hot"][0] == 500
