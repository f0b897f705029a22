"""Semantic tests for the round-6 third-wave operators: interval overlap
join, containment pairs, and KMV set operations.  The driver oracle checks
hash equality against DuckDB; these pin the MEANING on hand-built data.
"""

import datetime as dt

from pyspark.sql import functions as F

from polars_incremental_spark.functions import dedup, joins, sketches


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _intervals(spark, rows, names=("id", "start", "end")):
    return spark.createDataFrame(
        rows, f"{names[0]} long, {names[1]} timestamp, {names[2]} timestamp"
    )


def test_interval_overlap_semantics(spark):
    left = _intervals(
        spark,
        [
            (1, _ts(1), _ts(3)),   # overlaps r10 and r11
            (2, _ts(5), _ts(6)),   # touches r12's start exactly -> NO overlap
            (3, _ts(8), _ts(9)),   # disjoint from everything
        ],
    )
    right = _intervals(
        spark,
        [
            (10, _ts(0), _ts(1, 30)),
            (11, _ts(2, 30), _ts(4)),
            (12, _ts(6), _ts(7)),
        ],
        names=("rid", "start", "end"),
    )
    out = joins.interval_overlap_join(
        left, right, bucket="INTERVAL 30 MINUTES"
    )
    pairs = {(r["id"], r["rid_r"]) for r in out.collect()}
    assert pairs == {(1, 10), (1, 11)}
    # each overlapping pair appears exactly ONCE even though (1, 10) shares
    # a 30-min cell more than once
    assert out.count() == 2


def test_interval_overlap_long_interval_single_emission(spark):
    # left spans MANY cells; pair must still appear exactly once
    left = _intervals(spark, [(1, _ts(0), _ts(12))])
    right = _intervals(
        spark, [(10, _ts(5), _ts(5, 30))], names=("rid", "start", "end")
    )
    out = joins.interval_overlap_join(left, right, bucket="INTERVAL 15 MINUTES")
    assert [(r["id"], r["rid_r"]) for r in out.collect()] == [(1, 10)]


def test_interval_overlap_respects_keys(spark):
    left = spark.createDataFrame(
        [(7, 1, _ts(1), _ts(2))], "k long, id long, start timestamp, end timestamp"
    )
    right = spark.createDataFrame(
        [(7, 10, _ts(1), _ts(2)), (8, 11, _ts(1), _ts(2))],
        "k long, rid long, start timestamp, end timestamp",
    )
    out = joins.interval_overlap_join(left, right, on=["k"], bucket="INTERVAL 1 HOUR")
    assert [(r["k"], r["id"], r["rid_r"]) for r in out.collect()] == [(7, 1, 10)]


def test_containment_asymmetric(spark):
    base = " ".join(f"w{i}" for i in range(12))
    long_doc = base + " " + " ".join(f"x{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, long_doc)], "doc_id long, text string"
    )
    out = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in dedup.containment_pairs(df, threshold=0.5).collect()
    }
    # ALL of doc 1's shingles appear in doc 2 -> containment 1.0 that way,
    # but doc 2 is mostly novel so the reverse direction is filtered out
    assert out == {(1, 2): 1.0}


def test_containment_threshold_filters(spark):
    a = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, a + " z0 z1 z2"), (2, a)], "doc_id long, text string"
    )
    # doc 2 fully contained in doc 1; doc 1 only partially in doc 2
    out = dedup.containment_pairs(df, threshold=0.99).collect()
    assert [(r["contained_id"], r["container_id"]) for r in out] == [(2, 1)]


def test_kmv_set_ops_exact_when_small(spark):
    # distinct values per group < k -> estimates are EXACT
    rows = [("a", v) for v in range(10)] + [("b", v) for v in range(5, 20)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = sketches.kmv_set_ops(df, group_col="g", value_col="v", k=64).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert r["est_union"] == r["exact_union"] == 20
    assert r["est_intersection"] == r["exact_intersection"] == 5


def test_kmv_set_ops_disjoint_groups(spark):
    rows = [("a", v) for v in range(8)] + [("b", v) for v in range(100, 108)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = sketches.kmv_set_ops(df, group_col="g", value_col="v", k=64).collect()[0]
    assert r["exact_intersection"] == 0 and r["est_intersection"] == 0
    assert r["exact_union"] == 16


def test_kmv_set_ops_estimates_close_at_scale(spark):
    # 3 groups x 2000 distinct users with 50% pairwise overlap: estimates
    # should land within ~35% of truth at k=64 (KMV relative error ~1/sqrt(k))
    rows = []
    for g, base in (("a", 0), ("b", 1000), ("c", 2000)):
        rows += [(g, base + v) for v in range(2000)]
    df = spark.createDataFrame(rows, "g string, v long")
    for r in sketches.kmv_set_ops(df, group_col="g", value_col="v", k=64).collect():
        assert abs(r["est_union"] - r["exact_union"]) / r["exact_union"] < 0.35
        if r["exact_intersection"]:
            assert (
                abs(r["est_intersection"] - r["exact_intersection"])
                / r["exact_intersection"]
                < 0.5
            )
