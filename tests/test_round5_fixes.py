"""Round-5 advice fixes: asof tolerance anchored at left_ts (TZ- and
calendar-safe), weighted_sample NULL-weight rule, content-addressed
ad-hoc bloom index batches."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.functions import dedup, sampling
from polars_incremental_spark.functions.joins import asof_join


def test_asof_tolerance_calendar_interval_anchored_at_left_ts(spark):
    """'1 month' tolerance must mean ONE CALENDAR MONTH from each left
    timestamp, not January's 31 days measured from the epoch.  2024-03-30
    minus 1 month clamps to 2024-02-29, so a right row at 2024-02-28 (31
    days away — inside an epoch-anchored 31-day budget) must be REJECTED,
    while 2024-02-29 is accepted."""
    left = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 3, 30, 12, 0))], ["event_id", "k", "ts"]
    )

    def match(right_ts):
        right = spark.createDataFrame([("a", right_ts, "r")], ["k", "ts", "v"])
        rows = asof_join(
            left, right, on=["k"], direction="backward", tolerance="1 MONTH"
        ).collect()
        return rows[0]["v_r"]

    assert match(dt.datetime(2024, 2, 29, 12, 0)) == "r"
    assert match(dt.datetime(2024, 2, 28, 12, 0)) is None


def test_asof_tolerance_plain_interval_both_directions(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame([(1, "a", t(30))], ["event_id", "k", "ts"])
    right = spark.createDataFrame(
        [("a", t(18), "far_back"), ("a", t(25), "near_back"), ("a", t(44), "far_fwd")],
        ["k", "ts", "v"],
    )
    back = asof_join(
        left, right, on=["k"], direction="backward", tolerance="10 MINUTES"
    ).collect()[0]
    assert back["v_r"] == "near_back"
    fwd = asof_join(
        left, right, on=["k"], direction="forward", tolerance="10 MINUTES"
    ).collect()[0]
    assert fwd["v_r"] is None  # far_fwd is 14 min away

    near = asof_join(
        left, right, on=["k"], direction="nearest", tolerance="15 MINUTES"
    ).collect()[0]
    assert near["v_r"] == "near_back"  # fwd candidate outside tolerance


def test_weighted_sample_null_weight_rule(spark):
    df = spark.createDataFrame(
        [("k1", 1.0), ("k2", None), ("k3", 0.9), ("k4", None)],
        ["doc_id", "quality"],
    )
    kept = {
        r["doc_id"]
        for r in sampling.weighted_sample(
            df, weight_col="quality", key_col="doc_id", alpha=1.0
        ).collect()
    }
    assert "k2" not in kept and "k4" not in kept  # NULL -> 0.0 -> dropped
    assert "k1" in kept  # weight 1.0 always survives

    # alpha=0 keeps EVERYTHING, NULL weights included (pow(0,0) = 1)
    all_kept = sampling.weighted_sample(
        df, weight_col="quality", key_col="doc_id", alpha=0.0
    ).count()
    assert all_kept == 4


def test_adhoc_bloom_batches_content_addressed(spark, tmp_path):
    """Retrying the same ad-hoc (no batch_id) update overwrites its own
    content-addressed directory instead of accumulating uuid orphans; a
    different batch lands in a second directory; membership still matches
    the one-shot filter."""
    test_a = spark.createDataFrame(
        [(101, "we say the quick brown fox jumps high today")], ["doc_id", "text"]
    )
    test_b = spark.createDataFrame(
        [(102, "spark engines here are not a benchmark sentence")], ["doc_id", "text"]
    )
    idx = str(tmp_path / "bloom_adhoc")
    dedup.update_bloom_index(test_a, idx)
    dedup.update_bloom_index(test_a, idx)  # identical retry -> same dir

    def batch_dirs():
        return sorted(
            d for d in os.listdir(idx) if d.startswith("batch_adhoc_")
        )

    assert len(batch_dirs()) == 1

    dedup.update_bloom_index(test_b, idx)
    assert len(batch_dirs()) == 2

    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    indexed = sorted(
        map(
            tuple,
            dedup.bloom_decontaminate_indexed(spark, train, idx, min_hits=2).collect(),
        )
    )
    one_shot = sorted(
        map(
            tuple,
            dedup.bloom_decontaminate(
                train, test_a.union(test_b), min_hits=2, probe="bitset"
            ).collect(),
        )
    )
    assert indexed == one_shot


def test_char_trigram_score_cache_flag(spark):
    from polars_incremental_spark.functions import text as tx

    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, "zqxj vvkk zzzz")], ["doc_id", "text"]
    )
    cached = {tuple(r) for r in tx.char_trigram_score(df).collect()}
    uncached = {
        tuple(r)
        for r in tx.char_trigram_score(df, cache_intermediate=False).collect()
    }
    assert cached == uncached and len(cached) == 2
