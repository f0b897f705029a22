"""Deterministic HyperLogLog sketch (functions/sketches.py).

What must hold for the u21 oracle contract (and for incremental roll-up
at 100 TB):

1. merge losslessness — register-max-merging arbitrary batch partitions of
   the data yields the SAME registers (hence the same estimate) as
   sketching the whole table at once; commutative and idempotent.
2. cross-engine determinism — the Spark estimate equals the DuckDB twin
   (sql_hll_estimate) bit-for-bit, including on the linear-counting branch.
3. accuracy — within the textbook ~1.04/sqrt(m) bound on uniform data.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.functions import sketches as sk


def _toy(spark, n_rows: int, n_distinct: int, groups=("a", "b")):
    df = spark.range(n_rows).select(
        F.concat(F.lit("g"), F.pmod("id", F.lit(len(groups))).cast("string")).alias(
            "g"
        ),
        F.pmod(F.xxhash64("id"), F.lit(n_distinct)).alias("v"),
    )
    return df


def test_merge_is_lossless_and_idempotent(spark):
    df = _toy(spark, 20_000, 3_000)
    direct = sk.hll_sketch(df, group_cols=["g"], value_col="v")
    batched = sk.hll_sketch(
        df.withColumn("__b", F.pmod(F.xxhash64("v"), F.lit(13))),
        group_cols=["g", "__b"],
        value_col="v",
    )
    merged = sk.hll_merge(batched, group_cols=["g"])
    d = {r["g"]: r["hll_regs"] for r in direct.collect()}
    m = {r["g"]: r["hll_regs"] for r in merged.collect()}
    assert d == m
    # idempotent: merging the merged sketch with itself changes nothing
    twice = sk.hll_merge(merged.unionAll(merged), group_cols=["g"])
    assert {r["g"]: r["hll_regs"] for r in twice.collect()} == m


@pytest.mark.parametrize("n_distinct", [40, 5_000])  # LC branch / raw branch
def test_estimate_matches_duckdb_twin(spark, n_distinct):
    df = _toy(spark, 15_000, n_distinct)
    got = {
        r["g"]: r["approx_distinct"]
        for r in sk.hll_distinct(
            df, group_cols=["g"], value_col="v"
        ).collect()
    }
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    from polars_incremental_spark.queries import _sql_md5_long

    sql = sk.sql_hll_estimate(
        "t", group_col="g", value_expr=_sql_md5_long("v::VARCHAR")
    )
    want = {g: int(e) for g, e in con.execute(sql).fetchall()}
    assert got == want


def test_accuracy_within_bound(spark):
    true_n = 10_000
    df = _toy(spark, 40_000, true_n)
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    est = {
        r["g"]: r["approx_distinct"]
        for r in sk.hll_distinct(df, group_cols=["g"], value_col="v").collect()
    }
    for g, n in exact.items():
        rel = abs(est[g] - n) / n
        assert rel < 0.35, (g, n, est[g])  # 1.04/sqrt(64) ~ 13%; 0.35 = safe CI


def test_register_shape_and_bounds(spark):
    df = _toy(spark, 5_000, 800)
    regs = sk.hll_sketch(df, group_cols=["g"], value_col="v").collect()
    for r in regs:
        arr = r["hll_regs"]
        js = [x["j"] for x in arr]
        assert js == sorted(js) and len(set(js)) == len(js)
        assert all(0 <= x["j"] < 64 for x in arr)
        assert all(1 <= x["r"] <= 55 for x in arr)


def test_bad_b_rejected(spark):
    df = _toy(spark, 100, 10)
    with pytest.raises(ValueError):
        sk.hll_sketch(df, group_cols=["g"], value_col="v", b=2)


def test_cumulative_equals_prefix_union(spark):
    """hll_cumulative(k) must equal a direct sketch of batches 0..k."""
    df = _toy(spark, 9_000, 1_500).withColumn(
        "b", F.pmod(F.xxhash64("v"), F.lit(4)).cast("int")
    )
    per_batch = sk.hll_sketch(df, group_cols=["b"], value_col="v")
    cum = {
        r["b"]: r["hll_regs"]
        for r in sk.hll_cumulative(per_batch, order_col="b").collect()
    }
    for k in range(4):
        direct = sk.hll_sketch(
            df.filter(F.col("b") <= k).select(F.lit("all").alias("g"), "v"),
            group_cols=["g"],
            value_col="v",
        ).collect()[0]["hll_regs"]
        assert cum[k] == direct, k


# --- persisted index store ------------------------------------------------


def test_hll_index_fold_read_replay_compact(spark, tmp_path):
    idx = str(tmp_path / "hll_idx")
    df = _toy(spark, 12_000, 2_000)
    batches = [
        df.filter(F.pmod(F.xxhash64("v"), F.lit(3)) == i) for i in range(3)
    ]
    for i, b in enumerate(batches):
        assert sk.update_hll_index(
            b, idx, group_cols=["g"], value_col="v", batch_id=i
        )
    # replayed batch id is a no-op
    assert not sk.update_hll_index(
        batches[1], idx, group_cols=["g"], value_col="v", batch_id=1
    )
    merged, meta = sk.read_hll_index(spark, idx)
    assert meta["b"] == 6
    direct = sk.hll_sketch(df, group_cols=["g"], value_col="v")
    assert {r["g"]: r["hll_regs"] for r in merged.collect()} == {
        r["g"]: r["hll_regs"] for r in direct.collect()
    }
    est_before = {
        r["g"]: r["approx_distinct"]
        for r in sk.hll_index_distinct(spark, idx).collect()
    }
    assert sk.compact_hll_index(spark, idx) == 3
    assert sk.compact_hll_index(spark, idx) == 0  # already one dir
    est_after = {
        r["g"]: r["approx_distinct"]
        for r in sk.hll_index_distinct(spark, idx).collect()
    }
    assert est_before == est_after


def test_hll_index_double_fold_is_harmless(spark, tmp_path):
    """The HLL-specific guarantee: even if batch accounting were bypassed
    (distinct batch ids, same data), register max() absorbs the replay —
    unlike the CMS store, where a double fold doubles counts."""
    idx = str(tmp_path / "hll_idx2")
    df = _toy(spark, 6_000, 900)
    assert sk.update_hll_index(df, idx, group_cols=["g"], value_col="v", batch_id=0)
    assert sk.update_hll_index(df, idx, group_cols=["g"], value_col="v", batch_id=1)
    merged, _ = sk.read_hll_index(spark, idx)
    direct = sk.hll_sketch(df, group_cols=["g"], value_col="v")
    assert {r["g"]: r["hll_regs"] for r in merged.collect()} == {
        r["g"]: r["hll_regs"] for r in direct.collect()
    }


def test_hll_index_content_addressed_adhoc(spark, tmp_path):
    idx = str(tmp_path / "hll_idx3")
    df = _toy(spark, 3_000, 500)
    assert sk.update_hll_index(df, idx, group_cols=["g"], value_col="v")
    # identical ad-hoc batch -> same content digest -> refused
    assert not sk.update_hll_index(df, idx, group_cols=["g"], value_col="v")


def test_hll_index_meta_mismatch_rejected(spark, tmp_path):
    idx = str(tmp_path / "hll_idx4")
    df = _toy(spark, 1_000, 100)
    assert sk.update_hll_index(df, idx, group_cols=["g"], value_col="v", b=6)
    with pytest.raises(ValueError, match="refusing update"):
        sk.update_hll_index(df, idx, group_cols=["g"], value_col="v", b=5)
