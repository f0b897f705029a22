"""CDF reconstruction for remove-bearing commits WITHOUT change-data
files (round 11): ``read_change_feed(reconstruct_removes=True)`` diffs
each such commit's own touched files — removed files as they stood in
the prior snapshot (DVs applied) against the files the commit added —
yielding exact bag-level deletes/inserts.  Updates surface as
delete+insert (pairing images needs row tracking), which is
sign-equivalent for the counting consumers (the MV layer) that opt in.

The DEFAULT contract is unchanged: without the flag, a data remove with
no change files still raises ChangeDataFeedError, matching delta-spark's
``table_changes``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.errors import ChangeDataFeedError
from polars_incremental_spark.sinks.deltalog import (
    delete_where,
    read_change_feed,
    read_delta_fallback,
    set_table_properties,
    update_where,
    write_delta_fallback,
)


def _base(spark, path, rows=None):
    rows = rows or [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 40.0)]
    write_delta_fallback(
        spark.createDataFrame(rows, "k long, g string, x double"), path
    )
    return path


def _signed_bag(df):
    """{(payload...): net_sign} — the representation every counting
    consumer reduces the feed to; CDF and reconstruction must agree on it."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    rows = (
        df.withColumn("_s", sign)
        .groupBy("k", "g", "x")
        .agg(F.sum("_s").alias("net"))
        .filter(F.col("net") != 0)
        .collect()
    )
    return {(r["k"], r["g"], r["x"]): r["net"] for r in rows}


def test_default_still_raises_on_cdf_less_remove(spark, tmp_path):
    p = _base(spark, str(tmp_path / "t"))
    delete_where(spark, p, "k = 2")
    with pytest.raises(ChangeDataFeedError, match="change-data"):
        read_change_feed(spark, p, starting_version=1)


def test_reconstructed_delete_matches_cdf_twin(spark, tmp_path):
    a = _base(spark, str(tmp_path / "with_cdf"))
    b = _base(spark, str(tmp_path / "without_cdf"))
    delete_where(spark, a, "g = 'a'", write_cdf=True)
    delete_where(spark, b, "g = 'a'")
    cdf = read_change_feed(spark, a, starting_version=1)
    rec = read_change_feed(spark, b, starting_version=1, reconstruct_removes=True)
    assert _signed_bag(cdf) == _signed_bag(rec)
    # reconstruction emits only delete/insert types with correct metadata
    types = {r["_change_type"] for r in rec.select("_change_type").collect()}
    assert types <= {"delete", "insert"}
    assert {r["_commit_version"] for r in rec.collect()} == {1}


def test_reconstructed_update_is_delete_plus_insert(spark, tmp_path):
    a = _base(spark, str(tmp_path / "with_cdf"))
    b = _base(spark, str(tmp_path / "without_cdf"))
    update_where(spark, a, "k = 3", {"x": "33.0"}, write_cdf=True)
    update_where(spark, b, "k = 3", {"x": "33.0"})
    cdf = read_change_feed(spark, a, starting_version=1)
    rec = read_change_feed(spark, b, starting_version=1, reconstruct_removes=True)
    # pre/postimage pairs and delete+insert pairs reduce identically
    assert _signed_bag(cdf) == _signed_bag(rec)
    bag = _signed_bag(rec)
    assert bag[(3, "a", 30.0)] == -1 and bag[(3, "a", 33.0)] == 1


def test_reconstructed_dv_delete(spark, tmp_path):
    """The deletion-vector route commits remove + re-add(same file, DV);
    old side applies the v-1 DV state, new side the merged DV."""
    p = _base(spark, str(tmp_path / "dv"))
    set_table_properties(p, {"delta.enableDeletionVectors": "true"})
    res = delete_where(spark, p, "k = 2")
    assert res["files_dv"] >= 1  # the DV route actually engaged
    rec = read_change_feed(
        spark, p, starting_version=res["version"],
        ending_version=res["version"], reconstruct_removes=True,
    )
    assert _signed_bag(rec) == {(2, "b", 20.0): -1}
    # second DV delete on the SAME file merges descriptors; the diff must
    # yield only the newly-deleted row, not re-delete k=2
    res2 = delete_where(spark, p, "k = 4")
    rec2 = read_change_feed(
        spark, p, starting_version=res2["version"],
        reconstruct_removes=True,
    )
    assert _signed_bag(rec2) == {(4, "c", 40.0): -1}


def test_whole_file_delete_reconstructs_as_pure_removes(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta_fallback(
        spark.createDataFrame([(1, "a", 1.0)], "k long, g string, x double"),
        p,
    )
    write_delta_fallback(
        spark.createDataFrame([(2, "b", 2.0)], "k long, g string, x double"),
        p,
        mode="append",
    )
    delete_where(spark, p, "g = 'b'")  # kills file 2 entirely: remove, no add
    rec = read_change_feed(spark, p, starting_version=2, reconstruct_removes=True)
    assert _signed_bag(rec) == {(2, "b", 2.0): -1}


def test_row_tracked_reconstruction_pairs_update_images(spark, tmp_path):
    """On a row-tracked table the diff joins on _row_id: full CDF
    fidelity — paired update_preimage/update_postimage, exactly what the
    write_cdf twin emits (same rows, same types)."""
    from polars_incremental_spark.sinks.deltalog import enable_row_tracking

    a = _base(spark, str(tmp_path / "with_cdf"))
    b = _base(spark, str(tmp_path / "without_cdf"))
    enable_row_tracking(b)
    v = update_where(spark, b, "k = 3", {"x": "33.0"})["version"]
    update_where(spark, a, "k = 3", {"x": "33.0"}, write_cdf=True)
    cdf = read_change_feed(spark, a, starting_version=1)
    rec = read_change_feed(
        spark, b, starting_version=v, reconstruct_removes=True
    )

    def typed_rows(df):
        return sorted(
            (r["_change_type"], r["k"], r["g"], r["x"])
            for r in df.select("_change_type", "k", "g", "x").collect()
        )

    assert typed_rows(rec) == typed_rows(cdf)
    assert {r[0] for r in typed_rows(rec)} == {
        "update_preimage",
        "update_postimage",
    }


def test_row_tracked_reconstruction_handles_map_columns(spark, tmp_path):
    """MAP payloads block the bag diff (set ops can't compare maps) but
    not the row-id join."""
    from polars_incremental_spark.sinks.deltalog import enable_row_tracking

    p = str(tmp_path / "m")
    write_delta_fallback(
        spark.createDataFrame(
            [(1, {"a": 1}), (2, {"b": 2})], "k long, props map<string,int>"
        ),
        p,
    )
    enable_row_tracking(p)
    v = delete_where(spark, p, "k = 2")["version"]
    rec = read_change_feed(spark, p, starting_version=v, reconstruct_removes=True)
    rows = rec.select("_change_type", "k").collect()
    assert [(r["_change_type"], r["k"]) for r in rows] == [("delete", 2)]


def test_vacuumed_removed_file_fails_closed(spark, tmp_path):
    p = _base(spark, str(tmp_path / "t"))
    delete_where(spark, p, "k = 1")
    from polars_incremental_spark.sinks.deltalog import vacuum_fallback

    vacuum_fallback(p, retention_hours=0.0)
    with pytest.raises(ChangeDataFeedError, match="vacuum"):
        read_change_feed(spark, p, starting_version=1, reconstruct_removes=True)


def test_agg_mv_refresh_over_cdf_less_dml(spark, tmp_path):
    """The MV layer opts in: refresh folds CDF-less deletes/updates and
    still lands exactly where a recompute would."""
    from polars_incremental_spark.mv import create_agg_mv, refresh_agg_mv

    base, mv = str(tmp_path / "b"), str(tmp_path / "mv")
    _base(spark, base)
    create_agg_mv(spark, base, mv, group_cols=["g"], sum_cols=["x"])
    delete_where(spark, base, "k = 1")  # NO write_cdf
    update_where(spark, base, "k = 4", {"x": "44.0"})  # NO write_cdf
    res = refresh_agg_mv(spark, base, mv)
    assert res["refreshed"]
    got = {
        (r["g"],): (r["cnt"], r["sum_x"])
        for r in read_delta_fallback(spark, mv).collect()
    }
    want = {
        (r["g"],): (r["cnt"], r["sum_x"])
        for r in read_delta_fallback(spark, base)
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("cnt"), F.sum("x").alias("sum_x"))
        .collect()
    }
    assert got == want


def test_join_mv_refresh_over_cdf_less_dml(spark, tmp_path):
    from polars_incremental_spark.mv import (
        create_join_mv,
        read_join_mv,
        refresh_join_mv,
    )

    lp, rp, mv = str(tmp_path / "l"), str(tmp_path / "r"), str(tmp_path / "j")
    write_delta_fallback(
        spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "k long, lval string"
        ),
        lp,
    )
    write_delta_fallback(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, rval double"),
        rp,
    )
    create_join_mv(spark, lp, rp, mv, on=["k"])
    delete_where(spark, lp, "lval = 'b'")  # NO write_cdf
    update_where(spark, rp, "k = 2", {"rval": "22.0"})  # NO write_cdf
    res = refresh_join_mv(spark, mv)
    assert res["refreshed"]
    got = sorted(
        tuple(r) for r in read_join_mv(spark, mv).select("k", "lval", "rval").collect()
    )
    want = sorted(
        tuple(r)
        for r in read_delta_fallback(spark, lp)
        .join(read_delta_fallback(spark, rp), "k")
        .select("k", "lval", "rval")
        .collect()
    )
    assert got == want
