"""Round-6 regression tests for the three advisor-reported Delta DML defects.

1. update_where CDF postimage: a SET that falsifies its own WHERE predicate
   (``UPDATE SET x=0 WHERE x=1``) must still emit update_postimage rows —
   the match flag has to be computed against PRE-update values.
2. restore_table_fallback after a deletion-vector DELETE: the DV changes an
   add action in place under the same path, so a path-only snapshot diff
   reports success without resurrecting the deleted rows.
3. merge_into with NULL merge keys: real Delta's ``ON t.k = s.k`` is
   null-unsafe in BOTH directions — a NULL-key source row never matches and
   is inserted exactly once.

Reference parity: sinks/delta.py in HamiltonCulik/polars-incremental
delegates these semantics to delta-rs; this jar-less writer must match them.
"""

from pyspark.sql import functions as F

from polars_incremental_spark.checkpoints.delta import DeltaLog
from polars_incremental_spark.sinks.delta import (
    delete_rows,
    read_table,
    restore_table,
    update_rows,
    write_table,
)
from polars_incremental_spark.sinks.deltalog import merge_into


def _cdc_rows(spark, path):
    log = DeltaLog(path)
    out = []
    for v in log.versions():
        for action in log.actions(v):
            if "cdc" in action:
                for r in spark.read.parquet(
                    log.abs_path(action["cdc"]["path"])
                ).collect():
                    out.append(r.asDict())
    return out


def test_update_cdf_postimage_when_set_falsifies_predicate(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(
        spark.createDataFrame([(1, 10), (2, 10), (3, 99)], "id long, x long"),
        path,
    )
    # SET modifies the predicate column: post-update rows no longer satisfy
    # the WHERE, so a post-hoc re-evaluation of the predicate finds nothing
    res = update_rows(spark, path, "x = 10", {"x": "0"}, write_cdf=True)
    assert res["rows_updated"] == 2
    cdc = _cdc_rows(spark, path)
    pre = sorted(r["id"] for r in cdc if r["_change_type"] == "update_preimage")
    post = sorted(r["id"] for r in cdc if r["_change_type"] == "update_postimage")
    assert pre == [1, 2]
    assert post == [1, 2], "postimage rows lost when SET falsifies the predicate"
    post_vals = {r["id"]: r["x"] for r in cdc if r["_change_type"] == "update_postimage"}
    assert post_vals == {1: 0, 2: 0}
    # untouched row is absent from the change feed
    assert all(r["id"] != 3 for r in cdc)


def test_restore_resurrects_dv_deleted_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(
        spark.range(10).select(F.col("id").alias("x")).coalesce(1), path
    )
    log = DeltaLog(path)
    v0 = log.latest_version()
    res = delete_rows(spark, path, "x < 3", dv_max_rows_per_file=100)
    assert read_table(spark, path).count() == 7
    # the DV delete must have kept the data file path stable (in-place add
    # rewrite) — otherwise this test isn't exercising the path-diff blind spot
    paths_before = {a["path"] for a in log.snapshot_files(v0)}
    paths_after = {a["path"] for a in log.snapshot_files(log.latest_version())}
    assert paths_before == paths_after, f"expected DV path ({res}), got rewrite"
    out = restore_table(path, version=v0)
    assert out["n_files_added"] >= 1, "restore must re-add the pre-DV action"
    restored = read_table(spark, path)
    assert restored.count() == 10, "DV-deleted rows not resurrected by RESTORE"
    assert sorted(r["x"] for r in restored.collect()) == list(range(10))


def test_restore_roundtrips_back_to_dv_state(spark, tmp_path):
    # restoring FORWARD again (to the post-delete version) must re-apply the DV
    path = str(tmp_path / "t")
    write_table(spark.range(6).select(F.col("id").alias("x")).coalesce(1), path)
    log = DeltaLog(path)
    v0 = log.latest_version()
    delete_rows(spark, path, "x >= 4", dv_max_rows_per_file=100)
    v1 = log.latest_version()
    restore_table(path, version=v0)
    assert read_table(spark, path).count() == 6
    restore_table(path, version=v1)
    assert read_table(spark, path).count() == 4


def test_extract_features_entropy_and_histogram_slice(spark):
    # entropy left the driver oracle (float transcendental) — pin it here
    # against a reference computation, alongside the integer-exact companions
    import math
    from collections import Counter

    from polars_incremental_spark.functions.multimodal import extract_features

    payloads = [b"aaaa", b"abab", bytes(range(256)), b"", "héllo".encode()]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r.asDict() for r in extract_features(df).collect()}
    for i, p in enumerate(payloads):
        c = Counter(p)
        n = len(p)
        exp_entropy = (
            round(-sum((v / n) * math.log2(v / n) for v in c.values()), 6)
            if n else 0.0
        )
        assert got[i]["n_bytes"] == n
        assert abs(got[i]["byte_entropy"] - exp_entropy) < 1e-9, (i, p)
        assert got[i]["distinct_bytes"] == len(c)
        assert got[i]["mode_count"] == (max(c.values()) if c else 0)
        assert got[i]["byte_sum"] == sum(p)
        assert got[i]["head_hex"] == p[:8].hex()


def test_iterative_ops_identical_under_reliable_checkpoint(spark, tmp_path):
    # cluster mode: reliable checkpoint() must give bit-identical results to
    # the default localCheckpoint() (only the storage of the cut differs)
    from polars_incremental_spark.functions.dedup import connected_components
    from polars_incremental_spark.functions.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (6, 6), (2, 4)],
        "src long, dst long",
    )
    sym = edges.union(edges.selectExpr("dst as src", "src as dst")).distinct()
    ckpt = str(tmp_path / "reliable")

    pr_local = sorted(map(tuple, pagerank(sym, iterations=3).collect()))
    pr_rel = sorted(
        map(tuple, pagerank(sym, iterations=3, checkpoint_dir=ckpt).collect())
    )
    assert pr_local == pr_rel and len(pr_local) == 6

    e2 = edges.selectExpr("src as id_a", "dst as id_b")
    cc_local = sorted(map(tuple, connected_components(e2).collect()))
    cc_rel = sorted(
        map(tuple, connected_components(e2, checkpoint_dir=ckpt).collect())
    )
    assert cc_local == cc_rel and len(cc_local) == 6
    # the reliable run actually wrote checkpoint data
    import os

    assert any(os.scandir(ckpt)), "no reliable checkpoint files written"


def test_merge_null_key_inserts_once_never_matches(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(
        spark.createDataFrame(
            [(1, "a"), (None, "keep")], "id long, s string"
        ),
        path,
    )
    source = spark.createDataFrame(
        [(None, "new"), (2, "b"), (1, "A")], "id long, s string"
    )
    res = merge_into(
        spark,
        path,
        source,
        keys=["id"],
        when_matched_update={"s": "src.s"},
        when_not_matched_insert=True,
    )
    rows = sorted(
        ((r["id"], r["s"]) for r in read_table(spark, path).collect()),
        key=lambda t: (t[0] is None, t[0], t[1]),
    )
    # NULL-key target row untouched; NULL-key source row inserted exactly once
    assert rows == [
        (1, "A"),
        (2, "b"),
        (None, "keep"),
        (None, "new"),
    ], f"merge result wrong: {rows} ({res})"


def test_restore_reverts_table_metadata_not_just_schema(spark, tmp_path):
    """Real Delta's RestoreTableCommand restores the target snapshot's FULL
    metadata — a CHECK constraint added after the target version must not
    survive the restore (the old path compared schemaString only)."""
    from polars_incremental_spark.checkpoints.delta import DeltaLog
    from polars_incremental_spark.sinks.deltalog import (
        add_check_constraint,
        write_delta_fallback,
    )

    path = str(tmp_path / "t")
    write_table(spark.range(5).selectExpr("id AS x"), path)
    log = DeltaLog(path)
    v0 = log.latest_version()
    add_check_constraint(spark, path, "x_nonneg", "x >= 0")
    restore_table(path, version=v0)
    cfg = (log.table_metadata() or {}).get("configuration") or {}
    assert not any("constraint" in k.lower() for k in cfg)
    # a previously-violating append now succeeds, like real Delta
    write_delta_fallback(
        spark.createDataFrame([(-1,)], "x long"), path, mode="append"
    )
    assert read_table(spark, path).count() == 6
