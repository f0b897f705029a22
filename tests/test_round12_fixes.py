"""Round-12 fixes, each pinned by the round-11 ADVICE/verdict item it
closes:

- expired-prior-snapshot during CDF reconstruction raises
  ``ChangeDataFeedError`` (the documented taxonomy), not the internal
  ``PlanningError`` that ``snapshot_files`` signals (ADVICE medium);
- row-tracked update detection uses null-safe struct equality on
  map-free schemas, so semantically-equal payloads (``-0.0`` vs ``0.0``)
  no longer emit spurious update image pairs (ADVICE low);
- ``scoped_persist`` warns when an already-cached plan is asked for a
  different storage level instead of silently ignoring it (ADVICE low);
- ``_RddReleaseHandle`` reads materialization from the sticky JVM
  ``isCheckpointed()`` flag, so a kept checkpoint whose blocks were
  evicted AFTER materialization still releases its stale rounds
  (ADVICE low);
- kept final checkpoints release at the NEXT release point — no
  cross-suite accumulation (verdict Next #3).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.cache import release_operator_caches
from polars_incremental_spark.errors import ChangeDataFeedError
from polars_incremental_spark.sinks.deltalog import (
    delete_where,
    read_change_feed,
    update_where,
    write_delta_fallback,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def n_persisted(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


# --------------------------------------------------------- ADVICE medium
def test_expired_prior_snapshot_raises_cdf_error(spark, tmp_path):
    """Reconstruction needs the v-1 snapshot; when the log can no longer
    replay it (a JSON commit below v-1 was cleaned), ``snapshot_files``
    raises PlanningError — the reconstruction path must re-raise under
    the CDF taxonomy as its docstring promises, so callers catching
    ChangeDataFeedError (e.g. the MV-over-CDF-less example) see the
    documented fail-closed error, not an internal planner one."""
    p = str(tmp_path / "t")
    schema = "k long, g string, x double"
    write_delta_fallback(spark.createDataFrame([(1, "a", 1.0)], schema), p)
    write_delta_fallback(
        spark.createDataFrame([(2, "b", 2.0)], schema), p, mode="append"
    )
    write_delta_fallback(
        spark.createDataFrame([(3, "c", 3.0)], schema), p, mode="append"
    )
    delete_where(spark, p, "k = 2")  # v3, CDF-less remove
    # simulate external log cleanup losing a middle commit: v2 (snapshot
    # v2 = the delete's prior state) is no longer reconstructible
    os.unlink(os.path.join(p, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ChangeDataFeedError, match="expired"):
        read_change_feed(
            spark, p, starting_version=3, reconstruct_removes=True
        ).collect()


# ------------------------------------------------------------ ADVICE low
def test_row_tracked_no_spurious_update_pair_for_negative_zero(spark, tmp_path):
    """-0.0 -> 0.0 is a semantic no-op under Spark comparison semantics;
    the pre-round-12 to_json digest rendered them differently and emitted
    a spurious update_preimage/update_postimage pair.  Null-safe struct
    equality must yield an EMPTY feed for the commit (the carried row
    cancels by row identity)."""
    from polars_incremental_spark.sinks.deltalog import enable_row_tracking

    p = str(tmp_path / "nz")
    write_delta_fallback(
        spark.createDataFrame([(1, -0.0), (2, 5.0)], "k long, x double"), p
    )
    enable_row_tracking(p)
    v = update_where(spark, p, "k = 1", {"x": "0.0"})["version"]
    rec = read_change_feed(
        spark, p, starting_version=v, reconstruct_removes=True
    )
    assert rec.count() == 0
    # a REAL change on the same table still surfaces as a paired update
    v2 = update_where(spark, p, "k = 2", {"x": "6.0"})["version"]
    rec2 = read_change_feed(
        spark, p, starting_version=v2, reconstruct_removes=True
    )
    rows = sorted(
        (r["_change_type"], r["k"], r["x"])
        for r in rec2.select("_change_type", "k", "x").collect()
    )
    assert rows == [
        ("update_postimage", 2, 6.0),
        ("update_preimage", 2, 5.0),
    ]


def test_row_tracked_null_payloads_compare_null_safe(spark, tmp_path):
    """eqNullSafe semantics: NULL==NULL must not produce update pairs for
    carried rows with NULL fields, and NULL -> value must."""
    from polars_incremental_spark.sinks.deltalog import enable_row_tracking

    p = str(tmp_path / "nn")
    write_delta_fallback(
        spark.createDataFrame(
            [(1, None), (2, "b")], "k long, g string"
        ),
        p,
    )
    enable_row_tracking(p)
    v = update_where(spark, p, "k = 2", {"g": "'bb'"})["version"]
    rec = read_change_feed(
        spark, p, starting_version=v, reconstruct_removes=True
    )
    rows = sorted(
        (r["_change_type"], r["k"])
        for r in rec.select("_change_type", "k").collect()
    )
    # only k=2 changed; the NULL-bearing carried row must not pair up
    assert rows == [("update_postimage", 2), ("update_preimage", 2)]


# ------------------------------------------------------------ ADVICE low
def test_scoped_persist_storage_level_mismatch_warns(spark):
    import warnings

    from pyspark import StorageLevel

    from polars_incremental_spark.cache import scoped_persist

    release_operator_caches(spark)
    df = scoped_persist(spark.range(100), StorageLevel.MEMORY_ONLY)
    df.count()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = scoped_persist(df, StorageLevel.DISK_ONLY)
    assert out is df  # unchanged frame, first owner's level stands
    assert df.storageLevel == StorageLevel.MEMORY_ONLY
    assert any("already cached" in str(w.message) for w in caught)
    # same level asked again: idempotent AND silent
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        scoped_persist(df, StorageLevel.MEMORY_ONLY)
    assert not caught2
    release_operator_caches(spark)


# ------------------------------------------------------------ ADVICE low
def test_release_handle_fires_after_materialized_kept_was_evicted(spark):
    """Materialization is sticky (isCheckpointed), not inferred from
    cached partitions: evicting a MATERIALIZED kept checkpoint's blocks
    must not wedge the stale-round release into deferring forever."""
    from polars_incremental_spark.functions.iterutils import (
        _checkpointed_rdd_id,
        _RddReleaseHandle,
        persistent_rdd_ids,
        unpersist_rdd_ids,
    )

    release_operator_caches(spark)
    stale = spark.range(0, 10000).localCheckpoint(eager=True)
    kept = spark.range(0, 10000).select((F.col("id") * 2).alias("id"))
    kept = kept.localCheckpoint(eager=True)
    sid, kid = _checkpointed_rdd_id(stale), _checkpointed_rdd_id(kept)
    assert sid is not None and kid is not None
    jsc = spark.sparkContext._jsc.sc()
    jvm = spark.sparkContext._jvm

    def block0_exists(rid: int) -> bool:
        bid = jvm.org.apache.spark.storage.RDDBlockId(int(rid), 0)
        return bool(jsc.env().blockManager().master().contains(bid))

    # evict the kept checkpoint's blocks WITHOUT unregistering it — the
    # state the pre-fix cached-partitions probe misread as "never
    # materialized" (note getRDDStorageInfo is listener-store-backed and
    # does NOT see this removal, which is exactly why the probe was the
    # wrong signal; assert at block level instead)
    jsc.env().blockManager().master().removeRdd(int(kid), True)
    assert not block0_exists(kid) and kid in persistent_rdd_ids(spark)
    assert block0_exists(sid)
    handle = _RddReleaseHandle(
        spark, {sid}, guard_ids={kid}, release_guards_next=False
    )
    handle.unpersist(blocking=True)
    assert not block0_exists(sid), "stale round not released"
    unpersist_rdd_ids(spark, persistent_rdd_ids(spark), blocking=True)


def test_unmaterialized_guard_still_defers_and_is_not_lost(spark):
    """A LAZY kept checkpoint defers the release — and the deferred
    handle re-registers for the next release point instead of vanishing
    (pre-round-12, a deferred release was lost forever)."""
    from polars_incremental_spark.functions.iterutils import (
        _checkpointed_rdd_id,
        _RddReleaseHandle,
        persistent_rdd_ids,
        unpersist_rdd_ids,
    )

    release_operator_caches(spark)
    stale = spark.range(0, 10000).localCheckpoint(eager=True)
    kept = spark.range(0, 10000).localCheckpoint(eager=False)
    sid, kid = _checkpointed_rdd_id(stale), _checkpointed_rdd_id(kept)
    handle = _RddReleaseHandle(
        spark, {sid}, guard_ids={kid}, release_guards_next=False
    )
    handle.unpersist()  # kept is lazy+unmaterialized: defers, re-registers
    jsc = spark.sparkContext._jsc.sc()
    cached = {
        int(i.id())
        for i in jsc.getRDDStorageInfo()
        if i.numCachedPartitions() > 0
    }
    assert sid in cached, "released despite unmaterialized guard"
    kept.count()  # materialize the kept checkpoint
    # the re-registered handle fires at the next release point
    release_operator_caches(spark, blocking=True)
    cached2 = {
        int(i.id())
        for i in jsc.getRDDStorageInfo()
        if i.numCachedPartitions() > 0
    }
    assert sid not in cached2, "deferred release was lost"
    unpersist_rdd_ids(spark, persistent_rdd_ids(spark), blocking=True)


# ------------------------------------------------------- verdict Next #3
def test_kept_checkpoint_released_at_next_release_point(spark):
    """After an iterative query's OWN release its returned plan stays
    re-executable (kept checkpoint alive); the NEXT release point frees
    the kept blocks — late-suite queries no longer sit on accumulated
    final checkpoints (round-11 verdict: 12 RDDs / 20.8 MB at u20)."""
    from polars_incremental_spark.functions.graph import pagerank

    release_operator_caches(spark, blocking=True)
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    base = n_persisted(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1)], ["src", "dst"]
    )
    ranks = pagerank(edges, iterations=4)
    ranks.write.format("noop").mode("overwrite").save()
    release_operator_caches(spark, blocking=True)  # owning release point
    assert ranks.count() == 3  # kept checkpoint still serves the plan
    mid = n_persisted(spark)
    assert mid >= base + 1  # the kept checkpoint is the only survivor
    release_operator_caches(spark, blocking=True)  # NEXT release point
    assert n_persisted(spark) == base, (
        "kept final checkpoint survived the next release point"
    )


# ------------------------------------------------------- verdict Next #5
def test_keys_pairing_matches_cdf_twin_without_row_tracking(spark, tmp_path):
    """keys=['k'] on a plain (no CDF, no row tracking) table restores
    exactly-paired update images — byte-for-byte the rows the write_cdf
    twin emits."""
    rows = [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)]
    a, b = str(tmp_path / "with_cdf"), str(tmp_path / "plain")
    for p in (a, b):
        write_delta_fallback(
            spark.createDataFrame(rows, "k long, g string, x double"), p
        )
    update_where(spark, a, "g = 'a'", {"x": "x + 5"}, write_cdf=True)
    v = update_where(spark, b, "g = 'a'", {"x": "x + 5"})["version"]
    cdf = read_change_feed(spark, a, starting_version=1)
    rec = read_change_feed(
        spark, b, starting_version=v, reconstruct_removes=True, keys=["k"]
    )

    def typed(df):
        return sorted(
            (r["_change_type"], r["k"], r["g"], r["x"])
            for r in df.select("_change_type", "k", "g", "x").collect()
        )

    assert typed(rec) == typed(cdf)
    assert {t for t, *_ in typed(rec)} == {
        "update_preimage",
        "update_postimage",
    }
    # deletes stay one-sided under the same keys
    delete_where(spark, a, "k = 2", write_cdf=True)
    v2 = delete_where(spark, b, "k = 2")["version"]
    rec2 = read_change_feed(
        spark, b, starting_version=v2, reconstruct_removes=True, keys=["k"]
    )
    assert typed(rec2) == [("delete", 2, "b", 20.0)]


def test_keys_duplicate_key_fails_at_materialization(spark, tmp_path):
    """Two diff rows sharing a key value on one side = the table is not
    keyed by `keys`; pairing is ambiguous and the read fails closed at
    materialization (the frame is lazy by contract)."""
    p = str(tmp_path / "dup")
    write_delta_fallback(
        spark.createDataFrame(
            [(1, "a", 1.0), (1, "b", 2.0), (2, "c", 3.0)],
            "k long, g string, x double",
        ),
        p,
    )
    v = update_where(spark, p, "k = 1", {"x": "x + 10"})["version"]
    rec = read_change_feed(
        spark, p, starting_version=v, reconstruct_removes=True, keys=["k"]
    )
    with pytest.raises(Exception, match="not unique"):
        rec.collect()


def test_keys_validation_errors(spark, tmp_path):
    p = str(tmp_path / "t")
    write_delta_fallback(
        spark.createDataFrame([(1, "a", 1.0)], "k long, g string, x double"),
        p,
    )
    with pytest.raises(ValueError, match="reconstruct_removes"):
        read_change_feed(spark, p, starting_version=0, keys=["k"])
    delete_where(spark, p, "k = 1")
    with pytest.raises(ValueError, match="not in table schema"):
        read_change_feed(
            spark,
            p,
            starting_version=1,
            reconstruct_removes=True,
            keys=["nope"],
        )


def test_keys_composite_and_null_safe_pairing(spark, tmp_path):
    """Composite keys pair on ALL declared columns; NULL key values pair
    null-safely (SQL grouping), so a NULL-keyed row still emits an
    update pair rather than a spurious delete+insert."""
    p = str(tmp_path / "ck")
    write_delta_fallback(
        spark.createDataFrame(
            [(1, "a", 1.0), (1, "b", 2.0), (None, "z", 9.0)],
            "k long, g string, x double",
        ),
        p,
    )
    v = update_where(spark, p, "x < 100", {"x": "x + 1"})["version"]
    rec = read_change_feed(
        spark,
        p,
        starting_version=v,
        reconstruct_removes=True,
        keys=["k", "g"],
    )
    rows = sorted(
        (
            (r["_change_type"], r["k"], r["g"], r["x"])
            for r in rec.select("_change_type", "k", "g", "x").collect()
        ),
        key=repr,
    )
    assert rows == sorted(
        [
            ("update_postimage", None, "z", 10.0),
            ("update_postimage", 1, "a", 2.0),
            ("update_postimage", 1, "b", 3.0),
            ("update_preimage", None, "z", 9.0),
            ("update_preimage", 1, "a", 1.0),
            ("update_preimage", 1, "b", 2.0),
        ],
        key=repr,
    )
