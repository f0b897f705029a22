"""Round-11 fixes, pinned.

1. cache.py — ``scoped_persist`` is idempotent on the plan (no double
   persist / double registration; "Asked to cache already cached data"
   WARNs stop masking real double-persist bugs) and
   ``operator_cache_scope`` tracks membership by registration token, so
   a mid-scope ``release_operator_caches`` or two interleaved scopes on
   one session can no longer release another scope's live caches or let
   late registrations escape (ADVICE r10 cache.py:97).
2. sketches.py — the content-addressed ("adhoc") fold-id digest scheme
   is versioned in the index manifest; content-addressed updates refuse
   a manifest stamped with a different/unknown scheme instead of
   silently re-folding batches whose legacy ids no longer match (the
   CMS double-count ADVICE r10 flagged); ``update_hll_index`` rejects
   ``b`` above the estimator cap at WRITE time, not first read.
3. dedup.py — ``minhash_lsh_pairs`` / ``containment_pairs`` validate
   ``0 < threshold <= 1`` like ``prefix_filter_pairs`` does, making the
   "zero-overlap candidates are structurally excluded" docstring claim
   true at threshold=0.
4. tools/bench_compare.py — the parsed:null tail-scrape no longer turns
   the top-level ``canary_s`` field into a phantom query; it feeds the
   normalization instead.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.cache import (
    operator_cache_scope,
    release_operator_caches,
    scoped_cache_count,
    scoped_persist,
)


# ---------------------------------------------------------------------------
# cache.py
# ---------------------------------------------------------------------------


def test_scoped_persist_is_idempotent_on_plan(spark):
    release_operator_caches(spark)
    df = spark.range(50).withColumn("x", F.col("id") * 2)
    a = scoped_persist(df)
    assert scoped_cache_count(spark) == 1
    # same object and an equal-plan sibling: neither re-persists nor
    # re-registers — exactly one owner per plan
    b = scoped_persist(a)
    assert b is a
    assert scoped_cache_count(spark) == 1
    release_operator_caches(spark)


def test_scoped_persist_leaves_user_persisted_frames_alone(spark):
    release_operator_caches(spark)
    user = spark.range(40).withColumn("y", F.col("id") + 1).persist()
    user.count()
    got = scoped_persist(user)
    assert got is user
    assert scoped_cache_count(spark) == 0  # not registered -> never released
    release_operator_caches(spark)
    assert user.storageLevel.useMemory is True  # user cache survived
    user.unpersist(blocking=True)


def test_release_inside_scope_does_not_desync_membership(spark):
    """A mid-scope release used to shift the index-based 'before' slice;
    frames registered AFTER it could escape exit-release."""
    release_operator_caches(spark)
    pre = scoped_persist(spark.range(11))
    pre.count()
    with operator_cache_scope(spark):
        early = scoped_persist(spark.range(22))
        early.count()
        release_operator_caches(spark)  # releases pre AND early
        late = scoped_persist(spark.range(33))
        late.count()
        assert scoped_cache_count(spark) == 1
    # exit must release `late` (registered during the scope, still present)
    assert scoped_cache_count(spark) == 0
    assert late.storageLevel.useMemory is False
    assert early.storageLevel.useMemory is False
    assert pre.storageLevel.useMemory is False


def test_interleaved_scopes_release_only_their_own(spark):
    """Two Pipelines sharing a session = two concurrent scopes; each exit
    must release only registrations made during itself."""
    release_operator_caches(spark)
    outer_cm = operator_cache_scope(spark)
    outer_cm.__enter__()
    a = scoped_persist(spark.range(101))
    a.count()
    inner_cm = operator_cache_scope(spark)
    inner_cm.__enter__()
    b = scoped_persist(spark.range(202))
    b.count()
    # exit the OUTER scope first (interleaved, not nested, teardown order)
    outer_cm.__exit__(None, None, None)
    assert a.storageLevel.useMemory is False
    # b was registered during outer's lifetime too — outer releasing it is
    # acceptable only if inner then has nothing stale; with token tracking
    # outer releases both a and b (both appeared after its snapshot), and
    # inner's exit finds its token already gone: a no-op, never a double
    # release of someone else's NEW frames.
    c = scoped_persist(spark.range(303))
    c.count()
    inner_cm.__exit__(None, None, None)
    assert c.storageLevel.useMemory is False
    assert scoped_cache_count(spark) == 0


# ---------------------------------------------------------------------------
# sketches.py — digest-scheme versioning + write-time b cap
# ---------------------------------------------------------------------------


def _manifest(path):
    with open(f"{path}/MANIFEST.json") as fh:
        return json.load(fh)


def _write_manifest(path, m):
    with open(f"{path}/MANIFEST.json", "w") as fh:
        json.dump(m, fh)


def test_cms_manifest_stamps_digest_scheme(spark, tmp_path):
    from polars_incremental_spark.functions.sketches import update_cms_index

    idx = str(tmp_path / "cms")
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    assert update_cms_index(df, idx, key_col="k") is True
    m = _manifest(idx)
    assert m["digest"] == "md5-60"
    assert any(f.startswith("adhoc_") for f in m["folded"])
    # identical content replays as a no-op under the stamped scheme
    assert update_cms_index(df, idx, key_col="k") is False


def test_cms_legacy_adhoc_manifest_refuses_content_addressed_update(
    spark, tmp_path
):
    from polars_incremental_spark.functions.sketches import update_cms_index

    idx = str(tmp_path / "cms")
    df = spark.range(60).select(F.col("id").cast("string").alias("k"))
    update_cms_index(df, idx, key_col="k")
    # simulate a pre-versioning index holding old-scheme adhoc ids
    m = _manifest(idx)
    m.pop("digest")
    m["folded"] = ["adhoc_ffffffffdeadbeef_100"]  # sign-extended 32-bit-era id
    _write_manifest(idx, m)
    with pytest.raises(ValueError, match="digest scheme"):
        update_cms_index(df, idx, key_col="k")
    # explicit batch ids are scheme-independent and still allowed
    assert update_cms_index(df, idx, key_col="k", batch_id=7) is True


def test_cms_unversioned_md5_shaped_manifest_upgrades_in_place(
    spark, tmp_path
):
    """An unversioned manifest whose adhoc ids are md5-60-shaped was
    written by the identical digest expression (it shipped one round
    before the version key) — replay detection against it is exact, so
    the update proceeds and stamps the scheme."""
    from polars_incremental_spark.functions.sketches import update_cms_index

    idx = str(tmp_path / "cms")
    df = spark.range(60).select(F.col("id").cast("string").alias("k"))
    update_cms_index(df, idx, key_col="k")
    m = _manifest(idx)
    m.pop("digest")  # simulate the round-10 (pre-version-key) writer
    _write_manifest(idx, m)
    # identical content still replays as a no-op (ids match exactly);
    # a no-op never rewrites the manifest, so the stamp lands with the
    # next REAL fold
    assert update_cms_index(df, idx, key_col="k") is False
    df2 = spark.range(60, 120).select(F.col("id").cast("string").alias("k"))
    assert update_cms_index(df2, idx, key_col="k") is True
    assert _manifest(idx)["digest"] == "md5-60"


def test_cms_legacy_manifest_without_adhoc_ids_upgrades_in_place(
    spark, tmp_path
):
    from polars_incremental_spark.functions.sketches import update_cms_index

    idx = str(tmp_path / "cms")
    df = spark.range(60).select(F.col("id").cast("string").alias("k"))
    update_cms_index(df, idx, key_col="k", batch_id=1)
    m = _manifest(idx)
    m.pop("digest")
    _write_manifest(idx, m)
    # nothing to collide with -> allowed, and the manifest is re-stamped
    assert update_cms_index(df, idx, key_col="k") is True
    assert _manifest(idx)["digest"] == "md5-60"


def test_hll_legacy_adhoc_manifest_refuses_content_addressed_update(
    spark, tmp_path
):
    from polars_incremental_spark.functions.sketches import update_hll_index

    idx = str(tmp_path / "hll")
    df = spark.range(80).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    update_hll_index(df, idx, group_cols=["g"], value_col="v")
    assert _manifest(idx)["digest"] == "md5-60"
    m = _manifest(idx)
    m.pop("digest")
    m["folded"] = ["adhoc_000000000badc0de_50"]
    _write_manifest(idx, m)
    with pytest.raises(ValueError, match="digest scheme"):
        update_hll_index(df, idx, group_cols=["g"], value_col="v")
    assert update_hll_index(
        df, idx, group_cols=["g"], value_col="v", batch_id=3
    ) is True


def test_update_hll_index_rejects_unestimatable_b_at_write_time(
    spark, tmp_path
):
    from polars_incremental_spark.functions.sketches import update_hll_index

    df = spark.range(10).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="b=13"):
        update_hll_index(
            df, str(tmp_path / "hll13"), group_cols=["g"], value_col="v", b=13
        )


# ---------------------------------------------------------------------------
# dedup.py — threshold validation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bad", [0.0, -0.1, 1.5])
def test_minhash_lsh_pairs_validates_threshold(spark, bad):
    from polars_incremental_spark.functions.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="threshold"):
        minhash_lsh_pairs(docs, threshold=bad)


@pytest.mark.parametrize("bad", [0.0, -0.1, 1.5])
def test_containment_pairs_validates_threshold(spark, bad):
    from polars_incremental_spark.functions.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="threshold"):
        containment_pairs(docs, threshold=bad)


# ---------------------------------------------------------------------------
# tools/bench_compare.py — canary_s in the tail-scrape fallback
# ---------------------------------------------------------------------------


def _run_compare(base, cur, tmp_path):
    bp, cp = tmp_path / "base.json", tmp_path / "cur.json"
    bp.write_text(json.dumps(base))
    cp.write_text(json.dumps(cur))
    return subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(bp), str(cp)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )


def test_tail_scrape_lifts_canary_instead_of_phantom_query(tmp_path):
    base = {"queries": {"q1": 1.0, "q2": 2.0}, "canary_s": 1.0}
    # parsed:null driver wrapper whose tail carries canary_s: a pure-box
    # 2x slowdown that the lifted canary must normalize away
    cur = {
        "parsed": None,
        "tail": '{"queries":{"q1":2.0,"q2":4.0},"canary_s":2.0,"n_queries":2}',
    }
    r = _run_compare(base, cur, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "canary_s" not in [
        line.split()[0] for line in r.stdout.splitlines() if line.strip()
    ], f"phantom canary_s query in output:\n{r.stdout}"
    assert "box ratio 2.000" in r.stdout
