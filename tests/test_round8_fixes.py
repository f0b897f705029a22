"""Round-8 fixes: candidate-volume guard for the exact pair-enumeration
operators (d17/d18), nested-timestamp MV digests, bench hardening."""

import pytest
from pyspark.sql import Row

from polars_incremental_spark.errors import CandidateVolumeError
from polars_incremental_spark.functions import dedup


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


# a corpus whose shingles all collide: N near-identical docs make every
# shingle's doc-freq ~N, so candidate volume ~N^2/2 per shingle
_CLONES = [(i, "the quick brown fox jumps over the lazy dog") for i in range(12)]


def test_prefix_filter_candidate_guard_trips(spark):
    """Σ df·(df-1)/2 over the prefix postings exceeds a tiny budget on a
    clone corpus — the guard must raise with the d6 escape hatch BEFORE
    the quadratic join runs."""
    df = _docs(spark, _CLONES)
    with pytest.raises(CandidateVolumeError, match="minhash_lsh_pairs"):
        dedup.prefix_filter_pairs(df, threshold=0.5, max_candidates=10)


def test_containment_candidate_guard_trips(spark):
    df = _docs(spark, _CLONES)
    with pytest.raises(CandidateVolumeError, match="max_doc_freq"):
        dedup.containment_pairs(df, threshold=0.5, max_candidates=10)


def test_candidate_guard_none_disables(spark):
    """max_candidates=None is the explicit opt-out: the same corpus that
    trips the budget runs to completion and stays exact."""
    df = _docs(spark, _CLONES[:4])
    out = dedup.prefix_filter_pairs(
        df, threshold=0.5, max_candidates=None
    ).collect()
    # 4 identical docs -> all 6 ordered pairs at jaccard 1.0
    assert len(out) == 6 and all(r["jaccard"] == 1.0 for r in out)


def test_candidate_guard_default_budget_passes_small_corpus(spark):
    """The default 1e9 budget must NOT trip on normal corpora — d17/d18
    registry results stay hash-identical with the guard on."""
    texts = [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(10)]
    out = dedup.prefix_filter_pairs(_docs(spark, texts), threshold=0.5)
    assert out.count() == 0  # disjoint docs, guard silent, plan unchanged


def test_bench_shard_validation():
    """SPARK_GRAFT_BENCH_SHARD is 0-based and validated: i >= n and
    negative i exit instead of silently running zero/wrong queries."""
    import os
    import subprocess
    import sys

    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_SHARD="4/4",
        SPARK_GRAFT_BENCH_ONLY="q1_pricing_summary",
    )
    proc = subprocess.run(
        [sys.executable, "-c", "import bench; bench.main()"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0
    assert "0 <= i < n" in proc.stderr


def test_cosine_banded_candidate_guard_trips(spark):
    """A tiny budget trips the banded ANN candidate guard on a corpus
    where every vector lands in the same band buckets; the message names
    the band_size fix."""
    from polars_incremental_spark.functions import similarity

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(CandidateVolumeError, match="band_size"):
        similarity.cosine_near_dup_pairs(
            df, dim=4, threshold=0.9, max_candidates=10
        )


def test_cosine_banded_guard_none_disables(spark):
    from polars_incremental_spark.functions import similarity

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.cosine_near_dup_pairs(
        df, dim=4, threshold=0.9, max_candidates=None
    ).collect()
    assert len(out) == 10  # all identical vectors pair up
