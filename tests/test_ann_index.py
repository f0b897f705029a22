"""Persisted IVF index: build/serve split, disk partition pruning,
frozen-centroid appends with exactly-once folds."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.functions import ann_index as ai
from polars_incremental_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def _brute_topk(spark, corpus, queries, k):
    """Reference ranking: exact cosine over the FULL corpus."""
    from polars_incremental_spark.functions.similarity import cosine

    j = queries.select(
        F.col("query_id"), F.col("embedding").alias("__q")
    ).crossJoin(corpus.select("vec_id", "embedding"))
    j = j.filter(F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("__q"), F.col("embedding")), 6).alias("cosine_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= k) & F.col("cosine_sim").isNotNull())
    )


@pytest.mark.slow  # round-13 tiering: long randomized/property probe
def test_full_probe_search_equals_brute_force(spark, emb, tmp_path):
    idx = str(tmp_path / "ivf")
    ai.build_ivf_index(spark, emb, idx, n_cells=8, refine_iters=1)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        map(
            tuple,
            ai.ivf_index_search(
                spark, idx, queries, k=5, n_probe=8
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            _brute_topk(spark, emb, queries, 5)
            .select("query_id", "vec_id", "cosine_sim", "rank")
            .collect(),
        )
    )
    assert got == want and len(got) == 25


def test_search_prunes_unprobed_cell_directories(spark, emb, tmp_path):
    import glob

    idx = str(tmp_path / "ivf")
    ai.build_ivf_index(spark, emb, idx, n_cells=8, refine_iters=0)
    root = os.path.join(idx, "assignments")
    probed = {
        int(os.path.basename(d).split("=")[1])
        for d in glob.glob(os.path.join(root, "cell=*"))
    }
    keep = sorted(probed)[:2]
    # corrupt every parquet file of every UNPROBED cell: if the filtered
    # read still succeeds, Spark provably never opened those files
    for c in probed - set(keep):
        for f in glob.glob(os.path.join(root, f"cell={c}", "*", "*.parquet")):
            with open(f, "wb") as fh:
                fh.write(b"not parquet")
    pruned = spark.read.parquet(root).filter(F.col("cell").isin(keep))
    assert pruned.count() > 0  # unprobed corruption invisible
    with pytest.raises(Exception):
        spark.read.parquet(root).count()  # full scan DOES hit it
    # and the search plan itself carries the partition filter
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = ai.ivf_index_search(
        spark, idx, queries, k=3, n_probe=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_append_frozen_centroids_exactly_once(spark, emb, tmp_path):
    idx = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    ai.build_ivf_index(spark, base, idx, n_cells=8, refine_iters=1)
    with open(os.path.join(idx, "centroids.json")) as fh:
        before = json.load(fh)
    assert ai.append_to_ivf_index(spark, extra, idx, batch_id=1) is True
    with open(os.path.join(idx, "centroids.json")) as fh:
        assert json.load(fh) == before  # frozen
    n = spark.read.parquet(os.path.join(idx, "assignments")).count()
    assert n == emb.count()
    # replay is a no-op: same row count, False return
    assert ai.append_to_ivf_index(spark, extra, idx, batch_id=1) is False
    assert spark.read.parquet(os.path.join(idx, "assignments")).count() == n
    # appended vectors are actually served
    queries = emb.filter(F.col("vec_id") == 450).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ai.ivf_index_search(spark, idx, queries, k=5, n_probe=8).collect()
    want = (
        _brute_topk(spark, emb, queries, 5)
        .select("query_id", "vec_id", "cosine_sim", "rank")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_build_refuses_overwrite(spark, emb, tmp_path):
    idx = str(tmp_path / "ivf")
    ai.build_ivf_index(spark, emb.limit(50), idx, n_cells=4, refine_iters=0)
    with pytest.raises(ValueError, match="already exists"):
        ai.build_ivf_index(spark, emb.limit(50), idx, n_cells=4)


def test_ivfpq_full_probe_matches_pq_topk(spark, emb, tmp_path):
    """With every cell probed, index serving must reproduce the in-query
    pq_topk ranking exactly (same codebooks — both train deterministically
    from the same corpus)."""
    from polars_incremental_spark.functions.similarity import pq_topk

    idx = str(tmp_path / "ivfpq")
    ai.build_ivfpq_index(
        spark, emb, idx, n_cells=4, refine_iters=1, n_sub=4, n_codes=8,
        pq_iters=1,
    )
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        map(
            tuple,
            ai.ivfpq_index_search(spark, idx, queries, k=5, n_probe=4)
            .select("query_id", "vec_id", "pq_score", "rank")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            pq_topk(
                emb, queries, k=5, n_sub=4, n_codes=8, n_iter=1
            ).collect(),
        )
    )
    assert got == want and len(got) == 20


def test_ivfpq_stores_codes_not_vectors(spark, emb, tmp_path):
    idx = str(tmp_path / "ivfpq")
    ai.build_ivfpq_index(
        spark, emb, idx, n_cells=4, refine_iters=0, n_sub=4, n_codes=8
    )
    stored = spark.read.parquet(os.path.join(idx, "assignments"))
    assert set(stored.columns) == {
        "vec_id", "__code_0", "__code_1", "__code_2", "__code_3",
        "cell", "batch",
    }
    assert stored.count() == emb.count()
    # every code is a valid 1-based codebook entry
    for i in range(4):
        mx = stored.agg(F.max(f"__code_{i}"), F.min(f"__code_{i}")).first()
        assert 1 <= mx[1] and mx[0] <= 8


def test_ivfpq_append_exactly_once(spark, emb, tmp_path):
    idx = str(tmp_path / "ivfpq")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    ai.build_ivfpq_index(
        spark, base, idx, n_cells=4, refine_iters=1, n_sub=4, n_codes=8
    )
    assert ai.append_to_ivfpq_index(spark, extra, idx, batch_id=1) is True
    assert ai.append_to_ivfpq_index(spark, extra, idx, batch_id=1) is False
    n = spark.read.parquet(os.path.join(idx, "assignments")).count()
    assert n == emb.count()
    # appended vectors are served
    queries = emb.filter(F.col("vec_id") == 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ai.ivfpq_index_search(spark, idx, queries, k=400, n_probe=4)
    assert got.filter(F.col("vec_id") >= 400).count() > 0


def test_pipeline_maintains_index_across_crash_replay(spark, emb, tmp_path):
    """The Pipeline-driven shape (examples/incremental_ann.py): the writer
    folds each planned batch into the index; a crash AFTER the index
    append but BEFORE the checkpoint commit replays the same batch id on
    the next run, and the frozen-model append refuses the duplicate —
    every vector indexed exactly once."""

    from polars_incremental_spark import FilesSource, Pipeline

    landing = str(tmp_path / "landing")
    idx = str(tmp_path / "ivf")
    base = emb.filter(F.col("vec_id") % 3 == 0)
    # seed build takes its own id; pipeline batches start at 0
    ai.build_ivf_index(spark, base, idx, n_cells=4, refine_iters=1, batch_id=-1)
    emb.filter(F.col("vec_id") % 3 == 1).write.parquet(f"{landing}/b1")

    crash = {"armed": False}

    def writer(df, batch_id):
        folded = ai.append_to_ivf_index(spark, df, idx, batch_id=batch_id)
        if crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("simulated crash post-append")
        return {"folded": bool(folded)}

    pipe = Pipeline(
        source=FilesSource(path=landing),
        checkpoint_dir=str(tmp_path / "ckpt"),
        writer=writer,
    )
    assert pipe.run(spark).batches == 1

    emb.filter(F.col("vec_id") % 3 == 2).write.parquet(f"{landing}/b2")
    crash["armed"] = True
    from polars_incremental_spark.errors import WriterError

    with pytest.raises(WriterError, match="simulated crash"):
        pipe.run(spark)
    res = pipe.run(spark)  # replays the SAME batch; append no-ops
    assert res.batches == 1
    n_idx = spark.read.parquet(os.path.join(idx, "assignments")).count()
    assert n_idx == emb.count(), "crash replay duplicated or lost a batch"
    # the replayed batch's vectors are served
    q = emb.filter(F.col("vec_id") % 3 == 2).limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ai.ivf_index_search(spark, idx, q, k=5, n_probe=4)
    assert got.count() > 0
