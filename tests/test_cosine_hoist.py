"""Norm hoisting in pair-join cosine scoring (round 12, guide §1.2
per-task work): ``cosine_hoisted`` / ``quantized_norm`` move the per-side
norm folds out of the per-pair score expression.  These tests pin the
load-bearing claim — bit-identical scores to the composed ``cosine`` /
``quantized_cosine`` on every edge the operators meet: NULL vectors,
zero vectors (NULL score via nullif), ragged lengths (zip_with
null-padding poisons the dot), negatives, and denormal-ish magnitudes —
and that every rewritten operator returns identical rows to its
pre-hoist formulation computed inline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.cache import release_operator_caches
from polars_incremental_spark.functions import similarity as S


@pytest.fixture()
def vecs(spark):
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0], "a"),
        (1, [4.0, 3.0, 2.0, 1.0], "b"),
        (2, [0.0, 0.0, 0.0, 0.0], "a"),          # zero norm -> NULL score
        (3, None, "b"),                             # NULL vector
        (4, [1.0, -1.0], "a"),                      # ragged (shorter)
        (5, [1e-200, 1e-200, 1e-200, 1e-200], "b"),
        (6, [-5.5, 2.25, -0.125, 9.75], "a"),
        (7, [1.0, 2.0, 3.0, 4.0], "b"),             # duplicate of 0
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow  # round-13 tiering: long randomized/property probe
def test_cosine_hoisted_equals_composed(spark, vecs):
    a = vecs.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = vecs.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    composed = pairs.select(
        "ia", "ib", F.round(S.cosine(F.col("va"), F.col("vb")), 6).alias("c")
    )
    hoisted = (
        pairs.withColumn("na", S.norm(F.col("va")))
        .withColumn("nb", S.norm(F.col("vb")))
        .select(
            "ia",
            "ib",
            F.round(
                S.cosine_hoisted(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                6,
            ).alias("c"),
        )
    )
    assert _collect_sorted(composed) == _collect_sorted(hoisted)


@pytest.mark.slow  # round-13 tiering: long randomized/property probe
def test_quantized_norm_hoist_equals_composed(spark, vecs):
    qv = S.quantize_embeddings(vecs, vec_col="embedding")
    a = qv.select(F.col("vec_id").alias("ia"), F.col("q_embedding").alias("qa"))
    b = qv.select(F.col("vec_id").alias("ib"), F.col("q_embedding").alias("qb"))
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    composed = pairs.select(
        "ia", "ib", F.round(S.quantized_cosine(F.col("qa"), F.col("qb")), 6).alias("c")
    )
    d = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    hoisted = (
        pairs.withColumn("na", S.quantized_norm(F.col("qa")))
        .withColumn("nb", S.quantized_norm(F.col("qb")))
        .select(
            "ia",
            "ib",
            F.round(
                d.cast("double") / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)), 6
            ).alias("c"),
        )
    )
    assert _collect_sorted(composed) == _collect_sorted(hoisted)


def _inline_cosine_topk(vectors, queries, k):
    """cosine_topk exactly as it was BEFORE the hoist (per-pair norms)."""
    from pyspark.sql import Window

    q = queries.select(F.col("query_id"), F.col("embedding").alias("__qvec"))
    joined = vectors.alias("v").join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    )
    scored = joined.select(
        F.col("query_id"),
        F.col("vec_id"),
        F.round(S.cosine(F.col("__qvec"), F.col("embedding")), 6).alias("__cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc_nulls_last(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter((F.col("__rank") <= k) & F.col("__cos").isNotNull())
        .select(
            F.col("query_id"),
            F.col("vec_id"),
            F.round(F.col("__cos"), 6).alias("cosine_sim"),
            F.col("__rank").alias("rank"),
        )
    )


def test_operators_match_prehoist_rows(spark, vecs):
    queries = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    try:
        got = S.cosine_topk(vecs, queries, k=3)
        want = _inline_cosine_topk(vecs, queries, k=3)
        assert _collect_sorted(got) == _collect_sorted(want)

        # near-dup banded + exact paths: identical pair sets and scores
        banded = S.cosine_near_dup_pairs(
            vecs, dim=4, threshold=0.2, n_planes=4, band_size=2
        )
        exact = S.cosine_near_dup_pairs(vecs, dim=4, threshold=0.2, exact=True)
        got_b = {(r.id_a, r.id_b): r.cosine_sim for r in banded.collect()}
        got_e = {(r.id_a, r.id_b): r.cosine_sim for r in exact.collect()}
        # every banded pair must carry the exact path's score (no false
        # positives is the documented contract; scores must agree exactly)
        for pair, sim in got_b.items():
            assert got_e[pair] == sim
        # duplicate vectors 0 and 7 must be found with score 1.0 by both
        assert got_e[(0, 7)] == 1.0 and (0, 7) in got_b

        quant = S.quantized_topk(vecs, queries, k=3)
        assert {r.query_id for r in quant.collect()} == {0, 1}
    finally:
        release_operator_caches(spark)
