"""Exactness property fuzz for the filtered near-dup joins.

prefix_filter_pairs (d17) promises the EXACT Jaccard-threshold pair set
with no false negatives despite three candidate filters (prefix,
per-collision positional, aggregate suffix) and the array-intersect
verify; ngram_jaccard_pairs (d4) computes the same set via the plain
inverted-index join with none of those filters.  Equality across random
corpora and thresholds is the property that would break the moment any
filter over-prunes or the verify mis-scores — a per-seed, engine-internal
twin of the DuckDB oracle gate.

minhash_lsh_pairs (d6) is approximate on RECALL (banding can miss) but
must have NO false positives and exact Jaccard values on every pair it
emits — asserted as subset-with-matching-values of the d4 ground truth.
"""

from __future__ import annotations

import random

import pytest

# round-13 test tiering: randomized fuzz/stress campaign — slow tier
# (directed tests + the DuckDB oracle gate cover the same operators)
pytestmark = pytest.mark.slow


from polars_incremental_spark.cache import release_operator_caches
from polars_incremental_spark.functions import dedup

VOCAB = [f"w{i}" for i in range(40)]


def _corpus(spark, seed: int, n_docs: int):
    rng = random.Random(seed)
    rows = []
    base_docs = []
    for i in range(n_docs):
        if base_docs and rng.random() < 0.4:
            # near-dup: mutate an earlier doc (swap/drop/insert words)
            words = list(rng.choice(base_docs))
            for _ in range(rng.randint(0, 3)):
                op = rng.random()
                if op < 0.4 and len(words) > 4:
                    del words[rng.randrange(len(words))]
                elif op < 0.8:
                    words.insert(rng.randrange(len(words) + 1), rng.choice(VOCAB))
                else:
                    words[rng.randrange(len(words))] = rng.choice(VOCAB)
        else:
            words = [rng.choice(VOCAB) for _ in range(rng.randint(5, 25))]
            base_docs.append(tuple(words))
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("seed,threshold", [(1, 0.3), (2, 0.5), (3, 0.7), (4, 0.4), (5, 0.6)])
def test_prefix_filter_join_matches_plain_exact_join(spark, seed, threshold):
    docs = _corpus(spark, seed, 60)
    plain = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            docs, text_col="text", id_col="doc_id", threshold=threshold
        ).collect()
    )
    filtered = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.prefix_filter_pairs(
            docs, text_col="text", id_col="doc_id", threshold=threshold
        ).collect()
    )
    release_operator_caches(spark)
    assert filtered == plain, (
        f"seed={seed} t={threshold}: prefix/suffix/positional filters or the "
        f"array verify diverged from the plain exact join "
        f"(missing={set(plain)-set(filtered)}, extra={set(filtered)-set(plain)})"
    )
    assert plain, f"seed={seed} generated no qualifying pairs — weak fuzz case"


def _plain_containment(spark, docs, threshold):
    """Reference containment via the unfiltered posting self-join — the
    pre-round-10 implementation shape, kept here as the ground truth the
    prefix-filtered + array-verified path must reproduce exactly."""
    from pyspark.sql import functions as F

    p = dedup.shingle_posting_list(docs, "text", "doc_id", 3)
    sizes = p.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = p.alias("a"), p.alias("b")
    common = (
        a.join(b, "shingle_hash")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("contained_id"),
            F.col("b.doc_id").alias("container_id"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "contained_id"), "contained_id")
        .withColumn("containment", F.round(F.col("n_common") / F.col("sz"), 6))
        .filter(F.col("containment") >= threshold)
        .select("contained_id", "container_id", "containment")
    )


@pytest.mark.parametrize("seed,threshold", [(21, 0.5), (22, 0.6), (23, 0.75)])
def test_containment_both_plans_match_plain_join(spark, seed, threshold, monkeypatch):
    """containment_pairs picks its physical plan by the guard's collision
    estimate; BOTH plans (direct self-join count, prefix + array verify)
    must reproduce the unfiltered reference exactly — the cutover is
    forced each way so small fuzz corpora exercise the prefix branch."""
    docs = _corpus(spark, seed, 50)
    plain = sorted(
        (r["contained_id"], r["container_id"], r["containment"])
        for r in _plain_containment(spark, docs, threshold).collect()
    )
    assert plain, f"seed={seed} generated no qualifying pairs — weak fuzz case"
    for cutover, label in ((10**18, "direct"), (-1, "prefix+arrays")):
        monkeypatch.setattr(dedup, "_CONTAINMENT_PREFIX_CUTOVER", cutover)
        got = sorted(
            (r["contained_id"], r["container_id"], r["containment"])
            for r in dedup.containment_pairs(
                docs, text_col="text", id_col="doc_id", threshold=threshold
            ).collect()
        )
        release_operator_caches(spark)
        assert got == plain, (
            f"seed={seed} t={threshold} plan={label}: diverged "
            f"(missing={set(plain)-set(got)}, extra={set(got)-set(plain)})"
        )


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_lsh_pairs_are_subset_with_exact_values(spark, seed):
    threshold = 0.4
    docs = _corpus(spark, seed, 60)
    truth = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, text_col="text", id_col="doc_id", threshold=threshold
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, text_col="text", id_col="doc_id", threshold=threshold
        ).collect()
    }
    release_operator_caches(spark)
    assert set(lsh) <= set(truth), f"false positives: {set(lsh) - set(truth)}"
    for pair, j in lsh.items():
        assert j == truth[pair], f"jaccard mismatch on {pair}: {j} vs {truth[pair]}"
    assert lsh, f"seed={seed}: LSH found nothing — weak fuzz case"
