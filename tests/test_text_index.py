"""Persisted BM25 inverted index: serve == independent replay, bucket
pruning, additive-stats appends exactly-once."""

from __future__ import annotations

import glob
import math
import os
import re

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.functions import text_index as ti

CORPUS = [
    (1, "spark streams join hash hash hash"),
    (2, "vector search join"),
    (3, "hash join hash join hash join"),
    (4, "totally unrelated words here"),
    (5, "spark spark spark vector"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    """Independent replay of text_index_search's math."""
    toks = {d: [t for t in re.split(r"\s+", s.lower().strip()) if t] for d, s in corpus}
    n_docs = len(toks)
    sum_dl = sum(len(v) for v in toks.values())
    scores = {}
    for t in sorted(set(x.lower() for x in terms)):
        hit_docs = {d: v.count(t) for d, v in toks.items() if t in v}
        dfq = len(hit_docs)
        if not dfq:
            continue
        idf = math.log(1.0 + (n_docs - dfq + 0.5) / (dfq + 0.5))
        for d, tf in hit_docs.items():
            rel_dl = len(toks[d]) * n_docs / sum_dl
            ts = idf * (tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * rel_dl)))
            scores.setdefault(d, 0)
            scores[d] += int(round(round(ts, 6) * 1_000_000))
    out = sorted(
        ((s / 1_000_000.0, d) for d, s in scores.items()),
        key=lambda x: (-x[0], x[1]),
    )
    return [(d, s, i + 1) for i, (s, d) in enumerate(out)]


def test_search_matches_independent_replay(spark, tmp_path):
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, _docs(spark, CORPUS), idx, n_buckets=16)
    got = [
        (r["doc_id"], r["score"], r["rank"])
        for r in ti.text_index_search(
            spark, idx, ["hash", "vector"], k=10
        ).collect()
    ]
    assert got == _py_bm25(CORPUS, ["hash", "vector"])
    assert len(got) == 4  # docs 1,2,3,5 match; doc 4 never appears


def test_search_prunes_unqueried_buckets(spark, tmp_path):
    idx = str(tmp_path / "ti")
    ti.build_text_index(spark, _docs(spark, CORPUS), idx, n_buckets=16)
    root = os.path.join(idx, "postings")
    import hashlib

    qbuckets = {
        int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 16
        for t in ("hash", "vector")
    }
    corrupted = 0
    for d in glob.glob(os.path.join(root, "bucket=*")):
        bkt = int(os.path.basename(d).split("=")[1])
        if bkt not in qbuckets:
            for f in glob.glob(os.path.join(d, "*", "*.parquet")):
                with open(f, "wb") as fh:
                    fh.write(b"junk")
                corrupted += 1
    assert corrupted > 0
    got = ti.text_index_search(spark, idx, ["hash", "vector"], k=10).collect()
    assert len(got) == 4  # corruption of unqueried buckets is invisible
    with pytest.raises(Exception):
        spark.read.parquet(root).count()


def test_append_additive_stats_exactly_once(spark, tmp_path):
    idx = str(tmp_path / "ti")
    first, second = CORPUS[:3], CORPUS[3:]
    ti.build_text_index(spark, _docs(spark, first), idx, n_buckets=8)
    assert ti.append_to_text_index(
        spark, _docs(spark, second), idx, batch_id=1
    ) is True
    assert ti.append_to_text_index(
        spark, _docs(spark, second), idx, batch_id=1
    ) is False  # replay: stats must not double
    import json

    with open(os.path.join(idx, "meta.json")) as fh:
        meta = json.load(fh)
    assert meta["n_docs"] == 5
    assert meta["sum_dl"] == sum(
        len(re.split(r"\s+", s.strip())) for _, s in CORPUS
    )
    # the incrementally-built index serves the SAME results as a fresh
    # one-shot build over the whole corpus
    got = [
        tuple(r)
        for r in ti.text_index_search(spark, idx, ["spark", "join"], k=10).collect()
    ]
    assert got == _py_bm25(CORPUS, ["spark", "join"])
    with pytest.raises(ValueError, match="already exists"):
        ti.build_text_index(spark, _docs(spark, CORPUS), idx)
