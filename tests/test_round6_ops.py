"""Semantic tests for the round-6 operators: duplicated-span profiling
(d16) and leakage-safe cluster splits (u17).  The driver oracle checks
hash equality against DuckDB; these pin the MEANING on hand-built corpora.
"""

from pyspark.sql import functions as F

from polars_incremental_spark.functions import dedup, sampling


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicated_spans_finds_planted_duplicate_run(spark):
    # doc 1 and doc 2 share a 16-token block at DIFFERENT alignments —
    # exactly the case fixed-chunk dedup (d10/d15) can miss
    block = " ".join(f"dup{i}" for i in range(16))
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    df = _docs(
        spark,
        [
            (1, uniq("a", 4) + " " + block + " " + uniq("b", 8)),
            (2, uniq("c", 7) + " " + block + " " + uniq("d", 5)),
            (3, uniq("e", 30)),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.duplicated_spans(df, span_tokens=8, stride=1).collect()
    }
    # the unique doc has no duplicated spans
    assert out[3]["n_dup_spans"] == 0
    assert out[3]["max_dup_run"] == 0
    assert out[3]["approx_longest_dup_tokens"] == 0
    # both sharers see a positive duplicated run approximating the block
    for d in (1, 2):
        # stride 1: 16-token block -> 9 shared windows, run of 9, EXACT length
        assert out[d]["n_dup_spans"] == 9, out[d]
        assert out[d]["max_dup_run"] == 9, out[d]
        assert out[d]["approx_longest_dup_tokens"] == 16, out[d]
    # n_spans arithmetic: one window per position
    assert out[3]["n_spans"] == 30 - 8 + 1


def test_duplicated_spans_intra_doc_repeat_not_counted(spark):
    # a span repeated only WITHIN one doc is not cross-document duplication
    block = " ".join(f"x{i}" for i in range(8))
    df = _docs(
        spark,
        [
            (1, block + " " + block),
            (2, " ".join(f"y{i}" for i in range(16))),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.duplicated_spans(df, span_tokens=8, stride=8).collect()
    }
    assert out[1]["n_dup_spans"] == 0


def test_leakage_safe_split_colocates_near_dups(spark):
    # replicate the u17 composition on a corpus with a known dup pair
    base = " ".join(f"w{i}" for i in range(40))
    df = _docs(
        spark,
        [
            (10, base),
            (11, base + " tail"),          # near-dup of 10
            (12, " ".join(f"z{i}" for i in range(40))),
        ],
    )
    pairs = dedup.minhash_lsh_pairs(df, threshold=0.12)
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(10, 11)}
    clusters = dedup.connected_components(pairs)
    labeled = (
        df.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    out = sampling.hash_split(
        labeled,
        weights={"train": 0.8, "valid": 0.1, "test": 0.1},
        key_col="cluster_id",
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # the near-dup pair shares a cluster AND therefore a split
    assert by_id[10]["cluster_id"] == by_id[11]["cluster_id"] == 10
    assert by_id[10]["split"] == by_id[11]["split"]
    assert by_id[12]["cluster_id"] == 12


def test_duplicated_spans_validation(spark):
    import pytest

    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        dedup.duplicated_spans(df, span_tokens=0)
    with pytest.raises(ValueError):
        dedup.duplicated_spans(df, stride=0)


def test_transform_image_features_crop_resize_semantics(spark):
    """Pin crop + NN-resize pixel selection against a hand-built PPM."""
    import numpy as np

    from polars_incremental_spark.functions.multimodal import (
        transform_image_features,
    )

    # 4x2 image with unique channel values per pixel
    pix = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    content = b"P6\n4 2\n255\n" + pix.tobytes()
    df = spark.createDataFrame(
        [(1, bytearray(content)), (2, bytearray(b"garbage"))],
        "media_id long, content binary",
    )
    out = {
        r["media_id"]: r.asDict()
        for r in transform_image_features(
            df, crop=(1, 0, 2, 2), out_w=3, out_h=3
        ).collect()
    }
    good = out[1]
    assert (good["width"], good["height"]) == (3, 3)
    # crop keeps pixels (x,y) in {1,2}x{0,1}; NN 3x3 weights 4/2/2/1
    crop = pix[0:2, 1:3]
    exp = (
        crop[0, 0].astype(int) * 4
        + crop[0, 1].astype(int) * 2
        + crop[1, 0].astype(int) * 2
        + crop[1, 1].astype(int) * 1
    ) / 9.0
    assert abs(good["mean_r"] - round(float(exp[0]), 6)) < 1e-9
    assert abs(good["mean_g"] - round(float(exp[1]), 6)) < 1e-9
    assert abs(good["mean_b"] - round(float(exp[2]), 6)) < 1e-9
    # corrupt payload isolated, not fatal
    assert out[2]["width"] is None and out[2]["decode_error"]

    # crop outside bounds is an isolated per-item error too
    bad = transform_image_features(
        spark.createDataFrame([(3, bytearray(content))], "media_id long, content binary"),
        crop=(3, 0, 2, 2), out_w=2, out_h=2,
    ).first()
    assert bad["decode_error"] and "crop" in bad["decode_error"]


def test_frame_audio_features_semantics(spark):
    """Windowed frame energies against a hand-built 8-bit WAV."""
    import numpy as np

    from polars_incremental_spark.functions.multimodal import (
        frame_audio_features,
        wav_header,
    )

    # 32 samples: quiet first half, loud burst in samples 16..31
    raw = bytes([128] * 16 + [228] * 16)
    content = wav_header(n_samples=32, sample_rate=8000, bits=8) + raw
    df = spark.createDataFrame(
        [(1, bytearray(content)), (2, bytearray(b"nope"))],
        "media_id long, content binary",
    )
    out = {
        r["media_id"]: r.asDict()
        for r in frame_audio_features(
            df, frame_samples=16, hop_samples=8
        ).collect()
    }
    good = out[1]
    # frames: [0:16]=0 energy, [8:24]=8 loud samples, [16:32]=16 loud, [24:32]=8 loud
    assert good["n_frames"] == 4
    assert good["argmax_frame"] == 2
    assert good["max_frame_energy"] == 16 * 100 * 100
    assert good["total_energy"] == 16 * 100 * 100
    assert out[2]["n_frames"] is None and out[2]["decode_error"]


def test_frame_differences_semantics(spark):
    """Pin cut selection on hand-built frames with a known sharp cut."""
    from polars_incremental_spark.functions.multimodal import frame_differences

    frames = spark.createDataFrame(
        [
            # media 1: flat, flat, BURST, flat-again -> cut at frame 2
            (1, 0, bytearray(b"\x10" * 8)),
            (1, 1, bytearray(b"\x10" * 8)),
            (1, 2, bytearray(b"\x90" * 8)),
            (1, 3, bytearray(b"\x90" * 8)),
            # media 2: single frame -> no diffs
            (2, 0, bytearray(b"abc")),
            # media 3: unequal frame lengths compare over the common prefix
            (3, 0, bytearray(b"\x00\x00\x00\x00")),
            (3, 1, bytearray(b"\x05\x05")),
        ],
        "media_id long, frame_idx int, frame_bytes binary",
    )
    out = {r["media_id"]: r.asDict() for r in frame_differences(frames).collect()}
    assert out[1]["n_frames"] == 4
    assert out[1]["cut_frame"] == 2
    assert out[1]["max_frame_diff"] == 8 * 0x80
    assert out[1]["total_frame_diff"] == 8 * 0x80
    assert out[2] == {
        "media_id": 2, "n_frames": 1, "max_frame_diff": 0,
        "cut_frame": 0, "total_frame_diff": 0,
    }
    assert out[3]["max_frame_diff"] == 2 * 5


# ------------------------------------------------------ label propagation
def test_label_propagation_two_cliques(spark):
    """Two disjoint triangles converge to per-clique min labels; the
    bridge-free components never exchange labels."""
    from polars_incremental_spark.functions.graph import label_propagation

    tri = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    e = spark.createDataFrame(
        tri + [(b, a) for a, b in tri], ["src", "dst"]
    )
    out = {r["node"]: r["label"] for r in label_propagation(e, iterations=3).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_label_propagation_mode_beats_min(spark):
    """The update is MODE with min tiebreak, not plain min: node 5's
    neighbors {1: x2 via 2,3 already labeled 1...} — build a star where
    two neighbors share label 7 and one neighbor has smaller label 1;
    after round 1 on the frozen initial labels the center adopts 7? No —
    construct directly: center 9 has in-edges from 7, 8 (labels 7, 8) and
    from 70 (label 70). No majority -> tie among {7,8,70} all count 1 ->
    min = 7. Then make 8's label collapse so counts shift."""
    from polars_incremental_spark.functions.graph import label_propagation

    # center 9 receives from 7 twice (parallel edges) and from 1 once:
    # mode is 7 even though 1 < 7 — proves count wins before tiebreak
    edges = spark.createDataFrame(
        [(7, 9), (7, 9), (1, 9), (9, 7), (9, 1)], ["src", "dst"]
    )
    out = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=1).collect()
    }
    assert out[9] == 7


def test_label_propagation_checkpoint_dir_identical(spark, tmp_path):
    from polars_incremental_spark.functions.graph import label_propagation

    tri = [(1, 2), (2, 3), (1, 3), (3, 4)]
    e = spark.createDataFrame(tri + [(b, a) for a, b in tri], ["src", "dst"])
    # 5 iterations so the every-4th-round checkpoint actually fires
    a = sorted(map(tuple, label_propagation(e, iterations=5).collect()))
    b = sorted(
        map(
            tuple,
            label_propagation(
                e, iterations=5, checkpoint_dir=str(tmp_path / "ck")
            ).collect(),
        )
    )
    assert a == b


# ----------------------------------------------------------------- bm25
def _sym_edges(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    return e.union(e.select("dst", "src"))


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_bfs_path_graph_hop_distances(spark):
    from polars_incremental_spark.functions.graph import bfs_distances

    # 0-1-2-...-9 line: seed 0, cap 3 → exactly nodes 0..3 at dist 0..3
    e = _sym_edges(spark, [(i, i + 1) for i in range(9)])
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(e, _seeds(spark, [0]), max_hops=3).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_multi_seed_takes_min_distance(spark):
    from polars_incremental_spark.functions.graph import bfs_distances

    # seeds 0 and 6 on the 0..9 line: every node keeps its NEAREST seed
    e = _sym_edges(spark, [(i, i + 1) for i in range(9)])
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(e, _seeds(spark, [0, 6]), max_hops=3).collect()
    }
    assert out == {
        0: 0, 1: 1, 2: 2, 3: 3,  # from seed 0
        6: 0, 5: 1, 4: 2,        # node 4/5 nearer seed 6 than seed 0
        7: 1, 8: 2, 9: 3,
    }


def test_bfs_early_exit_and_isolated_seed(spark):
    from polars_incremental_spark.functions.graph import bfs_distances

    # tiny components + a seed with NO edges: the frontier empties after
    # round 1 and the loop exits early (max_hops=5 never runs 5 rounds);
    # the edgeless seed still reports dist 0
    e = _sym_edges(spark, [(1, 2), (3, 4)])
    out = {
        r["node"]: r["dist"]
        for r in bfs_distances(
            e, _seeds(spark, [1, 3, 99]), max_hops=5
        ).collect()
    }
    assert out == {1: 0, 3: 0, 99: 0, 2: 1, 4: 1}


def test_bfs_checkpoint_dir_identical(spark, tmp_path):
    from polars_incremental_spark.functions.graph import bfs_distances

    e = _sym_edges(spark, [(i, i + 1) for i in range(9)] + [(2, 7)])
    seeds = _seeds(spark, [0])
    a = sorted(map(tuple, bfs_distances(e, seeds, max_hops=4).collect()))
    b = sorted(
        map(
            tuple,
            bfs_distances(
                e, seeds, max_hops=4, checkpoint_dir=str(tmp_path / "ckpt")
            ).collect(),
        )
    )
    assert a == b


def test_bm25_rare_term_outranks_common(spark):
    """A doc matching the RARE query term outscores docs matching only
    the ubiquitous one (idf dominance), and scores are finite/ordered."""
    from polars_incremental_spark.functions.text import bm25_topk

    rows = [(i, "common filler words here") for i in range(20)]
    rows.append((100, "rare common"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(df, ["rare", "common"], k=5).collect()
    assert out[0]["doc_id"] == 100 and out[0]["rank"] == 1
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc wins (b > 0 length penalty)."""
    from polars_incremental_spark.functions.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "q short"), (2, "q " + "pad " * 50)], ["doc_id", "text"]
    )
    out = bm25_topk(df, ["q"], k=2).collect()
    assert out[0]["doc_id"] == 1
    assert out[0]["score"] > out[1]["score"]


# ------------------------------------------------------------------ pmi
def test_term_pmi_exact_counts(spark):
    """3 docs: (a b), (a b), (a c) -> c_ab: a&b=2, a&c=1; lift for (a,b)
    = 2*3*1e6 // (3*2) = 1_000_000 (independence = 1e6 ppm when pair
    tracks the rarer term)."""
    from polars_incremental_spark.functions.text import term_pmi

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    out = {
        (r["term_a"], r["term_b"]): r
        for r in term_pmi(df, min_pair_count=1).collect()
    }
    ab = out[("a", "b")]
    assert (ab["c_ab"], ab["c_a"], ab["c_b"]) == (2, 3, 2)
    assert ab["lift_ppm"] == 2 * 3 * 1_000_000 // (3 * 2)
    ac = out[("a", "c")]
    assert ac["lift_ppm"] == 1 * 3 * 1_000_000 // (3 * 1)


def test_term_pmi_vocab_cap_bounds_pairs(spark):
    """max_vocab=2 keeps only the top-2 doc-freq terms, so pairs outside
    the vocabulary never appear — the join stays bounded."""
    from polars_incremental_spark.functions.text import term_pmi

    df = spark.createDataFrame(
        [(1, "a b z"), (2, "a b y"), (3, "a b x")], ["doc_id", "text"]
    )
    out = term_pmi(df, max_vocab=2, min_pair_count=1).collect()
    assert len(out) == 1 and (out[0]["term_a"], out[0]["term_b"]) == ("a", "b")


# ---------------------------------------------------------- attribution
def test_attribution_last_touch_semantics(spark, tmp_path):
    """Hand-built stream: purchase credits the MOST RECENT preceding
    click; purchases before any click stay unattributed; a later click
    re-anchors the next purchase."""
    import datetime as dt
    import os

    from polars_incremental_spark.queries import r34_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: purchase(1s) before click -> unattributed; click(2s);
        # purchase(5s) -> latency 3s; click(6s); purchase(7s) -> 1s
        (1, t0 + dt.timedelta(seconds=1), 1, "purchase", 10.0, "{}"),
        (2, t0 + dt.timedelta(seconds=2), 1, "click", 0.0, "{}"),
        (3, t0 + dt.timedelta(seconds=5), 1, "purchase", 20.0, "{}"),
        (4, t0 + dt.timedelta(seconds=6), 1, "click", 0.0, "{}"),
        (5, t0 + dt.timedelta(seconds=7), 1, "purchase", 40.0, "{}"),
        # user 2: clicks only -> no output row
        (6, t0, 2, "click", 0.0, "{}"),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).write.parquet(os.path.join(sf_dir, "events.parquet"))
    out = {r["user_id"]: r for r in r34_attribution(spark, sf_dir).collect()}
    assert set(out) == {1}
    u1 = out[1]
    assert u1["n_purchases"] == 3 and u1["n_attributed"] == 2
    assert u1["attributed_value"] == 60.0
    assert u1["latency_us_total"] == (3 + 1) * 1_000_000


# ------------------------------------------------------------------ rake
def test_rake_scores_multiword_phrases_highest(spark):
    """Classic RAKE property: words that co-occur in long phrases get
    high degree, so multi-word phrases outrank singletons built from the
    same vocabulary."""
    from polars_incremental_spark.functions.text import rake_keywords

    df = spark.createDataFrame(
        [
            (1, "deep neural networks and deep neural networks for the win"),
            (2, "networks of the deep"),
        ],
        "doc_id long, text string",
    )
    out = rake_keywords(df, k=10).collect()
    top = out[0]
    assert top["phrase"] == "deep neural networks"
    assert top["n_words"] == 3 and top["n_occurrences"] == 2
    scores = {r["phrase"]: r["score_ppm"] for r in out}
    # exact RAKE arithmetic over the candidate phrases
    #   doc1: [deep neural networks] x2, [win]; doc2: [networks], [deep]
    # deep:     freq 3, deg 3+3+1=7 -> floor(7e6/3) = 2333333
    # neural:   freq 2, deg 6       -> 3000000
    # networks: freq 3, deg 3+3+1=7 -> 2333333
    assert scores["deep neural networks"] == 2333333 + 3000000 + 2333333
    assert scores["win"] == 1_000_000  # singleton: deg==freq


def test_rake_stopwords_split_phrases(spark):
    from polars_incremental_spark.functions.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "alpha beta the gamma")], "doc_id long, text string"
    )
    phrases = {r["phrase"] for r in rake_keywords(df, k=10).collect()}
    assert phrases == {"alpha beta", "gamma"}


# -------------------------------------------------------------------- pq
def test_pq_exact_on_prototype_corpus(spark):
    """When every corpus vector IS one of a few prototypes, each subspace
    codebook can represent its slices exactly, so PQ scores equal exact
    dot products and the ranking matches brute force."""
    from polars_incremental_spark.functions.similarity import pq_topk

    protos = [
        [1.0, 0.0, 0.0, 0.0, 2.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0, 0.0, 2.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 2.0, 0.0],
    ]
    rows = [(i, protos[i % 3]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(100, protos[0])], "query_id long, embedding array<double>"
    )
    out = pq_topk(df, q, k=12, n_sub=2, n_codes=3, n_iter=1, dim=8).collect()
    assert len(out) == 12
    by_id = {r["vec_id"]: r for r in out}
    # prototype-0 copies (ids 0,3,6,9) score the exact dot 1+4=5...
    # after spherical refinement centroids are unit-mean directions, but
    # the RANKING is what must hold: all proto-0 copies above the rest
    proto0 = {0, 3, 6, 9}
    top4 = {r["vec_id"] for r in out if r["rank"] <= 4}
    assert top4 == proto0, sorted((r["rank"], r["vec_id"]) for r in out)
    s0 = {by_id[i]["pq_score"] for i in proto0}
    assert len(s0) == 1  # identical codes -> identical scores


def test_pq_codes_are_bounded_and_deterministic(spark):
    from polars_incremental_spark.functions.similarity import pq_topk

    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[1][1])],
        "query_id long, embedding array<double>",
    )
    a = sorted(map(tuple, pq_topk(df, q, k=3, n_sub=4, n_codes=4, dim=16).collect()))
    b = sorted(map(tuple, pq_topk(df, q, k=3, n_sub=4, n_codes=4, dim=16).collect()))
    assert a == b and len(a) == 6
    with __import__("pytest").raises(ValueError, match="not divisible"):
        pq_topk(df, q, n_sub=5, dim=16)


# --------------------------------------------------------------------------
# Count-Min Sketch (u18)
# --------------------------------------------------------------------------


def _cms_stream(spark, items):
    return spark.createDataFrame([(x,) for x in items], "k string")


def test_cms_estimate_never_undercounts(spark):
    from polars_incremental_spark.functions import sketches as sk

    items = ["a"] * 7 + ["b"] * 3 + ["c"] * 1 + [f"x{i}" for i in range(50)]
    df = _cms_stream(spark, items)
    sketch = sk.cms_build(df, key_col="k", depth=3, width=16)  # tiny: collisions
    keys = df.groupBy("k").agg(F.count("*").cast("long").alias("exact"))
    est = {
        r["k"]: (r["est"], r["exact"])
        for r in sk.cms_estimate(
            sketch, keys, key_col="k", depth=3, width=16, out_col="est"
        ).collect()
    }
    assert len(est) == 53
    for k, (e, x) in est.items():
        assert e >= x, (k, e, x)  # CMS only ever overcounts
    # a width wide enough to avoid collisions is exact for the heavy key
    wide = sk.cms_build(df, key_col="k", depth=4, width=4096)
    e2 = {
        r["k"]: r["est"]
        for r in sk.cms_estimate(
            wide, keys, key_col="k", depth=4, width=4096, out_col="est"
        ).collect()
    }
    assert e2["a"] == 7 and e2["b"] == 3 and e2["c"] == 1


def test_cms_merge_is_exactly_linear(spark):
    from polars_incremental_spark.functions import sketches as sk

    a = _cms_stream(spark, ["a", "a", "b", "q", "r"])
    b = _cms_stream(spark, ["a", "b", "b", "s"])
    kw = dict(key_col="k", depth=3, width=8)
    merged = sk.cms_merge(
        sk.cms_build(a, **kw).unionByName(sk.cms_build(b, **kw))
    )
    whole = sk.cms_build(a.unionByName(b), **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_unseen_key_estimates_zero_and_validation(spark):
    import pytest

    from polars_incremental_spark.functions import sketches as sk

    df = _cms_stream(spark, ["only"])
    sketch = sk.cms_build(df, key_col="k", depth=2, width=64)
    keys = _cms_stream(spark, ["never-seen"])
    [row] = sk.cms_estimate(
        sketch, keys, key_col="k", depth=2, width=64
    ).collect()
    assert row["est_count"] == 0
    with pytest.raises(ValueError, match="depth"):
        sk.cms_build(df, key_col="k", depth=0, width=64)


# --------------------------------------------------------------------------
# Funnel (r36) and gap fill (r37)
# --------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_funnel_semantics(spark, tmp_path, monkeypatch):
    import datetime as dt

    from polars_incremental_spark import queries as q

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full funnel in order, inside the 72h window
        (1, t0, 1, "signup", 1.0),
        (2, t0 + 1 * h, 1, "view", 1.0),
        (3, t0 + 2 * h, 1, "click", 1.0),
        (4, t0 + 3 * h, 1, "purchase", 1.0),
        # user 2: purchase BEFORE click — stops at click (order matters)
        (5, t0, 2, "signup", 1.0),
        (6, t0 + 1 * h, 2, "view", 1.0),
        (7, t0 + 2 * h, 2, "purchase", 1.0),
        (8, t0 + 3 * h, 2, "click", 1.0),
        # user 3: completes but outside 72h of FIRST signup — stops at view
        (9, t0, 3, "signup", 1.0),
        (10, t0 + 1 * h, 3, "view", 1.0),
        (11, t0 + 100 * h, 3, "click", 1.0),
        (12, t0 + 101 * h, 3, "purchase", 1.0),
        # user 4: no signup at all — never enters the funnel
        (13, t0, 4, "view", 1.0),
        (14, t0 + 1 * h, 4, "click", 1.0),
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(q, "load_table", lambda s, d, t: ev)
    out = {r["step"]: r.asDict() for r in q.r36_funnel(spark, "ignored").collect()}
    assert [out[k]["n_users"] for k in (1, 2, 3, 4)] == [3, 3, 2, 1]
    assert out[1]["latency_us_total"] == 0
    # step-2 latency: users 1,2,3 each view 1h after signup
    assert out[2]["latency_us_total"] == 3 * 3600 * 1_000_000
    # step 4: only user 1, purchase 3h after signup
    assert out[4]["latency_us_total"] == 3 * 3600 * 1_000_000


def test_gap_fill_semantics(spark, monkeypatch):
    import datetime as dt

    from polars_incremental_spark import queries as q

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        (1, t0, 1, "click", 10.0),
        (2, t0 + dt.timedelta(minutes=30), 1, "click", 2.5),
        # hours +1 and +2 are GAPS
        (3, t0 + 3 * h, 2, "click", 7.0),
        (4, t0, 1, "view", 1.0),  # second series: single hour, no grid
    ]
    ev = _events(spark, rows)
    monkeypatch.setattr(q, "load_table", lambda s, d, t: ev)
    out = q.r37_gap_fill(spark, "ignored").collect()
    clicks = [r.asDict() for r in out if r["event_type"] == "click"]
    assert [r["n_events"] for r in clicks] == [2, 0, 0, 1]
    assert [r["is_gap"] for r in clicks] == [False, True, True, False]
    # gap hours carry the last observed hourly revenue forward
    assert [r["revenue_ffill"] for r in clicks] == [12.5, 12.5, 12.5, 7.0]
    views = [r.asDict() for r in out if r["event_type"] == "view"]
    assert len(views) == 1 and views[0]["n_events"] == 1


def test_cms_index_incremental_equals_oneshot(spark, tmp_path):
    from polars_incremental_spark.functions import sketches as sk

    idx = str(tmp_path / "cms")
    a = _cms_stream(spark, ["a", "a", "b", "x1", "x2"])
    b = _cms_stream(spark, ["a", "b", "b", "y1"])
    kw = dict(key_col="k", depth=3, width=64)
    assert sk.update_cms_index(a, idx, batch_id=1, **kw) is True
    assert sk.update_cms_index(b, idx, batch_id=2, **kw) is True
    merged, meta = sk.read_cms_index(spark, idx)
    whole = sk.cms_build(a.unionByName(b), **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    assert meta == {"depth": 3, "width": 64}
    # estimate through the index facade
    keys = _cms_stream(spark, ["a", "b", "never"])
    est = {
        r["k"]: r["est_count"]
        for r in sk.cms_index_estimate(spark, idx, keys, key_col="k").collect()
    }
    assert est["a"] >= 3 and est["b"] >= 3 and est["never"] == 0


def test_cms_index_replay_is_noop(spark, tmp_path):
    from polars_incremental_spark.functions import sketches as sk

    idx = str(tmp_path / "cms")
    a = _cms_stream(spark, ["a", "a", "b"])
    kw = dict(key_col="k", depth=2, width=32)
    assert sk.update_cms_index(a, idx, batch_id=7, **kw) is True
    before = sorted(map(tuple, sk.read_cms_index(spark, idx)[0].collect()))
    # same batch id replayed (Pipeline retry) — must NOT double count
    assert sk.update_cms_index(a, idx, batch_id=7, **kw) is False
    assert sorted(map(tuple, sk.read_cms_index(spark, idx)[0].collect())) == before
    # ad-hoc identical batch: content-addressed, second fold is a no-op
    assert sk.update_cms_index(a, idx, **kw) is True  # new counts (no batch id)
    assert sk.update_cms_index(a, idx, **kw) is False
    # parameter mismatch is refused loudly
    import pytest

    with pytest.raises(ValueError, match="refusing update"):
        sk.update_cms_index(a, idx, key_col="k", depth=4, width=32)


def test_cms_index_compaction_preserves_counts_and_blocks_replay(
    spark, tmp_path
):
    from polars_incremental_spark.functions import sketches as sk

    idx = str(tmp_path / "cms")
    kw = dict(key_col="k", depth=2, width=32)
    for i, items in enumerate((["a", "b"], ["a", "c"], ["b", "b"])):
        assert sk.update_cms_index(
            _cms_stream(spark, items), idx, batch_id=i, **kw
        )
    before = sorted(map(tuple, sk.read_cms_index(spark, idx)[0].collect()))
    assert sk.compact_cms_index(spark, idx) == 3
    assert sorted(map(tuple, sk.read_cms_index(spark, idx)[0].collect())) == before
    # a batch folded BEFORE compaction replayed AFTER it: still a no-op
    assert (
        sk.update_cms_index(_cms_stream(spark, ["a", "b"]), idx, batch_id=0, **kw)
        is False
    )
    assert sorted(map(tuple, sk.read_cms_index(spark, idx)[0].collect())) == before
    # nothing left to compact
    assert sk.compact_cms_index(spark, idx) == 0


# --------------------------------------------------------------------------
# Quantile sketch (u19)
# --------------------------------------------------------------------------


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, v double")


def test_quantile_sketch_exact_when_k_covers_group(spark):
    from polars_incremental_spark.functions import sketches as sk

    rows = [("a", i, float(i)) for i in range(1, 101)]
    df = _vals(spark, rows)
    skdf = sk.quantile_sketch(
        df, group_cols=["g"], value_col="v", id_col="id", k=500
    )
    [r] = skdf.select(
        "g",
        sk.quantile_estimate_expr("qsk", 0.5).alias("p50"),
        sk.quantile_estimate_expr("qsk", 0.9).alias("p90"),
        sk.quantile_estimate_expr("qsk", 0.01).alias("p01"),
    ).collect()
    # k >= group size: the "sample" is the whole group, nearest-rank exact
    assert (r["p50"], r["p90"], r["p01"]) == (50.0, 90.0, 1.0)


def test_quantile_sketch_merge_equals_oneshot(spark):
    from polars_incremental_spark.functions import sketches as sk

    a = _vals(spark, [("a", i, float(i * 7 % 100)) for i in range(200)])
    b = _vals(spark, [("a", i, float(i * 3 % 100)) for i in range(200, 350)])
    kw = dict(group_cols=["g"], value_col="v", id_col="id", k=64)
    merged = sk.quantile_sketch_merge(
        sk.quantile_sketch(a, **kw).unionByName(sk.quantile_sketch(b, **kw)),
        group_cols=["g"],
        k=64,
    )
    whole = sk.quantile_sketch(a.unionByName(b), **kw)
    [m], [w] = merged.collect(), whole.collect()
    assert [tuple(e) for e in m["qsk"]] == [tuple(e) for e in w["qsk"]]
    assert len(m["qsk"]) == 64


def test_quantile_sketch_estimate_within_sampling_error(spark):
    from polars_incremental_spark.functions import sketches as sk

    # 10k uniform values 0..9999: p50 should land near 5000 for k=256
    rows = [("a", i, float(i)) for i in range(10_000)]
    df = _vals(spark, rows)
    skdf = sk.quantile_sketch(
        df, group_cols=["g"], value_col="v", id_col="id", k=256
    )
    [r] = skdf.select(
        sk.quantile_estimate_expr("qsk", 0.5).alias("p50")
    ).collect()
    # 4-sigma rank-space bound: 0.5*10000 +- 4*sqrt(.25/256)*10000
    assert abs(r["p50"] - 5000) < 1300, r["p50"]
    with __import__("pytest").raises(ValueError, match="k must be"):
        sk.quantile_sketch(df, group_cols=["g"], value_col="v", id_col="id", k=0)


def test_cms_weighted_build_equals_raw_stream(spark):
    from polars_incremental_spark.functions import sketches as sk

    items = ["a"] * 5 + ["b"] * 2 + ["c"]
    raw = sk.cms_build(_cms_stream(spark, items), key_col="k", depth=3, width=16)
    agg = (
        _cms_stream(spark, items).groupBy("k").agg(F.count("*").alias("n"))
    )
    weighted = sk.cms_build(agg, key_col="k", depth=3, width=16, weight_col="n")
    assert sorted(map(tuple, raw.collect())) == sorted(
        map(tuple, weighted.collect())
    )


# --------------------------------------------------------------------------
# Prefix-filtering exact similarity join (d17)
# --------------------------------------------------------------------------


def test_prefix_filter_exact_no_false_negatives(spark):
    """Brute-force cross-check on a corpus where prefixes genuinely prune:
    every qualifying pair must survive, every non-qualifying one must not."""
    import itertools

    from polars_incremental_spark.functions import dedup

    base = [f"w{i}" for i in range(30)]
    texts = {
        1: " ".join(base),
        2: " ".join(base[:24] + [f"x{i}" for i in range(6)]),   # high overlap
        3: " ".join(base[:12] + [f"y{i}" for i in range(18)]),  # mid overlap
        4: " ".join(f"z{i}" for i in range(30)),                # disjoint
    }
    df = _docs(spark, list(texts.items()))
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.prefix_filter_pairs(df, threshold=0.3).collect()
    }

    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        j = round(len(sa & sb) / len(sa | sb), 6)
        if j >= 0.3:
            want[(a, b)] = j
    assert got == want and len(want) > 0


def test_prefix_filter_threshold_validation(spark):
    import pytest

    from polars_incremental_spark.functions import dedup

    df = _docs(spark, [(1, "a b c d")])
    with pytest.raises(ValueError, match="threshold"):
        dedup.prefix_filter_pairs(df, threshold=0.0)


def test_activity_streaks_islands_semantics(spark, monkeypatch):
    import datetime as dt

    from polars_incremental_spark import queries as q

    def day(n):
        return dt.datetime(2024, 1, n)

    rows = []
    eid = 0
    # user 1: days 1,2,3  7,8  10  -> 3 streaks, longest 3, 6 active days
    for n in (1, 2, 3, 7, 8, 10):
        for _ in range(2):  # duplicate events same day collapse
            eid += 1
            rows.append((eid, day(n), 1, "view", 1.0))
    # user 2: single day
    eid += 1
    rows.append((eid, day(5), 2, "click", 1.0))
    ev = _events(spark, rows)
    monkeypatch.setattr(q, "load_table", lambda s, d, t: ev)
    out = {r["user_id"]: r.asDict() for r in q.r38_activity_streaks(spark, "x").collect()}
    assert out[1]["n_active_days"] == 6
    assert out[1]["n_streaks"] == 3
    assert out[1]["longest_streak"] == 3
    assert out[2] == {
        "user_id": 2, "n_active_days": 1, "n_streaks": 1, "longest_streak": 1
    }


def test_avi_walker_roundtrip_and_stats(spark):
    from polars_incremental_spark.functions.multimodal import (
        avi_container,
        parse_avi,
        video_container_stats,
    )

    f1, f2, f3 = b"\x01" * 10, b"\x02" * 7, b"\x03" * 20  # odd size pads
    avi = avi_container([f1, f2, f3], width=8, height=6, us_per_frame=33_333)
    w, h, uspf, frames = parse_avi(avi)
    assert (w, h, uspf) == (8, 6, 33_333)
    # the index points at the REAL payload bytes (seekable without decode)
    assert [avi[o : o + s] for o, s in frames] == [f1, f2, f3]

    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"RIFFxxxxJUNK")), (3, None)],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r.asDict() for r in video_container_stats(df).collect()}
    ok = got[1]
    assert (ok["width"], ok["height"], ok["n_frames"]) == (8, 6, 3)
    assert ok["total_frame_bytes"] == 37 and ok["max_frame_bytes"] == 20
    assert ok["duration_ms"] == 3 * 33_333 // 1000
    assert ok["decode_error"] is None
    # per-item isolation: junk and null rows report errors, never a dead stage
    assert got[2]["decode_error"] and got[2]["n_frames"] is None
    assert got[3]["decode_error"] == "null content"


def test_avi_walker_rejects_truncated_header(spark):
    from polars_incremental_spark.functions.multimodal import avi_container, parse_avi

    import pytest as _pytest

    avi = avi_container([b"x" * 4])
    with _pytest.raises(ValueError, match="avih"):
        parse_avi(avi[:20] + b"\x00" * 4)  # header chunk destroyed
    with _pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
