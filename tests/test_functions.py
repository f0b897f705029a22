"""Unit tests for the LLM-pipeline operators: dedup / text / similarity / multimodal.

Covers the md5-portability contract (signatures reproducible from Python's
hashlib), skew edges (empty text, single-token docs), and the LSH-candidate
containment invariant.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.functions import dedup, multimodal, similarity
from polars_incremental_spark.functions import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "dog lazy the over jumps fox brown quick the"),  # word-order shuffle of 0
        (3, "the quick brown fox jumps over the lazy cat today"),  # near-dup
        (4, "completely different content about spark engines"),
        (5, ""),  # empty text edge
        (6, "single"),  # single-token edge
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ------------------------------------------------------------------- dedup


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["n_copies"] == 2
    assert out[0]["keeper_id"] == 0


def test_dedup_exact_keeps_min_id(docs):
    survivors = {r["doc_id"] for r in dedup.dedup_exact(docs).collect()}
    assert survivors == {0, 2, 3, 4, 5, 6}


def test_fingerprint_collapses_word_order(docs):
    groups = dedup.fingerprint_duplicates(docs).collect()
    # docs 0,1,2 share the normalized-bag fingerprint
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 3
    assert groups[0]["keeper_id"] == 0


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs  # near-dup above threshold
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard_doc_freq_cap(docs):
    # cap at 1 → any shingle shared by 2+ docs is dropped → no pairs survive
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_doc_freq=1).collect()
    assert pairs == []


def test_minhash_signature_matches_hashlib(docs):
    """md5-portability: signatures must be reproducible outside Spark."""
    sigs = {
        r["doc_id"]: r["minhash"]
        for r in dedup.minhash_signatures(docs, num_hashes=8).collect()
    }

    def py_minhash(text: str, i: int) -> int:
        toks = text.lower().split()
        n = 3
        count = max(len(toks) - n, 0) + 1
        shingles = {" ".join(toks[j : j + n]) for j in range(count)}
        a, b = dedup.minhash_params(i)
        best = None
        for s in shingles:
            h32 = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
            v = (a * h32 + b) % dedup.MINHASH_PRIME
            best = v if best is None else min(best, v)
        return best

    for doc_id, text in [(0, "the quick brown fox jumps over the lazy dog"), (6, "single")]:
        for i in range(8):
            assert sigs[doc_id][i] == py_minhash(text, i), (doc_id, i)


def test_minhash_identical_docs_same_signature(docs):
    sigs = {r["doc_id"]: r["minhash"] for r in dedup.minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[4]


def test_lsh_pairs_subset_of_exact(docs):
    exact = {
        (r["id_a"], r["id_b"]) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    assert lsh <= exact
    assert (0, 1) in lsh  # identical docs always collide in every band


def test_simhash_close_for_similar(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sigs[0] == sigs[1] == sigs[2]  # same token set
    ham = bin(sigs[0] ^ sigs[3]).count("1")
    assert ham <= 6  # near-dup stays close in Hamming space


# -------------------------------------------------------------------- text


def test_token_count_edges(spark):
    df = spark.createDataFrame([(0, ""), (1, "one"), (2, "  two  words  ")], ["i", "t"])
    out = {r["i"]: r["n"] for r in df.select("i", tx.token_count(F.col("t")).alias("n")).collect()}
    assert out[1] == 1 and out[2] == 2
    assert out[0] == 1  # split('') → [''] — documented edge, mirrored in the oracle


def test_quality_and_ratios(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on the mat with a hat and a bat")], ["i", "t"]
    )
    row = df.select(
        tx.punct_ratio(F.col("t")).alias("pr"),
        tx.stopword_ratio(F.col("t"), "en").alias("sr"),
        tx.quality_score(F.col("t")).alias("q"),
    ).collect()[0]
    assert row["pr"] == 0.0
    assert row["sr"] > 0.3
    assert 0.0 <= row["q"] <= 1.0


def test_lang_id_votes(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog in a house"),
            (1, "el perro y la casa de un gato"),
            (2, "xyzzy plugh qwerty"),
        ],
        ["i", "t"],
    )
    out = {r["i"]: r["lang"] for r in df.select("i", tx.lang_id(F.col("t")).alias("lang")).collect()}
    assert out[0] == "en" and out[1] == "es" and out[2] == "und"


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(0, "a b")], ["i", "t"])
    out = df.select(tx.word_shingles(F.col("t"), 3).alias("s")).collect()[0]["s"]
    assert out == ["a b"]  # shorter than n → one truncated shingle


def test_md5_long_matches_hashlib(spark):
    df = spark.createDataFrame([("abc",)], ["s"])
    row = df.select(
        tx.md5_long(F.col("s")).alias("h15"), tx.md5_long(F.col("s"), 8).alias("h8")
    ).collect()[0]
    hex_ = hashlib.md5(b"abc").hexdigest()
    assert row["h15"] == int(hex_[:15], 16)
    assert row["h8"] == int(hex_[:8], 16)


# -------------------------------------------------------------- similarity


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_ranks(vectors):
    q = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.cosine_topk(vectors, q, k=2).collect()
    assert [(r["vec_id"], r["rank"]) for r in out] == [(1, 1), (2, 2)]
    assert out[0]["cosine_sim"] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)


def test_lsh_ann_same_bucket_recall(vectors):
    q = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.lsh_ann_topk(vectors, q, dim=3, k=2, n_planes=2).collect()
    # vec 1 is nearly parallel to the query → same sign sketch → retrieved
    assert 1 in {r["vec_id"] for r in out}
    # the opposite vector lands in the opposite bucket → never retrieved
    assert 4 not in {r["vec_id"] for r in out}


# -------------------------------------------------------------- multimodal


def test_multimodal_features_roundtrip(docs):
    media = multimodal.synthesize_media(docs)
    feats = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert feats[0]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert feats[5]["n_bytes"] == 0 and feats[5]["byte_entropy"] == 0.0
    assert feats[0]["head_hex"] == "the quick".encode()[:8].hex()
    assert feats[0]["byte_entropy"] > 0


def test_multimodal_entropy_matches_reference_impl(docs):
    media = multimodal.synthesize_media(docs)
    row = multimodal.extract_features(media).filter(F.col("media_id") == 0).collect()[0]
    data = b"the quick brown fox jumps over the lazy dog"
    counts: dict[int, int] = {}
    for byte in data:
        counts[byte] = counts.get(byte, 0) + 1
    n = len(data)
    expected = -sum((c / n) * math.log2(c / n) for c in counts.values())
    assert row["byte_entropy"] == pytest.approx(expected, abs=1e-6)


def test_frame_sampler_fanout(docs):
    media = multimodal.synthesize_media(docs.filter(F.col("doc_id") == 0))
    frames = multimodal.sample_frames(media, every_ms=100).collect()
    assert len(frames) == max(len("the quick brown fox jumps over the lazy dog") * 10 // 100, 1)
    joined = b"".join(bytes(r["frame_bytes"]) for r in sorted(frames, key=lambda r: r["frame_idx"]))
    assert joined.startswith(b"the quick")


def test_decode_image_unsupported_formats_raise():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish payload")


def _ppm_bytes(pixels):
    """pixels: (H, W, 3) uint8 numpy array -> binary P6 with a comment."""
    h, w = pixels.shape[:2]
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _bmp_bytes(pixels, top_down=False):
    """pixels: (H, W, 3) uint8 RGB -> 24-bit BI_RGB BMP (rows 4B-padded)."""
    import struct

    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    body = bytearray()
    rows = pixels if top_down else pixels[::-1]
    for row in rows:
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # RGB -> BGR
        line += b"\x00" * (stride - len(line))
        body += line
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header + dib + body)


def test_decode_ppm_and_bmp_real_decoders():
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(multimodal.decode_image(_ppm_bytes(img)), img)
    assert np.array_equal(multimodal.decode_image(_bmp_bytes(img)), img)
    assert np.array_equal(multimodal.decode_image(_bmp_bytes(img, top_down=True)), img)


def test_decode_image_features_spark(spark):
    """Real decode inside mapInPandas: good PPM + good BMP + corrupt item."""
    import numpy as np

    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    rows = [
        (1, bytearray(_ppm_bytes(img))),
        (2, bytearray(_bmp_bytes(img))),
        (3, bytearray(b"\xffnot an image")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in multimodal.decode_image_features(df).collect()}
    for mid in (1, 2):
        assert (out[mid]["width"], out[mid]["height"]) == (4, 2)
        means = img.reshape(-1, 3).mean(axis=0)
        assert out[mid]["mean_r"] == pytest.approx(float(means[0]), abs=1e-6)
        assert out[mid]["mean_b"] == pytest.approx(float(means[2]), abs=1e-6)
        assert out[mid]["decode_error"] is None
    assert out[3]["width"] is None and out[3]["decode_error"]
    assert out[4]["decode_error"] == "null content"


@pytest.mark.slow  # round-13 tiering: long randomized/property probe
def test_cosine_near_dup_exact_vs_lsh(vectors):
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in similarity.cosine_near_dup_pairs(
            vectors, dim=3, threshold=0.8, exact=True
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in similarity.cosine_near_dup_pairs(
            vectors, dim=3, threshold=0.8, n_planes=8, band_size=2
        ).collect()
    }
    assert (0, 1) in exact and exact[(0, 1)] > 0.99
    assert set(lsh) <= set(exact)  # verify step kills all false positives
    assert (0, 1) in lsh  # near-parallel vectors collide in some band


def test_cosine_near_dup_rejects_bad_bands(vectors):
    with pytest.raises(ValueError):
        similarity.cosine_near_dup_pairs(vectors, dim=3, n_planes=7, band_size=2)


# ------------------------------------------------------------------- joins


def test_asof_join_backward_inclusive(spark):
    import datetime as dt

    from polars_incremental_spark.functions.joins import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame(
        [(1, "a", t(10)), (2, "a", t(5)), (3, "a", t(1)), (4, "b", t(10))],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [("a", t(5), "r5"), ("a", t(8), "r8")], ["k", "ts", "v"]
    )
    out = {
        r["event_id"]: (r["v_r"], r["ts_r"])
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out[1] == ("r8", t(8))      # latest prior
    assert out[2] == ("r5", t(5))      # equal ts matches (inclusive)
    assert out[3] == (None, None)      # nothing prior → left-join nulls
    assert out[4] == (None, None)      # other key group untouched


def test_asof_join_forward_nearest_tolerance(spark):
    import datetime as dt

    from polars_incremental_spark.functions.joins import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame(
        [(1, "a", t(10)), (2, "a", t(5)), (3, "a", t(50)), (4, "b", t(10))],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [("a", t(5), "r5"), ("a", t(12), "r12"), ("a", t(30), "r30")],
        ["k", "ts", "v"],
    )

    def run(**kw):
        return {
            r["event_id"]: (r["v_r"], r["ts_r"])
            for r in asof_join(left, right, on=["k"], **kw).collect()
        }

    fwd = run(direction="forward")
    assert fwd[1] == ("r12", t(12))    # earliest at-or-after
    assert fwd[2] == ("r5", t(5))      # equal ts matches (inclusive)
    assert fwd[3] == (None, None)      # nothing after → nulls
    assert fwd[4] == (None, None)

    near = run(direction="nearest")
    assert near[1] == ("r12", t(12))   # |12-10| < |10-5|
    assert near[2] == ("r5", t(5))     # exact hit
    assert near[3] == ("r30", t(30))   # only backward side exists

    # equidistant -> backward wins (polars tie rule)
    tie_left = spark.createDataFrame([(9, "a", t(20))], ["event_id", "k", "ts"])
    tie = {
        r["event_id"]: r["v_r"]
        for r in asof_join(
            tie_left,
            spark.createDataFrame(
                [("a", t(15), "back"), ("a", t(25), "fwd")], ["k", "ts", "v"]
            ),
            on=["k"],
            direction="nearest",
        ).collect()
    }
    assert tie[9] == "back"

    tol = run(direction="backward", tolerance="3 minutes")
    assert tol[1] == (None, None)      # r8 absent; r5 is 5 min away > 3
    assert tol[2] == ("r5", t(5))      # 0 min away
    tol_n = run(direction="nearest", tolerance="3 minutes")
    assert tol_n[1] == ("r12", t(12))  # forward 2 min within tolerance
    assert tol_n[3] == (None, None)    # nearest (r30) is 20 min away

    with pytest.raises(ValueError, match="direction"):
        run(direction="sideways")


def test_range_join_bucketed_matches_naive(spark):
    import datetime as dt

    from polars_incremental_spark.functions.joins import range_join_bucketed

    t = lambda m, s=0: dt.datetime(2024, 1, 1, 12, m, s)
    left = spark.createDataFrame(
        [(1, "a", t(20)), (2, "a", t(3)), (3, "b", t(20))], ["eid", "k", "ts"]
    )
    right = spark.createDataFrame(
        [("a", t(11), "in"), ("a", t(20), "edge0"), ("a", t(9, 59), "out_old"),
         ("a", t(21), "after"), ("b", t(15), "bmatch")],
        ["k", "ts", "tag"],
    )
    out = range_join_bucketed(
        left, right, on=["k"], lower="INTERVAL 0 SECONDS", upper="INTERVAL 10 MINUTES"
    )
    got = {(r["eid"], r["tag_r"]) for r in out.collect()}
    # naive reference: right.ts in [left.ts - 10min, left.ts]
    naive = set()
    for eid, k, lts in [(1, "a", t(20)), (2, "a", t(3)), (3, "b", t(20))]:
        for rk, rts, tag in [("a", t(11), "in"), ("a", t(20), "edge0"), ("a", t(9, 59), "out_old"),
                             ("a", t(21), "after"), ("b", t(15), "bmatch")]:
            if k == rk and lts - dt.timedelta(minutes=10) <= rts <= lts:
                naive.add((eid, tag))
    assert got == naive
    assert (1, "in") in got and (1, "edge0") in got and (1, "out_old") not in got


# --------------------------------------------------------------------- IVF


def test_ivf_assign_is_nearest_centroid(vectors):
    # centroids = the three axes; every vector must land on its nearest axis
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    cells = {
        r["vec_id"]: r["__cell"]
        for r in similarity.ivf_assign(vectors, cents).collect()
    }
    assert cells[0] == 1 and cells[1] == 1  # x-ish vectors → x centroid
    assert cells[2] == 2 and cells[3] == 3
    # the anti-parallel vector ties at 0-similarity rounding aside; cosine
    # to x-axis is -1, to y/z is 0 → nearest is y (lowest cell among ties)
    assert cells[4] == 2


def test_ivf_topk_exact_within_probed_cells(vectors):
    q = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # probe every cell → IVF degenerates to exact search
    out = similarity.ivf_topk(vectors, q, k=2, n_cells=3, n_probe=3).collect()
    assert [(r["vec_id"], r["rank"]) for r in out] == [(1, 1), (2, 2)]


def test_ivf_recall_vs_exact(spark, sf_dir):
    from polars_incremental_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(emb, q, k=5, n_cells=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # deterministic given fixed data; probing 4/16 cells must beat random
    assert recall >= 0.4, recall


def test_ivf_refine_does_not_increase_inertia(spark, sf_dir):
    from polars_incremental_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    seeds = similarity._seed_centroids(emb, 8, "vec_id", "embedding")
    before = similarity.ivf_inertia(emb, seeds)
    refined = similarity.ivf_refine_centroids(emb, seeds, n_iter=2)
    after = similarity.ivf_inertia(emb, refined)
    assert after <= before + 1e-9, (before, after)


def test_simhash_banding_is_exact(spark, sf_dir):
    """Pigeonhole guarantee: band blocking loses NO pair within the radius."""
    from itertools import combinations

    from polars_incremental_spark.tables import load_table

    doc = load_table(spark, sf_dir, "documents").limit(200)
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dup_pairs(doc, bits=16, max_hamming=3).collect()
    }
    sigs = sorted(
        (r["doc_id"], r["simhash"]) for r in dedup.simhash(doc).collect()
    )
    brute = {
        (a_id, b_id): bin(a_sig ^ b_sig).count("1")
        for (a_id, a_sig), (b_id, b_sig) in combinations(sigs, 2)
        if bin(a_sig ^ b_sig).count("1") <= 3
    }
    assert banded == brute


def test_incremental_lsh_dedup_across_batches(spark, tmp_path):
    idx = str(tmp_path / "lsh_index")
    base = (
        "the quick brown fox jumps over the lazy dog near the old stone "
        "bridge while the miller grinds wheat into flour for the village"
    )
    variant = base.replace("lazy", "sleepy")  # near-dup of base
    other = (
        "completely different subject matter entirely about spacecraft "
        "propulsion systems and orbital mechanics calculations in vacuum"
    )
    b1 = spark.createDataFrame(
        [(1, base), (2, variant), (3, other)], ["doc_id", "text"]
    )
    s1 = dedup.incremental_lsh_dedup(b1, idx, threshold=0.5, batch_id=0)
    assert sorted(r["doc_id"] for r in s1.collect()) == [1, 3]

    # batch 2: 4 near-dups the INDEXED doc 1; 5 is new
    b2 = spark.createDataFrame(
        [(4, base.replace("village", "town")), (5, "unrelated short poem about rain falling gently on rooftops at midnight in autumn")],
        ["doc_id", "text"],
    )
    s2 = dedup.incremental_lsh_dedup(b2, idx, threshold=0.5, batch_id=1)
    assert sorted(r["doc_id"] for r in s2.collect()) == [5]

    # replay of batch 1 (same batch_id) overwrites its index dir: no growth
    dedup.incremental_lsh_dedup(b1, idx, threshold=0.5, batch_id=0)
    indexed = spark.read.parquet(idx + "/batch_*")
    assert sorted(r["doc_id"] for r in indexed.collect()) == [1, 3, 5]


def test_repetition_ratio_known_value(spark):
    df = spark.createDataFrame([(1, "a b a b a b a b"), (2, "w x y z q r")], ["doc_id", "text"])
    out = {r["doc_id"]: r["rep"] for r in df.select(
        "doc_id", tx.repetition_ratio(F.col("text"), 3).alias("rep")
    ).collect()}
    # 6 trigrams, 2 distinct -> 1 - 2/6
    assert out[1] == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert out[2] == 0.0


def test_compact_lsh_index(spark, tmp_path):
    idx = str(tmp_path / "idx")
    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten eleven"),
        (3, "red orange yellow green blue indigo violet ultraviolet infrared light"),
    ]
    for i, row in enumerate(texts):
        dedup.incremental_lsh_dedup(
            spark.createDataFrame([row], ["doc_id", "text"]), idx, batch_id=i
        )
    import glob

    assert len(glob.glob(idx + "/batch_*")) == 3
    before = sorted(r["doc_id"] for r in spark.read.parquet(idx + "/batch_*").collect())
    removed = dedup.compact_lsh_index(spark, idx)
    assert removed == 3 and len(glob.glob(idx + "/batch_*")) == 1
    after = sorted(r["doc_id"] for r in spark.read.parquet(idx + "/batch_*").collect())
    assert after == before == [1, 2, 3]
    # dedup still works against the compacted index
    dup = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta eta theta iota jumbo")],
        ["doc_id", "text"],
    )
    assert dedup.incremental_lsh_dedup(dup, idx, threshold=0.5, batch_id=9).count() == 0


def test_similarity_zero_vector_does_not_crash(spark):
    """Round-3 review: a zero-norm embedding anywhere must not kill the job
    with DIVIDE_BY_ZERO (ANSI mode); it is skipped, not scored."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),  # degenerate
        (3, [0.0, 1.0]),
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(vecs, q, k=4).collect()
    assert 2 not in {r["vec_id"] for r in exact}
    ivf = similarity.ivf_topk(vecs, q, k=4, n_cells=2, n_probe=2).collect()
    assert 2 not in {r["vec_id"] for r in ivf}
    # zero vector as the QUERY: returns nothing rather than crashing
    zq = vecs.filter(F.col("vec_id") == 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert similarity.cosine_topk(vecs, zq, k=2).count() == 0


def test_simhash_bits_out_of_range_raises(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match=r"\[1, 60\]"):
        dedup.simhash(df, bits=64)
    # the documented corpus-scale config works
    assert dedup.simhash_near_dup_pairs(df, bits=60, max_hamming=3).count() == 0


def test_ivf_assign_arrow_agrees_with_expr(spark):
    """The BLAS matmul scale path must produce the same cell assignment as
    the oracle-checked expression path, including NULL for zero vectors,
    NULL embeddings, and wrong-dimension embeddings (round-3 review: the
    arrow path used to crash on a NULL row the expr path tolerates)."""
    rows = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)]) for i in range(200)]
    rows.append((200, [0.0] * 8))  # zero vector -> NULL cell in both paths
    rows.append((201, None))  # NULL embedding -> NULL cell, no crash
    rows.append((202, [1.0] * 5))  # wrong dim -> NULL cell in both paths
    vecs = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    cents = similarity._seed_centroids(vecs.filter("vec_id < 200"), 6, "vec_id", "embedding")
    a = similarity.ivf_assign(vecs, cents, method="expr").select("vec_id", "__cell")
    b = similarity.ivf_assign(vecs, cents, method="arrow").select("vec_id", "__cell")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    nulls = dict(b.collect())
    assert nulls[200] is None and nulls[201] is None and nulls[202] is None
    with pytest.raises(ValueError, match="expr|arrow"):
        similarity.ivf_assign(vecs, cents, method="bogus")


def test_pq_assign_arrow_fused_agrees_with_chained(spark):
    """The fused multi-subspace arrow assigner (one mapInPandas crossing
    for all subspaces — round-12 optimization) must match chaining
    ivf_assign per subspace, including NULL/zero/ragged rows, and the
    arrow-trained PQ pipeline must match the expr-trained one end-to-end."""
    import pyspark.sql.functions as SF

    rows = [
        (i, [float((i * 5 + d * 7) % 13) - 6.0 for d in range(8)])
        for i in range(100)
    ]
    rows.append((100, [0.0] * 8))
    rows.append((101, None))
    rows.append((102, [1.0] * 3))
    vecs = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    sub = 4
    subs = vecs.select(
        "vec_id",
        SF.slice("embedding", 1, sub).alias("__sub_0"),
        SF.slice("embedding", sub + 1, sub).alias("__sub_1"),
    )
    cents = similarity._seed_centroids(
        vecs.filter("vec_id < 100"), 4, "vec_id", "embedding"
    )
    cbs = [[c[:sub] for c in cents], [c[sub:] for c in cents]]
    fused = similarity._pq_assign_arrow(
        subs, [("__sub_0", "__c0", cbs[0]), ("__sub_1", "__c1", cbs[1])]
    ).select("vec_id", "__c0", "__c1")
    chained = subs
    for i, cb in enumerate(cbs):
        chained = similarity.ivf_assign(
            chained, cb, vec_col=f"__sub_{i}", cell_col=f"__c{i}", method="expr"
        )
    chained = chained.select("vec_id", "__c0", "__c1")
    assert fused.exceptAll(chained).count() == 0
    assert chained.exceptAll(fused).count() == 0
    got = {r["vec_id"]: (r["__c0"], r["__c1"]) for r in fused.collect()}
    assert got[100] == (None, None) and got[101] == (None, None)
    assert got[102] == (None, None)
    # end-to-end: arrow-trained+encoded PQ top-k == expr-trained one
    q = vecs.filter("vec_id < 2").select(
        SF.col("vec_id").alias("query_id"), "embedding"
    )
    a = similarity.pq_topk(
        vecs, q, k=3, n_sub=2, n_codes=4, n_iter=1, dim=8, assign_method="arrow"
    )
    b = similarity.pq_topk(
        vecs, q, k=3, n_sub=2, n_codes=4, n_iter=1, dim=8, assign_method="expr"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_connected_components_chain_and_islands(spark):
    """Chain 1-2-3-4 collapses to one cluster labeled by its min id; a
    separate pair and an untouched doc stay distinct; convergence bound
    raises instead of returning partial labels."""
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    with pytest.raises(RuntimeError, match="converge"):
        dedup.connected_components(edges, max_iter=1)


def test_connected_components_cluster_then_keep_one(spark, docs):
    """End-to-end dedup recipe: pairs -> clusters -> keep min doc per
    cluster + all unpaired docs."""
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.3)
    clusters = dedup.connected_components(pairs)
    keep_clustered = clusters.groupBy("cluster_id").agg(
        F.min("doc_id").alias("doc_id")
    )
    unpaired = docs.join(clusters, on="doc_id", how="left_anti")
    survivors = {
        r["doc_id"]
        for r in unpaired.select("doc_id")
        .unionByName(keep_clustered.select("doc_id"))
        .collect()
    }
    # 0/1 are exact dups (cluster -> keep 0); 2 shares 0's word BAG but not
    # its 3-gram shingles (order matters), so it is correctly unpaired
    assert 0 in survivors and 1 not in survivors
    assert {2, 4, 5, 6}.issubset(survivors)


# --------------------------------------------------------------- sampling


def test_sample_by_hash_deterministic_and_sized(spark):
    from polars_incremental_spark.functions import sampling

    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    s1 = sampling.sample_by_hash(df, rate=0.2, key_col="k")
    n = s1.count()
    assert abs(n / 20000 - 0.2) < 0.02  # binomial 3-sigma ~ 0.0085
    # per-row determinism: same rows every time, regardless of partitioning
    s2 = sampling.sample_by_hash(df.repartition(7), rate=0.2, key_col="k")
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    # nested property: a higher-rate sample CONTAINS the lower-rate one
    s3 = sampling.sample_by_hash(df, rate=0.5, key_col="k")
    assert s1.exceptAll(s3).count() == 0
    # different seed draws an independent sample
    s4 = sampling.sample_by_hash(df, rate=0.2, key_col="k", seed="other")
    assert s4.exceptAll(s1).count() > 0
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        sampling.sample_by_hash(df, rate=1.5, key_col="k")


def test_hash_split_disjoint_stable_under_append(spark):
    from polars_incremental_spark.functions import sampling

    w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    base = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = sampling.hash_split(base, weights=w, key_col="k")
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}  # no NULL leakage
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    # appending new keys never moves an existing key's split
    bigger = sampling.hash_split(
        spark.range(0, 9000).withColumnRenamed("id", "k"), weights=w, key_col="k"
    )
    moved = (
        a.withColumnRenamed("split", "old")
        .join(bigger, on="k")
        .filter(F.col("old") != F.col("split"))
        .count()
    )
    assert moved == 0
    # remainder weight -> NULL holdout
    h = sampling.hash_split(base, weights={"train": 0.5}, key_col="k")
    assert h.filter(F.col("split").isNull()).count() > 0
    with pytest.raises(ValueError, match="> 1"):
        sampling.split_bounds({"a": 0.9, "b": 0.2})


def test_stratified_sample_rates(spark):
    from polars_incremental_spark.functions import sampling

    df = spark.range(0, 10000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "hot").otherwise("cold").alias("g"),
    )
    out = sampling.stratified_sample(
        df, strata_col="g", rates={"hot": 0.1}, key_col="k", default_rate=1.0
    )
    got = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert got["cold"] == 5000  # default rate keeps everything
    assert abs(got["hot"] / 5000 - 0.1) < 0.03


def test_pii_redaction_kinds_and_order(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a.b+c@sub.example.org now"),
            (1, "from 192.168.001.255 and 1.2.3.4."),
            (2, "call 555-123-4567 or 555.123.4567"),
            (3, "digits 12.34 ver 1.2.3 id 12345 stay"),
            (4, "mixed x@y.io 10.0.0.1 555-000-1111"),
        ],
        ["i", "t"],
    )
    out = {
        r["i"]: (r["red"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in df.select(
            "i", tx.redact_pii(F.col("t")).alias("red"), *tx.pii_counts(F.col("t"))
        ).collect()
    }
    assert out[0] == ("mail [EMAIL] now", 1, 0, 0)
    assert out[1] == ("from [IP] and [IP].", 0, 2, 0)
    assert out[2] == ("call [PHONE] or [PHONE]", 0, 0, 2)
    # short decimals / versions / bare digit runs are NOT redacted
    assert out[3] == ("digits 12.34 ver 1.2.3 id 12345 stay", 0, 0, 0)
    assert out[4] == ("mixed [EMAIL] [IP] [PHONE]", 1, 1, 1)


def test_quantize_roundtrip_and_quantized_topk(spark):
    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.9, -0.45, 0.2, 0.01]),
        (2, [-1.0, 1.0, -1.0, 1.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector -> NULL scale/codes
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qz = similarity.quantize_embeddings(vecs)
    got = {r["vec_id"]: r for r in qz.collect()}
    assert got[0]["q_embedding"] == [127, -64, 32, 0]
    assert got[3]["q_embedding"] is None and got[3]["q_scale"] is None
    # reconstruction error bounded by s/2 per component
    deq = similarity.dequantize_embeddings(qz.filter(F.col("vec_id") == 0), vec_col="deq")
    row = deq.collect()[0]
    for orig, rec in zip(rows[0][1], row["deq"]):
        assert abs(orig - rec) <= row["q_scale"] / 2 + 1e-12
    # quantized ranking matches exact ranking on well-separated vectors,
    # and the zero vector is skipped not crashed
    q = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = [r["vec_id"] for r in similarity.cosine_topk(vecs, q, k=2).collect()]
    quant = [r["vec_id"] for r in similarity.quantized_topk(vecs, q, k=2).collect()]
    assert quant == exact == [1, 2]


def test_tfidf_top_terms_prefers_rare_terms(spark):
    df = spark.createDataFrame(
        [
            (0, "common rare"),
            (1, "common word word"),
            (2, "common other other"),
        ],
        ["doc_id", "text"],
    )
    out = tx.tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' is in every doc -> lowest idf; each doc's distinctive term wins
    assert top == {0: "rare", 1: "word", 2: "other"}
    assert all(r["rank"] == 1 for r in out)


def test_kmv_accuracy_and_merge(spark):
    from polars_incremental_spark.functions import sketches

    df = spark.range(0, 12000).select(
        F.when(F.col("id") % 3 == 0, "big").otherwise("small").alias("g"),
        # 'big': 4000 distinct values; 'small': 40 distinct (< k -> exact)
        F.when(F.col("id") % 3 == 0, F.col("id"))
        .otherwise(F.col("id") % 40)
        .alias("v"),
    )
    est = {
        r["g"]: r["approx_distinct"]
        for r in sketches.kmv_distinct(
            df, group_cols=["g"], value_col="v", k=64
        ).collect()
    }
    assert est["small"] == 40  # below k -> exact by construction
    assert abs(est["big"] - 4000) / 4000 < 0.4  # ~1/sqrt(62) expected error
    # mergeability: union of two half-sketches == sketch of the whole
    lo = sketches.kmv_sketch(
        df.filter(F.col("v") % 2 == 0), group_cols=["g"], value_col="v", k=64
    )
    hi = sketches.kmv_sketch(
        df.filter(F.col("v") % 2 == 1), group_cols=["g"], value_col="v", k=64
    )
    merged = sketches.kmv_merge(lo.unionByName(hi), group_cols=["g"], k=64)
    whole = sketches.kmv_sketch(df, group_cols=["g"], value_col="v", k=64)
    joined = merged.withColumnRenamed("kmv_hashes", "m").join(whole, on="g")
    assert joined.filter(F.expr("m != kmv_hashes")).count() == 0
    with pytest.raises(ValueError, match=">= 3"):
        sketches.kmv_sketch(df, group_cols=["g"], value_col="v", k=2)


def test_chunk_dedup_first_occurrence_wins(spark):
    """Sub-document dedup: a chunk repeated across documents survives only
    at its lexicographically-first (doc_id, chunk_idx); a fully-duplicated
    document keeps its true n_chunks with clean_text='' ; the short tail
    chunk is handled; chunk_words < 1 raises."""
    rows = [
        (1, "a b c d e f g h"),  # chunks (w=4): "a b c d", "e f g h"
        (2, "a b c d x y z w"),  # first chunk repeats doc 1 -> dropped
        (3, "a b c d e f g h"),  # exact dup of doc 1 -> fully dropped
        (4, "q r"),              # single short chunk, unique
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup.chunk_dedup(df, chunk_words=4).collect()}
    assert out[1]["clean_text"] == "a b c d e f g h" and out[1]["n_kept"] == 2
    assert out[2]["clean_text"] == "x y z w" and out[2]["n_kept"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_chunks"] == 2 and out[3]["n_kept"] == 0
    assert out[4]["clean_text"] == "q r" and out[4]["n_chunks"] == 1
    with pytest.raises(ValueError, match="chunk_words"):
        dedup.chunk_dedup(df, chunk_words=0)


def test_contamination_stats_flags_overlap(spark):
    """Decontamination: a train doc sharing >= min_hits trigrams with the
    test set is flagged; clean docs report zero hits; the non-broadcast
    join path returns identical rows."""
    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about spark engines here"),
        ],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(101, "we say the quick brown fox jumps high today")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.contamination_stats(train, test, min_hits=2).collect()
    }
    # shared trigrams: "the quick brown", "quick brown fox", "brown fox jumps"
    assert out[0]["n_contaminated"] == 3 and out[0]["is_contaminated"]
    assert out[2]["n_contaminated"] == 0 and not out[2]["is_contaminated"]
    assert out[0]["n_ngrams"] == 7 and out[2]["n_ngrams"] == 5
    shuffled = dedup.contamination_stats(
        train, test, min_hits=2, broadcast_test=False
    )
    assert sorted(map(tuple, shuffled.collect())) == sorted(
        map(tuple, (r for r in out.values()))
    )
    with pytest.raises(ValueError, match="ngram"):
        dedup.contamination_stats(train, test, ngram=0)
    with pytest.raises(ValueError, match="min_hits"):
        dedup.contamination_stats(train, test, min_hits=0)


def test_bloom_decontaminate_probes_agree_and_superset_exact(spark):
    """The bloom flags every truly-contaminated n-gram (no false negatives),
    join and bitset probes agree bit-for-bit, and a small filter provably
    produces false positives (the bloom semantics is real, not an exact set
    in disguise)."""
    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about spark engines here"),
        ],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(101, "we say the quick brown fox jumps high today")], ["doc_id", "text"]
    )
    join_out = {
        r["doc_id"]: r
        for r in dedup.bloom_decontaminate(train, test, min_hits=2, probe="join").collect()
    }
    # no false negatives: the 3 truly-shared trigrams are always positive
    assert join_out[0]["n_bloom_positive"] >= 3 and join_out[0]["is_flagged"]
    assert join_out[0]["n_ngrams"] == 7 and join_out[2]["n_ngrams"] == 5
    bitset_out = dedup.bloom_decontaminate(train, test, min_hits=2, probe="bitset")
    assert sorted(map(tuple, bitset_out.collect())) == sorted(
        map(tuple, join_out.values())
    )
    # tiny filter -> collisions: strictly more positives than true overlaps
    tiny = {
        r["doc_id"]: r
        for r in dedup.bloom_decontaminate(
            train, test, min_hits=2, m_bits=16, k_hashes=1, probe="join"
        ).collect()
    }
    assert tiny[0]["n_bloom_positive"] > 3 or tiny[2]["n_bloom_positive"] > 0
    with pytest.raises(ValueError, match="probe"):
        dedup.bloom_decontaminate(train, test, probe="nope")
    with pytest.raises(ValueError, match="m_bits"):
        dedup.bloom_decontaminate(train, test, m_bits=1)


def test_asof_join_all_directions_vs_brute_force(spark):
    """Randomized (seeded) cross-check: every direction × tolerance against
    a per-row Python reference over a few hundred rows with duplicate
    timestamps across keys."""
    import datetime as dt
    import random

    from polars_incremental_spark.functions.joins import asof_join

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, f"k{rng.randint(0, 3)}", base + dt.timedelta(minutes=rng.randint(0, 120)))
        for i in range(120)
    ]
    rrows_raw = {
        (f"k{rng.randint(0, 3)}", base + dt.timedelta(minutes=rng.randint(0, 120)))
        for _ in range(80)
    }
    rrows = [(k, ts, float(i)) for i, (k, ts) in enumerate(sorted(rrows_raw))]
    left = spark.createDataFrame(lrows, ["event_id", "k", "ts"])
    right = spark.createDataFrame(rrows, ["k", "ts", "v"])

    def brute(direction, tol_minutes):
        out = {}
        for eid, k, ts in lrows:
            cand = [(rts, v) for rk, rts, v in rrows if rk == k]
            back = [c for c in cand if c[0] <= ts]
            fwd = [c for c in cand if c[0] >= ts]
            b = max(back, key=lambda c: c[0]) if back else None
            f = min(fwd, key=lambda c: c[0]) if fwd else None
            if tol_minutes is not None:
                lim = dt.timedelta(minutes=tol_minutes)
                b = b if b and ts - b[0] <= lim else None
                f = f if f and f[0] - ts <= lim else None
            if direction == "backward":
                pick = b
            elif direction == "forward":
                pick = f
            else:
                if b is None or (f is not None and ts - b[0] > f[0] - ts):
                    pick = f
                else:
                    pick = b  # ties and closer-or-equal backward
            out[eid] = pick
        return out

    for direction in ("backward", "forward", "nearest"):
        for tol, tol_minutes in ((None, None), ("15 minutes", 15)):
            got = {
                r["event_id"]: ((r["ts_r"], r["v_r"]) if r["ts_r"] else None)
                for r in asof_join(
                    left, right, on=["k"], direction=direction, tolerance=tol
                ).collect()
            }
            assert got == brute(direction, tol_minutes), (direction, tol)


def test_grouped_topk_matches_plain_window(spark):
    """Two-phase salted top-k == single-window top-k, for any n_salts."""
    from pyspark.sql import Window

    from polars_incremental_spark.functions import curation

    rows = [(f"g{i % 3}", i, float((i * 37) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, ["grp", "rid", "score"])
    order = [F.col("score").desc(), F.col("rid").asc()]
    w = Window.partitionBy("grp").orderBy(*order)
    expected = sorted(
        map(
            tuple,
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .collect(),
        )
    )
    for n_salts in (1, 4, 64):
        got = sorted(
            map(
                tuple,
                curation.grouped_topk(
                    df, ["grp"], order, 5, salt_col="rid", n_salts=n_salts
                ).collect(),
            )
        )
        assert got == expected, n_salts
    with pytest.raises(ValueError, match="k must"):
        curation.grouped_topk(df, ["grp"], order, 0, salt_col="rid")


def test_grouped_topk_small_groups_survive(spark):
    """Groups smaller than k keep all their rows, ranked densely."""
    from polars_incremental_spark.functions import curation

    df = spark.createDataFrame([("a", 1, 1.0), ("b", 2, 2.0)], ["grp", "rid", "score"])
    out = curation.grouped_topk(
        df, ["grp"], [F.col("score").desc(), F.col("rid")], 10, salt_col="rid"
    ).collect()
    assert {(r["grp"], r["rank"]) for r in out} == {("a", 1), ("b", 1)}


def test_keep_canonical_resolves_clusters(spark):
    """Clustered docs collapse to the min-id member; unclustered pass through."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], ["doc_id", "text"]
    )
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (3, 3), (4, 3)], ["doc_id", "cluster_id"]
    )
    out = {r["doc_id"] for r in dedup.keep_canonical(docs, clusters).collect()}
    assert out == {0, 2, 3, 5}


def test_incremental_bloom_index_matches_one_shot(spark, tmp_path):
    """Two index batches == one-shot bloom on their union (bloom union is
    bitwise or); replaying a batch_id is idempotent; parameter drift and
    empty indexes are refused."""
    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about spark engines here"),
        ],
        ["doc_id", "text"],
    )
    test_a = spark.createDataFrame(
        [(101, "we say the quick brown fox jumps high today")], ["doc_id", "text"]
    )
    test_b = spark.createDataFrame(
        [(102, "spark engines here are not a benchmark sentence")], ["doc_id", "text"]
    )
    idx = str(tmp_path / "bloom_idx")
    dedup.update_bloom_index(test_a, idx, batch_id=0)
    dedup.update_bloom_index(test_b, idx, batch_id=1)
    dedup.update_bloom_index(test_b, idx, batch_id=1)  # idempotent replay

    indexed = sorted(
        map(
            tuple,
            dedup.bloom_decontaminate_indexed(
                spark, train, idx, min_hits=2
            ).collect(),
        )
    )
    one_shot = sorted(
        map(
            tuple,
            dedup.bloom_decontaminate(
                train, test_a.union(test_b), min_hits=2, probe="bitset"
            ).collect(),
        )
    )
    assert indexed == one_shot
    # doc 0 shares 3 trigrams with test_a -> flagged at min_hits=2; doc 2
    # shares exactly 1 ("spark engines here") with test_b -> positive but
    # below the flag threshold
    rows = {r[0]: r for r in indexed}
    assert rows[0][4] and rows[0][2] >= 3
    assert rows[2][2] >= 1 and not rows[2][4]

    with pytest.raises(ValueError, match="refusing update"):
        dedup.update_bloom_index(test_a, idx, m_bits=1 << 10)
    with pytest.raises(ValueError, match="no batches"):
        empty_idx = str(tmp_path / "empty_idx")
        dedup.update_bloom_index(test_a, empty_idx, batch_id=0)
        import shutil

        shutil.rmtree(f"{empty_idx}/batch_0")
        dedup.bloom_decontaminate_indexed(spark, train, empty_idx)


def test_round4_ops_empty_inputs(spark):
    """Every round-4 operator degrades cleanly on empty frames — at 100 TB
    an empty partition/batch is routine, not exceptional."""
    from polars_incremental_spark.functions import curation, multimodal
    from polars_incremental_spark.functions.joins import asof_join

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "the quick brown fox jumps over it")], ["doc_id", "text"])

    # bloom: empty test set -> nothing flagged; empty train -> no rows
    out = dedup.bloom_decontaminate(docs, empty_docs, probe="join").collect()
    assert len(out) == 1 and out[0]["n_bloom_positive"] == 0
    out = dedup.bloom_decontaminate(docs, empty_docs, probe="bitset").collect()
    assert len(out) == 1 and out[0]["n_bloom_positive"] == 0
    assert dedup.bloom_decontaminate(empty_docs, docs).count() == 0

    # keep_canonical: empty clusters -> corpus passes through
    empty_clusters = spark.createDataFrame([], "doc_id long, cluster_id long")
    assert dedup.keep_canonical(docs, empty_clusters).count() == 1

    # grouped_topk: empty input -> empty output with rank column
    e = spark.createDataFrame([], "grp string, rid long, score double")
    got = curation.grouped_topk(
        e, ["grp"], [F.col("score").desc(), F.col("rid")], 3, salt_col="rid"
    )
    assert got.count() == 0 and "rank" in got.columns

    # asof: empty right side -> left rows with null matches, all directions
    import datetime as dt

    left = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 1, 1))], ["event_id", "k", "ts"]
    )
    empty_right = spark.createDataFrame([], "k string, ts timestamp, v double")
    for d in ("backward", "forward", "nearest"):
        rows = asof_join(left, empty_right, on=["k"], direction=d).collect()
        assert len(rows) == 1 and rows[0]["v_r"] is None, d

    # image features: empty frame -> empty output, schema intact
    em = spark.createDataFrame([], "media_id long, content binary")
    feats = multimodal.decode_image_features(em)
    assert feats.count() == 0 and "decode_error" in feats.columns


def test_mixture_sample_budget_and_determinism(spark):
    """The scarcest-relative source is kept whole (rate 1.0), larger ones
    thin toward the target mix; rows outside the weights drop; the sample
    is deterministic across invocations."""
    from polars_incremental_spark.functions import sampling

    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(50)]
        + [(2000 + i, "c") for i in range(10)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.mixture_sample(
        df, source_col="source", weights={"a": 0.5, "b": 0.5}, key_col="doc_id"
    )
    got = [(r["doc_id"], r["source"]) for r in out.collect()]
    by_src = {}
    for _, s in got:
        by_src[s] = by_src.get(s, 0) + 1
    # T = min(100/0.5, 50/0.5) = 100 -> rate_a = 0.5, rate_b = 1.0
    assert by_src["b"] == 50          # scarcest source kept whole
    assert 30 <= by_src["a"] <= 70    # ~half of a, hash noise allowed
    assert "c" not in by_src          # unweighted source dropped
    again = [(r["doc_id"], r["source"]) for r in out.collect()]
    assert sorted(again) == sorted(got)  # deterministic
    with pytest.raises(ValueError, match="weight"):
        sampling.mixture_sample(
            df, source_col="source", weights={"a": 0.0}, key_col="doc_id"
        )
    with pytest.raises(ValueError, match="non-empty"):
        sampling.mixture_sample(df, source_col="source", weights={}, key_col="doc_id")


def test_detect_hot_keys_ranks_and_share(spark):
    """The heaviest key ranks first with the right share; min_share filters
    light keys; the plan uses distributed top-k, not a global sort window."""
    from polars_incremental_spark.functions import skew
    from polars_incremental_spark.functions.bucketing import physical_plan

    rows = [(k,) for k in ["hot"] * 70 + ["warm"] * 20 + ["cold"] * 10]
    df = spark.createDataFrame(rows, ["k"])
    out = skew.detect_hot_keys(df, ["k"], top_n=2)
    got = [(r["k"], r["n_rows"], r["share"], r["rank"]) for r in out.collect()]
    assert got == [("hot", 70, 0.7, 1), ("warm", 20, 0.2, 2)]
    only_hot = skew.detect_hot_keys(df, ["k"], min_share=0.5)
    assert [r["k"] for r in only_hot.collect()] == ["hot"]
    # distributed top-k (TakeOrderedAndProject), not a global sort of the
    # distinct-key table; the rank window sits above the tiny take
    assert "TakeOrdered" in physical_plan(skew.detect_hot_keys(df, ["k"], top_n=2))
    with pytest.raises(ValueError, match="key_cols"):
        skew.detect_hot_keys(df, [])


# ----------------------------------------------------------- audio decode


def _wav(payload: bytes, *, rate=8000, bits=8, ch=1, extra_chunk=False):
    from polars_incremental_spark.functions.multimodal import wav_header

    n = len(payload) // ((bits // 8) * ch)
    header = wav_header(n_samples=n, sample_rate=rate, bits=bits, n_channels=ch)
    if not extra_chunk:
        return header + payload
    # splice a LIST chunk between fmt and data (real-world WAVs carry
    # metadata chunks; a fixed-offset parser would break here)
    import struct

    fmt_part, data_part = header[:36], header[36:]
    junk = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    return fmt_part + junk + data_part + payload


def test_decode_audio_8bit_walks_chunks(spark):
    import numpy as np

    from polars_incremental_spark.functions.multimodal import decode_audio

    payload = bytes([128, 200, 60, 128, 255, 0])
    rate, s = decode_audio(_wav(payload, extra_chunk=True))
    assert rate == 8000 and s.shape == (6, 1)
    assert list(s[:, 0]) == [0, 72, -68, 0, 127, -128]
    assert s.dtype == np.int32


def test_decode_audio_16bit_stereo(spark):
    import struct

    from polars_incremental_spark.functions.multimodal import decode_audio

    frames = [(1000, -1000), (-32768, 32767), (0, 5)]
    payload = b"".join(struct.pack("<hh", a, b) for a, b in frames)
    rate, s = decode_audio(_wav(payload, rate=44100, bits=16, ch=2))
    assert rate == 44100 and s.shape == (3, 2)
    assert [tuple(r) for r in s] == [(1000, -1000), (-32768, 32767), (0, 5)]


def test_decode_audio_rejects_compressed_and_garbage():
    import struct

    import pytest as _pytest

    from polars_incremental_spark.functions.multimodal import decode_audio

    with _pytest.raises(ValueError, match="RIFF"):
        decode_audio(b"ID3\x04\x00mp3 junk")
    # codec 85 (MP3-in-WAV) must gate, not silently misparse
    hdr = _wav(b"\x80\x80")
    bad = hdr[:20] + struct.pack("<H", 85) + hdr[22:]
    with _pytest.raises(ValueError, match="codec"):
        decode_audio(bad)


def test_decode_audio_features_isolates_corrupt_items(spark):
    from polars_incremental_spark.functions.multimodal import (
        decode_audio_features,
    )

    rows = [
        (1, _wav(bytes([128, 255, 0, 128]))),
        (2, b"not a wav at all"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    assert out[1]["decode_error"] is None
    assert out[1]["n_samples"] == 4 and out[1]["peak"] == 128
    assert out[1]["sum_squares"] == 0 + 127 * 127 + 128 * 128 + 0
    assert out[1]["n_zero_crossings"] == 1  # 127 -> -128 sign change only
    assert out[2]["n_samples"] is None and "RIFF" in out[2]["decode_error"]
    assert out[3]["decode_error"] == "null content"
