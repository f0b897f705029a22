"""Round-5 advice fixes: asof tolerance anchored at left_ts (TZ- and
calendar-safe), weighted_sample NULL-weight rule, content-addressed
ad-hoc bloom index batches."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from polars_incremental_spark.functions import dedup, sampling
from polars_incremental_spark.functions.joins import asof_join


def test_asof_tolerance_calendar_interval_anchored_at_left_ts(spark):
    """'1 month' tolerance must mean ONE CALENDAR MONTH from each left
    timestamp, not January's 31 days measured from the epoch.  2024-03-30
    minus 1 month clamps to 2024-02-29, so a right row at 2024-02-28 (31
    days away — inside an epoch-anchored 31-day budget) must be REJECTED,
    while 2024-02-29 is accepted."""
    left = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 3, 30, 12, 0))], ["event_id", "k", "ts"]
    )

    def match(right_ts):
        right = spark.createDataFrame([("a", right_ts, "r")], ["k", "ts", "v"])
        rows = asof_join(
            left, right, on=["k"], direction="backward", tolerance="1 MONTH"
        ).collect()
        return rows[0]["v_r"]

    assert match(dt.datetime(2024, 2, 29, 12, 0)) == "r"
    assert match(dt.datetime(2024, 2, 28, 12, 0)) is None


def test_asof_tolerance_plain_interval_both_directions(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    left = spark.createDataFrame([(1, "a", t(30))], ["event_id", "k", "ts"])
    right = spark.createDataFrame(
        [("a", t(18), "far_back"), ("a", t(25), "near_back"), ("a", t(44), "far_fwd")],
        ["k", "ts", "v"],
    )
    back = asof_join(
        left, right, on=["k"], direction="backward", tolerance="10 MINUTES"
    ).collect()[0]
    assert back["v_r"] == "near_back"
    fwd = asof_join(
        left, right, on=["k"], direction="forward", tolerance="10 MINUTES"
    ).collect()[0]
    assert fwd["v_r"] is None  # far_fwd is 14 min away

    near = asof_join(
        left, right, on=["k"], direction="nearest", tolerance="15 MINUTES"
    ).collect()[0]
    assert near["v_r"] == "near_back"  # fwd candidate outside tolerance


def test_weighted_sample_null_weight_rule(spark):
    df = spark.createDataFrame(
        [("k1", 1.0), ("k2", None), ("k3", 0.9), ("k4", None)],
        ["doc_id", "quality"],
    )
    kept = {
        r["doc_id"]
        for r in sampling.weighted_sample(
            df, weight_col="quality", key_col="doc_id", alpha=1.0
        ).collect()
    }
    assert "k2" not in kept and "k4" not in kept  # NULL -> 0.0 -> dropped
    assert "k1" in kept  # weight 1.0 always survives

    # alpha=0 keeps EVERYTHING, NULL weights included (pow(0,0) = 1)
    all_kept = sampling.weighted_sample(
        df, weight_col="quality", key_col="doc_id", alpha=0.0
    ).count()
    assert all_kept == 4


def test_adhoc_bloom_batches_content_addressed(spark, tmp_path):
    """Retrying the same ad-hoc (no batch_id) update overwrites its own
    content-addressed directory instead of accumulating uuid orphans; a
    different batch lands in a second directory; membership still matches
    the one-shot filter."""
    test_a = spark.createDataFrame(
        [(101, "we say the quick brown fox jumps high today")], ["doc_id", "text"]
    )
    test_b = spark.createDataFrame(
        [(102, "spark engines here are not a benchmark sentence")], ["doc_id", "text"]
    )
    idx = str(tmp_path / "bloom_adhoc")
    dedup.update_bloom_index(test_a, idx)
    dedup.update_bloom_index(test_a, idx)  # identical retry -> same dir

    def batch_dirs():
        return sorted(
            d for d in os.listdir(idx) if d.startswith("batch_adhoc_")
        )

    assert len(batch_dirs()) == 1

    dedup.update_bloom_index(test_b, idx)
    assert len(batch_dirs()) == 2

    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    indexed = sorted(
        map(
            tuple,
            dedup.bloom_decontaminate_indexed(spark, train, idx, min_hits=2).collect(),
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


def test_char_trigram_score_cache_flag(spark):
    from polars_incremental_spark.functions import text as tx

    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, "zqxj vvkk zzzz")], ["doc_id", "text"]
    )
    cached = {tuple(r) for r in tx.char_trigram_score(df).collect()}
    uncached = {
        tuple(r)
        for r in tx.char_trigram_score(df, cache_intermediate=False).collect()
    }
    assert cached == uncached and len(cached) == 2


# ---------------------------------------------------------------------------
# PNG decode (round-5: real zlib+numpy decoder)
# ---------------------------------------------------------------------------

def _png_bytes(pixels, color_type=2, filter_types=None, palette=None):
    """Spec-faithful PNG encoder for tests — written from the PNG spec
    independently of the library decoder (filters subtract RAW neighbor
    values; the decoder reconstructs them progressively)."""
    import struct
    import zlib

    import numpy as np

    h, w = pixels.shape[:2]
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    flat = pixels.reshape(h, w * nch).astype(np.int32)
    if filter_types is None:
        filter_types = [0] * h

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    scan = bytearray()
    for y in range(h):
        f = filter_types[y]
        scan.append(f)
        for i in range(w * nch):
            x = int(flat[y, i])
            a = int(flat[y, i - nch]) if i >= nch else 0
            b = int(flat[y - 1, i]) if y > 0 else 0
            c = int(flat[y - 1, i - nch]) if (y > 0 and i >= nch) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[f]
            scan.append((x - pred) & 0xFF)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if palette is not None:
        out += chunk(b"PLTE", palette.astype("uint8").tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(scan)))
    out += chunk(b"IEND", b"")
    return out


def test_png_decode_all_filters_rgb():
    import numpy as np

    from polars_incremental_spark.functions import multimodal

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for f in range(5):
        got = multimodal.decode_image(_png_bytes(img, filter_types=[f] * 6))
        assert np.array_equal(got, img), f"filter {f}"
    # mixed per-row filters (the realistic encoder output)
    mixed = multimodal.decode_image(_png_bytes(img, filter_types=[0, 1, 2, 3, 4, 2]))
    assert np.array_equal(mixed, img)


def test_png_decode_color_types():
    import numpy as np

    from polars_incremental_spark.functions import multimodal

    rng = np.random.default_rng(12)
    gray = rng.integers(0, 256, size=(4, 3, 1), dtype=np.uint8)
    got = multimodal.decode_image(_png_bytes(gray, color_type=0, filter_types=[4] * 4))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))

    rgba = rng.integers(0, 256, size=(4, 3, 4), dtype=np.uint8)
    got = multimodal.decode_image(_png_bytes(rgba, color_type=6, filter_types=[1] * 4))
    assert np.array_equal(got, rgba[:, :, :3])

    ga = rng.integers(0, 256, size=(4, 3, 2), dtype=np.uint8)
    got = multimodal.decode_image(_png_bytes(ga, color_type=4, filter_types=[2] * 4))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))

    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(4, 3, 1), dtype=np.uint8)
    got = multimodal.decode_image(
        _png_bytes(idx, color_type=3, filter_types=[1] * 4, palette=pal)
    )
    assert np.array_equal(got, pal[idx[:, :, 0]])


def test_png_matches_ppm_of_same_image():
    import numpy as np

    from polars_incremental_spark.functions import multimodal
    from tests.test_functions import _ppm_bytes

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
    png = multimodal.decode_image(_png_bytes(img, filter_types=[4, 3, 2, 1, 0, 4, 1]))
    ppm = multimodal.decode_image(_ppm_bytes(img))
    assert np.array_equal(png, ppm)


def test_png_unsupported_and_corrupt():
    import numpy as np
    import struct
    import zlib

    from polars_incremental_spark.functions import multimodal

    img = np.zeros((2, 2, 3), dtype=np.uint8)

    def with_ihdr(depth=8, interlace=0):
        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, 2, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError, match="bit depth"):
        multimodal.decode_image(with_ihdr(depth=16))
    with pytest.raises(NotImplementedError, match="Adam7"):
        multimodal.decode_image(with_ihdr(interlace=1))
    with pytest.raises(ValueError, match="missing IHDR"):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n")
    truncated = _png_bytes(img)[:-30]
    with pytest.raises(Exception):
        multimodal.decode_image(truncated)


def test_png_in_decode_image_features_with_corrupt_isolation(spark):
    import numpy as np

    from polars_incremental_spark.functions import multimodal

    img = np.arange(3 * 4 * 3, dtype=np.uint8).reshape(3, 4, 3)
    good = _png_bytes(img, filter_types=[4, 1, 3])
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside IDAT -> zlib error
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytes(corrupt))],
        "media_id long, content binary",
    )
    out = {r["media_id"]: r for r in multimodal.decode_image_features(df).collect()}
    means = img.reshape(-1, 3).mean(axis=0)
    assert (out[1]["width"], out[1]["height"]) == (4, 3)
    assert abs(out[1]["mean_r"] - means[0]) < 1e-6
    assert out[1]["decode_error"] is None
    assert out[2]["decode_error"] is not None and out[2]["width"] is None


# ---------------------------------------------------------------------------
# Connected-components stress: adversarial cluster shapes (round-5)
# ---------------------------------------------------------------------------

def test_connected_components_long_chain_iteration_bound(spark):
    """Hash-min propagates the min label ONE HOP per iteration, so a chain
    of diameter D needs D+1 iterations (D to propagate + 1 to observe the
    fixpoint).  Pins that bound from both sides: converges at D+1, raises
    cleanly well under it — a non-converged labeling can never be returned
    as clusters."""
    D = 20  # diameter: chain 0-1-...-20
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(D)], ["id_a", "id_b"]
    )
    labels = dedup.connected_components(chain, max_iter=D + 1)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(D + 1)}

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=D // 2)


def test_connected_components_giant_star_two_iterations(spark):
    """A star (the shape near-dup clusters actually take: many copies of
    one source) converges in 2-3 iterations REGARDLESS of fan-out — the
    iteration count is bounded by diameter, not cluster size.  Center gets
    the HIGHEST id so the label must flow leaf -> center -> leaves."""
    import time

    n_leaves = 2000
    center = n_leaves + 1
    star = spark.createDataFrame(
        [(i, center) for i in range(n_leaves)], ["id_a", "id_b"]
    )
    t0 = time.monotonic()
    labels = dedup.connected_components(star, max_iter=3)
    rows = labels.collect()
    elapsed = time.monotonic() - t0
    assert len(rows) == n_leaves + 1
    assert {r["cluster_id"] for r in rows} == {0}
    # wall-time sanity: 3 bounded-shuffle iterations over 2001 nodes must
    # not blow up (localCheckpoint keeps the plan flat); generous CI margin
    assert elapsed < 60, f"star CC took {elapsed:.1f}s"


def test_connected_components_mixed_shapes_one_pass(spark):
    """Chains, a star, and singleton pairs in ONE edge set — per-component
    labels stay independent and equal each component's min id."""
    edges = []
    edges += [(i, i + 1) for i in range(100, 105)]  # chain 100..105
    edges += [(i, 300) for i in range(200, 210)]    # star centered high
    edges += [(400, 401)]                            # isolated pair
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(df, max_iter=10).collect()
    }
    assert all(got[i] == 100 for i in range(100, 106))
    assert all(got[i] == 200 for i in list(range(200, 210)) + [300])
    assert got[400] == got[401] == 400


# ---------------------------------------------------------------------------
# Token-budgeted mixture sampling (round-5 operator)
# ---------------------------------------------------------------------------

def _token_corpus(spark, sources=("a", "b", "c"), rows_per_source=400, seed=17):
    import random

    rng = random.Random(seed)
    data = [
        (f"{s}{i:04d}", s, rng.randint(1, 500))
        for s in sources
        for i in range(rows_per_source)
    ]
    return spark.createDataFrame(data, ["doc_id", "source", "n_tokens"])


def _reference_token_mixture(df, weights, seed="mixt"):
    """Semantics-level reference: global per-source window cumsum — the
    shape the DuckDB oracle uses, independent of the bucketed rollout."""
    from pyspark.sql import Window

    from polars_incremental_spark.functions.sampling import sample_hash

    base = df.filter(F.col("source").isin(sorted(weights))).withColumn(
        "__h", sample_hash(F.col("doc_id"), seed)
    )
    tot = base.groupBy("source").agg(F.sum("n_tokens").cast("double").alias("n"))
    rows = {r["source"]: r["n"] for r in tot.collect()}
    T = min(rows[s] / w for s, w in weights.items())
    budgets = {s: int(w * T) for s, w in weights.items()}
    w_cum = Window.partitionBy("source").orderBy(
        F.col("__h").asc(), F.col("doc_id").asc()
    )
    ref = base.withColumn("__cum", F.sum("n_tokens").over(w_cum))
    import functools

    cond = functools.reduce(
        lambda a, b: a | b,
        [
            (F.col("source") == s) & (F.col("__cum") <= F.lit(budgets[s]))
            for s in weights
        ],
    )
    return {tuple(r) for r in ref.filter(cond).select("doc_id", "source", "n_tokens").collect()}


def test_mixture_sample_tokens_matches_global_window_reference(spark):
    df = _token_corpus(spark)
    weights = {"a": 0.5, "b": 0.3, "c": 0.2}
    got = {
        tuple(r)
        for r in sampling.mixture_sample_tokens(
            df, source_col="source", weights=weights,
            token_col="n_tokens", key_col="doc_id",
        ).select("doc_id", "source", "n_tokens").collect()
    }
    assert got == _reference_token_mixture(df, weights)
    # the binding source (largest tokens/weight ratio denominator) is kept
    # nearly whole and proportions track the requested mix
    kept_tokens = {}
    for _, s, t in got:
        kept_tokens[s] = kept_tokens.get(s, 0) + t
    total = sum(kept_tokens.values())
    for s, w in weights.items():
        assert abs(kept_tokens[s] / total - w) < 0.02, (s, kept_tokens)


def test_mixture_sample_tokens_bucket_and_partition_invariance(spark):
    df = _token_corpus(spark, rows_per_source=250, seed=23)
    weights = {"a": 0.6, "b": 0.4}

    def run(frame, **kw):
        return {
            tuple(r)
            for r in sampling.mixture_sample_tokens(
                frame, source_col="source", weights=weights,
                token_col="n_tokens", key_col="doc_id", **kw,
            ).collect()
        }

    base = run(df)
    assert base == run(df, n_buckets=8)       # bucket count is an impl knob
    assert base == run(df.repartition(13))    # physical layout irrelevant
    assert base == run(df.orderBy(F.col("n_tokens").desc()))


def test_mixture_sample_tokens_append_stability_and_validation(spark):
    df = _token_corpus(spark, sources=("a", "b"), rows_per_source=200)
    weights = {"a": 0.5, "b": 0.5}
    before = {
        r["doc_id"]
        for r in sampling.mixture_sample_tokens(
            df, source_col="source", weights=weights,
            token_col="n_tokens", key_col="doc_id",
        ).filter(F.col("source") == "a").collect()
    }
    # appending a NEW source (not in weights) never perturbs a's selection
    bigger = df.unionByName(
        _token_corpus(spark, sources=("z",), rows_per_source=300, seed=5)
    )
    after = {
        r["doc_id"]
        for r in sampling.mixture_sample_tokens(
            bigger, source_col="source", weights=weights,
            token_col="n_tokens", key_col="doc_id",
        ).filter(F.col("source") == "a").collect()
    }
    assert before == after

    with pytest.raises(ValueError, match="non-empty"):
        sampling.mixture_sample_tokens(
            df, source_col="source", weights={},
            token_col="n_tokens", key_col="doc_id",
        )
    with pytest.raises(ValueError, match="power of two"):
        sampling.mixture_sample_tokens(
            df, source_col="source", weights=weights,
            token_col="n_tokens", key_col="doc_id", n_buckets=37,
        )


# ---------------------------------------------------------------------------
# Token-balanced shard assignment (round-5 operator)
# ---------------------------------------------------------------------------

def test_token_balanced_shards_matches_global_window_and_bounds(spark):
    """Bucketed parallel cumsum == one global window; shard token sums stay
    within tokens_per_shard + max doc (greedy packing bound)."""
    from pyspark.sql import Window

    from polars_incremental_spark.functions import layout
    from polars_incremental_spark.functions.sampling import sample_hash

    import random

    rng = random.Random(31)
    df = spark.createDataFrame(
        [(f"d{i:04d}", rng.randint(1, 800)) for i in range(1500)],
        ["doc_id", "n_tokens"],
    )
    per_shard = 10_000
    got = layout.token_balanced_shards(
        df, token_col="n_tokens", key_col="doc_id", tokens_per_shard=per_shard
    )
    # reference: single global window (the oracle shape)
    ref = (
        df.withColumn("__h", sample_hash(F.col("doc_id"), "shard"))
        .withColumn(
            "__cum_prev",
            F.coalesce(
                F.sum("n_tokens").over(
                    Window.orderBy(F.col("__h").asc(), F.col("doc_id").asc())
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("shard", F.floor(F.col("__cum_prev") / per_shard).cast("int"))
        .select("doc_id", "n_tokens", "shard")
    )
    got_rows = {tuple(r) for r in got.select("doc_id", "n_tokens", "shard").collect()}
    assert got_rows == {tuple(r) for r in ref.collect()}
    # every shard except possibly the last is filled to >= per_shard -
    # max_doc and <= per_shard + max_doc (greedy boundary slack only)
    sums = {
        r["shard"]: r["t"]
        for r in got.groupBy("shard").agg(F.sum("n_tokens").alias("t")).collect()
    }
    max_doc = 800
    last = max(sums)
    for s, t in sums.items():
        assert t <= per_shard + max_doc, (s, t)
        if s != last:
            assert t >= per_shard - max_doc, (s, t)
    # bucket count / partitioning are impl knobs, not semantics
    alt = {
        tuple(r)
        for r in layout.token_balanced_shards(
            df.repartition(7), token_col="n_tokens", key_col="doc_id",
            tokens_per_shard=per_shard, n_buckets=16,
        ).select("doc_id", "n_tokens", "shard").collect()
    }
    assert alt == got_rows


def test_token_balanced_shards_validation(spark):
    from polars_incremental_spark.functions import layout

    df = spark.createDataFrame([("a", 10)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError, match="tokens_per_shard"):
        layout.token_balanced_shards(
            df, token_col="n_tokens", key_col="doc_id", tokens_per_shard=0
        )
    with pytest.raises(ValueError, match="power of two"):
        layout.token_balanced_shards(
            df, token_col="n_tokens", key_col="doc_id",
            tokens_per_shard=100, n_buckets=3,
        )


def test_ngram_novelty_known_corpus(spark):
    """Hand-checkable corpus: a fully-unique doc scores 1.0, two identical
    docs score 0.0, a half-shared doc scores in between."""
    from polars_incremental_spark.functions import text as tx

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),       # unique -> 1.0
            (2, "the same boilerplate text here twice"),  # dup of 3 -> 0.0
            (3, "the same boilerplate text here twice"),
            (4, "alpha beta gamma zeta eta theta"),       # shares 1 of 4 with doc1
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in tx.ngram_novelty(docs).collect()}
    assert out[2]["novelty"] == 0.0 and out[3]["novelty"] == 0.0
    # doc1: shingles {a b g, b g d, g d e}; "alpha beta gamma" shared with
    # doc4 -> 2 of 3 unique
    assert out[1]["n_shingles"] == 3 and abs(out[1]["novelty"] - 2 / 3) < 1e-6
    assert out[4]["n_shingles"] == 4 and abs(out[4]["novelty"] - 3 / 4) < 1e-6
