"""Property-based tests (hypothesis) for pure-Python primitives: the
type-widening lattice and the portable hash derivations."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from polars_incremental_spark.errors import SchemaEvolutionError
from polars_incremental_spark.functions import dedup
from polars_incremental_spark.schema import widen_types

SCALARS = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.BooleanType(),
    T.StringType(),
]

types_st = st.sampled_from(SCALARS)


def _widen(a, b):
    try:
        return widen_types(a, b)
    except SchemaEvolutionError:
        return None


@given(types_st)
def test_widen_idempotent(a):
    assert widen_types(a, a) == a


@given(types_st, types_st)
def test_widen_commutative(a, b):
    assert _widen(a, b) == _widen(b, a)


@given(types_st, types_st)
def test_widen_is_upper_bound(a, b):
    """The widened type must absorb both inputs: widening either input with
    the result is a no-op."""
    w = _widen(a, b)
    if w is None:
        return
    assert _widen(a, w) == w
    assert _widen(b, w) == w


@given(types_st, types_st, types_st)
@settings(max_examples=200)
def test_widen_associative_when_defined(a, b, c):
    left = _widen(_widen(a, b), c) if _widen(a, b) is not None else None
    right = _widen(a, _widen(b, c)) if _widen(b, c) is not None else None
    if left is not None and right is not None:
        assert left == right


@given(st.integers(min_value=0, max_value=10_000), st.text(min_size=0, max_size=40))
@settings(max_examples=100)
def test_minhash_params_bounds_and_determinism(i, s):
    a, b = dedup.minhash_params(i % 64)
    assert a % 2 == 1 and 0 < a < 2**28 and 0 <= b < 2**28
    h32 = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    v = (a * h32 + b) % dedup.MINHASH_PRIME
    # no 64-bit overflow possible by construction
    assert a * h32 + b < 2**63
    assert 0 <= v < dedup.MINHASH_PRIME


@given(st.text(min_size=1, max_size=60))
@settings(max_examples=100)
def test_md5_long_range(s):
    v15 = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    assert 0 <= v15 < 2**60  # fits a positive long — the shuffle-key contract


def test_widen_rejects_unrelated():
    with pytest.raises(SchemaEvolutionError):
        widen_types(T.DateType(), T.LongType())


# ------------------------------------------------------- simhash banding


@given(st.integers(0, 2**32 - 1), st.integers(0, 2**32 - 1))
@settings(max_examples=500)
def test_pigeonhole_band_guarantee(a, b):
    """The blocking lemma behind simhash_near_dup_pairs: two 32-bit values
    within hamming distance 3 MUST agree exactly on >= 1 of the 4 bands
    (the same shift/mask arithmetic the Spark plan uses)."""
    hamming = bin(a ^ b).count("1")
    bands_agree = any(
        (a >> (i * 8)) & 0xFF == (b >> (i * 8)) & 0xFF for i in range(4)
    )
    if hamming <= 3:
        assert bands_agree
    # and the converse sanity: all-bands-disagree implies hamming >= 4
    if not bands_agree:
        assert hamming >= 4


# ---------------------------------------------------------------------------
# round-5 decoders: PNG and Avro round-trip under random inputs
# ---------------------------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    color=st.sampled_from([0, 2, 4, 6]),
    data=st.data(),
)
def test_png_roundtrip_random_images(w, h, color, data):
    """Any 8-bit image, any per-row filter choice -> decode inverts the
    spec-encoder exactly (RGB extraction rules applied)."""
    import numpy as np

    from polars_incremental_spark.functions import multimodal
    from tests.test_round5_fixes import _png_bytes

    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    pixels = np.array(
        data.draw(
            st.lists(
                st.lists(
                    st.lists(st.integers(0, 255), min_size=nch, max_size=nch),
                    min_size=w, max_size=w,
                ),
                min_size=h, max_size=h,
            )
        ),
        dtype=np.uint8,
    )
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    got = multimodal.decode_image(_png_bytes(pixels, color_type=color, filter_types=filters))
    if color == 2:
        want = pixels
    elif color == 6:
        want = pixels[:, :, :3]
    else:  # gray / gray+alpha -> replicated gray channel
        want = np.repeat(pixels[:, :, :1], 3, axis=2)
    assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(
    records=st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(-(2**62), 2**62),
                "name": st.text(max_size=40),
                "score": st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
                "tags": st.lists(st.text(max_size=10), max_size=4),
                "props": st.dictionaries(
                    st.text(min_size=1, max_size=8), st.integers(-(2**40), 2**40), max_size=3
                ),
                "kind": st.sampled_from(["A", "B"]),
            }
        ),
        min_size=1,
        max_size=12,
    ),
    codec=st.sampled_from(["null", "deflate"]),
    block_size=st.sampled_from([0, 1, 3]),
)
def test_avro_records_roundtrip_random(records, codec, block_size):
    """The pure-Python block decoder inverts the spec encoder for random
    records across codecs and block splits (driver-side decode path —
    no Spark session needed per example)."""
    from polars_incremental_spark.sources.formats import _iter_avro_records
    from tests.test_formats import _avro_container

    payload = _avro_container(records, codec=codec, block_size=block_size)
    got = list(_iter_avro_records(payload))
    assert got == records


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_avro_zigzag_varint_roundtrip_fuzz(data):
    """Arbitrary bytes never make the varint reader loop forever or read
    out of bounds silently — it either parses or raises cleanly."""
    from polars_incremental_spark.sources.formats import _Reader

    r = _Reader(data)
    try:
        while r.pos < len(data):
            r.long()
    except (ValueError, IndexError):
        pass


@settings(max_examples=25, deadline=None)
@given(
    header=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
            min_size=1, max_size=8,
        ),
        min_size=1, max_size=5, unique=True,
    ),
    data=st.data(),
)
def test_xlsx_rows_roundtrip_random(header, data):
    """The stdlib sheet-XML parser inverts the spec encoder for random
    grids of numbers/strings/blanks (driver-side parse, no Spark)."""
    import tempfile

    from polars_incremental_spark.sources.formats import _read_xlsx_rows
    from tests.test_formats import _xlsx_bytes

    cell = st.one_of(
        st.none(),
        st.integers(-(10**9), 10**9),
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
            min_size=1, max_size=12,
        ),
    )
    rows = data.draw(
        st.lists(
            st.lists(cell, min_size=len(header), max_size=len(header)),
            min_size=0, max_size=6,
        )
    )
    shared = data.draw(st.booleans())
    raw = _xlsx_bytes(header, rows, shared_strings=shared)
    with tempfile.NamedTemporaryFile(suffix=".xlsx") as fh:
        fh.write(raw)
        fh.flush()
        got = _read_xlsx_rows(fh.name)
    assert got[0] == list(header)
    for want_row, got_row in zip(rows, got[1:]):
        for w, g in zip(want_row, got_row):
            if isinstance(w, int):
                assert g == w
            else:
                assert g == w
    assert len(got) == len(rows) + 1


# ------------------------------------------------- chunking reconstruction


def _py_word_chunks(tokens: list[str], w: int) -> list[str]:
    return [" ".join(tokens[i : i + w]) for i in range(0, max(len(tokens), 1), w)]


def _py_sliding(tokens: list[str], chunk: int, stride: int):
    return [
        (i // stride, i, min(len(tokens) - i, chunk), " ".join(tokens[i : i + chunk]))
        for i in range(0, max(len(tokens), 1), stride)
    ]


token_st = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=6
)


@given(
    texts=st.lists(st.lists(token_st, min_size=1, max_size=40), min_size=1, max_size=12),
    w=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=8, deadline=None)
def test_word_chunks_reconstruct_text(texts, w):
    """Joining a doc's chunks with the separator reproduces the tokenized
    text exactly, for BOTH chunk-build branches (zip and slice), on
    arbitrary token streams."""
    from polars_incremental_spark.session import get_spark

    spark = get_spark("tests")
    from pyspark.sql import functions as F

    from polars_incremental_spark.functions import text as tx

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(texts)],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id", "text", tx.word_chunks(F.col("text"), w).alias("chunks")
    ).collect()
    for r in rows:
        toks = r["text"].split(" ")
        assert r["chunks"] == _py_word_chunks(toks, w)
        assert " ".join(r["chunks"]) == r["text"]


@given(
    texts=st.lists(st.lists(token_st, min_size=1, max_size=40), min_size=1, max_size=10),
    chunk=st.integers(min_value=1, max_value=10),
    stride=st.integers(min_value=1, max_value=10),
)
@settings(max_examples=8, deadline=None)
def test_sliding_chunks_match_python_reference(texts, chunk, stride):
    from polars_incremental_spark.session import get_spark

    spark = get_spark("tests")
    from polars_incremental_spark.functions import layout

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_index"]): (r["start"], r["n_tokens"], r["chunk_text"])
        for r in layout.sliding_chunks(
            df, chunk_tokens=chunk, stride=stride
        ).collect()
    }
    for i, toks in enumerate(texts):
        ref = _py_sliding(toks, chunk, stride)
        assert len([k for k in got if k[0] == i]) == len(ref)
        for ci, start, n, text_ in ref:
            assert got[(i, ci)] == (start, n, text_)


# ------------------------------------------------- WAV decoder properties


@settings(max_examples=60, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
    ch=st.integers(min_value=1, max_value=4),
    with_junk_chunk=st.booleans(),
)
def test_wav_16bit_roundtrip_property(samples, rate, ch, with_junk_chunk):
    """encode(synthesize) -> decode is the identity on samples, rate and
    channel count, for any PCM payload, channel layout, and chunk-list
    padding (junk LIST chunks between fmt and data)."""
    import struct

    from polars_incremental_spark.functions.multimodal import (
        decode_audio,
        wav_header,
    )

    usable = len(samples) - (len(samples) % ch)
    if usable == 0:
        samples = samples + samples[:1] * (ch - len(samples))
        usable = ch
    samples = samples[:usable]
    payload = b"".join(struct.pack("<h", s) for s in samples)
    header = wav_header(
        n_samples=usable // ch, sample_rate=rate, bits=16, n_channels=ch
    )
    if with_junk_chunk:
        junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size pads
        header = header[:36] + junk + header[36:]
    got_rate, s = decode_audio(header + payload)
    assert got_rate == rate
    assert s.shape == (usable // ch, ch)
    assert [int(v) for row in s for v in row] == samples


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=80))
def test_wav_decoder_never_hangs_or_misparses_garbage(data):
    """Arbitrary bytes either decode (only if they really are a WAV) or
    raise ValueError — never an unbounded loop or a numpy crash."""
    from polars_incremental_spark.functions.multimodal import decode_audio

    try:
        rate, s = decode_audio(data)
        assert rate >= 0 and s.ndim == 2
    except ValueError:
        pass


# ------------------------------------------ skipping-conjunct properties


@settings(max_examples=80, deadline=None)
@given(
    col=st.sampled_from(["x", "k", "v2"]),
    op=st.sampled_from(["=", "==", "<", "<=", ">", ">="]),
    lit=st.one_of(
        st.integers(min_value=-10**6, max_value=10**6),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(
            lambda f: round(f, 3)
        ),
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=122
            ),
            max_size=8,
        ),
    ),
)
def test_conjunct_parser_roundtrips_simple_comparisons(col, op, lit):
    from polars_incremental_spark.sinks.deltalog import _skipping_conjuncts

    if isinstance(lit, str):
        rendered = "'" + lit.replace("'", "''") + "'"
    else:
        rendered = repr(lit)
    got = _skipping_conjuncts(f"{col} {op} {rendered}")
    assert len(got) == 1
    gcol, gop, glit = got[0]
    assert gcol == col and gop == ("=" if op == "==" else op)
    if isinstance(lit, float):
        assert abs(glit - lit) < 1e-9
    else:
        assert glit == lit


@settings(max_examples=50, deadline=None)
@given(
    lo=st.integers(min_value=0, max_value=500),
    span=st.integers(min_value=0, max_value=500),
    lit=st.integers(min_value=-100, max_value=700),
    op=st.sampled_from(["=", "<", "<=", ">", ">="]),
)
def test_file_matcher_never_prunes_a_matching_file(lo, span, lit, op):
    """Soundness: if ANY value in [lo, hi] satisfies the predicate, the
    file must be kept.  (Completeness — pruning everything prunable — is
    covered by the corruption tests; soundness is the property that can
    never be traded away.)"""
    import json as _json

    from polars_incremental_spark.sinks.deltalog import _file_may_match

    hi = lo + span
    add = {
        "path": "p",
        "stats": _json.dumps(
            {
                "numRecords": span + 1,
                "minValues": {"x": lo},
                "maxValues": {"x": hi},
                "nullCount": {"x": 0},
            }
        ),
    }
    some_value_matches = any(
        {
            "=": v == lit,
            "<": v < lit,
            "<=": v <= lit,
            ">": v > lit,
            ">=": v >= lit,
        }[op]
        for v in (lo, lit, hi)
        if lo <= v <= hi
    )
    kept = _file_may_match(add, [("x", op, lit)], set(), {"x": "long"})
    if some_value_matches:
        assert kept


# ------------------------------------------------ deletion-vector codec


@settings(max_examples=80, deadline=None)
@given(
    positions=st.lists(
        st.integers(min_value=0, max_value=1 << 21), max_size=600
    ),
    dense_block=st.booleans(),
)
def test_dv_codec_roundtrip_property(positions, dense_block):
    """encode -> z85 -> decode is the identity on any position set,
    including >4096-per-container blocks (bitmap containers)."""
    from polars_incremental_spark.sinks.dv import (
        descriptor_positions,
        inline_descriptor,
    )

    if dense_block:
        base = positions[0] if positions else 0
        positions = positions + list(range(base, base + 5000))
    d = inline_descriptor(positions)
    assert descriptor_positions(d) == sorted(set(positions))


# ------------------------------------------------- duplicated spans (d16)


def _py_duplicated_spans(corpus: dict[int, list[str]], w: int):
    """Pure-Python reference for dedup.duplicated_spans at stride 1."""
    spans = {
        doc: [" ".join(t[i : i + w]) for i in range(max(len(t) - w, 0) + 1)]
        for doc, t in corpus.items()
    }
    freq: dict[str, set[int]] = {}
    for doc, sp in spans.items():
        for s in sp:
            freq.setdefault(s, set()).add(doc)
    out = {}
    for doc, sp in spans.items():
        dup_idx = [i for i, s in enumerate(sp) if len(freq[s]) > 1]
        best = cur = 0
        prev = -2
        for i in dup_idx:
            cur = cur + 1 if i == prev + 1 else 1
            best = max(best, cur)
            prev = i
        out[doc] = (
            len(sp),
            len(dup_idx),
            best,
            (best - 1) + w if best > 0 else 0,
        )
    return out


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=24
        ),
        min_size=2,
        max_size=8,
    ),
    w=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=8, deadline=None)
def test_duplicated_spans_matches_python_reference(texts, w):
    """Tiny alphabet forces genuine cross-document span collisions; the
    Spark plan must agree with the direct per-doc computation on counts,
    run length, and the span-length estimate."""
    from polars_incremental_spark.session import get_spark

    spark = get_spark("tests")
    corpus = {i: toks for i, toks in enumerate(texts)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_spans"],
            r["n_dup_spans"],
            r["max_dup_run"],
            r["approx_longest_dup_tokens"],
        )
        for r in dedup.duplicated_spans(df, span_tokens=w, stride=1).collect()
    }
    assert got == _py_duplicated_spans(corpus, w)
