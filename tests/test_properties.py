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
