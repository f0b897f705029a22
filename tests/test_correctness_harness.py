"""Meta-tests of the correctness gate itself: the round's entire hard
signal flows through tools/check_correctness.py's comparison, so a harness
that silently passed mismatches would invalidate everything downstream.
These tests prove the comparison REJECTS what it must reject."""

from __future__ import annotations

import datetime as dt
import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "check_correctness", "tools/check_correctness.py"
)
cc = importlib.util.module_from_spec(spec)
sys.modules["check_correctness"] = cc
spec.loader.exec_module(cc)


def test_norm_distinguishes_and_canonicalizes():
    # NULL vs "NULL" string vs 0 must all differ
    assert cc.norm(None) == "NULL" and cc.norm("NULL") == "NULL"  # documented collision
    assert cc.norm(0) != cc.norm(None)
    # float repr is exact: nearby doubles stay distinct
    assert cc.norm(0.1) != cc.norm(0.1 + 1e-15)
    # NaN normalizes stably (NaN != NaN would never match otherwise)
    assert cc.norm(float("nan")) == cc.norm(float("nan"))
    # tz-aware and naive timestamps must NOT collapse (round-6 hardening:
    # the driver distinguishes TIMESTAMP from TIMESTAMPTZ, and stripping
    # tzinfo here hid exactly that oracle bug in r25_sliding_window)
    aware = dt.datetime(2024, 1, 1, 12, 0, tzinfo=dt.timezone.utc)
    naive = dt.datetime(2024, 1, 1, 12, 0)
    assert cc.norm(aware) != cc.norm(naive)
    # aware values canonicalize through UTC, so equal instants in different
    # zones still match each other
    plus2 = dt.datetime(2024, 1, 1, 14, 0, tzinfo=dt.timezone(dt.timedelta(hours=2)))
    assert cc.norm(aware) == cc.norm(plus2)


def test_multiset_compare_rejects_value_and_count_drift():
    cols = ["a", "b"]
    base = cc.rows_to_multiset(cols, [(1, "x"), (2, "y")])
    # same rows, different order -> equal (order-insensitive by design)
    assert base == cc.rows_to_multiset(cols, [(2, "y"), (1, "x")])
    # a single changed value -> unequal
    assert base != cc.rows_to_multiset(cols, [(1, "x"), (2, "z")])
    # duplicate multiplicity matters
    assert base != cc.rows_to_multiset(cols, [(1, "x"), (2, "y"), (2, "y")])
    # column-order insensitivity: same data under reordered columns matches
    assert base == cc.rows_to_multiset(["b", "a"], [("x", 1), ("y", 2)])
    # but a value swapped BETWEEN columns does not
    assert base != cc.rows_to_multiset(cols, [("x", 1), (2, "y")])


def test_float_nan_and_decimal_normalization():
    from decimal import Decimal

    cols = ["v"]
    nan_rows = cc.rows_to_multiset(cols, [(float("nan"),)])
    assert nan_rows == cc.rows_to_multiset(cols, [(float("nan"),)])
    assert nan_rows != cc.rows_to_multiset(cols, [(0.0,)])
    # Decimal("1.5") and float 1.5 deliberately collide (str vs repr agree),
    # but a scale-bearing Decimal("1.50") does NOT — scale drift is caught
    assert cc.rows_to_multiset(cols, [(Decimal("1.5"),)]) == cc.rows_to_multiset(
        cols, [(1.5,)]
    )
    assert cc.rows_to_multiset(cols, [(Decimal("1.50"),)]) != cc.rows_to_multiset(
        cols, [(1.5,)]
    )


def test_type_compare_rejects_tz_and_width_drift():
    # the driver-strict layer added in round 6: column types compare per
    # name, so a TIMESTAMPTZ oracle against a plain-TIMESTAMP Spark column
    # fails schema even when the instants agree
    from pyspark.sql import types as T

    class FakeDuckType:
        def __init__(self, s):
            self._s = s

        def __str__(self):
            return self._s

    schema = T.StructType(
        [
            T.StructField("w", T.TimestampType()),
            T.StructField("n", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )
    ok = cc.compare_types(
        schema,
        ["w", "n", "v"],
        [FakeDuckType("TIMESTAMP"), FakeDuckType("BIGINT"), FakeDuckType("DOUBLE[]")],
    )
    assert ok == []
    bad = cc.compare_types(
        schema,
        ["w", "n", "v"],
        [
            FakeDuckType("TIMESTAMP WITH TIME ZONE"),
            FakeDuckType("INTEGER"),
            FakeDuckType("DOUBLE[]"),
        ],
    )
    assert len(bad) == 2 and "timestamptz" in bad[0] and "int32" in bad[1]
