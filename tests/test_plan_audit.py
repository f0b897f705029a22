"""Physical-plan lint over the bench headline queries.

Guards the scale contract in CI: no accidental cartesian products, no
nested-loop joins outside the documented exact-baseline/scalar-attach
allowlists, no row-at-a-time Python UDFs — the regressions that stay
invisible at sf0.001 and surface as a 100× cliff at corpus scale.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import audit_query  # noqa: E402

import bench  # noqa: E402  (repo-root bench.py: the headline query list)
from polars_incremental_spark import queries as Q  # noqa: E402


@pytest.mark.parametrize("name", bench.BENCH_QUERIES)
def test_headline_query_plan_is_scale_clean(spark, sf_dir, name):
    df = Q.queries()[name](spark, sf_dir)
    assert audit_query(name, df) == []


def test_audit_catches_cartesian_product(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    assert any("artesian" in h or "NestedLoop" in h for h in audit_query("x", a.crossJoin(b)))
