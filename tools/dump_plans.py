"""Dump .explain("formatted") for registry queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> query [query ...]
Writes <out_dir>/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)

    from polars_incremental_spark.cache import release_operator_caches
    from polars_incremental_spark.queries import REGISTRY
    from polars_incremental_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    for name in names:
        fn, _sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        release_operator_caches(spark)
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
