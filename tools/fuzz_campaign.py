#!/usr/bin/env python
"""Extended randomized fuzz campaign over the jar-less Delta writer.

Runs every generator from tests/test_delta_model_fuzz.py across a seed
range far wider than the default suite's (which pins a few seeds to keep
CI time bounded).  Use before a release or after touching
sinks/deltalog.py / checkpoints/delta.py:

    python tools/fuzz_campaign.py                # seeds 100..123, all generators
    python tools/fuzz_campaign.py 500 40         # seeds 500..539

Exit code 1 on any failure; each failure prints its generator + seed so
`pytest tests/test_delta_model_fuzz.py` can be extended with the exact
reproducer.
"""

from __future__ import annotations

import pathlib
import shutil
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    import tests.test_delta_model_fuzz as M
    from polars_incremental_spark.session import get_spark

    generators = [
        ("dml", M.test_random_dml_interleaving_matches_model),
        ("cdf", M.test_random_dml_change_feed_matches_model_diffs),
        ("part", M.test_random_dml_on_partitioned_table),
        ("cons", M.test_random_constraint_lifecycle_with_restore),
        ("cmap", M.test_random_column_mapping_lifecycle),
        ("rtrk", M.test_random_row_tracking_lifecycle),
    ]
    # strip the pytest parametrize wrapper: call the raw function
    raw = []
    for name, fn in generators:
        raw.append((name, getattr(fn, "__wrapped__", fn)))

    spark = get_spark("fuzz-campaign")
    base = pathlib.Path(tempfile.mkdtemp(prefix="fuzz_campaign_"))
    failures = 0
    try:
        for seed in range(start, start + count):
            for name, fn in raw:
                d = base / f"{name}{seed}"
                d.mkdir()
                try:
                    fn(spark, d, seed)
                    print(f"ok   {name} seed={seed}")
                except Exception as exc:  # noqa: BLE001
                    failures += 1
                    print(f"FAIL {name} seed={seed}: {type(exc).__name__}: "
                          f"{str(exc)[:300]}")
                finally:
                    shutil.rmtree(d, ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(f"\n{failures} failures over {count} seeds x {len(raw)} generators")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
