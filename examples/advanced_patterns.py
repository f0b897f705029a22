"""W1-W5 stateful patterns demo (reference examples/advanced-patterns/*).

Watermark drop-late, late routing, incremental aggregation, cross-batch
dedupe, latest-per-key upsert — each through the first-class helpers in
``polars_incremental_spark.patterns``.

Run: python examples/advanced_patterns.py
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_incremental_spark import (
    JobState,
    cross_batch_dedupe,
    drop_late,
    get_spark,
    incremental_aggregate,
    route_late,
    upsert_latest,
)


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def main() -> None:
    spark = get_spark("patterns-demo")
    work = tempfile.mkdtemp(prefix="pis_patterns_")
    state = JobState(os.path.join(work, "state"))

    events = spark.createDataFrame(
        [(1, ts(0), "a", 1.0), (2, ts(20), "a", 2.0), (3, ts(17), "b", 3.0), (4, ts(2), "b", 4.0)],
        ["event_id", "ts", "key", "value"],
    )

    print("W1 drop_late(5m):", sorted(r["event_id"] for r in drop_late(events, "ts", "5 minutes").collect()))
    on_time, late = route_late(events, "ts", "5 minutes")
    print("W2 on_time/late:", on_time.count(), "/", late.count())

    agg1 = incremental_aggregate(events, ["key"], {"value": "sum"}, state=state)
    print("W3 rolling after batch 1:", {r["key"]: r["value_sum"] for r in agg1.collect()})
    batch2 = spark.createDataFrame([(9, ts(30), "a", 10.0)], ["event_id", "ts", "key", "value"])
    agg2 = incremental_aggregate(batch2, ["key"], {"value": "sum"}, state=state)
    print("W3 rolling after batch 2:", {r["key"]: r["value_sum"] for r in agg2.collect()})

    d1 = cross_batch_dedupe(events.select("event_id", "key"), ["event_id"], state=state)
    d2 = cross_batch_dedupe(events.select("event_id", "key"), ["event_id"], state=state)
    print("W4 first batch kept:", d1.count(), "| replay kept:", d2.count())

    existing = spark.createDataFrame([("a", ts(0), "old")], ["key", "ts", "v"])
    merged = upsert_latest(events.selectExpr("key", "ts", "cast(event_id as string) v"), existing, ["key"], "ts")
    print("W5 upserted:", {r["key"]: r["v"] for r in merged.collect()})
    shutil.rmtree(work)


if __name__ == "__main__":
    main()
