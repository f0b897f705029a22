"""Streaming e2e of the flagship query with a mid-stream kill and resume.

Runs the flagship 1-minute tumbling window aggregation (``entry()``'s
query; reference README pipeline) as a real ``availableNow`` Structured
Streaming query over the sf0.001 events, sliced into multiple microbatches
via ``maxFilesPerTrigger``.  The writer crashes partway through the first
run; a second run over the SAME Spark checkpoint must resume from the
failed batch — not from scratch, not skipping it — and the re-aggregated
streamed output must equal the batch answer exactly (the exactly-once
invariant from SURVEY §5: idempotent batch_{id} sinks + Spark's
offset/commit logs).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException

from polars_incremental_spark.sources.base import FilesSource
from polars_incremental_spark.streaming.native import run_native
from polars_incremental_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _window_agg(df):
    """The flagship aggregation (same expression tree as entry())."""
    return (
        df.groupBy(F.window("ts", "1 minute").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def test_flagship_streamed_kill_resume_exactly_once(spark, tmp_path):
    # ---- input: sf0.001 events as 6 parquet files → 3 two-file microbatches
    src_dir = str(tmp_path / "events_in")
    events = load_table(spark, SF_DIR, "events").select("ts", "event_type", "value")
    events.repartition(6).write.parquet(src_dir)
    assert len(glob.glob(src_dir + "/*.parquet")) >= 3

    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spec = FilesSource(path=src_dir, file_format="parquet", max_files_per_trigger=2)
    crashed = {"done": False}

    def writer(df, batch_id):
        # Idempotent sink: per-batch dir, overwritten on replay.  Each batch
        # writes its PARTIAL window aggregate (map-side shape of the flagship).
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash mid-stream")
        _window_agg(df).write.mode("overwrite").parquet(f"{out_root}/batch_{batch_id}")

    # ---- run 1: crashes on batch 1; batch 0 must already be committed
    with pytest.raises((StreamingQueryException, RuntimeError)):
        run_native(spark, spec, ckpt, writer)
    done_before = set(os.listdir(out_root))
    assert done_before == {"batch_0"}

    # ---- run 2: resumes from batch 1 (batch 0 NOT reprocessed)
    replayed: list[int] = []

    def writer2(df, batch_id):
        replayed.append(batch_id)
        _window_agg(df).write.mode("overwrite").parquet(f"{out_root}/batch_{batch_id}")

    run_native(spark, spec, ckpt, writer2)
    assert min(replayed) == 1, f"batch 0 was reprocessed: {replayed}"
    assert sorted(replayed) == list(range(1, max(replayed) + 1))

    # ---- drained: a third run sees nothing new
    replayed.clear()
    run_native(spark, spec, ckpt, writer2)
    assert replayed == []

    # ---- exactly-once: merged partials == batch answer on the same input
    streamed = (
        spark.read.parquet(f"{out_root}/batch_*")
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    expected = _window_agg(spark.read.parquet(src_dir))
    sort = ["window_start", "event_type"]
    assert [r.asDict() for r in streamed.orderBy(*sort).collect()] == [
        r.asDict() for r in expected.orderBy(*sort).collect()
    ]


def test_stream_static_enrichment_join_incremental(spark, tmp_path):
    """Stream-static enrichment: a file stream broadcast-joins a static
    dimension inside the streaming transform.  Run 1 enriches the initial
    file; run 2 over the SAME checkpoint ingests ONLY the newly arrived
    file (no reprocessing) and applies the same enrichment — the canonical
    100 TB pattern of a fact stream decorated by a small dim."""
    src_dir = str(tmp_path / "facts_in")
    os.makedirs(src_dir)
    dim_path = str(tmp_path / "dim")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "gold"), (2, "basic"), (3, "basic")], ["user_id", "segment"]
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], ["user_id", "value"]
    ).coalesce(1).write.mode("append").parquet(src_dir)

    def enrich(df):
        return df.join(F.broadcast(dim), "user_id").withColumn(
            "boosted", F.when(F.col("segment") == "gold", F.col("value") * 2)
            .otherwise(F.col("value"))
        )

    def writer(df, batch_id):
        df.write.mode("overwrite").parquet(os.path.join(out_root, f"batch_{batch_id}"))

    spec = FilesSource(path=src_dir, file_format="parquet")
    run_native(spark, spec, ckpt, writer, transform=enrich)
    out1 = spark.read.parquet(out_root + "/batch_*")
    assert {(r["user_id"], r["boosted"]) for r in out1.collect()} == {(1, 20.0), (2, 20.0)}

    # second file arrives; same checkpoint → only the new rows are enriched
    spark.createDataFrame(
        [(3, 30.0)], ["user_id", "value"]
    ).coalesce(1).write.mode("append").parquet(src_dir)
    run_native(spark, spec, ckpt, writer, transform=enrich)
    out2 = spark.read.parquet(out_root + "/batch_*")
    assert {(r["user_id"], r["boosted"]) for r in out2.collect()} == {
        (1, 20.0), (2, 20.0), (3, 30.0),
    }
    batches = sorted(os.path.basename(p) for p in glob.glob(out_root + "/batch_*"))
    assert len(batches) == 2  # run 2 produced exactly one incremental batch


def test_streaming_dedup_within_watermark_bounded_state(spark, tmp_path):
    """Native bounded-state streaming dedup: dropDuplicatesWithinWatermark
    holds each key only until the watermark passes it (state is bounded by
    the lateness window, unlike dropDuplicates whose state grows forever).
    A duplicate arriving in a later microbatch inside the window is
    dropped; the per-batch outputs across a restart never re-emit a key."""
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_file(rows):
        spark.createDataFrame(rows, "event_id: long, ts: timestamp").coalesce(
            1
        ).write.mode("append").parquet(src_dir)

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    write_file([(1, t0), (2, t0 + dt.timedelta(seconds=30))])

    def transform(df):
        return df.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
            ["event_id"]
        )

    def writer(df, batch_id):
        df.write.mode("overwrite").parquet(os.path.join(out_root, f"batch_{batch_id}"))

    spec = FilesSource(path=src_dir, file_format="parquet")
    run_native(spark, spec, ckpt, writer, transform=transform)

    # batch 2: one duplicate inside the window + one new event
    write_file([(1, t0 + dt.timedelta(seconds=60)), (3, t0 + dt.timedelta(seconds=90))])
    run_native(spark, spec, ckpt, writer, transform=transform)

    out = spark.read.parquet(out_root + "/batch_*")
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3]  # the duplicate id=1 was dropped across batches


def test_stream_stream_join_within_interval(spark, tmp_path):
    """Stream-stream inner join with watermarks: errors join clicks by the
    same user within [-10 min, 0] — the state-store buffers each side until
    the watermark passes, and rows arriving in DIFFERENT microbatches must
    still pair up.  Final output equals the equivalent batch join."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    m = lambda mins: t0 + dt.timedelta(minutes=mins)
    clicks = [(1, m(0)), (1, m(30)), (2, m(5))]
    errors = [(1, m(7), "e1"), (1, m(31), "e2"), (2, m(40), "e3")]
    cdir, edir = str(tmp_path / "clicks"), str(tmp_path / "errors")
    spark.createDataFrame(clicks, "user_id long, cts timestamp").repartition(
        2
    ).write.parquet(cdir)
    spark.createDataFrame(
        errors, "user_id long, ets timestamp, err string"
    ).repartition(2).write.parquet(edir)

    def joined(c, e):
        return e.join(
            c,
            (e.user_id == c.user_id)
            & (c.cts <= e.ets)
            & (c.cts >= e.ets - F.expr("INTERVAL 10 MINUTES")),
        ).select(e.user_id, "err", "ets", "cts")

    cs = (
        spark.readStream.schema("user_id long, cts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(cdir)
        .withWatermark("cts", "1 hour")
    )
    es = (
        spark.readStream.schema("user_id long, ets timestamp, err string")
        .option("maxFilesPerTrigger", "1")
        .parquet(edir)
        .withWatermark("ets", "1 hour")
    )
    q = (
        joined(cs, es)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        map(tuple, spark.sql("SELECT * FROM ss_join").collect())
    )
    want = sorted(
        map(
            tuple,
            joined(
                spark.read.parquet(cdir), spark.read.parquet(edir)
            ).collect(),
        )
    )
    # e1<-click@12:00 (7 min prior), e2<-click@12:30 (1 min prior);
    # e3 unmatched: user 2's click@12:05 is 35 min before the error
    assert got == want and len(got) == 2


def test_streaming_session_window_merges_across_microbatches(spark, tmp_path):
    """Native stateful session windows under Structured Streaming: the
    sf0.001 events stream in multiple microbatches, and sessions that SPAN
    a microbatch boundary must be merged by the session-window state store
    — the final answer equals the batch ``events_sessionize`` aggregation
    exactly.  (Complete output mode: state is the full session set, fine at
    test scale; production uses watermark + append to bound it.)"""
    src_dir = str(tmp_path / "sess_in")
    events = load_table(spark, SF_DIR, "events").select("ts", "user_id")
    # time-sorted files so microbatch boundaries slice sessions mid-flight
    events.orderBy("ts").coalesce(1).write.parquet(src_dir)
    more = glob.glob(src_dir + "/*.parquet")
    assert len(more) == 1

    def session_agg(df):
        return (
            df.groupBy(
                F.session_window(F.col("ts"), "17 minutes").alias("w"),
                F.col("user_id"),
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("w.start").alias("session_start"), "user_id", "n_events"
            )
        )

    # re-slice into 4 files of contiguous time ranges
    sliced_dir = str(tmp_path / "sess_sliced")
    df = spark.read.parquet(src_dir)
    n = df.count()
    df = df.orderBy("ts").withColumn(
        "__part", (F.monotonically_increasing_id() * 4 / n).cast("int")
    )
    df.write.partitionBy("__part").parquet(sliced_dir)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(sliced_dir + "/__part=*")
    )
    q = (
        session_agg(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.awaitTermination(300)

    streamed = spark.sql("SELECT * FROM sess_stream")
    expected = session_agg(spark.read.parquet(sliced_dir + "/__part=*"))
    sort = ["session_start", "user_id"]
    got = [r.asDict() for r in streamed.orderBy(*sort).collect()]
    want = [r.asDict() for r in expected.orderBy(*sort).collect()]
    assert got == want and len(got) > 0


def test_streaming_curation_stage_equals_batch(spark, tmp_path):
    """The stateless curation chain (gopher gates -> boilerplate-safe
    chunking into training windows) runs unchanged under Structured
    Streaming: per-microbatch results union to exactly the batch answer,
    because every op is a pure projection/explode of its input rows."""
    from polars_incremental_spark.functions import layout
    from polars_incremental_spark.functions import text as tx

    src_dir = str(tmp_path / "docs_in")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.repartition(4).write.parquet(src_dir)

    def curate(df):
        gated = df.select("doc_id", "text", *tx.gopher_quality_stats(F.col("text")))
        kept = gated.filter(F.col("keep") == 1).select("doc_id", "text")
        return layout.sliding_chunks(kept, chunk_tokens=32, stride=16)

    out_root = str(tmp_path / "out")
    spec = FilesSource(path=src_dir, file_format="parquet", max_files_per_trigger=2)

    def writer(df, batch_id):
        curate(df).write.mode("overwrite").parquet(f"{out_root}/batch_{batch_id}")

    run_native(spark, spec, str(tmp_path / "ckpt"), writer)

    streamed = spark.read.parquet(f"{out_root}/batch_*")
    expected = curate(spark.read.parquet(src_dir))
    key = lambda r: (r["doc_id"], r["chunk_index"])
    got = sorted((r.asDict() for r in streamed.collect()), key=key)
    want = sorted((r.asDict() for r in expected.collect()), key=key)
    assert got == want and len(got) > 0


def test_streaming_foreachbatch_maintains_agg_mv(spark, tmp_path):
    """The examples/streaming_mv.py shape as a deterministic availableNow
    run: each micro-batch appends to the Delta base AND refreshes the
    aggregate MV from its change feed inside foreachBatch — the MV ends
    exactly where a batch recompute would, and a second availableNow run
    (stream checkpoint replay surface) folds nothing twice."""
    from pyspark.sql import functions as F

    from polars_incremental_spark.mv import create_agg_mv, refresh_agg_mv
    from polars_incremental_spark.sinks.deltalog import (
        read_delta_fallback,
        write_delta_fallback,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    base, mv = str(tmp_path / "base"), str(tmp_path / "mv")
    write_delta_fallback(
        spark.createDataFrame(
            [("eu", 100), ("us", 200)], "region string, amount long"
        ),
        base,
    )
    create_agg_mv(spark, base, mv, group_cols=["region"], sum_cols=["amount"])

    # two parquet FILES at the landing top level (file streams don't
    # recurse into subdirectories)
    for i, rows in enumerate(
        [[("eu", 25), ("apac", 70)], [("us", 5), ("apac", 30)]]
    ):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(
            rows, "region string, amount long"
        ).coalesce(1).write.parquet(str(stage))
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        part.rename(landing / f"batch{i}.parquet")

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        write_delta_fallback(batch_df, base, mode="append")
        refresh_agg_mv(spark, base, mv)

    def run_once():
        q = (
            spark.readStream.schema("region string, amount long")
            .option("maxFilesPerTrigger", 1)  # force >=2 micro-batches
            .parquet(str(landing))
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_once()
    expected = {
        r["region"]: r["sum_amount"]
        for r in read_delta_fallback(spark, base)
        .groupBy("region")
        .agg(F.sum("amount").alias("sum_amount"))
        .collect()
    }
    got = {
        r["region"]: r["sum_amount"]
        for r in read_delta_fallback(spark, mv).collect()
    }
    assert got == expected == {"eu": 125, "us": 205, "apac": 100}
    # second run: stream checkpoint says nothing new — MV untouched
    run_once()
    got2 = {
        r["region"]: r["sum_amount"]
        for r in read_delta_fallback(spark, mv).collect()
    }
    assert got2 == expected


def test_streaming_foreachbatch_maintains_join_mv(spark, tmp_path):
    """The examples/streaming_join_mv.py shape as a deterministic
    availableNow run: TWO streams (orders + customer updates) each append
    to their own Delta base and refresh the counted JOIN MV inside
    foreachBatch — exercising BOTH delta-join terms (ΔL⋈R₂ from the left
    stream, L₁⋈ΔR from a customer arriving after its orders) end-to-end
    under a streaming trigger.  A replayed availableNow run folds nothing
    twice."""
    from polars_incremental_spark.mv import (
        create_join_mv,
        read_join_mv,
        refresh_join_mv,
    )
    from polars_incremental_spark.sinks.deltalog import write_delta_fallback

    o_landing, c_landing = tmp_path / "ol", tmp_path / "cl"
    o_landing.mkdir()
    c_landing.mkdir()
    orders, cust = str(tmp_path / "orders"), str(tmp_path / "cust")
    mv = str(tmp_path / "jmv")
    write_delta_fallback(
        spark.createDataFrame([(1, 100)], "cust_id long, amount long"), orders
    )
    write_delta_fallback(
        spark.createDataFrame(
            [(1, "gold"), (2, "silver")], "cust_id long, segment string"
        ),
        cust,
    )
    create_join_mv(spark, orders, cust, mv, on=["cust_id"])

    def land(rows, schema, landing, name):
        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(stage))
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        part.rename(landing / f"{name}.parquet")

    def fold(base_path):
        def inner(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            write_delta_fallback(batch_df, base_path, mode="append")
            refresh_join_mv(spark, mv)

        return inner

    def drain(landing, schema, base_path, ckpt):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(landing))
            .writeStream.foreachBatch(fold(base_path))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # ΔL⋈R₂: new orders join the current dim; order for cust 3 dangles
    land(
        [(2, 40), (3, 70)], "cust_id long, amount long", o_landing, "orders0"
    )
    drain(o_landing, "cust_id long, amount long", orders, "ockpt")
    # L₁⋈ΔR: customer 3 arriving surfaces the pre-existing order
    land([(3, "bronze")], "cust_id long, segment string", c_landing, "cust0")
    drain(c_landing, "cust_id long, segment string", cust, "cckpt")

    expected = sorted(
        [(1, 100, "gold"), (2, 40, "silver"), (3, 70, "bronze")]
    )

    def mv_rows():
        return sorted(
            (r["cust_id"], r["amount"], r["segment"])
            for r in read_join_mv(spark, mv).collect()
        )

    assert mv_rows() == expected
    # replayed runs: stream checkpoints say nothing new — MV untouched
    drain(o_landing, "cust_id long, amount long", orders, "ockpt")
    drain(c_landing, "cust_id long, segment string", cust, "cckpt")
    assert mv_rows() == expected
