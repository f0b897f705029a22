"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop-format write (full pipeline
execution, no sink or driver-collect cost).  The headline metric is total
wall time across the suite.  The complete per-query timing dict is also
written to bench_full.json next to this file; the stdout line inlines the
slowest queries that fit a ~1900-char budget so the driver's tail-
truncated capture still parses (it recorded parsed:null in rounds 6-7
when all 90+ timings were inlined).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "events_window_1m",
    "events_sessionize",
    "r13_latest_per_key",
    "r21_distinct_keys",
    "cdc_merge_latest",
    "d1_exact_duplicates",
    "d5_minhash_signatures",
    "d6_minhash_lsh",
    "d7_simhash",
    "t1_text_stats",
    "s1_cosine_topk",
    "s2_lsh_ann_topk",
    "s3_cosine_near_dup",
    "s5_ivf_topk",
    # round-3 additions — the original 18 keys above stay untouched so
    # per-query numbers remain comparable round-over-round
    # (tools/bench_compare.py flags regressions on the shared set)
    "d9_dup_clusters",
    "d10_chunk_dedup",
    "s6_quantized_topk",
    "t7_pii_redaction",
    "t8_tfidf_top_terms",
    "u3_hash_split",
    "q18_large_orders",  # TPC-H Q18 shape: having-on-fact + join-back
    "q21_waiting_supplier",  # TPC-H Q21 shape: exists/not-exists self-join
    # round-4 additions — trained-IVF + Arrow-BLAS assignment (scale path),
    # bloom decontamination, skew-safe curation top-k, semantic dedup chain,
    # fact-fact join shape
    "s5b_ivf_refined_topk",
    "d12_bloom_decontaminate",
    "t9_curate_topk",
    "s7_semantic_dedup",
    "q12_late_priority_lines",
    "r24_trailing_hour",
    "t10_quality_deciles",
    "r25_sliding_window",
    "r26_ranking_functions",
    "m3_image_decode",  # real PPM decode in mapInPandas — the multimodal perf row
    "t11_char_lm_score",  # corpus LM build + per-doc scoring in one plan
    # round-5 additions — every query family's most expensive never-benched
    # member, so family-level regressions surface the round they happen
    "d13_dedup_canonical",  # LSH pairs -> CC -> keep-canonical anti-join
    "d14_edit_distance_pairs",  # levenshtein verify over banded candidates
    "u9_weighted_sample",  # quality-score compute + map-side thinning
    "q2_min_cost_supplier",  # TPC-H Q2: correlated min over part-supp
    "q11_important_parts",  # TPC-H Q11: group-agg vs scalar-agg threshold
    "asof_fwd_click_after_error",  # forward as-of over events self-pair
    "m1b_multimodal_meta",  # mapInPandas feature extract, hash-oracled
    "u10_token_mixture",  # token-budgeted mixture: boundary-bucket window
    "u11_token_shards",  # exact global token cumsum, 1024 bounded windows
    "t12_ngram_novelty",  # doc-freq inverted index without the join-back
    "d15_boilerplate_strip",  # chunk doc-freq + per-doc reassembly (2 shuffles)
    "u12_sliding_chunks",  # overlapping-window chunk explode, zero shuffle
    "t13_gopher_quality",  # hard quality gates, one projection pass
    "r30_lead_lag",  # lag window + agg sharing one user_id shuffle
    "u13_histogram_quantiles",  # one-pass binned quantiles, no global sort
    "r31_cohort_retention",  # cohort join-back + distinct-count shuffle
    "s10_hard_negatives",  # banded different-label ANN re-rank
    "t14_linear_classifier",  # hashed-ngram linear scorer, zero shuffle
    "u14_temperature_sample",  # sqrt-temperature corpus rebalance
    "m4_audio_decode",  # real WAV/PCM decode in mapInPandas
    "s11_diverse_topk",  # cluster-interleaved diversified retrieval
    "g1_pagerank",  # 5-iteration integer PageRank over the LSH graph
    "g2_triangles",  # two-self-join triangle enumeration
    # round-6 additions — remaining heavy never-benched family members
    "q9_product_profit",  # TPC-H Q9: 5-way join + profit agg (heaviest TPC-H)
    "q8_market_share",  # TPC-H Q8: 6-way join, per-year share division
    "u15_data_profile",  # one-pass multi-distinct EXPAND profile
    "g3_cluster_sizes",  # CC cluster-size audit over the LSH graph
    "r33_unpivot",  # wide->long melt + per-metric agg
    # round-6 additions (second wave)
    "d16_duplicated_spans",  # stride-1 span windows + doc-freq + run stats
    "u17_leakage_safe_split",  # LSH pairs -> CC -> cluster-keyed hash split
    "m5_image_transform",  # decode -> crop -> NN-resize in mapInPandas
    "m6_audio_frames",  # decode -> overlapping frame energies (hop windows)
    "m7_scene_changes",  # frame-pair join + vectorized pandas_udf byte delta
    "t16_bm25_topk",  # BM25 ranker: one token-agg shuffle + TakeOrdered
    "t17_term_pmi",  # vocab-bounded co-occurrence pair join
    "g4_communities",  # 3-round deterministic label propagation (LSH graph)
    "g5_bfs_reach",  # frontier BFS hop distances from a seed set (LSH graph)
    "r41_session_paths",  # top event paths per 17-min session (one window pass)
    "s14_ann_recall",  # recall@5 of LSH ANN vs exact cosine top-k
    "t19_vocab_oov",  # top-V vocab + per-doc OOV ratio (broadcast vocab)
    "m8_video_index",  # RIFF/AVI walk: frame index + integer container stats
    "r34_attribution",  # last-touch attribution: keyed carry-forward window
    "t18_rake_keywords",  # RAKE phrases: keyed cumsum window + 2 hash aggs
    "r35_cube_revenue",  # CUBE: one EXPAND + hash agg, grouping_id
    "s12_pq_topk",  # PQ ANN: codebook train + 4-byte codes + LUT scan
    "r36_funnel",  # 4-step windowed funnel: one shuffle + array walk
    "r37_gap_fill",  # hourly resample + dense grid + ffill window
    "u18_cms_heavy_hitters",  # count-min sketch build + broadcast estimate
    "u19_quantile_sketch",  # bottom-k-by-hash sample quantile estimation
    "d17_prefix_filter_join",  # exact PPJoin-style prefix-filtered jaccard
    "r38_activity_streaks",  # gaps-and-islands: rank-difference streaks
    # round-6 additions (third wave)
    "r39_session_incident_overlap",  # interval×interval canonical-cell join
    "r40_event_transitions",  # per-user lead window + transition matrix
    "d18_containment_pairs",  # directional containment over posting lists
    "s13_event_cooccurrence",  # user-incidence cosine co-occurrence
    "u20_kmv_set_ops",  # KMV sketch union/intersection estimates
    # round-9 additions
    "u21_hll_distinct",  # deterministic HLL through the register merge
    "u22_distinct_growth",  # cumulative-HLL corpus novelty curve
]


def _gc_ms(spark) -> int | None:
    """Cumulative JVM GC time (ms).  local[N] runs driver+executors in ONE
    JVM, so the driver's GC MXBeans are the executors' too — good enough
    to attribute a slow query to collection pressure.  Returns None on a
    remote/connect session where the beans aren't reachable."""
    try:
        jvm = spark.sparkContext._jvm
        beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return int(sum(beans.get(i).getCollectionTime() for i in range(beans.size())))
    except Exception:
        return None


def _storage_mb(spark) -> float | None:
    """Block-manager storage memory currently used (MB), summed across
    executors — the high-water suspect for the sporadic in-suite
    slowdowns round 10 couldn't attribute (a non-blocking unpersist
    backlog would show up here as a non-zero residue between queries)."""
    try:
        st = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
        it = st.iterator()
        used = 0
        while it.hasNext():
            t = it.next()._2()
            used += t._1() - t._2()  # maxMem - remainingMem
        return round(used / 1048576, 1)
    except Exception:
        return None


def _n_persisted(spark) -> int | None:
    try:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from polars_incremental_spark.queries import REGISTRY
    from polars_incremental_spark.session import get_spark

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    # optional subset (comma-separated names) / shard ("i/n") for long
    # scaling runs that need chunking; default runs the full suite
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = set(only.split(","))
        unknown = wanted - set(BENCH_QUERIES)
        if unknown:
            # a typo'd subset would otherwise run ZERO queries and emit a
            # clean-looking empty result
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY names not in the bench set: "
                f"{sorted(unknown)}"
            )
        queries = [q for q in BENCH_QUERIES if q in wanted]
    else:
        queries = list(BENCH_QUERIES)
    shard = os.environ.get("SPARK_GRAFT_BENCH_SHARD")
    if shard:
        # 0-BASED convention: "0/4".."3/4" cover the suite; a 1-based
        # invocation would silently skip queries[0::n]'s first element and
        # "n/n" would run ZERO queries with clean-looking empty output
        i, k = (int(x) for x in shard.split("/"))
        if not 0 <= i < k:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_SHARD={shard!r}: shard index must "
                f"satisfy 0 <= i < n (0-based; got i={i}, n={k})"
            )
        queries = queries[i::k]
        if not queries:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_SHARD={shard!r} selects zero queries"
            )

    spark = get_spark("bench")
    # warm the JVM (whole-stage codegen, shuffle machinery, parquet reader)
    # with one small scan+agg+shuffle so per-query numbers measure the
    # plans, not first-job JIT compilation
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .limit(10000)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # two passes, report the per-query minimum: pass 1 pays each plan's
    # one-time whole-stage-codegen JIT compile, pass 2 measures the
    # steady-state cost a long-running cluster job actually sees
    # SPARK_GRAFT_BENCH_CLEARCACHE=1 additionally drops ALL persisted
    # frames (spark.catalog.clearCache) between queries — a blunt
    # escape hatch kept for debugging; the per-query scoped release below
    # already removes cross-query cache interference for the operator
    # library's own intermediates.
    clear_cache = os.environ.get("SPARK_GRAFT_BENCH_CLEARCACHE") == "1"
    # Operator-persisted intermediates (LSH postings, verify candidates,
    # ANN sketches — cache.py) are released once per QUERY, after its
    # repeat passes: that is the production lifecycle (the Pipeline loop
    # releases per micro-batch), it makes in-suite ≈ isolated (round 9's
    # d6 16.1s-in-suite vs 1.86s-isolated eviction artifact is gone by
    # construction — no query ever sees another query's caches), and the
    # query-major repeat order keeps pass 2 warm on the query's OWN caches,
    # preserving the min-of-2 steady-state semantics every earlier round's
    # numbers use.
    from polars_incremental_spark.cache import release_operator_caches

    # ---- box-noise canary: min-of-3 wall over 5 queries that have been
    # frozen since round 3 (never touched by operator work), measured
    # before the suite.  Round-over-round the driver's box drifts 30-50%
    # (round 9: same code scored 98.6s and 131.9s on different days), so
    # the headline alone is un-gateable; BENCH_rN.canary_s / BENCH_rN-1.
    # canary_s is a pure box-speed ratio that tools/bench_compare.py uses
    # to normalize before flagging regressions.  Skipped for subset/shard
    # scaling runs (manual, not round-over-round comparable anyway).
    CANARY_QUERIES = [
        "q1_pricing_summary",
        "q6_forecast_revenue",
        "r03_projection",
        "r17_limit0",
        "u3_hash_split",
    ]
    # canary protocol version, stamped into the output so cross-round
    # canary ratios are provably like-for-like (round-11 verdict nit:
    # the protocol changed between rounds with nothing recording it).
    # v2 = round-11 protocol (same 5 frozen queries, canary-first
    # ordering, start = per-query min-of-3) + round-12 interleaved
    # single-shot samples every CANARY_EVERY queries.
    CANARY_SCHEMA = 2
    CANARY_EVERY = int(os.environ.get("SPARK_GRAFT_BENCH_CANARY_EVERY", "15"))

    def _loadavg1m() -> float | None:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return None

    def _canary_pass() -> dict[str, float]:
        """One single-shot wall per canary query (current box condition,
        not best-case — the probe exists to SEE contention)."""
        walls: dict[str, float] = {}
        for name in CANARY_QUERIES:
            fn, _sql = REGISTRY[name]
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            release_operator_caches(spark)
            walls[name] = round(time.monotonic() - t0, 3)
        return walls

    canary_s = None
    canary: dict[str, float] = {}
    canary_samples: list[dict] = []
    run_canary = (
        not only and not shard and os.environ.get("SPARK_GRAFT_BENCH_CANARY") != "0"
    )
    if run_canary:
        for _ in range(3):
            for name, w in _canary_pass().items():
                canary[name] = min(canary.get(name, w), w)
        canary_s = round(sum(canary.values()), 3)

    # Per-query release is BLOCKING by default since round 11: round 10's
    # driver bench showed sporadic 4-7x elevations on a handful of queries
    # that no isolated A/B reproduced, and the prime suspect is the
    # non-blocking unpersist backlog — cleanup from a heavy query's cached
    # blocks landing on its successors' wall time under some schedulings.
    # Blocking release charges each query its OWN cleanup.  Set
    # SPARK_GRAFT_BENCH_BLOCKING_RELEASE=0 to A/B the old behavior.
    blocking = os.environ.get("SPARK_GRAFT_BENCH_BLOCKING_RELEASE") != "0"

    # Per-query diagnostics (bench_full.json "detail"): BOTH repeat walls
    # (not just the min — a pass-2-only elevation is scheduling noise, a
    # both-passes elevation is plan cost), the JVM GC-time delta across
    # the query, and the storage-memory level after the query's release —
    # the three signals round 10's anomaly adjudication was missing.
    # Dead-broadcast hygiene (round-12): SQL broadcast relations have no
    # Python-side owner; between queries (OUTSIDE every timed section) a
    # gc nudge lets the ContextCleaner ship RemoveBroadcast to executors
    # instead of letting ~0.5-1 GB of decayed broadcast blocks squeeze
    # later queries' working sets (round-11: s7 in-suite 2.1x isolated
    # under 6 GiB local-cluster executors).  Default ON only for
    # local-cluster masters — the multi-JVM, memory-tight shape the
    # residue was adjudicated on.  Under single-JVM local[N] the forced
    # full GC is a measured net LOSS: the pause lands outside the timed
    # sections but destabilizes the queries that follow (15-query A/B on
    # idle sf0.1: 45.2/51.8/36.3 s with the nudge vs 27.4/31.2 s without,
    # with sporadic 2-7 s per-query elevations — the exact anomaly class
    # rounds 10-11 hunted).  SPARK_GRAFT_BENCH_GCRESIDUE=1/0 forces
    # either behavior for A/Bs.
    from polars_incremental_spark.cache import gc_jvm_residue

    _gcres_env = os.environ.get("SPARK_GRAFT_BENCH_GCRESIDUE")
    if _gcres_env is not None:
        gc_residue = _gcres_env != "0"
    else:
        gc_residue = spark.sparkContext.master.startswith("local-cluster")

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for qi, name in enumerate(queries, start=1):
        fn, _sql = REGISTRY[name]
        if clear_cache:
            spark.catalog.clearCache()
        walls: list[float] = []
        gc0 = _gc_ms(spark)
        for _ in range(max(repeats, 1)):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        storage_peak = _storage_mb(spark)
        release_operator_caches(spark, blocking=blocking)
        gc1 = _gc_ms(spark)
        timings[name] = min(walls)
        detail[name] = {
            "walls": walls,
            "gc_ms": (gc1 - gc0) if gc0 is not None and gc1 is not None else None,
            # cumulative GC + 1-min loadavg: a contaminated SEGMENT shows
            # as a loadavg/GC ramp in the record itself, adjudicable
            # after the fact (round-11 verdict: the r11 session's 7-10x
            # GC elevation was only visible via an out-of-band clean run)
            "gc_total_ms": gc1,
            "loadavg1m": _loadavg1m(),
            "storage_mb_before_release": storage_peak,
            "storage_mb_after_release": _storage_mb(spark),
            "persisted_after_release": _n_persisted(spark),
        }
        if gc_residue:
            gc_jvm_residue(spark)
        # interleaved canary micro-probe: the start-of-suite canary is
        # blind to MID-session contention (round-11: the driver record
        # overstated the wall ~35% with a clean start canary); a
        # single-shot probe every CANARY_EVERY queries makes the session
        # self-adjudicating — tools/bench_compare.py normalizes per
        # segment and flags segments whose probe deviates from the
        # session's own cleanest probe
        if run_canary and (qi % CANARY_EVERY == 0 or qi == len(queries)):
            cw = _canary_pass()
            canary_samples.append(
                {
                    "after_n": qi,
                    "after_query": name,
                    "canary_s": round(sum(cw.values()), 3),
                    "queries": cw,
                    "gc_total_ms": _gc_ms(spark),
                    "loadavg1m": _loadavg1m(),
                }
            )
    total = round(sum(timings.values()), 3)

    # The driver records only the LAST ~2000 chars of stdout and tries to
    # parse them as JSON; 90+ per-query timings overflow that budget and
    # the record degrades to parsed:null (it did in rounds 6-7).  Keep the
    # COMPLETE per-query dict in a side file, and keep the stdout line
    # itself under budget by inlining only the slowest queries that fit —
    # the most informative subset for regression tracking.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    result = {
        "metric": "headline_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if canary_s is not None:
        # fixed-set box-speed constant; divide rN wall by (canary_rN /
        # canary_rN-1) before comparing — see tools/bench_compare.py
        result["canary_s"] = canary_s
        result["canary_schema"] = CANARY_SCHEMA
        if canary_samples:
            # compact form on stdout (full per-query probes with after_n
            # in the side file): bare floats in run order — enough for a
            # reader of BENCH_rN.json alone to spot a mid-session
            # contamination ramp, and ~190 chars cheaper than dicts, which
            # buys ~8 more per-query timings under the stdout tail budget
            result["canary_samples"] = [s["canary_s"] for s in canary_samples]
    # the side file additionally carries the per-query diagnostics and the
    # canary's per-query minima (so one outlying canary query can't skew
    # the normalization ratio unexamined) — stdout stays within the
    # driver's tail budget
    full = dict(result, detail=detail)
    if canary:
        full["canary_queries"] = canary
    if canary_samples:
        full["canary_samples"] = canary_samples
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    line = json.dumps(result, separators=(",", ":"))
    budget = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_BUDGET", "1900"))
    if len(line) > budget:
        slowest = sorted(timings.items(), key=lambda kv: -kv[1])
        kept: dict[str, float] = {}
        for name, secs in slowest:
            kept[name] = secs
            trial = dict(result, queries=kept, n_queries=len(timings))
            trial["full"] = "bench_full.json"
            if len(json.dumps(trial, separators=(",", ":"))) > budget:
                del kept[name]
                break
        result = dict(result, queries=kept, n_queries=len(timings))
        result["full"] = "bench_full.json"
        line = json.dumps(result, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
