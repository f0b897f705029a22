"""The north-star composition: an incremental LLM training-data pipeline.

Documents land in a drop directory; each checkpointed micro-batch is
PII-scrubbed, quality-filtered (text stats + Gopher repetition), exactly
deduplicated against ALL previously accepted documents (cross-batch
state), near-dup-deduped via the persisted MinHash-LSH index, stamped
with a deterministic train/valid/test split, and appended to a curated
Delta table — so downstream trainers can stream the curated corpus
incrementally (Delta source).  After ingestion, near-dup PAIRS in the
curated corpus resolve to CLUSTERS (connected components) for reporting.

Every stage is the same code that runs at 100 TB: hash-keyed shuffles,
no driver-side data loops, Arrow-batched Python only where Catalyst can't
express the op.  The split is hash-keyed, so a doc can never migrate
between train and test across incremental runs.

Run: python examples/llm_data_pipeline.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_incremental_spark import (
    DeltaSource,
    FilesSource,
    Pipeline,
    cross_batch_dedupe,
    get_spark,
)
from polars_incremental_spark.functions import dedup, layout, sampling
from polars_incremental_spark.functions import text as tx
from polars_incremental_spark.sinks.delta import read_table, write_table
from polars_incremental_spark.tables import load_table


def curate(batch, state, batch_id, lsh_index, heldout):
    """Scrub → quality-filter → DECONTAMINATE → cross-batch exact + NEAR
    dedupe → split."""
    scrubbed = batch.withColumn("text", tx.redact_pii(F.col("text")))
    scored = scrubbed.withColumn("quality", tx.quality_score(F.col("text")))
    # Gopher-style HARD gates (fail closed on any rule) — the production
    # quality filter; the soft `quality` score rides along for reporting
    gated = scored.select(
        "*", *tx.gopher_quality_stats(F.col("text"), {"min_words": 10})
    )
    kept = gated.filter(F.col("keep") == 1).drop(
        "n_words", "avg_word_len", "symbol_ratio", "n_stopwords", "rep_ratio", "keep"
    )
    # benchmark decontamination: drop docs whose trigrams collide with the
    # held-out eval set — bloom probe, so memory stays fixed as evals grow
    flags = dedup.bloom_decontaminate(kept, heldout, min_hits=2, m_bits=1 << 18)
    kept = kept.join(
        flags.filter(F.col("is_flagged")).select("doc_id"), "doc_id", "left_anti"
    )
    # exact dedupe vs everything accepted in ANY earlier batch
    kept = kept.withColumn("text_hash", F.md5(F.col("text")))
    kept = cross_batch_dedupe(
        kept, ["text_hash"], state=state, state_key="seen_hashes", batch_id=batch_id
    )
    # near-dup dedupe vs the whole accepted corpus AND within the batch:
    # survivors' minhash signatures append to the persisted LSH index
    # (idempotently per batch_id), so batch N+1 dedupes against them
    survivors = dedup.incremental_lsh_dedup(
        kept, lsh_index, threshold=0.6, batch_id=batch_id
    )
    # deterministic split LAST: keyed on doc_id, so reprocessing or future
    # batches can never move a doc between train and test
    return sampling.hash_split(
        survivors, weights={"train": 0.9, "valid": 0.05, "test": 0.05},
        key_col="doc_id",
    )


def main() -> None:
    spark = get_spark("llm-data-pipeline")
    work = tempfile.mkdtemp(prefix="pis_llm_")
    land, ckpt, curated, lsh_index = (
        os.path.join(work, d) for d in ("landing", "ckpt", "curated", "lsh_index")
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    docs.filter(F.col("doc_id") < 300).write.parquet(os.path.join(land, "crawl_1.parquet"))
    # held-out eval set for decontamination (doc_ids 900+ play the benchmark)
    heldout = docs.filter(F.col("doc_id") >= 900).select("doc_id", "text")

    def writer(df, state, batch_id):
        out = curate(df, state, batch_id, lsh_index, heldout)
        write_table(out, curated, mode="append" if os.path.exists(curated) else "overwrite")
        return {"accepted": out.count()}

    pipeline = Pipeline(
        source=FilesSource(path=land, file_format="parquet"),
        checkpoint_dir=ckpt,
        writer=writer,
    )
    print("batch 1:", pipeline.run(spark))
    n1 = read_table(spark, curated).count()
    print(f"curated after batch 1: {n1} docs")

    # second crawl overlaps the first — cross-batch dedupe drops repeats
    docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 500)).write.parquet(
        os.path.join(land, "crawl_2.parquet")
    )
    print("batch 2:", pipeline.run(spark))
    n2 = read_table(spark, curated).count()
    print(f"curated after batch 2: {n2} docs (overlap 200-299 deduped)")

    # duplicate-cluster report over the curated corpus: near-dup pairs that
    # survived the per-batch threshold resolve into clusters for auditing,
    # and PageRank centrality flags the template hubs worth inspecting
    curated_df = read_table(spark, curated)
    pairs = dedup.minhash_lsh_pairs(curated_df, threshold=0.3).persist()
    if pairs.take(1):
        clusters = dedup.connected_components(pairs)
        n_clusters = clusters.select("cluster_id").distinct().count()
        print(f"residual near-dup clusters at 0.3: {n_clusters}")
        from polars_incremental_spark.functions.graph import pagerank

        sym = pairs.select("id_a", "id_b").union(
            pairs.select(F.col("id_b"), F.col("id_a"))
        ).toDF("src", "dst")
        top = pagerank(sym, iterations=3).orderBy(F.col("rank").desc()).limit(3)
        print("most-central dup hubs:", [(r["node"], r["rank"]) for r in top.collect()])
    else:
        print("residual near-dup clusters at 0.3: 0 (corpus fully deduped)")
    pairs.unpersist()
    splits = {r["split"]: r["n"] for r in
              curated_df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print("split sizes:", splits)

    # curation report: best 3 docs per language by quality (skew-safe
    # two-phase top-k — a per-lang window would funnel the corpus through
    # a handful of reducer keys at scale)
    from polars_incremental_spark.functions import curation

    best = curation.grouped_topk(
        curated_df.select("lang", "doc_id", "quality"),
        ["lang"],
        [F.col("quality").desc(), F.col("doc_id").asc()],
        3,
        salt_col="doc_id",
    )
    print("top-quality per lang:", best.count(), "rows")

    # downstream trainer streams the curated corpus incrementally
    consumed = []
    Pipeline(
        source=DeltaSource(path=curated, ignore_changes=True),
        checkpoint_dir=os.path.join(work, "trainer_ckpt"),
        writer=lambda df: consumed.append(df.count()),
    ).run(spark)
    print("trainer streamed docs:", sum(consumed))
    assert sum(consumed) == n2

    # ---- pre-training finishing passes over the curated train split ----
    # 1. benchmark decontamination: drop train docs sharing >= 2 trigrams
    #    with a held-out eval set (broadcast probe; train never shuffles)
    # (the 450+ range overlaps crawl 2 — an eval set leaked into the crawl)
    bench_docs = docs.filter(F.col("doc_id") >= 450)
    train = curated_df.filter(F.col("split") == "train")
    stats = dedup.contamination_stats(train, bench_docs, ngram=3)
    # drop on overlap FRACTION: incidental trigram collisions are universal
    # in a same-domain corpus (median 4 hits here); true leaks sit near 1.0
    clean_ids = stats.filter(F.col("contaminated_frac") <= 0.5).select("doc_id")
    clean = train.join(clean_ids, "doc_id", "left_semi")
    print(
        "decontamination: kept",
        clean.count(),
        "of",
        train.count(),
        "train docs",
    )

    # 2. boilerplate removal: drop EVERY occurrence of any 8-word chunk
    #    appearing in >1 document (C4 semantics — the repeated block leaves
    #    all pages; use chunk_dedup instead for first-occurrence-wins
    #    paragraph DEDUP semantics)
    chunked = dedup.strip_frequent_chunks(
        clean, chunk_words=8, max_doc_freq=1
    ).filter(F.col("n_kept") > 0)
    chars = chunked.agg(
        F.sum(F.length("clean_text")).alias("kept_chars")
    ).first()["kept_chars"]
    print("boilerplate strip: surviving docs", chunked.count(), "chars", chars)
    finished = clean.select("doc_id", "source").join(
        chunked.select("doc_id", "clean_text"), "doc_id"
    )

    # 3. novelty gate: drop boilerplate-dominated docs (most of the doc's
    #    shingles appear in other docs) before spending the token budget
    novelty = tx.ngram_novelty(
        finished.select("doc_id", F.col("clean_text").alias("text"))
    )
    novel_ids = novelty.filter(F.col("novelty") >= 0.2).select("doc_id")
    finished = finished.join(novel_ids, "doc_id", "left_semi")
    print("novelty gate kept", finished.count(), "docs")

    # 3b. model-based quality: the fastText-style hashed-ngram linear
    #     scorer (zero shuffle; swap in trained weights via
    #     apply_linear_classifier without changing the plan shape)
    cls = finished.select(
        "doc_id", *tx.hashed_linear_columns(F.col("clean_text"))
    )
    print(
        "classifier mean logit:",
        round(cls.agg(F.avg("quality_logit")).first()[0], 4),
    )

    # 3c. temperature rebalancing ACROSS LANGUAGES (XLM-R recipe): head
    #     languages thin toward sqrt-proportional shares, tail languages
    #     keep everything — runs before the source mixture so low-resource
    #     languages aren't crowded out of the token budget
    finished_lang = finished.join(
        curated_df.select("doc_id", "lang"), "doc_id"
    )
    rebalanced = sampling.temperature_sample(
        finished_lang, group_col="lang", key_col="doc_id",
        alpha=0.5, total_frac=0.9,
    )
    print(
        "temperature rebalance:",
        {r["lang"]: r["n"] for r in rebalanced.groupBy("lang")
         .agg(F.count("*").alias("n")).orderBy("lang").collect()},
    )
    finished = rebalanced.drop("lang")

    # 4. mixture: sample sources to a target mix, budgeted in TOKENS (real
    #    mixtures are token-budgeted — row-based mixing under-weights
    #    long-document sources)
    finished = finished.withColumn(
        "n_tokens", tx.token_count(F.col("clean_text")).cast("long")
    )
    present = [r["source"] for r in finished.select("source").distinct().limit(3).collect()]
    weights = dict(zip(sorted(present), (0.5, 0.3, 0.2)[: len(present)]))
    mixed = sampling.mixture_sample_tokens(
        finished, source_col="source", weights=weights,
        token_col="n_tokens", key_col="doc_id",
    )
    print("token mixture:", {r["source"]: r["t"] for r in
                             mixed.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()})

    # 5. expand documents into overlapping fixed-width training windows
    #    (map-side only) — the loader consumes examples, not documents
    chunks = layout.sliding_chunks(
        mixed.select("doc_id", F.col("clean_text").alias("text")),
        chunk_tokens=64, stride=48,
    ).withColumn(
        "chunk_key", F.concat_ws(":", F.col("doc_id"), F.col("chunk_index"))
    )
    print("training windows:", chunks.count(), "from", mixed.count(), "docs")

    # 6. shard for the training loader: greedy TOKEN packing in
    #    deterministic hash order (1024 bounded windows, no global sort),
    #    then one shard directory per shard id
    shard_dir = os.path.join(work, "shards")
    assigned = layout.token_balanced_shards(
        chunks, token_col="n_tokens", key_col="chunk_key", tokens_per_shard=20_000
    )
    layout.write_partitioned(assigned, shard_dir, partition_cols=["shard"])
    sharded = spark.read.parquet(shard_dir)
    assert sharded.count() == chunks.count()
    print("wrote token-balanced shards:", sharded.select("shard").distinct().count(), "dirs")

    # ---- governance on the published curated table ----
    # CHECK constraint: every future append must carry a known split tag
    from polars_incremental_spark.errors import ConstraintViolationError
    from polars_incremental_spark.sinks.delta import delete_rows
    from polars_incremental_spark.sinks.deltalog import add_check_constraint

    add_check_constraint(
        spark, curated, "split_known", "split in ('train', 'valid', 'test')"
    )
    try:
        write_table(
            curated_df.limit(1).withColumn("split", F.lit("oops")), curated
        )
        raise AssertionError("constraint should have rejected the write")
    except ConstraintViolationError:
        print("constraint rejected a bad-split append (table untouched)")

    # retraction: a benchmark vendor reports doc_ids 250-259 leaked into
    # the crawl — DELETE them from the published table.  Copy-on-write
    # rewrites ONLY the files containing hits (stats-pruned), and
    # write_cdf emits precise delete rows so the trainer's CDF stream
    # retracts exactly those docs instead of erroring on the rewrite.
    res = delete_rows(
        spark, curated, "doc_id >= 250 and doc_id < 260", write_cdf=True
    )
    print(
        f"retraction: deleted {res['rows_deleted']} docs, rewrote "
        f"{res['files_rewritten']} of {res['files_matched']} candidate files"
    )
    assert read_table(spark, curated, where="doc_id >= 250 and doc_id < 260").count() == 0

    shutil.rmtree(work)


if __name__ == "__main__":
    main()
