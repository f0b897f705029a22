"""Persisted IVF ANN index: build once, serve many — the production split
the in-query ANN entries (s5/s5b, queries.py) deliberately avoid so their
oracles can replay training.

A real corpus trains its index ONCE (or nightly), then serves thousands
of queries against the stored artifact.  The on-disk layout makes the
serving cost proportional to the probed fraction, not the corpus:

    index_path/
      meta.json                 {n_cells, dim, id_col, vec_col, folded: [...]}
      centroids.json            n_cells x dim doubles (tiny — a dim table)
      assignments/cell=<c>/...  corpus rows partitioned BY cell id

Searching reads ``assignments`` with a ``cell IN (probes)`` filter, which
Spark turns into DISK-level partition pruning (only the probed cells'
directories are listed/read — asserted via inputFiles() in tests).  At
100 TB with n_cells=4096, n_probe=64 that is 1.6% of the corpus per
query batch.

Appends assign NEW vectors with the FROZEN centroids (an index's cell
boundaries must not drift under its stored assignments) and are
exactly-once per batch id through the same folded-id accounting as the
CMS store (sketches.py): rows ADD, so a replayed fold would duplicate
candidates and corrupt ranks.

Greenfield Spark work (no reference counterpart; the reference's nearest
surface is its static parquet sink, sinks/parquet.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import (
    _centroid_sims,
    _seed_centroids,
    cosine,
    ivf_assign,
    ivf_refine_centroids,
)

_META = "meta.json"
_CENTROIDS = "centroids.json"
_ASSIGN = "assignments"


def _write_json_atomic(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def build_ivf_index(
    spark,
    vectors: DataFrame,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    refine_iters: int = 2,
    assign_method: str = "expr",
    batch_id: int = 0,
) -> dict:
    """Train centroids (md5 seed + spherical k-means) over ``vectors``,
    persist them with the cell-partitioned corpus, return the meta dict.
    Refuses to overwrite an existing index (drop the directory first —
    an index rebuild invalidates every stored assignment by definition)."""
    meta_path = os.path.join(index_path, _META)
    if os.path.exists(meta_path):
        raise ValueError(
            f"ivf index already exists at {index_path}; "
            "rebuild requires removing it first"
        )
    os.makedirs(index_path, exist_ok=True)
    centroids = _seed_centroids(vectors, n_cells, id_col, vec_col)
    if refine_iters > 0:
        centroids = ivf_refine_centroids(
            vectors, centroids, n_iter=refine_iters,
            vec_col=vec_col, assign_method=assign_method,
        )
    dim = len(centroids[0]) if centroids else 0
    _write_json_atomic(os.path.join(index_path, _CENTROIDS), centroids)
    assigned = ivf_assign(
        vectors, centroids, vec_col=vec_col, cell_col="cell",
        method=assign_method,
    ).filter(F.col("cell").isNotNull())
    # same (cell, batch) layout as appends — partition discovery requires
    # one consistent directory depth across the whole assignments tree
    (
        assigned.select(id_col, vec_col, "cell")
        .withColumn("batch", F.lit(f"batch_{batch_id}"))
        .write.partitionBy("cell", "batch")
        .parquet(os.path.join(index_path, _ASSIGN))
    )
    meta = {
        "n_cells": len(centroids),
        "dim": dim,
        "id_col": id_col,
        "vec_col": vec_col,
        "folded": [f"batch_{batch_id}"],
    }
    _write_json_atomic(meta_path, meta)
    return meta


def load_ivf_index(index_path: str) -> tuple[list[list[float]], dict]:
    with open(os.path.join(index_path, _META)) as fh:
        meta = json.load(fh)
    with open(os.path.join(index_path, _CENTROIDS)) as fh:
        centroids = json.load(fh)
    return centroids, meta


def append_to_ivf_index(
    spark,
    new_vectors: DataFrame,
    index_path: str,
    *,
    batch_id: int,
    assign_method: str = "expr",
) -> bool:
    """Assign ``new_vectors`` under the FROZEN centroids and append them to
    the cell partitions.  Returns False (no-op) when this batch id was
    already folded — the Pipeline-retry contract; rows ADD, so the guard
    is what keeps a replayed writer from duplicating candidates."""
    centroids, meta = load_ivf_index(index_path)
    bid = f"batch_{batch_id}"
    if bid in meta["folded"]:
        return False
    assigned = ivf_assign(
        new_vectors, centroids, vec_col=meta["vec_col"], cell_col="cell",
        method=assign_method,
    ).filter(F.col("cell").isNotNull())
    # partition-dir appends first, manifest commit second: a crash between
    # the two leaves duplicate FILES for an uncommitted batch — visible to
    # readers, so the retry must be idempotent at the file level too.
    # parquet append can't overwrite selectively; instead tag rows with the
    # batch id and have the retry's reader-side dedup drop the torn batch:
    # we write to a per-batch subdir of each cell via an extra partition
    # column, and retries OVERWRITE that batch's directories only.
    (
        assigned.select(meta["id_col"], meta["vec_col"], "cell")
        .withColumn("batch", F.lit(bid))
        .write.partitionBy("cell", "batch")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(index_path, _ASSIGN))
    )
    meta["folded"] = meta["folded"] + [bid]
    _write_json_atomic(os.path.join(index_path, _META), meta)
    return True


def ivf_index_search(
    spark,
    index_path: str,
    queries: DataFrame,
    *,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str | None = None,
) -> DataFrame:
    """(query_id, vec_id, cosine_sim, rank) — IVF search against the
    stored index.  The probed-cell filter lands on the partition column,
    so Spark prunes unprobed cell directories at file-listing time; exact
    cosine re-ranks within candidates (same contract as ivf_topk)."""
    centroids, meta = load_ivf_index(index_path)
    id_col = meta["id_col"]
    qv = vec_col or meta["vec_col"]
    corpus = spark.read.parquet(os.path.join(index_path, _ASSIGN))
    q = queries.select(
        F.col(query_id_col), F.col(qv).alias("__qvec")
    ).withColumn("__sims", _centroid_sims("__qvec", centroids))
    probe = (
        q.select(
            F.col(query_id_col),
            F.col("__qvec"),
            F.posexplode("__sims").alias("__pos", "__sim"),
        )
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col("__sim").desc(), F.col("__pos").asc()
                )
            ),
        )
        .filter(F.col("__pr") <= n_probe)
        .select(
            F.col(query_id_col), F.col("__qvec"), (F.col("__pos") + 1).alias("cell")
        )
    )
    # distinct probed cells as a literal IN-list: tiny (<= n_queries *
    # n_probe ids) and REQUIRED for disk pruning — a join predicate alone
    # cannot prune partitions at file-listing time without DPP kicking in,
    # and the collect is bounded by n_cells regardless of query count.
    cells = sorted(
        r["cell"] for r in probe.select("cell").distinct().collect()
    )
    pruned = corpus.filter(F.col("cell").isin(cells))
    joined = pruned.join(F.broadcast(probe), on="cell").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col("__qvec"), F.col(meta["vec_col"])), 6).alias("__cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__cos").desc_nulls_last(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter((F.col("__rank") <= k) & F.col("__cos").isNotNull())
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.col("__cos").alias("cosine_sim"),
            F.col("__rank").alias("rank"),
        )
    )
