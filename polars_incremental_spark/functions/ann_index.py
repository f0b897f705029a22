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
    cosine_hoisted,
    ivf_assign,
    ivf_refine_centroids,
    norm,
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
    payload = assigned.select(id_col, vec_col, "cell").withColumn(
        "batch", F.lit(f"batch_{batch_id}")
    )
    payload.write.partitionBy("cell", "batch").parquet(
        os.path.join(index_path, _ASSIGN)
    )
    meta = {
        "n_cells": len(centroids),
        "dim": dim,
        "id_col": id_col,
        "vec_col": vec_col,
        # pinned read schema — serving skips footer-sampling inference
        "schema": __import__("json").loads(payload.schema.json()),
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


def _read_assignments(spark, index_path: str, meta: dict) -> DataFrame:
    """Assignments reader with the meta-pinned schema when present (no
    parquet footer sampling — see text_index for why that matters)."""
    from pyspark.sql.types import StructType

    reader = spark.read
    if "schema" in meta:
        reader = reader.schema(StructType.fromJson(meta["schema"]))
    return reader.parquet(os.path.join(index_path, _ASSIGN))


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
    corpus = _read_assignments(spark, index_path, meta).withColumn(
        "__vn", norm(F.col(meta["vec_col"]))
    )
    q = queries.select(
        F.col(query_id_col), F.col(qv).alias("__qvec")
    ).withColumn("__sims", _centroid_sims("__qvec", centroids))
    probe = (
        q.withColumn("__qn", norm(F.col("__qvec")))
        .select(
            F.col(query_id_col),
            F.col("__qvec"),
            F.col("__qn"),
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
            F.col(query_id_col),
            F.col("__qvec"),
            F.col("__qn"),
            (F.col("__pos") + 1).alias("cell"),
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
        F.round(
            cosine_hoisted(
                F.col("__qvec"),
                F.col(meta["vec_col"]),
                F.col("__qn"),
                F.col("__vn"),
            ),
            6,
        ).alias("__cos"),
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


# --------------------------------------------------------------------------
# IVF+PQ: probed cells + 4-byte LUT codes — the production ANN layout
# --------------------------------------------------------------------------
#
# The FAISS-style composition: a coarse IVF quantizer picks which
# partition directories to read (I/O ∝ n_probe/n_cells), and inside them
# the corpus exists only as n_sub-byte PQ codes scored by per-query
# lookup tables (memory ∝ codes, 128× down from float64 at dim=64).
# Neither trick needs the other's data: cells prune DISK, codes shrink
# RAM — composed, a 100 TB corpus serves from ~1.6% I/O × ~1% memory.
# Scores are asymmetric-distance approximations (recall < exact IVF
# serving, same ranking determinism contract as pq_topk).

_CODEBOOKS = "codebooks.json"


def build_ivfpq_index(
    spark,
    vectors: DataFrame,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    refine_iters: int = 1,
    n_sub: int = 4,
    n_codes: int = 16,
    pq_iters: int = 1,
    assign_method: str = "expr",
    batch_id: int = 0,
) -> dict:
    """Train the coarse quantizer AND the PQ codebooks, store codes (not
    vectors) partitioned by coarse cell.  The stored payload per vector is
    the id + n_sub small ints — nothing else survives, which is the point."""
    from .similarity import pq_encode, pq_train_codebooks

    meta_path = os.path.join(index_path, _META)
    if os.path.exists(meta_path):
        raise ValueError(
            f"ivfpq index already exists at {index_path}; "
            "rebuild requires removing it first"
        )
    os.makedirs(index_path, exist_ok=True)
    centroids = _seed_centroids(vectors, n_cells, id_col, vec_col)
    if refine_iters > 0:
        centroids = ivf_refine_centroids(
            vectors, centroids, n_iter=refine_iters,
            vec_col=vec_col, assign_method=assign_method,
        )
    codebooks = pq_train_codebooks(
        vectors, n_sub=n_sub, n_codes=n_codes, n_iter=pq_iters,
        id_col=id_col, vec_col=vec_col, assign_method=assign_method,
    )
    _write_json_atomic(os.path.join(index_path, _CENTROIDS), centroids)
    _write_json_atomic(os.path.join(index_path, _CODEBOOKS), codebooks)
    coarse = ivf_assign(
        vectors, centroids, vec_col=vec_col, cell_col="cell",
        method=assign_method,
    ).filter(F.col("cell").isNotNull())
    coded = pq_encode(
        coarse, codebooks, id_col=id_col, vec_col=vec_col,
        assign_method=assign_method, keep_cols=("cell",),
    )
    payload = coded.withColumn("batch", F.lit(f"batch_{batch_id}"))
    payload.write.partitionBy("cell", "batch").parquet(
        os.path.join(index_path, _ASSIGN)
    )
    meta = {
        "kind": "ivfpq",
        "schema": __import__("json").loads(payload.schema.json()),
        "n_cells": len(centroids),
        "dim": len(centroids[0]) if centroids else 0,
        "n_sub": len(codebooks),
        "n_codes": len(codebooks[0]) if codebooks else 0,
        "id_col": id_col,
        "vec_col": vec_col,
        "folded": [f"batch_{batch_id}"],
    }
    _write_json_atomic(meta_path, meta)
    return meta


def append_to_ivfpq_index(
    spark,
    new_vectors: DataFrame,
    index_path: str,
    *,
    batch_id: int,
    assign_method: str = "expr",
) -> bool:
    """Encode new vectors under the FROZEN coarse centroids + codebooks;
    exactly-once per batch id, same dynamic-partition-overwrite retry
    contract as append_to_ivf_index."""
    centroids, meta = load_ivf_index(index_path)
    with open(os.path.join(index_path, _CODEBOOKS)) as fh:
        codebooks = json.load(fh)
    bid = f"batch_{batch_id}"
    if bid in meta["folded"]:
        return False
    from .similarity import pq_encode

    coarse = ivf_assign(
        new_vectors, centroids, vec_col=meta["vec_col"], cell_col="cell",
        method=assign_method,
    ).filter(F.col("cell").isNotNull())
    coded = pq_encode(
        coarse, codebooks, id_col=meta["id_col"], vec_col=meta["vec_col"],
        assign_method=assign_method, keep_cols=("cell",),
    )
    (
        coded.withColumn("batch", F.lit(bid))
        .write.partitionBy("cell", "batch")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(index_path, _ASSIGN))
    )
    meta["folded"] = meta["folded"] + [bid]
    _write_json_atomic(os.path.join(index_path, _META), meta)
    return True


def ivfpq_index_search(
    spark,
    index_path: str,
    queries: DataFrame,
    *,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str | None = None,
) -> DataFrame:
    """(query_id, vec_id, pq_score, rank) — LUT scan over the probed
    cells' CODES.  I/O prunes to the probed partition dirs; per-candidate
    work is n_sub array lookups, never a dim-length product."""
    from .similarity import pq_query_luts, pq_score_expr

    centroids, meta = load_ivf_index(index_path)
    with open(os.path.join(index_path, _CODEBOOKS)) as fh:
        codebooks = json.load(fh)
    id_col = meta["id_col"]
    qv = vec_col or meta["vec_col"]
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
        .select(F.col(query_id_col), (F.col("__pos") + 1).alias("cell"))
    )
    # LUTs once per QUERY (not per probe row), then fan out to the probed
    # (query, cell) pairs — both sides bounded by |Q| × n_probe
    luts = pq_query_luts(
        q.select(query_id_col, F.col("__qvec").alias(qv)),
        codebooks,
        query_id_col=query_id_col,
        vec_col=qv,
    ).join(probe, query_id_col)
    cells = sorted(
        r["cell"] for r in probe.select("cell").distinct().collect()
    )
    coded = _read_assignments(spark, index_path, meta).filter(
        F.col("cell").isin(cells)
    )
    joined = coded.join(F.broadcast(luts), on="cell").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        query_id_col,
        id_col,
        pq_score_expr(meta["n_sub"]).alias("pq_score"),
    ).filter(F.col("pq_score").isNotNull())
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("pq_score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
