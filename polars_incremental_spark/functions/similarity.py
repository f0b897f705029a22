"""Similarity search over embedding columns (array<float>).

Three paths:

- ``cosine_topk``: exact brute-force top-k.  The query side is broadcast
  (it is small by construction), so the big side streams once with no
  shuffle; per-row work is a codegen'd ``aggregate``/``zip_with`` dot
  product in doubles.  This is the correctness baseline.
- ``lsh_ann_topk``: random-hyperplane LSH — each vector gets a b-bit sign
  sketch; candidates share the sketch bucket, then exact cosine re-ranks
  within buckets.  At 100 TB the bucket join replaces the full cross
  product; hyperplanes are md5-derived so results stay deterministic and
  oracle-reproducible.
- ``ivf_topk``: inverted-file (IVF) partitioned search — vectors are
  assigned to the nearest of ``n_cells`` centroids map-side (zero shuffle
  on the corpus), queries probe their ``n_probe`` nearest cells, exact
  cosine re-ranks within probed cells.  Seed centroids are an md5-ordered
  deterministic sample (k-means‖ with zero refinement rounds), so the
  whole index is oracle-reproducible; ``ivf_refine_centroids`` runs real
  Lloyd iterations on top when recall matters more than determinism.

Greenfield Spark work (no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import scoped_persist
from .dedup import spread
from .text import md5_long


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL (not a DIVIDE_BY_ZERO error under ANSI mode) for zero-norm
    vectors — cosine is undefined there; ranking windows sort NULLs last."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def cosine_hoisted(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with the per-side norms PRE-COMPUTED as columns.

    Bit-identical to ``cosine(a, b)`` when ``na``/``nb`` carry ``norm(a)``
    / ``norm(b)``: the same two doubles multiply in the same order, the
    same ``nullif`` guards the division.  The point is pair-join scoring
    (guide §1.2 per-task work): higher-order-function folds are
    interpreted and get no common-subexpression elimination, so scoring
    |pairs| rows with ``cosine`` pays THREE O(dim) folds per pair while
    each side's norm only ever has |side| distinct values.  Hoisting the
    norms to the pre-join projections leaves one fold (the dot) per pair
    — a 3× cut in interpreted per-pair work that grows with join fan-out
    (measurements in OPTIMIZATION_r12.md).  NULL semantics are
    unchanged: a NULL/zero-norm side gives a NULL factor, so the product
    and the score stay NULL."""
    return dot(a, b) / F.nullif(na * nb, F.lit(0.0))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, cosine_sim).

    ``queries`` must have (query_id_col, vec_col).  Deterministic ranking:
    cosine rounded to 6 dp desc, then vec_id asc on ties; self-matches are
    excluded when ids collide.  Ranking on the ROUNDED value keeps the order
    reproducible across engines (full-precision ties differ in the last bit
    between summation strategies).
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    ).withColumn("__qn", norm(F.col("__qvec")))
    # per-side norms ride the pre-join projections (cosine_hoisted): the
    # corpus norm is one fold per corpus row instead of one per scored pair.
    # spread: the corpus usually arrives as one small-file scan partition,
    # and with broadcast queries the whole interpreted-HOF scoring would
    # pipeline on that one task (round-13 profile: every s-family stage ran
    # 1 task at sf0.1/sf1) — the one-row-per-vector exchange is noise next
    # to the per-pair dot folds it parallelizes
    v = spread(vectors).withColumn("__vn", norm(F.col(vec_col)))
    joined = v.alias("v").join(F.broadcast(q), F.col(query_id_col) != F.col(id_col))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            cosine_hoisted(
                F.col("__qvec"), F.col(vec_col), F.col("__qn"), F.col("__vn")
            ),
            6,
        ).alias("__cos"),
    )
    # NULL-scored rows (zero-norm vectors) sort LAST and are dropped AFTER
    # the window: a pre-window isNotNull(__cos) filter gets pushed below the
    # projection and re-evaluates the whole cosine per row (no subexpression
    # elimination across Filter/Project for interpreted higher-order
    # functions — measured 2x on the brute-force path).  Above the window it
    # is a cheap column test, and NULLs can never displace a real candidate.
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__cos").desc_nulls_last(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter((F.col("__rank") <= k) & F.col("__cos").isNotNull())
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(F.col("__cos"), 6).alias("cosine_sim"),
            F.col("__rank").alias("rank"),
        )
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    *,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    band_size: int = 4,
    exact: bool = False,
    max_candidates: int | None = 1_000_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine_sim).

    Scale path (default): random-hyperplane sign bits split into bands (the
    MinHash-banding trick applied to sign sketches) — vectors colliding in
    ≥1 band become candidates, then exact cosine verifies, so the output has
    no false positives.  For two vectors at angle θ a bit agrees with
    probability 1−θ/π; recall = 1−(1−p^band_size)^n_bands and rises toward 1
    as ``threshold`` → 1 (near-dup regime).  The all-pairs cross product
    never materializes; the only full shuffle is the 8-byte band-bucket key.

    ``exact=True`` runs the O(N²) self-join baseline instead (correctness
    reference; unusable at corpus scale).

    ``max_candidates`` (banded path only): with B = 2^band_size buckets
    per band, candidate volume grows as N²·bands/B — at fixed defaults a
    10× corpus is ~100× candidates (SCALING.md measured s3 at 31×).  A
    pre-flight Σ bucket² estimate raises CandidateVolumeError over the
    budget with the fix (raise ``band_size``/``n_planes``: every +1 bit of
    band halves candidates at ~unchanged recall when threshold is high).
    ``None`` disables the guard; the exact path is already an allowlisted
    baseline and is not guarded.
    """
    if n_planes % band_size != 0:
        raise ValueError("n_planes must be a multiple of band_size")
    # the sign-sketch build (n_planes × dim interpreted folds per row) and
    # the exact path's pair scoring are CPU-bound on a corpus that arrives
    # as one small-file scan partition — spread them across the cluster
    # before any per-row work (same rationale as shingle_posting_list)
    vectors = spread(vectors)
    a_ids = F.col(f"a.{id_col}")
    b_ids = F.col(f"b.{id_col}")
    if exact:
        vn = vectors.withColumn("__nv", norm(F.col(vec_col)))
        a = vn.alias("a")
        b = vn.alias("b")
        pairs = a.join(b, a_ids < b_ids)
    else:
        n_bands = n_planes // band_size
        # __nv: per-vector norm computed ONCE into the persisted frame —
        # the verify join then scores each candidate pair with a single
        # dot fold (cosine_hoisted) instead of re-folding both norms per
        # pair (candidates are ~100× the corpus at dense-corpus scale)
        bits = vectors.withColumn(
            "__sk", sign_sketch(vec_col, dim, n_planes)
        ).withColumn("__nv", norm(F.col(vec_col)))
        # one row per vector (NOT per band): the persisted frame feeds the
        # guard, the candidate join, and the post-dedup vector re-attach,
        # so the md5-hyperplane sketch is computed exactly once — and the
        # cache is n_bands× smaller than persisting the exploded frame
        # (which round 9's sf1 re-measure caught costing 2.5× on s3: the
        # cached exploded frame's in-memory stats pushed the self-join
        # from broadcast-hash to sort-merge over only bands·2^band_size
        # distinct keys)
        # scoped: released by the caller's operator_cache_scope / the
        # pipeline's per-batch release (cache.py) — the returned lazy plan
        # references this cache, so a bare persist would leak it for the
        # session's lifetime
        bits = scoped_persist(bits)
        band_mask = (1 << band_size) - 1
        banded = bits.select(
            F.col(id_col),
            F.col(vec_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col("__sk"), b * band_size)
                            .bitwiseAND(F.lit(band_mask))
                            .alias("bucket"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bb"),
        ).select(F.col(id_col), F.col("bb.band"), F.col("bb.bucket"))
        # `banded` deliberately does NOT carry the vector: the candidate
        # self-join and the dedup shuffle move 16-byte (id, band, bucket)
        # rows, not ~1 KB vector pairs, and vectors re-attach AFTER the
        # pair set is deduplicated — at a dense-corpus scale where
        # candidates are ~100× the corpus (SCALING.md s3 row), payload
        # width on the candidate path dominates the query
        if max_candidates is not None:
            # one cheap agg over the banded projection of the persisted
            # sketch frame — the hyperplane dot products are not recomputed
            row = (
                banded.groupBy("band", "bucket")
                .agg(F.count("*").alias("__n"))
                .agg(
                    F.sum(
                        F.col("__n").cast("double") * (F.col("__n") - 1) / 2
                    ).alias("c")
                )
                .collect()[0]
            )
            est = int(row["c"] or 0)
            if est > max_candidates:
                from ..errors import CandidateVolumeError

                bits.unpersist()  # don't leak the cache on the error path
                raise CandidateVolumeError(
                    f"cosine_near_dup_pairs: estimated candidate volume "
                    f"{est:,} pairs exceeds max_candidates="
                    f"{max_candidates:,}. Candidates grow as "
                    f"N^2*bands/2^band_size — raise band_size (every +1 "
                    f"bit halves candidates) and/or n_planes, or pass "
                    f"max_candidates=None to accept the cost explicitly."
                )
        a = banded.alias("a")
        b = banded.alias("b")
        cand = (
            a.join(b, on=["band", "bucket"])
            .filter(a_ids < b_ids)
            .select(a_ids.alias(id_col), b_ids.alias("__idb"))
            .dropDuplicates([id_col, "__idb"])
        )
        va = bits.select(
            F.col(id_col), F.col(vec_col).alias("__va"), F.col("__nv").alias("__na")
        )
        vb = bits.select(
            F.col(id_col).alias("__idb"),
            F.col(vec_col).alias("__vb"),
            F.col("__nv").alias("__nb"),
        )
        scored = cand.join(va, id_col).join(vb, "__idb").select(
            F.col(id_col).alias("id_a"),
            F.col("__idb").alias("id_b"),
            F.round(
                cosine_hoisted(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ).alias("cosine_sim"),
        )
        return scored.filter(F.col("cosine_sim") >= threshold)
    scored = pairs.select(
        a_ids.alias("id_a"),
        b_ids.alias("id_b"),
        F.round(
            cosine_hoisted(
                F.col(f"a.{vec_col}"),
                F.col(f"b.{vec_col}"),
                F.col("a.__nv"),
                F.col("b.__nv"),
            ),
            6,
        ).alias("cosine_sim"),
    )
    return scored.filter(F.col("cosine_sim") >= threshold)


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 bits (engine-portable).

    Component j = ±1 by the low bit of md5(f"{plane_idx}:{j}") — a Rademacher
    hyperplane, which for sign-sketch LSH performs like a Gaussian one.
    """
    import hashlib

    out = []
    for j in range(dim):
        digest = hashlib.md5(f"{plane_idx}:{j}".encode()).hexdigest()
        out.append(1.0 if int(digest[-1], 16) % 2 else -1.0)
    return out


def sign_sketch(vec: Column | str, dim: int, n_planes: int = 8) -> Column:
    """b-bit sign sketch of a vector under the deterministic hyperplanes.

    When ``vec`` is a column NAME the whole sketch is built as one SQL
    expression string — a single Py4J round-trip instead of ~dim×n_planes
    Column compositions, and the n_planes independent straight-line dot
    products execute ~2× faster than a nested aggregate-over-planes fold
    (measured on the s2/s3 bench queries; higher-order lambdas are
    interpreted, so fold depth is per-row cost).  Unrolling is safe here
    because n_planes ≤ 16 keeps the AST small; the nested-array-literal
    fold that protects PLANNING time against superlinear recanonicalization
    lives in ``_centroid_sims``, where the matrix is 64×64, not 16×dim.
    Column input keeps the composed form for expression callers.
    """
    if isinstance(vec, str):
        terms = []
        for p in range(n_planes):
            plane = _hyperplane(dim, p)
            arr = ", ".join(f"{c!r}D" for c in plane)
            proj = (
                f"aggregate(zip_with({vec}, array({arr}), "
                f"(x, h) -> CAST(x AS DOUBLE) * h), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
        return F.expr(" + ".join(terms))
    sketch = F.lit(0)
    for p in range(n_planes):
        plane = _hyperplane(dim, p)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(c) for c in plane]),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sketch = sketch + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sketch


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the sign-sketch bucket, exact
    cosine re-ranks inside the bucket.  Recall trades off with n_planes."""
    v = spread(vectors).withColumn(
        "__bucket", sign_sketch(vec_col, dim, n_planes)
    ).withColumn("__vn", norm(F.col(vec_col)))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        sign_sketch(vec_col, dim, n_planes).alias("__bucket"),
    ).withColumn("__qn", norm(F.col("__qvec")))
    joined = v.join(F.broadcast(q), on="__bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            cosine_hoisted(
                F.col("__qvec"), F.col(vec_col), F.col("__qn"), F.col("__vn")
            ),
            6,
        ).alias("__cos"),
    )
    # NULL-scored rows (zero-norm vectors) sort LAST and are dropped AFTER
    # the window: a pre-window isNotNull(__cos) filter gets pushed below the
    # projection and re-evaluates the whole cosine per row (no subexpression
    # elimination across Filter/Project for interpreted higher-order
    # functions — measured 2x on the brute-force path).  Above the window it
    # is a cheap column test, and NULLs can never displace a real candidate.
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__cos").desc_nulls_last(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter((F.col("__rank") <= k) & F.col("__cos").isNotNull())
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(F.col("__cos"), 6).alias("cosine_sim"),
            F.col("__rank").alias("rank"),
        )
    )


# --------------------------------------------------------------------- IVF


def _seed_centroids(
    vectors: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> list[list[float]]:
    """Deterministic seed centroids: the ``n_cells`` vectors whose md5-hashed
    id sorts lowest — a uniform pseudo-random sample reproducible in any
    engine with md5 (the same portability trick as the MinHash params).

    This is the one deliberate driver materialization in the IVF path: the
    centroid set is tiny by construction (n_cells ≪ N — hundreds even at
    100 TB), the same class of collect as a broadcast dim table.
    """
    rows = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .orderBy(md5_long(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def _centroid_sims(vec_col: str, centroids: list[list[float]]) -> Column:
    """array<double> of round(cosine(vec, c_i), 6) per centroid.

    The centroid matrix rides along as ONE nested-array literal indexed by
    ``transform`` over a 0..n-1 sequence — NOT as per-centroid unrolled
    fold expressions.  The distinction is load-bearing: an unrolled variant
    (16 centroids × 64 dims of scalar literals) produces an expression tree
    Catalyst re-canonicalizes superlinearly — window/rank plans on top of
    it took ~40 s to OPTIMIZE at any data size; this form plans in <0.3 s
    with bit-identical results.

    Centroid norms are Python-computed literals: the sequential left-fold
    below is bit-identical to the engines' aggregate / list_sum folds over
    the same doubles.  Rounding to 6 dp before the argmax keeps cell
    assignment identical across engines.  ``nullif``: a zero-norm vector
    (or degenerate seed centroid) yields NULL sims instead of an ANSI
    DIVIDE_BY_ZERO crash; its cell comes out NULL and the row simply never
    joins a probe.
    """
    import math

    cnorms = []
    for c in centroids:
        acc = 0.0
        for x in c:
            acc += x * x
        cnorms.append(math.sqrt(acc))
    C = F.lit([[float(x) for x in c] for c in centroids])
    N = F.lit(cnorms)
    vn = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    idxs = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    return F.transform(
        idxs,
        lambda i: F.round(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), F.get(C, i), lambda x, h: x.cast("double") * h
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            / F.nullif(vn * F.get(N, i), F.lit(0.0)),
            F.lit(6),
        ),
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    cell_col: str = "__cell",
    method: str = "expr",
) -> DataFrame:
    """Attach the 1-based nearest-centroid cell id — pure map-side (the
    centroids ride into every task as a literal / numpy constant; no
    shuffle, no broadcast join).  Ties on the rounded similarity go to the
    lowest cell; zero-norm vectors get a NULL cell (cosine undefined) and
    drop out of probe joins instead of crashing the job.

    ``method="expr"`` (default) evaluates the sims as Catalyst higher-order
    functions — engine-portable sequential folds, the form the DuckDB
    oracle reproduces bit-for-bit.  ``method="arrow"`` runs the assignment
    as ONE numpy matmul per Arrow batch in ``mapInPandas`` — the scale
    path: at dim=1024 × n_cells=4096 the interpreted per-row folds are the
    corpus bottleneck while BLAS does the (batch × dim) @ (dim × cells)
    product in microseconds.  Same rounding (6 dp) and first-max tie rule;
    results agree with "expr" except for float summation order in the last
    bits, which the rounding masks in practice (asserted by test, not by
    construction — keep "expr" for oracle-checked runs).

    At 100 TB the assigned corpus would be persisted partitioned BY this
    column (``df.write.partitionBy(cell_col)``) so probe-time reads prune
    to n_probe/n_cells of the data.
    """
    if method == "arrow":
        return _ivf_assign_arrow(vectors, centroids, vec_col, cell_col)
    if method != "expr":
        raise ValueError(f"method must be 'expr' or 'arrow'; got {method!r}")
    return (
        vectors.withColumn("__sims", _centroid_sims(vec_col, centroids))
        .withColumn(
            cell_col, F.expr("array_position(__sims, array_max(__sims))").cast("int")
        )
        .drop("__sims")
    )


def _ivf_assign_arrow(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    cell_col: str,
) -> DataFrame:
    """Vectorized cell assignment: one BLAS matmul per Arrow batch."""
    import numpy as np
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)  # (cells, dim)
    cn = np.sqrt((C * C).sum(axis=1))  # zero-norm centroid -> sims NaN
    out_schema = T.StructType(
        list(vectors.schema.fields) + [T.StructField(cell_col, T.IntegerType(), True)]
    )

    def assign(batches):
        import pandas as pd

        dim = C.shape[1]
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{cell_col: pd.Series([], dtype="Int32")})
                continue
            vecs = pdf[vec_col].to_list()
            # NULL / wrong-length embeddings get a NULL cell, matching the
            # expr path (zip_with over a NULL or ragged array yields NULL
            # sims there); np.asarray on a ragged list would raise instead.
            valid = np.array(
                [v is not None and len(v) == dim for v in vecs], dtype=bool
            )
            cells = pd.array([pd.NA] * len(pdf), dtype="Int32")
            if valid.any():
                M = np.asarray(
                    [v for v, m in zip(vecs, valid) if m], dtype=np.float64
                )  # (n_valid, dim)
                vn = np.sqrt((M * M).sum(axis=1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.round((M @ C.T) / (vn[:, None] * cn[None, :]), 6)
                ok = ~np.isnan(sims).all(axis=1)
                # nanargmax would raise on all-NaN rows; argmax on a masked
                # copy keeps the first-max (lowest cell) tie rule of the
                # expr path
                safe = np.where(np.isnan(sims), -np.inf, sims)
                sub = pd.array(safe.argmax(axis=1) + 1, dtype="Int32")
                sub[~ok] = pd.NA
                cells[valid] = sub
            yield pdf.assign(**{cell_col: cells})

    return vectors.mapInPandas(assign, out_schema)


def _pq_assign_arrow(
    vectors: DataFrame,
    jobs: list[tuple[str, str, list[list[float]]]],
) -> DataFrame:
    """FUSED multi-subspace cell assignment: every (vec_col, cell_col,
    codebook) job runs inside ONE ``mapInPandas`` pass — one matmul per
    subspace per Arrow batch, identical math (6-dp rounding, first-max
    tie, NULL for zero-norm/ragged rows) to chaining ``_ivf_assign_arrow``
    per subspace.

    The fusion is the point (guide §4: you cannot remove the JVM↔Python
    boundary, only how often the data crosses it): the chained form
    shipped the whole frame — every subspace slice — through a separate
    Python worker round-trip PER SUBSPACE, so a 4-subspace PQ
    train+encode paid 8 corpus crossings; fused it pays 2."""
    import numpy as np
    from pyspark.sql import types as T

    mats = [
        (
            vec_col,
            cell_col,
            np.asarray(cb, dtype=np.float64),
        )
        for vec_col, cell_col, cb in jobs
    ]
    out_schema = T.StructType(
        list(vectors.schema.fields)
        + [T.StructField(cell_col, T.IntegerType(), True) for _, cell_col, _ in jobs]
    )

    def assign(batches):
        import pandas as pd

        norms = [(C, np.sqrt((C * C).sum(axis=1))) for _, _, C in mats]
        for pdf in batches:
            out = {}
            for (vec_col, cell_col, _), (C, cn) in zip(mats, norms):
                if len(pdf) == 0:
                    out[cell_col] = pd.Series([], dtype="Int32")
                    continue
                dim = C.shape[1]
                vecs = pdf[vec_col].to_list()
                valid = np.array(
                    [v is not None and len(v) == dim for v in vecs], dtype=bool
                )
                cells = pd.array([pd.NA] * len(pdf), dtype="Int32")
                if valid.any():
                    M = np.asarray(
                        [v for v, m in zip(vecs, valid) if m], dtype=np.float64
                    )
                    vn = np.sqrt((M * M).sum(axis=1))
                    with np.errstate(divide="ignore", invalid="ignore"):
                        sims = np.round((M @ C.T) / (vn[:, None] * cn[None, :]), 6)
                    ok = ~np.isnan(sims).all(axis=1)
                    safe = np.where(np.isnan(sims), -np.inf, sims)
                    sub = pd.array(safe.argmax(axis=1) + 1, dtype="Int32")
                    sub[~ok] = pd.NA
                    cells[valid] = sub
                out[cell_col] = cells
            yield pdf.assign(**out)

    return vectors.mapInPandas(assign, out_schema)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
    assign_method: str = "expr",
) -> DataFrame:
    """IVF approximate top-k: (query_id, vec_id, cosine_sim, rank).

    Corpus side: one map-side pass assigns each vector to its nearest
    centroid.  Query side (small): each query probes its ``n_probe``
    nearest cells.  The candidate set is the broadcast equi-join on the
    cell id — expected corpus fraction n_probe/n_cells — and exact cosine
    re-ranks candidates, so scores carry no approximation (only recall
    does).  Pass ``centroids`` (e.g. from ``ivf_refine_centroids``) to
    reuse a trained index; default is the deterministic md5 seed sample.
    """
    if centroids is None:
        centroids = _seed_centroids(vectors, n_cells, id_col, vec_col)
    v = ivf_assign(
        spread(vectors), centroids, vec_col=vec_col, method=assign_method
    ).withColumn("__vn", norm(F.col(vec_col)))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
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
            (F.col("__pos") + 1).alias("__cell"),
        )
    )
    joined = v.join(F.broadcast(probe), on="__cell").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            cosine_hoisted(
                F.col("__qvec"), F.col(vec_col), F.col("__qn"), F.col("__vn")
            ),
            6,
        ).alias("__cos"),
    )
    # NULL-scored rows (zero-norm vectors) sort LAST and are dropped AFTER
    # the window: a pre-window isNotNull(__cos) filter gets pushed below the
    # projection and re-evaluates the whole cosine per row (no subexpression
    # elimination across Filter/Project for interpreted higher-order
    # functions — measured 2x on the brute-force path).  Above the window it
    # is a cheap column test, and NULLs can never displace a real candidate.
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


def ivf_refine_centroids(
    vectors: DataFrame,
    centroids: list[list[float]],
    *,
    n_iter: int = 3,
    vec_col: str = "embedding",
    assign_method: str = "expr",
    scale: int = 1_000_000,
) -> list[list[float]]:
    """SPHERICAL k-means refinement of the seed centroids, Spark-shaped:
    each iteration is one map-side assignment + one groupBy(cell, dim)
    partial-aggregated mean — per-iteration shuffle is O(n_cells × dim)
    rows after map-side combine, independent of corpus size.  The update
    averages UNIT vectors (the mean direction maximizes within-cell cosine;
    a raw-vector mean would optimize Euclidean distortion instead and can
    INCREASE cosine inertia when magnitudes vary).  Empty cells keep their
    previous centroid; zero-norm vectors are excluded.

    Determinism (what makes the TRAINED index oracle-replayable): the mean
    goes through ``scale``-scaled integer sums — per (cell, dim) the update
    is ``sum(round(unit_d * scale)) / (n * scale)``, an integer sum (order-
    independent under any partitioning) followed by ONE exact IEEE double
    division, no final rounding.  Every term is bit-reproducible in any
    engine (same trick as ``label_centroids``), so an unrolled-CTE oracle
    can replay the full Lloyd loop — see S5B_SQL in queries.py.
    """
    # spread once, outside the loop: every iteration's assignment (one
    # matmul per Arrow batch / per-row folds) otherwise runs on the small
    # number of scan partitions the corpus file yields
    vectors = spread(vectors)
    for _ in range(n_iter):
        assigned = ivf_assign(vectors, centroids, vec_col=vec_col, method=assign_method)
        unit = F.transform(
            F.col(vec_col),
            lambda x: x.cast("double") / F.nullif(F.col("__n"), F.lit(0.0)),
        )
        means = (
            assigned.filter(F.col("__cell").isNotNull())
            .withColumn("__n", norm(F.col(vec_col)))
            .select(F.col("__cell"), F.posexplode(unit).alias("__dim", "__x"))
            .groupBy("__cell", "__dim")
            .agg(
                F.count("__x").cast("long").alias("__c"),
                F.sum(F.round(F.col("__x") * scale).cast("long")).alias("__s"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            if r["__s"] is None or not r["__c"]:
                continue
            by_cell.setdefault(r["__cell"] - 1, {})[r["__dim"]] = r["__s"] / (
                r["__c"] * float(scale)
            )
        for cell, dims in by_cell.items():
            new[cell] = [dims[d] for d in sorted(dims)]
        centroids = new
    return centroids


def ivf_inertia(
    vectors: DataFrame, centroids: list[list[float]], *, vec_col: str = "embedding"
) -> float:
    """Mean (1 − cosine-to-assigned-centroid) over the corpus — the
    quantity Lloyd iterations should not increase."""
    assigned = vectors.withColumn("__sims", _centroid_sims(vec_col, centroids))
    return float(
        assigned.agg(F.avg(F.lit(1.0) - F.array_max("__sims"))).collect()[0][0]
    )


# ------------------------------------------------------------ quantization


def quantize_embeddings(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q = round(x / s), s =
    max|x| / 127 — a 4× (vs float32) / 8× (vs float64) storage cut, the
    difference between an embedding corpus fitting executor memory or not
    at 100 TB.  Pure Catalyst expressions; zero vectors get a NULL scale
    and NULL codes (nothing to preserve).  Cosine between quantized
    vectors needs NO dequantization: the per-vector scales cancel in
    dot/(|a||b|), so scoring runs on exact integer arithmetic
    (``quantized_cosine``) and only the final division is floating.
    """
    absmax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    s = F.nullif(absmax, F.lit(0.0)) / F.lit(127.0)
    q = F.when(
        s.isNotNull(),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") / s).cast("tinyint")
        ),
    )
    return df.withColumn(q_col, q).withColumn(scale_col, s)


def dequantize_embeddings(
    df: DataFrame,
    *,
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
    vec_col: str = "embedding",
) -> DataFrame:
    """x ≈ q * s (max reconstruction error s/2 per component)."""
    return df.withColumn(
        vec_col,
        F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)),
    )


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over int8 codes — integer dot and norms (exact, engine-
    portable), one floating division at the end.  Scales cancel."""
    d = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return d.cast("double") / F.nullif(
        quantized_norm(qa) * quantized_norm(qb), F.lit(0.0)
    )


def quantized_norm(q: Column) -> Column:
    """sqrt of the exact integer self-dot of an int8 code array, as the
    double ``quantized_cosine`` divides by — exposed so pair joins can
    hoist it to the per-side projections (``cosine_hoisted`` pattern:
    same doubles, same multiply order, one fold per row instead of per
    pair)."""
    return F.sqrt(
        F.aggregate(
            q,
            F.lit(0).cast("long"),
            lambda acc, v: acc + v.cast("long") * v.cast("long"),
        ).cast("double")
    )


def quantized_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force top-k over int8-quantized vectors: same plan shape as
    ``cosine_topk`` (broadcast queries, corpus streams once) at a quarter
    of the memory traffic; scores differ from exact float cosine only by
    quantization error (~1e-2 at dim 64)."""
    qv = quantize_embeddings(spread(vectors), vec_col=vec_col).withColumn(
        "__vn", quantized_norm(F.col("q_embedding"))
    )
    qq = quantize_embeddings(
        queries.select(F.col(query_id_col), F.col(vec_col)), vec_col=vec_col
    ).select(
        F.col(query_id_col),
        F.col("q_embedding").alias("__qq"),
        quantized_norm(F.col("q_embedding")).alias("__qn"),
    )
    joined = qv.join(F.broadcast(qq), F.col(query_id_col) != F.col(id_col))
    d = F.aggregate(
        F.zip_with(
            F.col("__qq"),
            F.col("q_embedding"),
            lambda x, y: x.cast("long") * y.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            d.cast("double") / F.nullif(F.col("__qn") * F.col("__vn"), F.lit(0.0)), 6
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


def label_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Element-wise mean embedding per label (mean-pooling / class
    centroids): one row per ``(label, pos)`` with the exact mean of that
    dimension over every vector in the class.

    The building block for class prototypes, nearest-centroid
    classification, and per-cluster summary vectors.  Means go through
    ``scale``-scaled integer sums (round half-up at 6 dp of the scaled
    value), so partial-sum ordering can never perturb the result across
    engines or partitionings — same determinism rule as the IVF centroid
    math.

    Scale shape: one ``posexplode`` (fan-out = dim per row) feeding a
    single partial-aggregated groupBy on ``(label, pos)`` — the shuffle
    moves at most ``n_labels × dim`` combined rows per task, not the
    corpus.  Output: (label, pos, n_vectors, centroid_val).

    Greenfield Spark work (no reference counterpart): the north-star
    LLM-data operators from BASELINE.json.
    """
    ex = df.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "__v")
    )
    return (
        ex.groupBy(label_col, "pos")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.sum(
                F.round(F.col("__v").cast("double") * scale).cast("long")
            ).alias("__s"),
        )
        .select(
            F.col(label_col),
            F.col("pos"),
            F.col("n_vectors"),
            F.round(
                F.col("__s") / (F.col("n_vectors") * float(scale)), 6
            ).alias("centroid_val"),
        )
    )


def hard_negatives(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the top-k
    MOST similar vectors carrying a DIFFERENT label — the near-misses that
    teach an embedding model its decision boundary (uniform random
    negatives are too easy to be informative).

    Same banded scale shape as ``lsh_ann_topk``: candidates come from a
    sign-sketch bucket EQUI-join (queries broadcast, corpus streams once —
    no nested-loop node, no all-pairs), the label exclusion and exact
    cosine re-rank run inside the bucket only.  Sparse buckets can yield
    fewer than ``k`` negatives per query — raise recall by lowering
    ``n_planes`` (denser buckets), or run multiple rotated sketch tables.

    Output: (query_id, vec_id, label, cosine_sim, rank).

    Greenfield Spark work (no reference counterpart): the north-star
    LLM-data operators from BASELINE.json.
    """
    v = spread(vectors).withColumn(
        "__bucket", sign_sketch(vec_col, dim, n_planes)
    ).withColumn("__vn", norm(F.col(vec_col)))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.col(label_col).alias("__qlabel"),
        sign_sketch(vec_col, dim, n_planes).alias("__bucket"),
    ).withColumn("__qn", norm(F.col("__qvec")))
    joined = v.join(F.broadcast(q), on="__bucket").filter(
        (F.col(query_id_col) != F.col(id_col))
        & (F.col(label_col) != F.col("__qlabel"))
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.col(label_col),
        F.round(
            cosine_hoisted(
                F.col("__qvec"), F.col(vec_col), F.col("__qn"), F.col("__vn")
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
            F.col(label_col),
            F.round(F.col("__cos"), 6).alias("cosine_sim"),
            F.col("__rank").alias("rank"),
        )
    )


def diversified_topk(
    df: DataFrame,
    *,
    group_col: str,
    score_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Cluster-interleaved diversified top-k: rank rows WITHIN their group
    (cluster / source / topic), then take k globally by (group_rank,
    score) — the result spans min(k, n_groups) distinct groups before any
    group repeats, instead of letting one dense cluster fill the whole
    list.  The standard bucketed-diversity formulation of diversified
    retrieval (the greedy-MMR family's scalable cousin: deterministic,
    one pass, no sequential re-scoring).

    Scale shape: one group-keyed window (shuffle by group), then a global
    TakeOrderedAndProject for the k winners — no global sort, no driver
    loop.  The final_rank window runs over the ALREADY-LIMITED k rows.
    Ties break on ``id_col`` so the result is hash-stable cross-engine
    when scores are rounded.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    ranked = df.withColumn(
        "cluster_rank", F.row_number().over(w).cast("long")
    )
    top = ranked.orderBy(
        "cluster_rank", F.col(score_col).desc(), F.col(id_col)
    ).limit(k)
    w_final = Window.orderBy(
        "cluster_rank", F.col(score_col).desc(), F.col(id_col)
    )
    return top.withColumn(
        "final_rank", F.row_number().over(w_final).cast("long")
    )


def _centroid_dots(vec_col: Column, centroids: list[list[float]]) -> Column:
    """array<double> of round(dot(vec, c_i), 6) per centroid — the
    asymmetric-distance LUT primitive for product quantization.  Same
    literal-matrix + transform shape as ``_centroid_sims`` (the unrolled
    variant plans superlinearly — see that docstring), minus the
    normalization."""
    C = F.lit([[float(x) for x in c] for c in centroids])
    idxs = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    return F.transform(
        idxs,
        lambda i: F.round(
            F.aggregate(
                F.zip_with(vec_col, F.get(C, i), lambda x, h: x.cast("double") * h),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
            F.lit(6),
        ),
    )


def _pq_slices(col, n_sub: int, sub: int):
    return [F.slice(F.col(col), i * sub + 1, sub) for i in range(n_sub)]


def pq_train_codebooks(
    vectors: DataFrame,
    *,
    n_sub: int = 4,
    n_codes: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    assign_method: str = "expr",
) -> list[list[list[float]]]:
    """Per-subspace PQ codebooks (n_sub × n_codes × dim/n_sub), trained by
    the fused one-job spherical k-means described in ``pq_topk`` (which is
    now a composition of this + ``pq_encode`` + the LUT scan — extracted
    so a persisted index can train once and serve separately).

    Plan shape: seeds come from ONE corpus pass (the per-subspace seed is
    a slice of the same n_codes rows, so there is no reason to re-rank
    per subspace); each Lloyd iteration FUSES all n_sub subspace updates
    into one job — the map side attaches every subspace's assignment and
    explodes (subspace, cell, dim, unit_x) rows, one groupBy yields all
    codebook means (n_sub × n_codes × sub_dim rows after map-side
    combine, corpus-size-independent).  Measured 13.3s -> 4.5s cold /
    6.7s -> 2.4s warm at sf0.1 vs the naive per-subspace training loop.
    """
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])  # 1-row scalar fetch
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub = dim // n_sub

    # seeds once (ordering depends only on the id); slice per subspace
    full_seeds = _seed_centroids(vectors, n_codes, id_col, vec_col)
    # spread before the per-iteration assignment passes (see
    # ivf_refine_centroids)
    vectors = spread(vectors)
    codebooks = [
        [c[i * sub : (i + 1) * sub] for c in full_seeds] for i in range(n_sub)
    ]
    scale = 1_000_000
    for _ in range(n_iter):
        assigned = vectors.select(
            *[
                sl.alias(f"__sub_{i}")
                for i, sl in enumerate(_pq_slices(vec_col, n_sub, sub))
            ]
        )
        if assign_method == "arrow":
            # ONE Python-boundary crossing for all n_sub assignments
            # (guide §4) — the per-subspace ivf_assign chain shipped the
            # frame through n_sub separate mapInPandas round-trips
            assigned = _pq_assign_arrow(
                assigned,
                [(f"__sub_{i}", f"__cell_{i}", cb)
                 for i, cb in enumerate(codebooks)],
            )
        else:
            for i, cb in enumerate(codebooks):
                assigned = ivf_assign(
                    assigned, cb, vec_col=f"__sub_{i}", cell_col=f"__cell_{i}",
                    method=assign_method,
                )
        # fused update: every (subspace, cell, dim, unit_x) contribution in
        # one explode, one groupBy — the same scaled-integer spherical mean
        # as ivf_refine_centroids, so the unrolled-CTE oracle still replays
        def _unit(i):
            # NOTE: the transform lambda must take ONE arg — a second
            # positional param would be bound to the ELEMENT INDEX by
            # PySpark, silently shadowing any captured loop variable
            n = F.nullif(norm(F.col(f"__sub_{i}")), F.lit(0.0))
            return F.transform(
                F.col(f"__sub_{i}"), lambda x: x.cast("double") / n
            )

        contribs = assigned.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("__s"),
                            F.col(f"__cell_{i}").alias("__cell"),
                            _unit(i).alias("__u"),
                        )
                        for i in range(n_sub)
                    ]
                )
            ).alias("c")
        ).select("c.__s", "c.__cell", F.posexplode("c.__u").alias("__dim", "__x"))
        means = (
            contribs.filter(F.col("__cell").isNotNull())
            .groupBy("__s", "__cell", "__dim")
            .agg(
                F.count("__x").cast("long").alias("__c"),
                F.sum(F.round(F.col("__x") * scale).cast("long")).alias("__s2"),
            )
            .collect()
        )
        new = [[list(c) for c in cb] for cb in codebooks]
        by_key: dict[tuple, dict[int, float]] = {}
        for r in means:
            if r["__s2"] is None or not r["__c"]:
                continue
            by_key.setdefault((r["__s"], r["__cell"] - 1), {})[r["__dim"]] = r[
                "__s2"
            ] / (r["__c"] * float(scale))
        for (s_i, cell), dims in by_key.items():
            new[s_i][cell] = [dims[d] for d in sorted(dims)]
        codebooks = new
    return codebooks


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_method: str = "expr",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, __code_0..__code_{n_sub-1}, *keep_cols) — ONE map-side pass
    attaching every subspace's code (no joins, no shuffle).  n_sub bytes
    of payload per vector — the 128× compression the scan side lives on."""
    n_sub = len(codebooks)
    sub = len(codebooks[0][0])
    # NO spread here: pq_encode feeds index WRITE paths (ann_index), where
    # inflating the partition count multiplies output files (guide §6);
    # the scan-side pq_topk composition spreads at its own call site
    coded = vectors.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        *[
            sl.alias(f"__sub_{i}")
            for i, sl in enumerate(_pq_slices(vec_col, n_sub, sub))
        ],
    )
    if assign_method == "arrow":
        # one fused boundary crossing — see pq_train_codebooks
        coded = _pq_assign_arrow(
            coded,
            [(f"__sub_{i}", f"__code_{i}", cb)
             for i, cb in enumerate(codebooks)],
        )
    else:
        for i, cb in enumerate(codebooks):
            coded = ivf_assign(
                coded, cb, vec_col=f"__sub_{i}", cell_col=f"__code_{i}",
                method=assign_method,
            )
    return coded.select(
        id_col, *keep_cols, *[f"__code_{i}" for i in range(n_sub)]
    )


def pq_query_luts(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, __lut_0..) — per-subspace asymmetric-distance lookup
    tables: round(dot(query_sub, code), 6) per codebook entry."""
    n_sub = len(codebooks)
    sub = len(codebooks[0][0])
    return queries.select(
        F.col(query_id_col),
        *[
            _centroid_dots(sl, cb).alias(f"__lut_{i}")
            for i, (sl, cb) in enumerate(
                zip(_pq_slices(vec_col, n_sub, sub), codebooks)
            )
        ],
    )


def pq_score_expr(n_sub: int):
    """sum of LUT lookups in FIXED subspace order (determinism: the same
    left-to-right double adds in any engine)."""
    score = F.lit(0.0)
    for i in range(n_sub):
        score = score + F.element_at(f"__lut_{i}", F.col(f"__code_{i}"))
    return score


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_sub: int = 4,
    n_codes: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    assign_method: str = "expr",
) -> DataFrame:
    """PRODUCT-QUANTIZATION approximate top-k (Jégou et al.): the vector
    splits into ``n_sub`` subvectors, each encoded as its nearest entry in
    a per-subspace codebook (trained by the same replayable spherical
    k-means as the IVF index), and a query scores a corpus vector by
    summing per-subspace LUT dot products — the asymmetric-distance scan.
    Returns (query_id, vec_id, pq_score, rank).

    Memory story at 100 TB: n_sub code bytes per vector (4 here) instead
    of dim floats — a 64-dim float64 corpus compresses 128×, which is what
    lets the scan side of ANN live in executor memory; the int8 path (s6)
    stops at 8×.  Scoring per pair is n_sub array lookups + adds, no
    dim-length loop.

    Composition of ``pq_train_codebooks`` (fused one-job Lloyd loop) →
    ``pq_encode`` (one map-side projection) → broadcast LUT scan; the
    persisted form lives in ann_index.build_pq_index, which stores the
    codebooks + codes and skips the training at serve time.

    Determinism: codebooks come out of ``ivf_refine_centroids``'s
    scaled-integer means, assignment uses the 6-dp-rounded cosine argmax
    (first-max tie), LUT entries round to 6 dp, and the final score adds
    them in fixed subspace order — every term bit-reproducible in DuckDB,
    so the FULL train→encode→scan pipeline sits under a hash oracle
    (S12_SQL in queries.py).
    """
    codebooks = pq_train_codebooks(
        vectors, n_sub=n_sub, n_codes=n_codes, n_iter=n_iter,
        id_col=id_col, vec_col=vec_col, dim=dim, assign_method=assign_method,
    )
    coded = pq_encode(
        spread(vectors), codebooks, id_col=id_col, vec_col=vec_col,
        assign_method=assign_method,
    )
    q = pq_query_luts(
        queries, codebooks, query_id_col=query_id_col, vec_col=vec_col
    )
    joined = F.broadcast(q).crossJoin(coded).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        query_id_col, id_col, pq_score_expr(len(codebooks)).alias("pq_score")
    ).filter(F.col("pq_score").isNotNull())
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("pq_score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
