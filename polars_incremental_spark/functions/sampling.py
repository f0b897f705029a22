"""Deterministic hash-based sampling / splitting for training-data pipelines.

``df.sample()`` is seed-reproducible only for an identical partitioning of
identical input — re-reading the same table with a different file layout (or
appending a batch) reshuffles which rows survive.  At pipeline scale the
property that matters is per-ROW determinism: whether a row is sampled must
be a pure function of its key, so samples are stable across reruns, engines,
and incremental batches, and disjoint splits stay disjoint forever.

Every operator here keeps a row iff ``md5(seed || key) mod 2^60`` falls
under a precomputed integer threshold — one hash per row, no shuffle, no
state, pushdown-friendly (the filter sits directly over the scan), and
reproducible in any engine with md5 (the same portability contract as the
MinHash/SimHash oracles).

Greenfield Spark work (no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import md5_long

# md5_long carries 60 usable bits; thresholds are fractions of this space,
# precomputed driver-side so the comparison is a single long literal
SAMPLE_SPACE = 1 << 60


def sample_hash(key: Column, seed: str = "s0") -> Column:
    """Uniform 60-bit hash of (seed, key) — the per-row coin flip."""
    return md5_long(F.concat(F.lit(seed), key.cast("string")))


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]; got {rate}")
    return int(rate * SAMPLE_SPACE)


def sample_by_hash(
    df: DataFrame, *, rate: float, key_col: str, seed: str = "s0"
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen per-key deterministically.

    Changing ``seed`` draws an independent sample; the same (key, seed)
    always lands on the same side, so incremental batches sample
    consistently with history.
    """
    return df.filter(sample_hash(F.col(key_col), seed) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum rates (e.g. downsample boilerplate-heavy languages,
    keep all rare ones).  The rate lookup is a map literal — pure map-side;
    strata missing from ``rates`` fall back to ``default_rate``.
    """
    thr_map = F.create_map(
        *[
            x
            for k, v in sorted(rates.items())
            for x in (F.lit(k), F.lit(_threshold(v)))
        ]
    )
    thr = F.coalesce(
        F.element_at(thr_map, F.col(strata_col).cast("string")),
        F.lit(_threshold(default_rate)),
    )
    return df.filter(sample_hash(F.col(key_col), seed) < thr)


def hash_split(
    df: DataFrame,
    *,
    weights: dict[str, float],
    key_col: str,
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split label (train/valid/test...) per key.

    Weights must sum to ≤ 1 (a remainder gets NULL — useful as a holdout);
    splits are disjoint by construction and stable under appends, so a row
    can never migrate from test to train between runs.  Ranges are assigned
    in sorted(label) order so the layout is engine-reproducible.
    """
    h = sample_hash(F.col(key_col), seed)
    expr = F.lit(None).cast("string")
    for label, lo, hi in reversed(split_bounds(weights)):
        expr = F.when((h >= lo) & (h < hi), F.lit(label)).otherwise(expr)
    return df.withColumn(split_col, expr)


def split_bounds(weights: dict[str, float]) -> list[tuple[str, int, int]]:
    """(label, lo, hi) integer hash ranges for ``hash_split`` — exposed so
    an external system (or a SQL oracle) can reproduce the exact same
    assignment, float-summation order included."""
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    cum = 0.0
    bounds = []
    for label, w in sorted(weights.items()):
        lo, cum = cum, cum + w
        bounds.append((label, _threshold(lo), _threshold(cum)))
    return bounds


def mixture_sample(
    df: DataFrame,
    *,
    source_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: str = "mix",
) -> DataFrame:
    """Training-data mixing: sample each source corpus so the OUTPUT mix
    matches ``weights`` (e.g. 50% web / 30% code / 20% books), using the
    largest total budget the smallest-relative source allows.

    Per-source rate = w_s · T / n_s where T = min_s(n_s / w_s): the source
    that would exhaust first is kept whole (rate 1.0) and every other
    source is thinned to proportion.  Rows outside ``weights`` are dropped.

    Everything is computed IN THE PLAN — per-source counts aggregate and
    broadcast back, the budget T rides along as a 1-row frame, the keep
    decision is one deterministic hash compare per row — so there is no
    driver collect, the same row always survives under appends of OTHER
    sources (its hash and rate don't change unless its own source grows),
    and a SQL oracle can reproduce the sample bit-for-bit by mirroring the
    double arithmetic (w·T/n · 2^60, floored).

    Reference parity: greenfield — mixing is the training-pipeline step
    upstream of everything the reference serves.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    for label, w in weights.items():
        if not (0.0 < w <= 1.0):
            raise ValueError(f"weight for {label!r} must be in (0, 1]; got {w}")
    w_map = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(float(v)))]
    )
    base = df.filter(F.col(source_col).isin(sorted(weights)))
    cnt = (
        base.groupBy(source_col)
        .agg(F.count("*").cast("double").alias("__n"))
        .withColumn("__w", F.element_at(w_map, F.col(source_col).cast("string")))
    )
    budget = cnt.agg(F.min(F.col("__n") / F.col("__w")).alias("__T"))
    thr = (
        F.floor(
            F.col("__w") * F.col("__T") / F.col("__n") * F.lit(float(SAMPLE_SPACE))
        )
        .cast("long")
    )
    return (
        base.join(F.broadcast(cnt), source_col)
        .join(F.broadcast(budget))
        .filter(sample_hash(F.col(key_col), seed) < thr)
        .drop("__n", "__w", "__T")
    )


def mixture_sample_tokens(
    df: DataFrame,
    *,
    source_col: str,
    weights: dict[str, float],
    token_col: str,
    key_col: str,
    seed: str = "mixt",
    n_buckets: int = 1024,
) -> DataFrame:
    """Token-budgeted training-data mixing: real pretraining mixtures are
    specified in TOKENS ("50% web / 30% code / 20% books of a 10T-token
    budget"), not rows — row-based ``mixture_sample`` under-weights
    long-document sources.  Semantics (exact, engine-portable):

        T = min_s(tokens_s / w_s)          (largest feasible total budget)
        budget_s = floor(w_s * T)          (tokens source s may contribute)
        keep s's rows in deterministic hash order (hash(seed,key), key)
        while the running token total stays <= budget_s.

    The prefix rule makes the sample a pure function of (keys, tokens,
    weights, seed): reruns and engines reproduce it bit-for-bit (the SQL
    twin is a per-source window cumsum), and appending OTHER sources never
    perturbs a source's selection.

    Scale shape: a naive per-source window cumsum funnels each source's
    entire corpus through one reducer — the classic skew killer when a
    mixture has 3-10 sources.  Instead the 60-bit hash space splits into
    ``n_buckets`` ranges: per-(source, bucket) token sums aggregate
    map-side into an (n_sources x n_buckets) metadata frame, a prefix sum
    over THAT finds each source's boundary bucket, whole buckets below it
    keep rows with no per-row ordering at all, and the window cumsum runs
    only INSIDE the single boundary bucket (~1/n_buckets of the source).
    Every broadcast is metadata-sized; no driver collect.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    for label, w in weights.items():
        if not (0.0 < w <= 1.0):
            raise ValueError(f"weight for {label!r} must be in (0, 1]; got {w}")
    if n_buckets < 2 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two >= 2; got {n_buckets}")
    from pyspark.sql import Window

    shift = 61 - n_buckets.bit_length()  # bucket = h >> shift, h in [0, 2^60)
    w_map = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(float(v)))]
    )
    base = (
        df.filter(F.col(source_col).isin(sorted(weights)))
        .withColumn("__h", sample_hash(F.col(key_col), seed))
        .withColumn("__tok", F.coalesce(F.col(token_col).cast("long"), F.lit(0)))
        .withColumn("__b", F.shiftright(F.col("__h"), shift))
    )
    tot = (
        base.groupBy(source_col)
        .agg(F.sum("__tok").cast("double").alias("__n"))
        .withColumn("__w", F.element_at(w_map, F.col(source_col).cast("string")))
    )
    # T = min(n/w) attaches via a global window over the n_sources-row
    # metadata frame — same answer as a 1-row cross join, but no
    # nested-loop join node in the plan
    bud = (
        tot.withColumn(
            "__T",
            F.min(F.col("__n") / F.col("__w")).over(Window.partitionBy(F.lit(1))),
        )
        .select(
            source_col,
            F.floor(F.col("__w") * F.col("__T")).cast("long").alias("__budget"),
        )
    )
    bcum = (
        base.groupBy(source_col, "__b")
        .agg(F.sum("__tok").alias("__btok"))
        .withColumn(
            "__cum",
            F.sum("__btok").over(Window.partitionBy(source_col).orderBy("__b")),
        )
        .withColumn("__cum_prev", F.col("__cum") - F.col("__btok"))
        .drop("__btok")
    )
    joined = base.join(F.broadcast(bcum), [source_col, "__b"]).join(
        F.broadcast(bud), source_col
    )
    # whole buckets strictly inside the budget: every row's global running
    # total is bounded by its bucket's inclusive cum
    fast = joined.filter(F.col("__cum") <= F.col("__budget"))
    # exactly ONE bucket per source straddles the budget (cum monotone);
    # rows past it have cum_prev > budget and can never qualify
    boundary = joined.filter(
        (F.col("__cum") > F.col("__budget")) & (F.col("__cum_prev") <= F.col("__budget"))
    )
    w_row = Window.partitionBy(source_col, "__b").orderBy(
        F.col("__h").asc(), F.col(key_col).asc()
    )
    sel = boundary.withColumn(
        "__rcum", F.sum("__tok").over(w_row) + F.col("__cum_prev")
    ).filter(F.col("__rcum") <= F.col("__budget"))
    drop_cols = ["__h", "__tok", "__b", "__cum", "__cum_prev", "__budget"]
    return fast.drop(*drop_cols).unionByName(sel.drop("__rcum", *drop_cols))


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    key_col: str,
    alpha: float = 1.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-row weighted sampling: keep a row with probability
    ``clamp(weight, 0, 1) ** alpha`` — quality-weighted corpus thinning
    ("sample prob ∝ quality²") without any shuffle or state: the keep
    decision is ``hash(key) < weight^alpha * 2^60``, one map-side compare
    per row, deterministic across reruns / engines / appends (a row's fate
    depends only on its own key and weight).  ``alpha`` sharpens (>1) or
    flattens (<1) the weighting; ``alpha=0`` keeps everything.

    NULL weights are treated as 0.0: dropped for any ``alpha > 0``, kept
    at ``alpha = 0`` (``pow(0, 0) = 1``) — an explicit rule rather than the
    silent null-predicate drop a raw comparison would give.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0; got {alpha}")
    w = F.least(
        F.greatest(F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(0.0)),
        F.lit(1.0),
    )
    threshold = F.floor(F.pow(w, F.lit(float(alpha))) * F.lit(float(SAMPLE_SPACE))).cast(
        "long"
    )
    return df.filter(sample_hash(F.col(key_col), seed) < threshold)


def temperature_sample(
    df: DataFrame,
    *,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    total_frac: float = 0.5,
    seed: str = "temp",
) -> DataFrame:
    """Temperature-based corpus rebalancing (the multilingual sampler from
    the XLM-R / mT5 recipes): group g's share of the output is proportional
    to ``count_g ** alpha``, so alpha=1 keeps natural proportions and
    alpha->0 approaches uniform — low-resource groups are upweighted
    RELATIVE to the head without hand-writing per-group weights
    (``mixture_sample`` is the explicit-weights sibling).

    ``total_frac`` sets the output budget as a fraction of the input; each
    group's keep-rate = min(1, budget * share_g / count_g) — head groups
    thin, tail groups clamp at 1.0 (downsampling-only, the standard batch
    formulation).

    Scale shape: one low-cardinality groupBy for counts, the per-group
    thresholds broadcast back, keep = one deterministic hash compare per
    row.  No driver collect; the same row survives under appends to OTHER
    groups only if its own group's count is unchanged.

    Cross-engine determinism: for alpha=0.5 the share weights go through
    ``round(sqrt(n) * 1e6)`` — sqrt is correctly rounded IEEE, so the
    weights are EXACT integers and their sum is order-independent; the
    rate expression is written with identical association in the SQL
    oracle.  Other alphas use ``pow`` (last-ulp portability not
    guaranteed; fine for production, not for a hash gate).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1]; got {alpha}")
    if not 0.0 < total_frac <= 1.0:
        raise ValueError(f"total_frac must be in (0, 1]; got {total_frac}")
    from pyspark.sql import Window

    cnt = df.groupBy(group_col).agg(F.count("*").cast("double").alias("__n"))
    q = F.sqrt("__n") if alpha == 0.5 else F.pow(F.col("__n"), F.lit(alpha))
    cnt = cnt.withColumn(
        "__qi", F.round(q * F.lit(1000000.0)).cast("long")
    )
    # corpus totals via an unpartitioned window over the GROUP TABLE —
    # bounded by group cardinality (u13's bin-table pattern), so no
    # scalar cross-join enters the plan
    w_all = Window.partitionBy()
    cnt = cnt.withColumn("__Q", F.sum("__qi").over(w_all).cast("long")).withColumn(
        "__ntot", F.sum("__n").over(w_all)
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(total_frac) * F.col("__ntot") * F.col("__qi") / F.col("__Q") / F.col("__n"),
    )
    thr = cnt.select(
        group_col,
        F.floor(rate * F.lit(float(SAMPLE_SPACE))).cast("long").alias("__thr"),
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(sample_hash(F.col(key_col), seed) < F.col("__thr"))
        .drop("__thr")
    )
