"""Oracle-verified query registry: every entry is a (Spark callable, DuckDB SQL) pair.

This is the correctness gate surface consumed by ``__spark_entry__.py``:
the driver runs each Spark callable at sf=0.01 and compares row count,
schema, and an order-insensitive value hash against the DuckDB oracle SQL
over the same parquet tables.

Cross-engine determinism rules used throughout (the reason this file looks
pedantic):

- Sums over doubles are computed in DECIMAL (exact, order-independent) and
  cast to double at the end — a plain double sum differs in the last bits
  between engines/partitionings and breaks the value hash.
- Raw column passthroughs and single-row arithmetic (x*y, x/y) are IEEE
  identical across engines and are emitted unrounded.
- Hashing is md5-based (portable) — Spark ``conv(substr(md5,1,15),16,10)``
  equals the generated 15-term hex-parse expression in DuckDB.
- Rankings order by ROUNDED scores with unique-id tiebreaks, never by
  full-precision floats.
- Counts are cast to BIGINT on the Spark side (``F.size`` returns int,
  DuckDB ``len()`` returns BIGINT).

Operator coverage: R1-R21 (SURVEY §2.6), CDC merge (M1/M4), schema
evolution (E2), watermark pattern (W1), and the LLM-pipeline operators
(dedup / text / similarity / multimodal).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cdc, patterns
from .functions import curation, dedup, layout, multimodal, sampling, similarity
from .functions import sketches as _sketches_mod
from .functions import text as tx
from .functions.similarity import _hyperplane
from .schema import apply_schema
from .tables import load_table, register_views

# --------------------------------------------------------------------------
# DuckDB SQL fragment generators (mirror the Spark-side Catalyst expressions)
# --------------------------------------------------------------------------


def _sql_md5_long(expr: str, n_hex: int = 15) -> str:
    """Exact DuckDB twin of functions.text.md5_long: first n_hex md5 hex chars as BIGINT."""
    terms = " + ".join(
        f"((strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1))-1)::BIGINT << {4 * (n_hex - 1 - i)})"
        for i in range(n_hex)
    )
    return f"({terms})"


def _sql_tokens(expr: str) -> str:
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


_SQL_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(t) - 3, 0) + 2), "
    "i -> array_to_string(t[i:i+2], ' ')))"
)

# shared CTE: distinct word-3-gram shingles per document
_SQL_SHINGLE_CTE = (
    "toks AS (SELECT doc_id, "
    + _sql_tokens("lower(text)")
    + " AS t FROM documents), "
    "sh AS (SELECT doc_id, unnest(" + _SQL_SHINGLES + ") AS shingle FROM toks)"
)


def _sql_stopword_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in tx.STOPWORDS[lang])
    return (
        f"len(list_filter({_sql_tokens('lower(text)')}, "
        f"t -> list_contains([{words}], t)))"
    )


# Exact, order-independent sums over doubles via SCALED LONGS: round each
# value to 4 dp, sum as 64-bit integers (whole-stage-codegen arithmetic,
# ~3× faster than decimal128 aggregation), divide back at the end.
# Overflow bound: |sum of scaled values| must stay < 2^63 ≈ 9.2e18, i.e.
# per-group sums below ~9e14 in original units — 5 orders of magnitude above
# this bench's scale.  Beyond ~1e12-row groups, switch to DECIMAL(18,4) sums
# (same hash-portability, slower arithmetic).
SUM_SCALE = 10_000


def _dsum(col_expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(round(({col_expr}) * {SUM_SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {SUM_SCALE}.0 AS {alias}"
    )


def _spark_dsum(col, alias: str):
    return (
        F.sum(F.round(col * SUM_SCALE).cast("long")) / F.lit(float(SUM_SCALE))
    ).alias(alias)


# --------------------------------------------------------------------------
# Relational / TPC-H-style queries (R1-R21 + headliners)
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with decimal-exact sums (R1, R10)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _spark_dsum(F.col("l_quantity"), "sum_qty"),
            _spark_dsum(F.col("l_extendedprice"), "sum_base_price"),
            _spark_dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"
            ),
            (
                F.sum(F.round(F.col("l_quantity") * SUM_SCALE).cast("long"))
                / F.lit(float(SUM_SCALE))
                / F.count("*")
            ).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum("l_quantity", "sum_qty")},
       {_dsum("l_extendedprice", "sum_base_price")},
       {_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       CAST(SUM(CAST(round(l_quantity * {SUM_SCALE}) AS BIGINT)) AS DOUBLE)
         / {SUM_SCALE}.0 / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10 (R1, R10, R12).

    customer is tiny → broadcast into orders; orders⋈lineitem shuffles on
    the order key only.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _spark_dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, dims broadcast (R1, R10)."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _spark_dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


Q5_SQL = f"""
SELECT n_name, {_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-agg — the pushdown showcase."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _spark_dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count("*").alias("n_rows"),
    )


Q6_SQL = f"""
SELECT {_dsum("l_extendedprice * l_discount", "revenue")}, COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# TPC-H pattern extension (q4-q22 shapes adapted to the trimmed testdata
# schema: no partsupp/commitdate/shipmode/container/phone columns, so each
# query keeps the ORIGINAL's join/subquery pattern with predicates rewritten
# onto the columns that exist).  Scalar thresholds that gate row membership
# (q17's 0.2*avg, q22's positive-balance avg) are compared in SCALED INTEGER
# arithmetic — `qty_s * 5 * n < sum_s` instead of `qty < 0.2 * sum/n` — so
# threshold crossings cannot differ between engines by a ULP of float
# division.
# --------------------------------------------------------------------------


def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join with a non-equi residual
    (l_shipdate > o_orderdate stands in for the missing commit/receipt pair).
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation self-pair with a disjunctive pair filter.

    Both nation copies broadcast; the disjunction is applied AFTER the two
    dim joins so it prunes on the joined names (Catalyst pushes each
    half-predicate into the respective broadcast build side).
    """
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            _spark_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
        )
    )


TPCH7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue per year.

    The share is a ratio of two SCALED-LONG sums (conditional numerator /
    total), so both engines divide the same pair of integers — float-safe.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    n_c = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_s = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol_s = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SUM_SCALE
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol_s).otherwise(
                        F.lit(0)
                    )
                )
                / F.sum(vol_s),
                6,
            ).alias("mkt_share")
        )
    )


TPCH8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(SUM(CASE WHEN ns.n_name = 'NATION_3'
                      THEN CAST(round(l_extendedprice * (1 - l_discount) * {SUM_SCALE}) AS BIGINT)
                      ELSE 0 END)
             / SUM(CAST(round(l_extendedprice * (1 - l_discount) * {SUM_SCALE}) AS BIGINT)),
             6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region   ON nc.n_regionkey = r_regionkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year over a 5-way join
    (p_retailprice stands in for the missing ps_supplycost)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_spark_dsum(amount, "sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {_dsum("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity",
              "sum_profit")}
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part bucket with a
    NOT-IN exclusion (lineitem is the part↔supplier bridge in lieu of
    partsupp; negative-balance suppliers are the excluded set)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(), F.col("p_size").asc()
        )
        .limit(20)
    )


Q16_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_size
LIMIT 20
"""


def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN-subquery with a correlated aggregate threshold —
    suppliers whose 1996 PROMO-part quantity exceeds 20% of their total 1996
    quantity.  The threshold is integer (`5 * promo_s > tot_s`)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    qty_s = F.round(F.col("l_quantity") * SUM_SCALE).cast("long")
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", qty_s).otherwise(F.lit(0))).alias(
                "__promo_s"
            ),
            F.sum(qty_s).alias("__tot_s"),
        )
        .filter(F.lit(5) * F.col("__promo_s") > F.col("__tot_s"))
        .select("l_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_nationkey")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH sq AS (
  SELECT l_suppkey,
         SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(round(l_quantity * {SUM_SCALE}) AS BIGINT) ELSE 0 END)
           AS promo_s,
         SUM(CAST(round(l_quantity * {SUM_SCALE}) AS BIGINT)) AS tot_s
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM sq WHERE 5 * promo_s > tot_s)
ORDER BY s_name
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-MIN subquery — for each qualifying part,
    keep only the supplier(s) whose account balance equals the per-part
    minimum among that part's EUROPE suppliers.  lineitem bridges
    part↔supplier in lieu of partsupp; the correlated min is a window on
    the join's own partitioning (q17's pattern — one shuffle total), and
    all dims broadcast.  s_acctbal is decimal-exact in parquet, so the
    equality membership is engine-exact."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 15, 25) & (F.col("p_type") == "STANDARD")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # The selective part filter runs BEFORE the bridge dedup (guide §2.3:
    # shuffle fewer bytes): the broadcast semi-shaped join drops ~94% of
    # lineitem rows map-side, so the dedup exchange carries only qualifying
    # pairs — previously the FULL (l_partkey, l_suppkey) projection
    # shuffled first and the part filter ran after.  Filter-then-distinct
    # = distinct-then-filter (the predicate is a function of l_partkey
    # alone), proven by the unchanged oracle hash.  Hash-partitioning by
    # l_partkey alone satisfies the pair-dedup's clustered distribution
    # AND the correlated-min window's, so one exchange serves both
    # (guide §2.4 — the q17 single-shuffle pattern, now with zero
    # re-exchange between dedup and window).
    bridge = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select("l_partkey", "l_suppkey")
        .repartition("l_partkey")
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )
    joined = (
        bridge.join(F.broadcast(sup), bridge.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("__min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__min_bal"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("l_partkey").alias("p_partkey"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .limit(100)
    )


Q2_SQL = """
WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
j AS (
  SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey
  FROM bridge b
  JOIN part p ON b.l_partkey = p.p_partkey
   AND p.p_size IN (5, 15, 25) AND p.p_type = 'STANDARD'
  JOIN supplier s ON b.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
),
m AS (
  SELECT *, MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal FROM j
)
SELECT s_acctbal, s_name, n_name, p_partkey
FROM m WHERE s_acctbal = min_bal
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key value sum with a HAVING threshold that is a
    FRACTION OF THE GLOBAL TOTAL (scalar subquery).  The global total rides
    in as a 1-row broadcast (the no-collect scalar-attach pattern, see
    plan_audit SCALAR_NLJ_ALLOWED); the integer-scaled comparison keeps
    threshold membership exact across engines.  Adapted to this schema:
    lineitem value per part in lieu of partsupp stock value."""
    li = load_table(spark, sf_dir, "lineitem")
    scaled = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SUM_SCALE
    ).cast("long")
    per_part = li.groupBy("l_partkey").agg(F.sum(scaled).alias("__v"))
    total = per_part.agg(F.sum("__v").alias("__tot"))
    return (
        per_part.join(total)
        # value > 0.07% of global: 10000 * v > 7 * tot  (integer-exact)
        .filter(F.col("__v") * 10_000 > F.col("__tot") * 7)
        .select(
            "l_partkey",
            (F.col("__v") / F.lit(float(SUM_SCALE))).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
        .limit(20)
    )


Q11_SQL = f"""
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(round(l_extendedprice * (1 - l_discount) * {SUM_SCALE}) AS BIGINT))
           AS v
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(v) AS t FROM pv)
SELECT l_partkey, CAST(v AS DOUBLE) / {SUM_SCALE}.0 AS part_value
FROM pv, tot
WHERE v * 10000 > t * 7
ORDER BY part_value DESC, l_partkey ASC
LIMIT 20
"""


def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: the one fact-fact join (lineitem ⋈ orders on
    orderkey) + per-group CASE-sum split by order priority class.  Adapted
    to this schema: l_returnflag stands in for l_shipmode and "late" means
    shipped > 60 days after the order date (no commit/receipt dates).
    Both fact sides shuffle ONCE on the same 8-byte key; the priority
    split is a map-side CASE after the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue, top-20 customers."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _spark_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customers-per-order-count histogram via LEFT join
    (customers with zero qualifying orders land in the 0 bucket)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue percentage (PROMO parts), the
    ratio taken over scaled-long sums so both engines divide equal integers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    vol_s = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SUM_SCALE
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol_s).otherwise(F.lit(0)))
                / F.sum(vol_s),
                6,
            ).alias("promo_revenue")
        )
    )


Q14_SQL = f"""
SELECT round(100.0 *
         SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(round(l_extendedprice * (1 - l_discount) * {SUM_SCALE}) AS BIGINT)
                  ELSE 0 END)
         / SUM(CAST(round(l_extendedprice * (1 - l_discount) * {SUM_SCALE}) AS BIGINT)),
       6) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) whose quarterly revenue equals the max.

    The max rides back as a broadcast 1-row equi-join on the (decimal-exact)
    revenue value — not a driver collect and not a nested-loop filter.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        _spark_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("__mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, {_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below 20% of their part's average quantity.

    The correlated AVG becomes a per-part window; the threshold test is pure
    integer arithmetic (`5 * qty_s * n < sum_s` ⇔ qty < 0.2 * avg), so no
    engine can disagree on a boundary row.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    li = load_table(spark, sf_dir, "lineitem")
    qty_s = F.round(F.col("l_quantity") * SUM_SCALE).cast("long")
    w = Window.partitionBy("l_partkey")
    joined = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .withColumn("__qty_s", qty_s)
        .withColumn("__sum_s", F.sum("__qty_s").over(w))
        .withColumn("__n", F.count("*").over(w))
    )
    return joined.filter(
        F.col("__qty_s") * 5 * F.col("__n") < F.col("__sum_s")
    ).agg(
        (
            F.sum(F.round(F.col("l_extendedprice") * SUM_SCALE).cast("long"))
            / F.lit(float(SUM_SCALE))
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


Q17_SQL = f"""
WITH j AS (
  SELECT l_partkey, l_extendedprice,
         CAST(round(l_quantity * {SUM_SCALE}) AS BIGINT) AS qty_s
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#4'
),
t AS (
  SELECT l_extendedprice, qty_s,
         SUM(qty_s) OVER (PARTITION BY l_partkey) AS sum_s,
         COUNT(*) OVER (PARTITION BY l_partkey) AS n
  FROM j
)
SELECT CAST(SUM(CAST(round(l_extendedprice * {SUM_SCALE}) AS BIGINT)) AS DOUBLE)
         / {SUM_SCALE}.0 / 7.0 AS avg_yearly
FROM t WHERE qty_s * 5 * n < sum_s
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped fact, joined back to its
    dimensions; top-20 by order value."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * SUM_SCALE).cast("long")).alias("__s"))
        .filter(F.col("__s") > 150 * SUM_SCALE)
        .select(
            "l_orderkey", (F.col("__s") / F.lit(float(SUM_SCALE))).alias("sum_qty")
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(round(l_quantity * {SUM_SCALE}) AS BIGINT)) AS s
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity * {SUM_SCALE}) AS BIGINT)) > 150 * {SUM_SCALE}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(s AS DOUBLE) / {SUM_SCALE}.0 AS sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of three (brand, size, quantity)
    brackets over a part⋈lineitem join — the OR-pushdown stress test."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    b3 = (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(b1 | b2 | b3)
        .agg(
            _spark_dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


Q19_SQL = f"""
SELECT {_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS self-correlation — the sole
    late supplier in multi-supplier finished orders (ship > order + 60d
    stands in for the missing commit/receipt dates)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    # Count-based EXISTS/NOT EXISTS (guide §2.4 — remove shuffles
    # outright): the pair-distinct rides the fact-fact join's own
    # l_orderkey partitioning (dropDuplicates adds NO exchange after the
    # join), the late-supplier count is a window on that same
    # partitioning, and the per-order supplier count replaces the
    # non-equi semi/anti self-joins — EXISTS(other supplier) ⇔ the order
    # has ≥2 distinct suppliers (a late pair's supplier is itself one of
    # them), NOT EXISTS(other LATE supplier) ⇔ the order has exactly one
    # distinct late pair.  The old shape paid a full-lineitem pair
    # distinct + a late pair distinct + two non-equi joins (4 pair-sized
    # exchanges, 6 scans); this shape pays the fact-fact join + ONE
    # map-side-partial countDistinct over lineitem, and the late⋈counts
    # join is co-partitioned on l_orderkey (zero new exchanges).
    # Equivalence is pinned by the unchanged Q21 oracle hash.
    late = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        # hash-partition by order alone: HashPartitioning(l_orderkey)
        # satisfies the pair-dedup's clustered distribution AND the late-
        # count window's, so ONE exchange serves both (a plain
        # dropDuplicates exchanged on the pair and the window re-exchanged
        # on the order key — two pair-sized exchanges where one suffices)
        .repartition("l_orderkey")
        .dropDuplicates(["l_orderkey", "l_suppkey"])
    )
    n_all = (
        li.select("l_orderkey", "l_suppkey")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("__n_all"))
    )
    w_ok = Window.partitionBy("l_orderkey")
    waiting = (
        late.withColumn("__n_late", F.count(F.lit(1)).over(w_ok))
        .join(n_all, "l_orderkey")
        .filter((F.col("__n_all") > 1) & (F.col("__n_late") == 1))
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(sup), waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


Q21_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lo
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
),
ap AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s_name, COUNT(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM ap
              WHERE ap.l_orderkey = l1.l_orderkey AND ap.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (nation key stands in for the missing phone country code; the
    1999-01-01 recency cut keeps the anti-join non-degenerate on a corpus
    where every customer has ordered at some point).

    The balance threshold joins back as a broadcast 1-row aggregate and the
    comparison is integer (`bal_s * n > sum_s` ⇔ bal > avg) — no float
    boundary.  NOT EXISTS is the left-anti join on recent orders.
    """
    cust = load_table(spark, sf_dir, "customer")
    bal_s = F.round(F.col("c_acctbal") * SUM_SCALE).cast("long")
    pos = cust.filter(F.col("c_acctbal") > 0)
    thr = pos.agg(
        F.sum(bal_s).alias("__sum_s"), F.count("*").alias("__n")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = (
        cust.withColumn("__bal_s", bal_s)
        .join(F.broadcast(thr))
        .filter(F.col("__bal_s") * F.col("__n") > F.col("__sum_s"))
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        idle.groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            _spark_dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("cntry")
    )


Q22_SQL = f"""
WITH thr AS (
  SELECT SUM(CAST(round(c_acctbal * {SUM_SCALE}) AS BIGINT)) AS sum_s,
         COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
       {_dsum("c_acctbal", "totacctbal")}
FROM customer, thr
WHERE CAST(round(c_acctbal * {SUM_SCALE}) AS BIGINT) * n > sum_s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
ORDER BY 1
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (native F.session_window, 17-minute inactivity gap).

    Beyond reference parity: the reference has no session semantics at all
    (SURVEY §2.6 'notably absent'); Spark gives them natively, and the
    DuckDB oracle reproduces them with gaps-and-islands SQL.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "17 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 17 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT min(ts) AS session_start, user_id, COUNT(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


def events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: tumbling 1-minute event-time window aggregation (README flagship)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("window_start"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        _spark_dsum(F.col("value"), "sum_value"),
    )


EVENTS_WINDOW_SQL = f"""
SELECT date_trunc('minute', ts) AS window_start, event_type,
       COUNT(*) AS n_events, {_dsum("value", "sum_value")}
FROM events
GROUP BY 1, 2
"""


def r01_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


def r02_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: ndjson write/read round-trip on the int/string columns, then agg.

    The scratch dir is unique per invocation (hermetic across concurrent and
    sequential runs at different scale factors), and the aggregate is cast to
    BIGINT on both engines so DuckDB's HUGEINT SUM cannot diverge.
    """
    import atexit
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    path = tempfile.gettempdir() + f"/spark_graft_r02_ndjson_{uuid.uuid4().hex}"
    # The returned DataFrame reads `path` lazily (at the caller's collect), so
    # the dir can only be reclaimed at interpreter exit, not here.
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema("event_id BIGINT, user_id BIGINT, event_type STRING").json(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("event_id").cast("bigint").alias("sum_id"),
    )


R02_SQL = """
SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_id
FROM events GROUP BY event_type
"""


def r03_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


R03_SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"


def r04_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R") & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


R04_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem WHERE l_returnflag IN ('A', 'R') AND l_quantity > 45
"""


def r05_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_totalprice") * 0.9).alias("adj_price")
    )


R05_SQL = "SELECT o_orderkey, o_totalprice * 0.9::DOUBLE AS adj_price FROM orders"


def r06_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_orderkey").cast("string").alias("key_str"),
    )


R06_SQL = """
SELECT l_orderkey, CAST(l_quantity AS INTEGER) AS qty_int,
       CAST(l_shipdate AS DATE) AS ship_date,
       CAST(l_orderkey AS VARCHAR) AS key_str
FROM lineitem
"""


def r07_null_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "region").select(
        "r_regionkey",
        "r_name",
        F.lit(None).cast("string").alias("note"),
        F.lit(None).cast("double").alias("score"),
    )


R07_SQL = """
SELECT r_regionkey, r_name, CAST(NULL AS VARCHAR) AS note,
       CAST(NULL AS DOUBLE) AS score
FROM region
"""


def r08_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("bucket"),
    )


R08_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'low' END AS bucket
FROM orders
"""


def r09_struct_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("s")
            )
        ).alias("payload"),
    )


R09_SQL = """
SELECT o_orderkey,
       CAST(to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS VARCHAR) AS payload
FROM orders
"""


def r12_topk_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


R12_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 10
"""


def r13_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13/W5: newest event per user via the latest_per_key pattern helper."""
    ev = load_table(spark, sf_dir, "events")
    return patterns.latest_per_key(
        ev, ["user_id"], "ts", tiebreak=["event_id"]
    ).select("user_id", "event_id", "event_type", "value")


R13_SQL = """
SELECT user_id, event_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def r14_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no big order — the filter makes the result non-trivial
    (every customer has *some* order in the synthetic data)."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


R14_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
"""


def r15_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.select("event_id", "event_type")
    b = ev.filter(F.col("value") > 90).select("event_id", "value")
    return a.unionByName(b, allowMissingColumns=True)


R15_SQL = """
SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS value FROM events
UNION ALL
SELECT event_id, CAST(NULL AS VARCHAR) AS event_type, value FROM events WHERE value > 90
"""


def r16_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R16/M3: value remap via cdc.normalize_change_types."""
    ev = load_table(spark, sf_dir, "events").withColumnRenamed(
        "event_type", "_change_type"
    )
    mapped = cdc.normalize_change_types(
        ev, {"view": "V", "click": "C", "purchase": "P", "signup": "S", "error": "E"}
    )
    return mapped.groupBy(F.col("_change_type").alias("code")).agg(
        F.count("*").alias("n")
    )


R16_SQL = """
SELECT CASE event_type WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
            WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
            WHEN 'error' THEN 'E' ELSE event_type END AS code,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


def r17_limit0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("event_id", "value").limit(0)


R17_SQL = "SELECT event_id, value FROM events LIMIT 0"


def r18_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.max("ts").alias("max_ts"),
        F.min("ts").alias("min_ts"),
        F.count("*").alias("n"),
    )


R18_SQL = "SELECT max(ts) AS max_ts, min(ts) AS min_ts, COUNT(*) AS n FROM events"


def r19_sql_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R19: the spark.sql path over registered temp views."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events WHERE value > 10
        GROUP BY event_type HAVING COUNT(*) > 5
        """
    )


R19_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events WHERE value > 10
GROUP BY event_type HAVING COUNT(*) > 5
"""


def r20_drop_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").drop("props", "value")


R20_SQL = "SELECT event_id, ts, user_id, event_type FROM events"


def r21_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )


R21_SQL = "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"


# --------------------------------------------------------------------------
# Framework operators exercised as queries: CDC, schema evolution, watermark
# --------------------------------------------------------------------------


def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (beyond reference parity): totals per
    (status, priority), per status, and grand total in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), _spark_dsum(F.col("o_totalprice"), "total"))
    )


ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {_dsum("o_totalprice", "total")}
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def except_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT (beyond reference parity): users who click but never
    purchase, plus users who do both, labeled."""
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    only_click = clickers.exceptAll(buyers).withColumn("segment", F.lit("click_only"))
    both = clickers.intersect(buyers).withColumn("segment", F.lit("click_and_buy"))
    return only_click.unionByName(both)


EXCEPT_SQL = """
SELECT user_id, 'click_only' AS segment FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT user_id, 'click_and_buy' AS segment FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
"""


def r22_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user event counts, one column per type.
    Explicit pivot values ⇒ one pass, no distinct-values pre-query, and a
    schema that is stable however the data shifts."""
    types = ["click", "error", "purchase", "signup", "view"]
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", types).count()
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
    )


R22_SQL = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS n_click,
       COUNT(*) FILTER (event_type = 'error') AS n_error,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


def r23_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence analytics: previous/next event type and the
    running value total, ordered by (ts, event_id) — the deterministic
    tiebreak matters, and the running sum goes through decimal so both
    engines accumulate exactly."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
    )


R23_SQL = """
SELECT event_id, user_id,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       CAST(SUM(value::DECIMAL(18,6)) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def r24_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE rolling aggregation: per user, the trailing-1-hour event
    count and value sum at every event — the feature-engineering staple.
    Spark's rangeBetween needs a numeric ordering, so the frame is
    [-3.6e9 µs, 0] over unix_micros(ts); DuckDB's twin uses RANGE with an
    interval.  Peers (equal ts) are in-frame in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing_1h"),
    )


R24_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w::BIGINT AS n_trailing_1h,
       CAST(SUM(value::DECIMAL(18,6)) OVER w AS DOUBLE) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def r26_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-window trio in one pass: rank (gapped), dense_rank, and
    percent_rank of each order inside its priority class by total price —
    one shuffle on the partition key serves all three expressions."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.rank().over(w).cast("int").alias("price_rank"),
            F.dense_rank().over(w).cast("int").alias("price_dense_rank"),
            F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        )
        .filter(F.col("price_rank") <= 50)
        .orderBy("o_orderpriority", "price_rank", "o_orderkey")
    )


R26_SQL = """
WITH r AS (
  SELECT o_orderkey, o_orderpriority,
         rank() OVER w::INT AS price_rank,
         dense_rank() OVER w::INT AS price_dense_rank,
         round(percent_rank() OVER w, 6) AS price_pct_rank
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC)
)
SELECT * FROM r WHERE price_rank <= 50
ORDER BY o_orderpriority, price_rank, o_orderkey
"""


def r25_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time window: 10-minute windows every 5
    minutes, so each event lands in exactly 2 windows.  Native
    ``F.window(ts, "10 minutes", "5 minutes")``; the oracle unnests each
    event's two candidate window starts and filters to containment —
    the relational definition of a hop."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


R25_SQL = """
WITH cand AS (
  SELECT ts, value,
         unnest([
           time_bucket(INTERVAL 5 MINUTE, ts),
           time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE
         ]) AS window_start
  FROM events
)
SELECT window_start, COUNT(*)::BIGINT AS n_events,
       CAST(SUM(value::DECIMAL(18,4)) AS DOUBLE) AS sum_value
FROM cand
WHERE ts >= window_start AND ts < window_start + INTERVAL 10 MINUTE
GROUP BY window_start
ORDER BY window_start
"""


def q7_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of extended price per return flag.
    ``percentile`` is the exact (full-sort-per-group) baseline both engines
    define identically; at 100 TB you'd reach for ``approx_percentile``
    (t-digest, mergeable partial aggs, no per-group sort) and accept the
    documented error bound — the oracle pins the exact variant."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = lambda p, a: F.round(  # noqa: E731
        F.expr(f"percentile(l_extendedprice, {p})"), 4
    ).alias(a)
    return (
        li.groupBy("l_returnflag")
        .agg(pct(0.25, "p25"), pct(0.5, "p50"), pct(0.9, "p90"))
        .orderBy("l_returnflag")
    )


Q7_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface: (priority, status), (priority),
    and grand total in one pass — the general form ROLLUP/CUBE special-case."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q8_orders")
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               {_dsum("o_totalprice", "total")}
        FROM q8_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        """
    )


Q8_SQL = f"""
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
       {_dsum("o_totalprice", "total")}
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
"""


def asof_error_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (beyond reference parity): for every error event, the
    latest prior click by the same user — "state at event time"."""
    from .functions.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    # unique (user, ts) on the right so the match is well-defined
    clicks = patterns.latest_per_key(clicks, ["user_id", "ts"], "value")
    joined = asof_join(errors, clicks, on=["user_id"], left_ts="ts", right_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts_r").alias("click_ts"),
        F.col("value_r").alias("click_value"),
    )


ASOF_SQL = """
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY value DESC) = 1
)
SELECT e.event_id, e.user_id, c.ts AS click_ts, c.value AS click_value
FROM errors e ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


def asof_fwd_click_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (polars join_asof strategy='forward'):
    for every error event, the EARLIEST click by the same user at-or-after
    it, but only within 30 minutes.  Same no-join union+window plan as the
    backward direction; DuckDB has no forward ASOF, so the oracle uses a
    correlated-min formulation."""
    from .functions.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    clicks = patterns.latest_per_key(clicks, ["user_id", "ts"], "value")
    joined = asof_join(
        errors, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        direction="forward", tolerance="30 minutes",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts_r").alias("click_ts"),
        F.col("value_r").alias("click_value"),
    )


ASOF_FWD_SQL = """
WITH errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY value DESC) = 1
),
m AS (
  SELECT e.event_id, e.user_id, e.ts,
         (SELECT min(c.ts) FROM clicks c
          WHERE c.user_id = e.user_id AND c.ts >= e.ts
            AND c.ts <= e.ts + INTERVAL 30 MINUTE) AS click_ts
  FROM errors e
)
SELECT m.event_id, m.user_id, m.click_ts, c.value AS click_value
FROM m LEFT JOIN clicks c ON c.user_id = m.user_id AND c.ts = m.click_ts
"""


def range_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval join (beyond reference parity): clicks in the 10
    minutes preceding each error, counted per error event."""
    from .functions.joins import range_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = range_join_bucketed(
        errors, clicks, on=["user_id"],
        lower="INTERVAL 0 SECONDS", upper="INTERVAL 10 MINUTES",
    )
    return joined.groupBy("event_id").agg(F.count("*").alias("n_clicks"))


RANGE_SQL = """
SELECT e.event_id, COUNT(*) AS n_clicks
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts <= e.ts
GROUP BY e.event_id
"""


def cdc_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M4: apply_cdc over a change stream synthesized from events.

    event_type maps onto CDC verbs; event_id is the commit version, so
    'latest change wins' is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        "value",
        F.when(F.col("event_type") == "error", "delete")
        .when(F.col("event_type").isin("view", "signup"), "insert")
        .when(F.col("event_type") == "click", "update")
        .otherwise("update_postimage")
        .alias("_change_type"),
        F.col("event_id").alias("_commit_version"),
    )
    return cdc.apply_cdc(changes, None, keys=["user_id"])


CDC_MERGE_SQL = """
WITH ch AS (
  SELECT user_id, value,
         CASE WHEN event_type = 'error' THEN 'delete'
              WHEN event_type IN ('view', 'signup') THEN 'insert'
              WHEN event_type = 'click' THEN 'update'
              ELSE 'update_postimage' END AS ct,
         event_id AS cv
  FROM events
),
latest AS (
  SELECT * FROM ch QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY cv DESC) = 1
)
SELECT user_id, value FROM latest WHERE ct <> 'delete'
"""


def schema_evolve_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: missing target column filled as a typed null."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    target = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    out, _ = apply_schema(ev, target, mode="add_new_columns")
    return out


SCHEMA_EVOLVE_SQL = (
    "SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS score FROM events"
)


def schema_type_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: widening lattice — int×long→long, long×string→string, float×double→double."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    target = T.StructType(
        [
            T.StructField("event_id", T.IntegerType()),  # batch is long → widens to long
            T.StructField("user_id", T.StringType()),  # batch long × string → string
            T.StructField("value", T.FloatType()),  # batch double → widens to double
        ]
    )
    out, final = apply_schema(ev, target, mode="type_widen")
    assert [f.dataType.simpleString() for f in final.fields] == ["bigint", "string", "double"]
    return out


SCHEMA_WIDEN_SQL = """
SELECT event_id, CAST(user_id AS VARCHAR) AS user_id, value FROM events
"""


def schema_rescue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: coerce + rescue column — failed casts captured as stringified originals."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    target = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.DoubleType()),  # never parses → rescued
        ]
    )
    out, _ = apply_schema(ev, target, mode="coerce", rescue_mode="column")
    return out.select(
        "event_id", "event_type", F.to_json(F.col("_rescued")).alias("rescued")
    )


SCHEMA_RESCUE_SQL = """
SELECT event_id, CAST(NULL AS DOUBLE) AS event_type,
       CAST(to_json(struct_pack(event_type := event_type)) AS VARCHAR) AS rescued
FROM events
"""


def w1_drop_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: drop events older than max(ts) − 5 minutes, then count by type."""
    ev = load_table(spark, sf_dir, "events")
    kept = patterns.drop_late(ev, "ts", "5 minutes")
    return kept.groupBy("event_type").agg(F.count("*").alias("n_kept"))


W1_SQL = """
SELECT event_type, COUNT(*) AS n_kept
FROM events
WHERE ts >= (SELECT max(ts) - INTERVAL 5 MINUTE FROM events)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# LLM-pipeline operators: dedup / text / similarity / multimodal
# --------------------------------------------------------------------------


def d1_exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(load_table(spark, sf_dir, "documents"))


D1_SQL = """
SELECT md5(text) AS dup_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_id
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""


def d2_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_exact(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_chars"
    )


D2_SQL = """
SELECT doc_id, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
"""


def d3_fingerprint_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.fingerprint_duplicates(load_table(spark, sf_dir, "documents"))


_SQL_NORM_WORDS = (
    "list_sort(list_distinct(list_filter("
    "regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')), '\\s+'),"
    " w -> w <> '')))"
)

D3_SQL = f"""
WITH fp AS (
  SELECT doc_id, md5(array_to_string({_SQL_NORM_WORDS}, ' ')) AS fp FROM documents
)
SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
FROM fp GROUP BY fp HAVING COUNT(*) > 1
"""


def d4_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.12
    )


D4_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM p a JOIN p b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b,
         round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.12
"""


def d4b_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d4 with the ``max_doc_freq`` hot-shingle cap engaged (dedup.py skew
    guard): shingles present in more than 2 documents are dropped from the
    posting list BEFORE the self-join, and set sizes / Jaccard are computed
    over the capped shingle universe so the metric stays consistent.  The
    cap is deliberately low so it truly bites at sf0.01 (max shingle doc
    freq there is 7) — at corpus scale the cap would be in the thousands,
    but the plan shape under test is identical."""
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.1, max_doc_freq=2
    )


D4B_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
p0 AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
hot AS (SELECT h FROM p0 GROUP BY h HAVING COUNT(*) > 2),
p AS (SELECT * FROM p0 WHERE h NOT IN (SELECT h FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM p a JOIN p b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b,
         round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.1
"""


def d5_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dedup.minhash_signatures(load_table(spark, sf_dir, "documents"))
    return sigs.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform(F.col("minhash"), lambda h: h.cast("string"))
        ).alias("sig"),
    )


# affine MinHash twin: one 32-bit md5 base hash per shingle, then the same
# (a_i * h + b_i) mod P derivation as functions.dedup.minhash_signatures
_SQL_MINHASH_MINS = ", ".join(
    "MIN(({a}::BIGINT * h32 + {b}) % {p}) AS h{i}".format(
        a=dedup.minhash_params(i)[0],
        b=dedup.minhash_params(i)[1],
        p=dedup.MINHASH_PRIME,
        i=i,
    )
    for i in range(32)
)
_SQL_H32_CTE = f"sh32 AS (SELECT doc_id, {_sql_md5_long('shingle', 8)} AS h32 FROM sh)"

D5_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id)
SELECT doc_id,
       array_to_string([{", ".join(f"h{i}" for i in range(32))}], ',') AS sig
FROM sigs
"""


def d6_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.12
    )


_SQL_BANDS = "\nUNION ALL\n".join(
    "SELECT doc_id, {b} AS band, md5({concat}) AS bucket FROM sigs".format(
        b=b,
        concat=" || ',' || ".join(f"h{b * 4 + r}::VARCHAR" for r in range(4)),
    )
    for b in range(8)
)

D6_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN p pa ON pa.doc_id = c.id_a
  JOIN p pb ON pb.doc_id = c.id_b AND pb.h = pa.h
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.12
"""


def d14_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching by EDIT DISTANCE with LSH candidate generation: pairs
    whose 64-char prefixes are within levenshtein 40, candidates coming
    from the same MinHash banding as d6 (edit distance is O(len^2) per
    pair, so the candidate set must be sparse BEFORE verification — never
    all-pairs).  Both engines ship the same levenshtein, so distances
    hash-match."""
    return dedup.edit_distance_pairs(
        load_table(spark, sf_dir, "documents"), max_distance=40, prefix_chars=64
    ).orderBy("id_a", "id_b")


D14_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       levenshtein(substr(da.text, 1, 64), substr(db.text, 1, 64))::INT
         AS edit_distance
FROM cand c
JOIN documents da ON da.doc_id = c.id_a
JOIN documents db ON db.doc_id = c.id_b
WHERE levenshtein(substr(da.text, 1, 64), substr(db.text, 1, 64)) <= 40
ORDER BY c.id_a, c.id_b
"""


def d7_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(load_table(spark, sf_dir, "documents"))


_SQL_SIMHASH_VOTES = ", ".join(
    f"SUM(CASE WHEN (th >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(16)
)
_SQL_SIMHASH_SIG = " + ".join(
    f"CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(16)
)

D7_SQL = f"""
WITH dt AS (
  SELECT doc_id,
         unnest(list_distinct({_sql_tokens("lower(text)")})) AS tok
  FROM documents
),
th AS (SELECT doc_id, {_sql_md5_long("tok")} AS th FROM dt),
votes AS (SELECT doc_id, {_SQL_SIMHASH_VOTES} FROM th GROUP BY doc_id)
SELECT doc_id, CAST({_SQL_SIMHASH_SIG} AS BIGINT) AS simhash FROM votes
"""


def d8_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole band blocking.

    32-bit signatures in 2 bands of 16 bits (65k buckets per band), hamming
    radius 1 — the production-shaped parameterization; 16-bit signatures
    collapse on this templated corpus.  Exact under blocking (a pair within
    the radius must agree on ≥1 band), so the oracle's brute-force pair
    scan must match the banded plan row-for-row.
    """
    return dedup.simhash_near_dup_pairs(
        load_table(spark, sf_dir, "documents"), bits=32, max_hamming=1
    )


_SQL_SIMHASH32_VOTES = ", ".join(
    f"SUM(CASE WHEN (th >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(32)
)
_SQL_SIMHASH32_SIG = " + ".join(
    f"CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(32)
)

D8_SQL = f"""
WITH dt AS (
  SELECT doc_id,
         unnest(list_distinct({_sql_tokens("lower(text)")})) AS tok
  FROM documents
),
th AS (SELECT doc_id, {_sql_md5_long("tok")} AS th FROM dt),
votes AS (SELECT doc_id, {_SQL_SIMHASH32_VOTES} FROM th GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({_SQL_SIMHASH32_SIG} AS BIGINT) AS simhash FROM votes)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
"""


def d9_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER resolution: MinHash-LSH pairs (exactly d6's
    parameters) fed through hash-min connected components, labeling every
    paired doc with the min doc_id of its duplicate group.  The oracle
    recomputes the same clusters relationally — recursive-CTE transitive
    closure over the d6 pair set, then min reachable id per node — so the
    iterative Spark labeling is hash-checked, not just row-counted.
    """
    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.12
    )
    return dedup.connected_components(pairs).orderBy("doc_id")


D9_SQL = f"""
WITH RECURSIVE {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN p pa ON pa.doc_id = c.id_a
  JOIN p pb ON pb.doc_id = c.id_b AND pb.h = pa.h
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.12),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, LEAST(a, MIN(b))::BIGINT AS cluster_id
FROM reach GROUP BY a ORDER BY doc_id
"""


def d10_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup (RefinedWeb/Dolma paragraph dedup, delimiter-free
    variant): 8-word chunks, first corpus-wide occurrence wins, survivors
    reassembled in order.  The oracle rebuilds the identical chunking with
    DuckDB list functions and the identical first-wins rank, so the whole
    reassembled clean_text is hash-checked byte-for-byte."""
    return dedup.chunk_dedup(
        dedup.spread(load_table(spark, sf_dir, "documents")), chunk_words=8
    ).orderBy("doc_id")


D10_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id, u.chunk_idx, u.chunk FROM (
    SELECT doc_id, unnest(list_transform(range((len(t) + 7) // 8),
      i -> struct_pack(chunk_idx := i,
                       chunk := array_to_string(t[i*8+1 : i*8+8], ' ')))) AS u
    FROM toks)
),
kept AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
),
agg AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_kept,
         string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
  FROM kept WHERE rn = 1 GROUP BY doc_id
),
meta AS (SELECT doc_id, ((len(t) + 7) // 8)::BIGINT AS n_chunks FROM toks)
SELECT m.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       m.n_chunks, COALESCE(a.n_kept, 0)::BIGINT AS n_kept
FROM meta m LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def u17_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/valid/test split: near-duplicate documents must
    NEVER straddle a split boundary (a test doc whose near-dup sits in
    train is evaluation leakage — the reason FineWeb/Dolma split by
    dedup cluster, not by document).  Composition: d6's MinHash-LSH pairs
    -> connected components -> every doc keyed by its cluster id
    (singletons key by themselves) -> u3's deterministic md5 hash-split on
    the CLUSTER id, so a whole duplicate group lands in one split.  The
    oracle replays the recursive-CTE closure and the identical md5
    bucketing."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.12)
    clusters = dedup.connected_components(pairs)
    labeled = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    return (
        sampling.hash_split(
            labeled,
            weights={"train": 0.8, "valid": 0.1, "test": 0.1},
            key_col="cluster_id",
        )
        .select("doc_id", "cluster_id", "split")
        .orderBy("doc_id")
    )


_U17_H = _sql_md5_long("'split' || cluster_id::VARCHAR")
_U17_CASE = " ".join(
    f"WHEN {_U17_H} >= {lo} AND {_U17_H} < {hi} THEN '{label}'"
    for label, lo, hi in sampling.split_bounds(
        {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
)


U17_SQL = f"""
WITH RECURSIVE {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN p pa ON pa.doc_id = c.id_a
  JOIN p pb ON pb.doc_id = c.id_b AND pb.h = pa.h
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.12),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
clus AS (
  SELECT a AS doc_id, LEAST(a, MIN(b))::BIGINT AS cluster_id
  FROM reach GROUP BY a
),
labeled AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clus c USING (doc_id)
)
SELECT doc_id, cluster_id, CASE {_U17_CASE} ELSE NULL END AS split
FROM labeled ORDER BY doc_id
"""


def d16_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-alignment duplicated-span profile (the suffix-array-dedup
    statistic of Lee et al. 2021 via stride-1 windows): an 8-token window
    at EVERY position, a span is duplicated when >1 distinct docs contain
    it, and each doc reports its span counts plus the longest consecutive
    duplicated run — at stride 1 the run length recovers the exact longest
    duplicated span (>=8 tokens) at any alignment, which fixed chunking
    (d10/d15) structurally misses.  Span text never crosses a shuffle —
    digests are md5'd map-side; the oracle replays the identical windows,
    doc-frequency, and the row_number-gap run grouping."""
    return dedup.duplicated_spans(
        dedup.spread(load_table(spark, sf_dir, "documents")),
        span_tokens=8,
        stride=1,
    ).orderBy("doc_id")


D16_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
spans AS (
  SELECT doc_id, u.span_idx, u.dig FROM (
    SELECT doc_id, unnest(list_transform(range(greatest(len(t) - 8, 0) + 1),
      i -> struct_pack(span_idx := i,
                       dig := md5(array_to_string(t[i+1 : i+8], ' '))))) AS u
    FROM toks)
),
freq AS (
  SELECT dig FROM (
    SELECT dig, COUNT(DISTINCT doc_id) AS df FROM spans GROUP BY dig
  ) WHERE df > 1
),
dup AS (
  SELECT s.doc_id, s.span_idx FROM spans s JOIN freq f ON s.dig = f.dig
),
runs AS (
  SELECT doc_id,
         span_idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY span_idx) AS grp
  FROM dup
),
maxrun AS (
  SELECT doc_id, CAST(MAX(c) AS INTEGER) AS max_dup_run FROM (
    SELECT doc_id, grp, COUNT(*) AS c FROM runs GROUP BY doc_id, grp
  ) GROUP BY doc_id
),
per AS (SELECT doc_id, COUNT(*)::BIGINT AS n_dup_spans FROM dup GROUP BY doc_id),
meta AS (
  SELECT doc_id, (greatest(len(t) - 8, 0) + 1)::BIGINT AS n_spans FROM toks
)
SELECT m.doc_id, m.n_spans,
       COALESCE(p.n_dup_spans, 0)::BIGINT AS n_dup_spans,
       COALESCE(r.max_dup_run, 0)::INTEGER AS max_dup_run,
       CAST(CASE WHEN COALESCE(r.max_dup_run, 0) > 0
                 THEN (r.max_dup_run - 1) * 1 + 8 ELSE 0 END AS INTEGER)
         AS approx_longest_dup_tokens
FROM meta m LEFT JOIN per p USING (doc_id) LEFT JOIN maxrun r USING (doc_id)
ORDER BY doc_id
"""


def d11_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/PaLM-style): flag training docs
    whose word trigrams collide with a held-out set.  Here train = even
    doc_ids, test = odd doc_ids; both sides shingle to 60-bit md5 keys and
    the oracle joins on the identical hash, so counts and flags are
    hash-verified.  Plan: test side collapses to a distinct hash set and
    broadcasts — the train side never shuffles for the probe."""
    doc = load_table(spark, sf_dir, "documents")
    return dedup.contamination_stats(
        dedup.spread(doc.filter(F.col("doc_id") % 2 == 0)),
        doc.filter(F.col("doc_id") % 2 == 1),
        ngram=3,
        min_hits=2,
    ).orderBy("doc_id")


D11_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_sql_tokens("lower(text)")} AS t FROM documents
),
sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM toks),
h AS (SELECT doc_id, {_sql_md5_long("shingle")} AS hh FROM sh),
tr AS (SELECT doc_id, hh FROM h WHERE doc_id % 2 = 0),
te AS (SELECT DISTINCT hh FROM h WHERE doc_id % 2 = 1),
tot AS (SELECT doc_id, COUNT(*)::BIGINT AS n_ngrams FROM tr GROUP BY doc_id),
hit AS (
  SELECT tr.doc_id, COUNT(*)::BIGINT AS n_contaminated
  FROM tr JOIN te USING (hh) GROUP BY tr.doc_id
)
SELECT tot.doc_id, tot.n_ngrams,
       COALESCE(hit.n_contaminated, 0)::BIGINT AS n_contaminated,
       round(COALESCE(hit.n_contaminated, 0) / tot.n_ngrams, 6) AS contaminated_frac,
       COALESCE(hit.n_contaminated, 0) >= 2 AS is_contaminated
FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
ORDER BY tot.doc_id
"""


def d12_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the scale path of d11: the test-set
    membership structure is a fixed ``m_bits``-size bloom (here 2^18 bits =
    32 KiB) instead of an exact hash set that grows with the benchmark.
    False positives are deterministic (salted-md5 double hashing), so the
    oracle reproduces the bloom relationally and the flags hash-match
    INCLUDING collisions."""
    doc = load_table(spark, sf_dir, "documents")
    return dedup.bloom_decontaminate(
        dedup.spread(doc.filter(F.col("doc_id") % 2 == 0)),
        doc.filter(F.col("doc_id") % 2 == 1),
        ngram=3,
        min_hits=2,
        m_bits=1 << 18,
        k_hashes=2,
        probe="join",
    ).orderBy("doc_id")


_D12_M = 1 << 18
D12_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_sql_tokens("lower(text)")} AS t FROM documents
),
sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS shingle FROM toks),
te AS (SELECT shingle FROM sh WHERE doc_id % 2 = 1),
bits AS (
  SELECT DISTINCT p FROM (
    SELECT {_sql_md5_long("(shingle || ':0')")} % {_D12_M} AS p FROM te
    UNION ALL
    SELECT {_sql_md5_long("(shingle || ':1')")} % {_D12_M} AS p FROM te
  )
),
tr AS (
  SELECT doc_id,
         {_sql_md5_long("(shingle || ':0')")} % {_D12_M} AS p0,
         {_sql_md5_long("(shingle || ':1')")} % {_D12_M} AS p1
  FROM sh WHERE doc_id % 2 = 0
),
probed AS (
  SELECT doc_id,
         (p0 IN (SELECT p FROM bits) AND p1 IN (SELECT p FROM bits)) AS hit
  FROM tr
),
agg AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_ngrams,
         SUM(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS n_bloom_positive
  FROM probed GROUP BY doc_id
)
SELECT doc_id, n_ngrams, n_bloom_positive,
       round(n_bloom_positive / n_ngrams, 6) AS positive_frac,
       n_bloom_positive >= 2 AS is_flagged
FROM agg ORDER BY doc_id
"""


def d13_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup: d9's MinHash-LSH clusters resolved to a
    DEDUPED CORPUS — every clustered doc except its cluster's min-id
    canonical member is dropped, unclustered docs pass through.  The
    oracle recomputes the clusters via recursive-CTE transitive closure
    and anti-joins identically, so the surviving doc set is hash-checked."""
    doc = load_table(spark, sf_dir, "documents")
    clusters = dedup.connected_components(
        dedup.minhash_lsh_pairs(doc, threshold=0.12)
    )
    return (
        dedup.keep_canonical(doc, clusters)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


D13_SQL = f"""
WITH RECURSIVE {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN p pa ON pa.doc_id = c.id_a
  JOIN p pb ON pb.doc_id = c.id_b AND pb.h = pa.h
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.12),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
clusters AS (
  SELECT a AS doc_id, LEAST(a, MIN(b))::BIGINT AS cluster_id
  FROM reach GROUP BY a
),
dropped AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
ORDER BY d.doc_id
"""


def t9_curate_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-3 documents by quality score — the curation
    selection step, run through the SKEW-SAFE two-phase grouped_topk (a
    corpus groups into a handful of languages; a plain per-lang window
    would funnel the whole corpus through those few reducer keys).  The
    salted two-phase form is provably identical to the plain window, which
    is exactly what the oracle runs."""
    doc = load_table(spark, sf_dir, "documents")
    scored = doc.select(
        "lang", "doc_id", tx.quality_score(F.col("text")).alias("quality")
    )
    return curation.grouped_topk(
        scored,
        ["lang"],
        [F.col("quality").desc(), F.col("doc_id").asc()],
        3,
        salt_col="doc_id",
        n_salts=16,
    ).select(
        "lang", "doc_id", "quality", F.col("rank").cast("int").alias("rank")
    ).orderBy("lang", "rank")


T9_SQL = f"""
WITH base AS (
  SELECT lang, doc_id,
         len({_sql_tokens("text")})::BIGINT AS n_tokens,
         length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS n_nonspace,
         len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
         length(text)::BIGINT AS n_chars,
         {_sql_stopword_count("en")}::BIGINT AS n_stop
  FROM documents
),
scored AS (
  SELECT lang, doc_id,
         round(
           (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
           + least(round(n_stop / greatest(n_tokens, 1), 6) * 4, 0.3::DOUBLE)
           + 0.3::DOUBLE
           - least(round(n_punct / greatest(n_chars, 1), 6) * 2, 0.3::DOUBLE), 6
         ) AS quality
  FROM base
),
ranked AS (
  SELECT lang, doc_id, quality,
         row_number() OVER (
           PARTITION BY lang ORDER BY quality DESC, doc_id ASC
         )::INT AS rank
  FROM scored
)
SELECT lang, doc_id, quality, rank FROM ranked WHERE rank <= 3
ORDER BY lang, rank
"""


def t1_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return doc.select(
        "doc_id",
        tx.token_count(c).cast("long").alias("n_tokens"),
        tx.char_count(c).cast("long").alias("n_chars_calc"),
        tx.punct_count(c).cast("long").alias("n_punct"),
        tx.punct_ratio(c).alias("punct_ratio"),
        tx.avg_token_len(c).alias("avg_token_len"),
        tx.stopword_ratio(c, "en").alias("stopword_ratio_en"),
        tx.quality_score(c).alias("quality"),
    )


T1_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len({_sql_tokens("text")})::BIGINT AS n_tokens,
         length(text)::BIGINT AS n_chars_calc,
         len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
         length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS n_nonspace,
         {_sql_stopword_count("en")}::BIGINT AS n_stop
  FROM documents
),
ratios AS (
  SELECT doc_id, n_tokens, n_chars_calc, n_punct,
         round(n_punct / greatest(n_chars_calc, 1), 6) AS punct_ratio,
         round(n_nonspace / greatest(n_tokens, 1), 6) AS avg_token_len,
         round(n_stop / greatest(n_tokens, 1), 6) AS stopword_ratio_en
  FROM base
)
SELECT doc_id, n_tokens, n_chars_calc, n_punct, punct_ratio, avg_token_len,
       stopword_ratio_en,
       round(
         (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
         + least(stopword_ratio_en * 4, 0.3::DOUBLE)
         + 0.3::DOUBLE
         - least(punct_ratio * 2, 0.3::DOUBLE), 6) AS quality
FROM ratios
"""


def t2_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return doc.select("doc_id", tx.lang_id(F.col("text")).alias("lang_guess"))


_SQL_LANG_COUNTS = ", ".join(
    f"{_sql_stopword_count(lang)} AS c_{lang}" for lang in sorted(tx.STOPWORDS)
)

T2_SQL = f"""
WITH counts AS (SELECT doc_id, {_SQL_LANG_COUNTS} FROM documents)
SELECT doc_id,
       CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
            WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
            WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
            WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
            ELSE 'fr' END AS lang_guess
FROM counts
"""


def t3_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return doc.select("doc_id", tx.fingerprint(F.col("text")).alias("fp"))


T3_SQL = f"SELECT doc_id, md5(array_to_string({_SQL_NORM_WORDS}, ' ')) AS fp FROM documents"


def t4_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-style token counts per document."""
    doc = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return doc.select(
        "doc_id",
        tx.token_count(c).cast("long").alias("ws_tokens"),
        tx.bpe_token_count(c).cast("long").alias("bpe_tokens"),
    )


T4_SQL = f"""
SELECT doc_id,
       len({_sql_tokens("text")})::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '{tx.BPE_TOKEN_RE}'))::BIGINT AS bpe_tokens
FROM documents
"""


def t5_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word trigrams by document frequency (corpus analytics).

    ``word_shingles`` is distinct-per-document, so each document contributes
    a given shingle at most once and COUNT(*) over the exploded shingles IS
    the number of documents containing it — a true document frequency.
    """
    doc = load_table(spark, sf_dir, "documents")
    sh = dedup.spread(doc).select(
        F.explode(tx.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("shingle").asc())
        .limit(20)
    )


T5_SQL = f"""
WITH {_SQL_SHINGLE_CTE}
SELECT shingle, COUNT(*) AS doc_freq
FROM sh GROUP BY shingle
ORDER BY doc_freq DESC, shingle
LIMIT 20
"""


def t6_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-trigram fraction per document (quality filter
    for boilerplate / looping text), plus the raw gram counts."""
    doc = load_table(spark, sf_dir, "documents")
    grams = tx.ngram_list(F.col("text"), 3)
    return doc.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_grams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
        tx.repetition_ratio(F.col("text"), 3).alias("repetition"),
    )


_SQL_NGRAMS = (
    "list_transform(range(1, greatest(len(t) - 3, 0) + 2), "
    "i -> array_to_string(t[i:i+2], ' '))"
)

T6_SQL = f"""
WITH toks AS (SELECT doc_id, {_sql_tokens("lower(text)")} AS t FROM documents),
g AS (SELECT doc_id, {_SQL_NGRAMS} AS grams FROM toks)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                   / CAST(len(grams) AS DOUBLE), 6) AS repetition
FROM g
"""


def s1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.cosine_topk(emb, queries, k=5)


def _sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of similarity.cosine: sequential-fold dot/norm in doubles."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"
        f" / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({b}, x -> x * x))))"
    )


_SQL_COSINE = _sql_cosine("qe", "e")

S1_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 8),
s AS (
  SELECT query_id, vec_id, round({_SQL_COSINE}, 6) AS c
  FROM q, v WHERE vec_id <> query_id
),
r AS (
  SELECT query_id, vec_id, c AS cosine_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 5
"""


def s2_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.lsh_ann_topk(emb, queries, dim=64, k=5, n_planes=4)


def _sql_sketch(vec: str, dim: int = 64, n_planes: int = 4) -> str:
    """DuckDB twin of similarity.sign_sketch with the same md5 hyperplanes."""
    parts = []
    for p in range(n_planes):
        plane = _hyperplane(dim, p)
        proj = " + ".join(
            f"{vec}[{j + 1}] * ({plane[j]!r}::DOUBLE)" for j in range(dim)
        )
        parts.append(f"CASE WHEN ({proj}) > 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(parts) + ")"


S2_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
vb AS (SELECT vec_id, e, {_sql_sketch("e")} AS bucket FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM vb WHERE vec_id < 8),
s AS (
  SELECT query_id, vec_id, round({_SQL_COSINE}, 6) AS c
  FROM q JOIN vb ON q.bucket = vb.bucket AND vb.vec_id <> q.query_id
),
r AS (
  SELECT query_id, vec_id, c AS cosine_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 5
"""


def s3_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded sign-sketch LSH.

    8-bit bands → 256 buckets per band: candidate volume scales ~N²/256
    per band instead of N²/16, keeping the verify stage sparse.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup_pairs(
        emb, dim=64, threshold=0.4, n_planes=16, band_size=8
    )


def _sql_near_dup_bands(n_planes: int = 16, band_size: int = 8) -> str:
    mask = (1 << band_size) - 1
    rows = ", ".join(f"({b})" for b in range(n_planes // band_size))
    return (
        f"SELECT vec_id, e, bb.band, (s >> (bb.band * {band_size})) & {mask} AS bucket "
        f"FROM sk, (VALUES {rows}) bb(band)"
    )


S3_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
sk AS (SELECT vec_id, e, {_sql_sketch("e", 64, 16)} AS s FROM v),
bands AS ({_sql_near_dup_bands()}),
cand AS (
  SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT ia AS id_a, ib AS id_b,
         round({_sql_cosine("va.e", "vb.e")}, 6) AS cosine_sim
  FROM cand
  JOIN v va ON va.vec_id = ia
  JOIN v vb ON vb.vec_id = ib
)
SELECT id_a, id_b, cosine_sim FROM scored WHERE cosine_sim >= 0.4
"""


def s7_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end-to-end: embedding-cosine near-dup pairs (s3's
    banded sign-sketch LSH, candidates verified exactly) → connected
    components → keep the min-id member per cluster.  The full chain —
    banding, verification, transitive clustering, canonical resolution —
    is reproduced relationally by the oracle, so the surviving vector set
    hash-checks."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_near_dup_pairs(
        emb, dim=64, threshold=0.4, n_planes=16, band_size=8
    )
    clusters = dedup.connected_components(
        pairs, src="id_a", dst="id_b", node_col="vec_id"
    )
    survivors = dedup.keep_canonical(emb, clusters, id_col="vec_id")
    return survivors.select("vec_id").orderBy("vec_id")


S7_SQL = f"""
WITH RECURSIVE v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
sk AS (SELECT vec_id, e, {_sql_sketch("e", 64, 16)} AS s FROM v),
bands AS ({_sql_near_dup_bands()}),
cand AS (
  SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT ia AS id_a, ib AS id_b,
         round({_sql_cosine("va.e", "vb.e")}, 6) AS cosine_sim
  FROM cand
  JOIN v va ON va.vec_id = ia
  JOIN v vb ON vb.vec_id = ib
),
pairs AS (SELECT id_a, id_b FROM scored WHERE cosine_sim >= 0.4),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a
),
clusters AS (
  SELECT a AS vec_id, LEAST(a, MIN(b))::BIGINT AS cluster_id
  FROM reach GROUP BY a
),
dropped AS (SELECT vec_id FROM clusters WHERE vec_id <> cluster_id)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
ORDER BY vec_id
"""





def s4_cosine_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs baseline for near-dup (correctness reference)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup_pairs(emb, dim=64, threshold=0.4, exact=True)


S4_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_sql_cosine("a.e", "b.e")}, 6) AS cosine_sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM scored WHERE cosine_sim >= 0.4
"""


def s5_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned ANN: 16 md5-seeded cells, 4 probed per query.

    The corpus-side cell assignment is a map-side Arrow-BLAS pass (one
    numpy matmul per batch, zero shuffle — same 6-dp rounding and tie rule
    as the expr form, agreement asserted in test_functions and proven
    under the driver hash gate by s5b since round 5); the oracle
    recomputes the identical index relationally (seed ranking → argmin
    assignment → probe ranking), so determinism of the whole IVF pipeline
    — not just the final scores — is hash-checked.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.ivf_topk(
        emb, queries, k=5, n_cells=16, n_probe=4, assign_method="arrow"
    )


S5_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
ranked_seeds AS (
  SELECT e AS c,
         row_number() OVER (
           ORDER BY {_sql_md5_long("CAST(vec_id AS VARCHAR)")}, vec_id
         ) AS cell
  FROM v
),
seeds AS (SELECT * FROM ranked_seeds WHERE cell <= 16),
sims AS (
  SELECT v.vec_id, v.e, s.cell, round({_sql_cosine("v.e", "s.c")}, 6) AS sim
  FROM v CROSS JOIN seeds s
),
ranked AS (
  SELECT vec_id, e, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rnk
  FROM sims
),
cells AS (SELECT vec_id, e, cell FROM ranked WHERE rnk = 1),
q AS (
  SELECT vec_id AS query_id, e AS qe, cell
  FROM ranked WHERE vec_id < 8 AND rnk <= 4
),
s AS (
  SELECT query_id, c.vec_id, round({_sql_cosine("qe", "c.e")}, 6) AS cos
  FROM q JOIN cells c ON q.cell = c.cell AND c.vec_id <> q.query_id
),
r AS (
  SELECT query_id, vec_id, cos AS cosine_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 5
"""


def _sql_ivf_refine_iter(prev: str, out: str, src: str = "v") -> str:
    """One unrolled Lloyd iteration over CTE ``src`` (vec_id, e) given
    centroids CTE ``prev`` (cell, c): rounded-cosine assignment (first-max
    tie on the lowest cell), then the scaled-integer spherical mean —
    ``sum(round(unit*1e6))::BIGINT / (n*1e6)`` — exactly the arithmetic
    ``similarity.ivf_refine_centroids`` performs, so the trained centroids
    replay bit-for-bit.  Empty cells keep the previous centroid."""
    return f"""
sims_{out} AS (
  SELECT {src}.vec_id, {src}.e, p.cell,
         round({_sql_cosine(f"{src}.e", "p.c")}, 6) AS sim
  FROM {src} CROSS JOIN {prev} p
),
a_{out} AS (
  SELECT vec_id, e, cell FROM (
    SELECT vec_id, e, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rnk
    FROM sims_{out} WHERE sim IS NOT NULL
  ) WHERE rnk = 1
),
u_{out} AS (
  SELECT cell,
         unnest(range(0, len(e))) AS dim,
         unnest(list_transform(
           e, x -> (x / nullif(sqrt(list_sum(list_transform(e, y -> y * y))), 0.0))
                   * 1000000.0
         )) AS xs
  FROM a_{out}
),
m_{out} AS (
  SELECT cell, dim, COUNT(xs) AS n, SUM(CAST(round(xs) AS BIGINT)) AS s
  FROM u_{out} WHERE xs IS NOT NULL GROUP BY cell, dim
),
c_{out} AS (
  SELECT cell, list(s / (n * 1000000.0) ORDER BY dim) AS c
  FROM m_{out} GROUP BY cell
),
{out} AS (
  SELECT p.cell, COALESCE(nw.c, p.c) AS c
  FROM {prev} p LEFT JOIN c_{out} nw ON p.cell = nw.cell
)"""


def s5b_ivf_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN on a TRAINED index — the real 100 TB path: spherical k-means
    refinement of the md5 seed centroids (2 Lloyd iterations, per-iteration
    shuffle O(n_cells × dim) after map-side combine) + Arrow-BLAS cell
    assignment (one numpy matmul per Arrow batch instead of interpreted
    per-row folds).  The refinement's scaled-integer mean makes the trained
    index engine-replayable, so the ITERATIVE training is hash-verified by
    an unrolled-CTE oracle (the g1_pagerank trick applied to k-means).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = similarity._seed_centroids(emb, 16, "vec_id", "embedding")
    trained = similarity.ivf_refine_centroids(emb, seeds, n_iter=2, assign_method="arrow")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.ivf_topk(
        emb, queries, k=5, n_cells=16, n_probe=4,
        centroids=trained, assign_method="arrow",
    )


S5B_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
ranked_seeds AS (
  SELECT e AS c,
         row_number() OVER (
           ORDER BY {_sql_md5_long("CAST(vec_id AS VARCHAR)")}, vec_id
         ) AS cell
  FROM v
),
seeds AS (SELECT cell, c FROM ranked_seeds WHERE cell <= 16),
{_sql_ivf_refine_iter("seeds", "cent1")},
{_sql_ivf_refine_iter("cent1", "cent2")},
sims_f AS (
  SELECT v.vec_id, v.e, t.cell, round({_sql_cosine("v.e", "t.c")}, 6) AS sim
  FROM v CROSS JOIN cent2 t
),
ranked_f AS (
  SELECT vec_id, e, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rnk
  FROM sims_f WHERE sim IS NOT NULL
),
cells AS (SELECT vec_id, e, cell FROM ranked_f WHERE rnk = 1),
q AS (
  SELECT vec_id AS query_id, e AS qe, cell
  FROM ranked_f WHERE vec_id < 8 AND rnk <= 4
),
s AS (
  SELECT query_id, c.vec_id, round({_sql_cosine("qe", "c.e")}, 6) AS cos
  FROM q JOIN cells c ON q.cell = c.cell AND c.vec_id <> q.query_id
),
r AS (
  SELECT query_id, vec_id, cos AS cosine_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 5
"""


def s12_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: 4 subspace codebooks (16 codes each,
    trained by the replayable spherical k-means), 4-byte corpus codes,
    asymmetric LUT scan — the 128×-compression companion to s6's int8
    path.  The ENTIRE train→encode→scan pipeline is hash-verified by an
    unrolled-CTE oracle (similarity.pq_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.pq_topk(
        emb, queries, k=5, n_sub=4, n_codes=16, n_iter=1, dim=64,
        assign_method="arrow",
    )


def _s12_sql(n_sub: int = 4, n_codes: int = 16, sub: int = 16, k: int = 5) -> str:
    parts = []
    for i in range(n_sub):
        lo, hi = i * sub + 1, (i + 1) * sub
        parts.append(
            f"v{i} AS (SELECT vec_id, e[{lo}:{hi}] AS e FROM v),\n"
            f"seeds{i} AS (SELECT cell, c[{lo}:{hi}] AS c FROM ranked_seeds "
            f"WHERE cell <= {n_codes}),"
        )
        parts.append(_sql_ivf_refine_iter(f"seeds{i}", f"cb{i}", src=f"v{i}") + ",")
        parts.append(
            f"""encs{i} AS (
  SELECT v{i}.vec_id, p.cell,
         round({_sql_cosine(f"v{i}.e", "p.c")}, 6) AS sim
  FROM v{i} CROSS JOIN cb{i} p
),
enc{i} AS (
  SELECT vec_id, cell AS code_{i} FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rnk
    FROM encs{i} WHERE sim IS NOT NULL
  ) WHERE rnk = 1
),"""
        )
    score_terms = []
    for i in range(n_sub):
        off = i * sub
        dot = (
            f"list_sum(list_transform(range(1, {sub} + 1), "
            f"j -> q.e[j + {off}] * c{i}.c[j]))"
        )
        score_terms.append(f"round({dot}, 6)")
    score = "0.0\n           + " + "\n           + ".join(score_terms)
    code_join = "\n  ".join(
        f"JOIN cb{i} c{i} ON c{i}.cell = d.code_{i}" for i in range(n_sub)
    )
    enc_join = " ".join(
        f"JOIN enc{i} USING (vec_id)" if i else "enc0" for i in range(n_sub)
    )
    body = "\n".join(parts)
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
ranked_seeds AS (
  SELECT e AS c,
         row_number() OVER (
           ORDER BY {_sql_md5_long("CAST(vec_id AS VARCHAR)")}, vec_id
         ) AS cell
  FROM v
),
{body}
codes AS (SELECT * FROM {enc_join}),
q AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, d.vec_id,
         {score} AS pq_score
  FROM q
  JOIN codes d ON d.vec_id <> q.query_id
  {code_join}
),
r AS (
  SELECT query_id, vec_id, pq_score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY pq_score DESC, vec_id
         ) AS rank
  FROM scored WHERE pq_score IS NOT NULL
)
SELECT query_id, vec_id, pq_score, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= {k}
"""


S12_SQL = _s12_sql()


def s6_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k over int8-quantized embeddings: 4-8× less memory
    traffic than the float corpus, scoring on exact integer dot/norms (the
    per-vector scales cancel in cosine), one floating division at the end.
    The oracle replays quantization and integer scoring in DuckDB."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.quantized_topk(emb, queries, k=5)


S6_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
sc AS (
  SELECT vec_id, e,
         nullif(list_max(list_transform(e, x -> abs(x))), 0.0) / 127.0 AS s
  FROM v
),
qz AS (
  SELECT vec_id, list_transform(e, x -> CAST(round(x / s) AS BIGINT)) AS qe
  FROM sc
),
q AS (SELECT vec_id AS query_id, qe AS qq FROM qz WHERE vec_id < 8),
scored AS (
  SELECT query_id, vec_id,
         round(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * qe[i]))
               / nullif(sqrt(list_sum(list_transform(qq, x -> x * x)))
                        * sqrt(list_sum(list_transform(qe, x -> x * x))), 0.0),
               6) AS c
  FROM q, qz WHERE vec_id <> query_id
),
r AS (
  SELECT query_id, vec_id, c AS cosine_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
  FROM scored WHERE c IS NOT NULL
)
SELECT query_id, vec_id, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 5
"""


def m1_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: synthesize media, extract byte features via
    Arrow-batched mapInPandas.  The driver-facing projection is the
    integer-exact slice of the byte histogram (distinct values, mode count,
    byte sum) — the same histogram the entropy derives from — so the oracle
    hash-verifies the REAL extractor end-to-end; entropy itself is a float
    transcendental and stays pytest-verified (test_round6_fixes)."""
    media = multimodal.synthesize_media(load_table(spark, sf_dir, "documents"))
    return multimodal.extract_features(media).select(
        "media_id", "n_bytes", "distinct_bytes", "mode_count", "byte_sum",
        "head_hex",
    )


M1_SQL = """
WITH e AS (
  SELECT doc_id AS media_id, encode(text) AS d FROM documents
),
bytes AS (
  SELECT media_id,
         CAST('0x' || substr(hex(d), 2 * i - 1, 2) AS INTEGER) AS v
  FROM e, unnest(range(1, octet_length(d) + 1)) AS u(i)
),
hist AS (
  SELECT media_id, v, COUNT(*) AS c FROM bytes GROUP BY media_id, v
),
feat AS (
  SELECT media_id,
         COUNT(*)::INTEGER AS distinct_bytes,
         MAX(c)::INTEGER AS mode_count,
         SUM(v * c)::BIGINT AS byte_sum
  FROM hist GROUP BY media_id
)
SELECT e.media_id,
       octet_length(e.d)::BIGINT AS n_bytes,
       f.distinct_bytes, f.mode_count, f.byte_sum,
       lower(substr(hex(e.d), 1, 16)) AS head_hex
FROM e JOIN feat f ON e.media_id = f.media_id
"""


def m1b_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-verifiable slice of the multimodal feature path: the byte length
    and head-hex that ``extract_features`` computes inside mapInPandas ARE
    SQL-expressible, so this runs the real Arrow-batched extractor and
    joins its output back to the typed metadata — giving the m1 plumbing a
    DuckDB hash oracle (entropy stays rows-only in m1)."""
    media = multimodal.synthesize_media(load_table(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media).select("media_id", "n_bytes", "head_hex")
    return feats.join(
        media.select(
            "media_id", F.col("meta.width").alias("width"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
        "media_id",
    )


M1B_SQL = """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       lower(substr(hex(encode(text)), 1, 16)) AS head_hex,
       CAST(length(text) % 1920 AS INTEGER) AS width,
       CAST(length(text) * 10 AS BIGINT) AS duration_ms
FROM documents
"""


def m3_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL image decoder under the driver's hash gate: each document's
    first 24 printable-ASCII chars become the pixel payload of a 4×2 binary
    PPM built in-plan, ``decode_image_features`` decodes it inside
    mapInPandas (the same numpy P6 parser a real corpus would hit), and the
    oracle computes the expected channel means DIRECTLY from the text bytes
    — so dimensions and per-channel pixel means are hash-verified without
    the oracle ever touching an image."""
    doc = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[ -~]{24}")
    )
    content = F.concat(
        F.encode(F.lit("P6\n4 2\n255\n"), "utf-8"),
        F.encode(F.substring("text", 1, 24), "utf-8"),
    )
    media = doc.select(F.col("doc_id").alias("media_id"), content.alias("content"))
    return (
        multimodal.decode_image_features(media)
        .select("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
        .orderBy("media_id")
    )


def m4_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL audio decoder under the hash gate: each document's first 32
    printable chars become the 8-bit PCM payload of a canonical WAV built
    in-plan (constant 44-byte header via a binary literal),
    ``decode_audio_features`` walks the RIFF chunks and decodes inside
    mapInPandas, and the oracle recomputes the INTEGER-exact signal stats
    (energy, zero crossings, peak) directly from the text bytes — the
    decode path is hash-verified without the oracle parsing a WAV."""
    from .functions.multimodal import wav_header

    doc = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[ -~]{32}")
    )
    content = F.concat(
        F.lit(wav_header(n_samples=32, sample_rate=8000, bits=8)),
        F.encode(F.substring("text", 1, 32), "utf-8"),
    )
    media = doc.select(F.col("doc_id").alias("media_id"), content.alias("content"))
    return (
        multimodal.decode_audio_features(media)
        .select(
            "media_id", "sample_rate", "n_samples", "duration_ms",
            "sum_squares", "n_zero_crossings", "peak",
        )
        .orderBy("media_id")
    )


def m6_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame windowing under the hash gate: the same in-plan 8-bit
    WAV as m4, cut into 16-sample frames every 8 (the spectrogram hop
    pattern); per media the loudest frame's integer energy + index and the
    total energy are byte-arithmetic-replayable, so the decode->window
    chain is hash-verified end to end."""
    from .functions.multimodal import wav_header

    doc = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[ -~]{32}")
    )
    content = F.concat(
        F.lit(wav_header(n_samples=32, sample_rate=8000, bits=8)),
        F.encode(F.substring("text", 1, 32), "utf-8"),
    )
    media = doc.select(F.col("doc_id").alias("media_id"), content.alias("content"))
    return (
        multimodal.frame_audio_features(media, frame_samples=16, hop_samples=8)
        .select(
            "media_id", "n_frames", "max_frame_energy", "argmax_frame",
            "total_energy",
        )
        .orderBy("media_id")
    )


M6_SQL = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 32) AS s FROM documents
  WHERE regexp_matches(substr(text, 1, 32), '^[ -~]{32}$')
),
samp AS (
  SELECT doc_id, g.i AS i, CAST(ord(substr(d.s, g.i, 1)) - 128 AS BIGINT) AS v
  FROM d, generate_series(1, 32) g(i)
),
-- frame f covers samples [f*8 + 1, f*8 + 16]; starts < 32 -> f in 0..3
fr AS (
  SELECT doc_id, f.f AS f, SUM(v * v) AS e
  FROM samp, unnest([0, 1, 2, 3]) AS f(f)
  WHERE i > f.f * 8 AND i <= f.f * 8 + 16
  GROUP BY doc_id, f.f
),
best AS (
  SELECT doc_id, e AS max_frame_energy, f AS argmax_frame
  FROM (
    SELECT doc_id, f, e,
           row_number() OVER (PARTITION BY doc_id ORDER BY e DESC, f) AS rn
    FROM fr
  ) WHERE rn = 1
),
tot AS (SELECT doc_id, SUM(v * v) AS total_energy FROM samp GROUP BY doc_id)
SELECT d.doc_id AS media_id, 4 AS n_frames,
       b.max_frame_energy::BIGINT AS max_frame_energy,
       CAST(b.argmax_frame AS INTEGER) AS argmax_frame,
       t.total_energy::BIGINT AS total_energy
FROM d JOIN best b ON b.doc_id = d.doc_id JOIN tot t ON t.doc_id = d.doc_id
ORDER BY media_id
"""


def m7_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection under the hash gate: 32-byte payloads cut
    into four 8-byte frames by the REAL frame sampler, then per-media
    frame differencing in grouped applyInPandas (frames of one video meet
    in one task).  Every diff is an integer sum of absolute byte deltas,
    so the oracle replays cut selection and totals from the text bytes."""
    doc = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[ -~]{32}")
    )
    media = doc.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.substring("text", 1, 32), "utf-8").alias("content"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            F.lit(2000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    frames = multimodal.sample_frames(media, every_ms=500)  # 4 frames of 8B
    return multimodal.frame_differences(frames).orderBy("media_id")


M7_SQL = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 32) AS s FROM documents
  WHERE regexp_matches(substr(text, 1, 32), '^[ -~]{32}$')
),
-- frame f = bytes [f*8+1, f*8+8]; diff(f) vs frame f-1 over positions j in 1..8
diffs AS (
  SELECT doc_id, f.f AS f,
         SUM(abs(ord(substr(s, f.f * 8 + g.j, 1))
               - ord(substr(s, (f.f - 1) * 8 + g.j, 1)))) AS dsum
  FROM d, unnest([1, 2, 3]) AS f(f), generate_series(1, 8) g(j)
  GROUP BY doc_id, f.f
),
best AS (
  SELECT doc_id, dsum AS max_frame_diff, f AS cut_frame
  FROM (
    SELECT doc_id, f, dsum,
           row_number() OVER (PARTITION BY doc_id ORDER BY dsum DESC, f) AS rn
    FROM diffs
  ) WHERE rn = 1
),
tot AS (SELECT doc_id, SUM(dsum) AS total_frame_diff FROM diffs GROUP BY doc_id)
SELECT d.doc_id AS media_id, 4 AS n_frames,
       b.max_frame_diff::BIGINT AS max_frame_diff,
       CAST(b.cut_frame AS INTEGER) AS cut_frame,
       t.total_frame_diff::BIGINT AS total_frame_diff
FROM d JOIN best b ON b.doc_id = d.doc_id JOIN tot t ON t.doc_id = d.doc_id
ORDER BY media_id
"""


_M8_FRAME_SIZES = (10, 7, 15)  # 32 payload bytes total, odd size pads


def m8_video_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL AVI container walker under the hash gate: each document's
    first 32 printable chars become the payloads of three fixed-size
    ``00dc`` frames inside a canonical AVI built in-plan (with fixed frame
    sizes the container bytes around the payloads are one constant
    template, sliced once at import), ``video_container_stats`` walks the
    nested RIFF LISTs in mapInPandas, and the oracle replays the integer
    container stats — frame count/bytes/timing from the template,
    payload_byte_sum directly from the text bytes (the m4 contract:
    hash-verified without the oracle parsing an AVI)."""
    from .functions.multimodal import avi_container, parse_avi

    template = avi_container(
        [b"\x00" * n for n in _M8_FRAME_SIZES], width=4, height=2,
        us_per_frame=40_000,
    )
    _w, _h, _uspf, frame_index = parse_avi(template)
    pieces = []
    cursor, text_pos = 0, 1
    for off, size in frame_index:
        pieces.append(F.lit(template[cursor:off]))
        pieces.append(F.encode(F.substring("text", text_pos, size), "utf-8"))
        cursor, text_pos = off + size, text_pos + size
    pieces.append(F.lit(template[cursor:]))
    doc = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[ -~]{32}")
    )
    media = doc.select(
        F.col("doc_id").alias("media_id"), F.concat(*pieces).alias("content")
    )
    return (
        multimodal.video_container_stats(media)
        .select(
            "media_id", "width", "height", "n_frames", "total_frame_bytes",
            "max_frame_bytes", "payload_byte_sum", "duration_ms",
        )
        .orderBy("media_id")
    )


M8_SQL = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 32) AS s FROM documents
  WHERE regexp_matches(substr(text, 1, 32), '^[ -~]{32}$')
),
bs AS (
  SELECT doc_id, SUM(ord(substr(s, g.i, 1)))::BIGINT AS payload_byte_sum
  FROM d, generate_series(1, 32) g(i) GROUP BY doc_id
)
SELECT d.doc_id AS media_id,
       4 AS width, 2 AS height, 3::BIGINT AS n_frames,
       32::BIGINT AS total_frame_bytes, 15::BIGINT AS max_frame_bytes,
       bs.payload_byte_sum, 120::BIGINT AS duration_ms
FROM d JOIN bs ON bs.doc_id = d.doc_id
ORDER BY media_id
"""


M4_SQL = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 32) AS s FROM documents
  WHERE regexp_matches(substr(text, 1, 32), '^[ -~]{32}$')
),
smp AS (
  SELECT doc_id, g.i AS i, ord(substr(d.s, g.i, 1)) - 128 AS v
  FROM d, generate_series(1, 32) g(i)
),
feat AS (
  SELECT doc_id, SUM(v * v)::BIGINT AS sum_squares, MAX(abs(v))::INT AS peak
  FROM smp GROUP BY doc_id
),
zc AS (
  SELECT a.doc_id,
         SUM(CASE WHEN a.v * b.v < 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_crossings
  FROM smp a JOIN smp b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY a.doc_id
)
SELECT d.doc_id AS media_id, 8000::INT AS sample_rate, 32::BIGINT AS n_samples,
       4::BIGINT AS duration_ms, f.sum_squares, z.n_zero_crossings, f.peak
FROM d JOIN feat f ON d.doc_id = f.doc_id JOIN zc z ON d.doc_id = z.doc_id
ORDER BY media_id
"""


M3_SQL = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 24) AS s FROM documents
  WHERE regexp_matches(substr(text, 1, 24), '^[ -~]{24}$')
),
px AS (
  SELECT doc_id, g.i AS i, ord(substr(d.s, g.i, 1)) AS b
  FROM d, generate_series(1, 24) g(i)
)
SELECT doc_id AS media_id,
       4 AS width, 2 AS height,
       round(avg(CASE WHEN (i - 1) % 3 = 0 THEN b END), 6) AS mean_r,
       round(avg(CASE WHEN (i - 1) % 3 = 1 THEN b END), 6) AS mean_g,
       round(avg(CASE WHEN (i - 1) % 3 = 2 THEN b END), 6) AS mean_b
FROM px GROUP BY doc_id
ORDER BY media_id
"""


def m5_image_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> crop -> nearest-neighbor resize -> channel stats, the
    vision-preprocessing chain, under the hash gate: the same in-plan 4x2
    PPM as m3, cropped to its right 2x2 quadrant-pair and NN-resized to
    3x3.  NN resize is pure integer pixel SELECTION (src = floor(out_idx *
    in/out)), so each output channel mean is a fixed weighted sum of
    specific text bytes — the oracle computes those weights ([4,2;2,1]/9)
    directly from the string, never touching an image."""
    doc = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[ -~]{24}")
    )
    content = F.concat(
        F.encode(F.lit("P6\n4 2\n255\n"), "utf-8"),
        F.encode(F.substring("text", 1, 24), "utf-8"),
    )
    media = doc.select(F.col("doc_id").alias("media_id"), content.alias("content"))
    return (
        multimodal.transform_image_features(
            media, crop=(1, 0, 2, 2), out_w=3, out_h=3
        )
        .select("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
        .orderBy("media_id")
    )


M5_SQL = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 24) AS s FROM documents
  WHERE regexp_matches(substr(text, 1, 24), '^[ -~]{24}$')
),
-- source pixel (x, y) channel c lives at string position (y*4 + x)*3 + c + 1.
-- crop x0=1,y0=0,w=2,h=2 keeps (x,y) in {1,2}x{0,1}; NN 2x2 -> 3x3 maps
-- output cols/rows [0,1,2] to source [0,0,1], so cropped pixel (0,0) is
-- sampled 4x, (1,0) and (0,1) 2x, (1,1) 1x  ->  weights 4/2/2/1 over 9.
m AS (
  SELECT doc_id,
         ord(substr(s, (0*4 + 1)*3 + c + 1, 1)) * 4
       + ord(substr(s, (0*4 + 2)*3 + c + 1, 1)) * 2
       + ord(substr(s, (1*4 + 1)*3 + c + 1, 1)) * 2
       + ord(substr(s, (1*4 + 2)*3 + c + 1, 1)) * 1 AS wsum,
         c
  FROM d, unnest([0, 1, 2]) AS u(c)
)
SELECT doc_id AS media_id, 3 AS width, 3 AS height,
       round(MAX(CASE WHEN c = 0 THEN wsum END) / 9.0, 6) AS mean_r,
       round(MAX(CASE WHEN c = 1 THEN wsum END) / 9.0, 6) AS mean_g,
       round(MAX(CASE WHEN c = 2 THEN wsum END) / 9.0, 6) AS mean_b
FROM m GROUP BY doc_id
ORDER BY media_id
"""


def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame fan-out (one row per sampled frame), re-aggregated to per-media
    frame counts AND total sliced bytes — both replayable in SQL (slices
    are contiguous from byte 0, so total = least(len, n_frames*step)),
    which upgrades this from a rows-only check to a hash oracle over the
    real mapInPandas fan-out."""
    media = multimodal.synthesize_media(load_table(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(media, every_ms=500)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count("*").cast("long").alias("n_frames"),
            F.sum(F.length("frame_bytes")).cast("long").alias("total_bytes"),
        )
        .orderBy("media_id")
    )


M2_SQL = """
WITH b AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS nb,
         greatest((length(text) * 10) // 500, 1) AS n_frames
  FROM documents
)
SELECT media_id,
       n_frames::BIGINT AS n_frames,
       least(nb, n_frames * greatest(nb // n_frames, 1))::BIGINT AS total_bytes
FROM b
ORDER BY media_id
"""


def t7_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over a corpus seeded with deterministic doc_id-derived
    contact strings (the synthetic corpus carries no digits at all, so the
    regexes are exercised on synthesized-but-realistic payloads — the same
    trick as multimodal.synthesize_media).  Counts are taken pre-redaction;
    the redacted text itself is hash-verified too, proving replacement
    order and tags match across engines."""
    doc = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") * 7 % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") * 13 % 256).cast("string"),
        F.lit(" or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return doc.select(
        "doc_id",
        *[c.cast("long") for c in tx.pii_counts(pii_text)],
        tx.redact_pii(pii_text).alias("redacted"),
    )


_T7_TEXT = (
    "text || ' contact user' || doc_id::VARCHAR || '@example.com at 10.' || "
    "(doc_id % 256)::VARCHAR || '.' || (doc_id * 7 % 256)::VARCHAR || '.' || "
    "(doc_id * 13 % 256)::VARCHAR || ' or 555-' || "
    "lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' || "
    "lpad((doc_id % 10000)::VARCHAR, 4, '0')"
)
T7_SQL = f"""
WITH pii AS (SELECT doc_id, {_T7_TEXT} AS t FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{tx.PII_PATTERNS[0][1]}'))::BIGINT AS n_email,
       len(regexp_extract_all(t, '{tx.PII_PATTERNS[1][1]}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(t, '{tx.PII_PATTERNS[2][1]}'))::BIGINT AS n_phone,
       regexp_replace(regexp_replace(regexp_replace(t,
         '{tx.PII_PATTERNS[0][1]}', '[EMAIL]', 'g'),
         '{tx.PII_PATTERNS[1][1]}', '[IP]', 'g'),
         '{tx.PII_PATTERNS[2][1]}', '[PHONE]', 'g') AS redacted
FROM pii
"""


def t8_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by smoothed TF-IDF (corpus-level
    statistic: doc frequency + corpus size join back onto term counts)."""
    return tx.tfidf_top_terms(
        load_table(spark, sf_dir, "documents"), k=3
    ).select("doc_id", "term", "tfidf", F.col("rank").cast("int").alias("rank"))


T8_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_sql_tokens("lower(text)")}) AS term FROM documents
),
t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, COUNT(*) AS n FROM t GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(n) AS dl FROM tf GROUP BY 1),
dfq AS (SELECT term, COUNT(*) AS dft FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round((tf.n::DOUBLE / dl.dl::DOUBLE)
               * (ln((nd.n_docs + 1)::DOUBLE / (dfq.dft + 1)::DOUBLE) + 1.0),
               6) AS tfidf
  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term), nd
),
r AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 3
"""


def u1_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% sample of documents by doc_id hash — per-row
    stable across reruns/engines/batches (sampling.py rationale)."""
    return sampling.sample_by_hash(
        load_table(spark, sf_dir, "documents"), rate=0.25, key_col="doc_id"
    ).select("doc_id", "lang", "source", "n_chars")


U1_SQL = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_sql_md5_long("'s0' || doc_id::VARCHAR")} < {sampling._threshold(0.25)}
"""


def u2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates over events: keep all rare types (error/signup),
    thin the high-volume ones — the rate lookup is a map literal, the
    filter is one hash compare over the scan."""
    rates = {"click": 0.1, "view": 0.05, "purchase": 0.5}
    return sampling.stratified_sample(
        load_table(spark, sf_dir, "events"),
        strata_col="event_type",
        rates=rates,
        key_col="event_id",
        default_rate=1.0,
    ).select("event_id", "user_id", "event_type")


U2_SQL = f"""
SELECT event_id, user_id, event_type
FROM events
WHERE {_sql_md5_long("'s0' || event_id::VARCHAR")} <
  CASE event_type
    WHEN 'click' THEN {sampling._threshold(0.1)}
    WHEN 'purchase' THEN {sampling._threshold(0.5)}
    WHEN 'view' THEN {sampling._threshold(0.05)}
    ELSE {sampling._threshold(1.0)}
  END
"""


def u3_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment per doc_id —
    disjoint by construction, stable under appends (a row can never
    migrate between splits across runs)."""
    return sampling.hash_split(
        load_table(spark, sf_dir, "documents"),
        weights={"train": 0.8, "valid": 0.1, "test": 0.1},
        key_col="doc_id",
    ).select("doc_id", "split")


_U3_H = _sql_md5_long("'split' || doc_id::VARCHAR")
_U3_CASE = " ".join(
    f"WHEN {_U3_H} >= {lo} AND {_U3_H} < {hi} THEN '{label}'"
    for label, lo, hi in sampling.split_bounds(
        {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
)
U3_SQL = f"""
SELECT doc_id, CASE {_U3_CASE} ELSE NULL END AS split
FROM documents
"""


def u4_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic KMV distinct-count sketch: approx distinct users per
    event type at k=32.  Unlike HLL the estimate is engine-reproducible
    (md5 hashes + double arithmetic), so it gets a full hash oracle."""
    from .functions import sketches

    return sketches.kmv_distinct(
        load_table(spark, sf_dir, "events"),
        group_cols=["event_type"],
        value_col="user_id",
        k=32,
    ).orderBy("event_type")


U4_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type, {_sql_md5_long("user_id::VARCHAR")} AS h FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
),
agg AS (
  SELECT event_type, COUNT(*) AS n, MAX(CASE WHEN rn = 32 THEN h END) AS kth
  FROM r WHERE rn <= 32 GROUP BY event_type
)
SELECT event_type,
       CASE WHEN n < 32 THEN n::BIGINT
            ELSE CAST(round(31.0 * {float(1 << 60)!r} / kth) AS BIGINT)
       END AS approx_distinct
FROM agg ORDER BY event_type
"""


def u5_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixing: sample three source corpora to a 50/30/20
    output mix, budget-maximal, fully in-plan (counts broadcast back, the
    budget scalar rides as a 1-row frame, keep = one hash compare).  The
    oracle mirrors the double arithmetic (w·T/n · 2^60 floored) so the
    surviving row set is hash-verified, not just proportioned."""
    return (
        sampling.mixture_sample(
            load_table(spark, sf_dir, "documents"),
            source_col="source",
            weights={"src0": 0.5, "src1": 0.3, "src2": 0.2},
            key_col="doc_id",
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


U5_SQL = f"""
WITH w(source, w) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
base AS (
  SELECT doc_id, source FROM documents WHERE source IN ('src0', 'src1', 'src2')
),
cnt AS (SELECT source, COUNT(*)::DOUBLE AS n FROM base GROUP BY source),
j AS (SELECT c.source, c.n, w.w FROM cnt c JOIN w USING (source)),
t AS (SELECT MIN(n / w) AS T FROM j),
thr AS (
  SELECT j.source,
         CAST(floor(j.w * t.T / j.n * {float(1 << 60)!r}) AS BIGINT) AS thr
  FROM j, t
)
SELECT b.doc_id, b.source
FROM base b JOIN thr ON b.source = thr.source
WHERE {_sql_md5_long("'mix' || b.doc_id::VARCHAR")} < thr.thr
ORDER BY b.doc_id
"""


def u6_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: documents hash-scatter into 8
    independent streams and pack greedily to a 512-token budget via a
    per-shard cumsum window — n_shards-way parallel, no global sort.  The
    oracle replays the identical hash order and cumsum, so shard, pack
    membership, and intra-pack offsets are all hash-verified."""
    from .functions import layout

    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", tx.bpe_token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return (
        layout.pack_sequences(
            doc, key_col="doc_id", token_col="n_tokens", budget=512, n_shards=8
        )
        .select("doc_id", "n_tokens", "shard", "pack_id", "pack_offset")
        .orderBy("doc_id")
    )


U6_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{tx.BPE_TOKEN_RE}'))::BIGINT AS n_tokens,
         {_sql_md5_long("'pack' || doc_id::VARCHAR")} AS h
  FROM documents
),
s AS (SELECT doc_id, n_tokens, h, CAST(h % 8 AS INT) AS shard FROM t),
c AS (
  SELECT doc_id, n_tokens, shard, h,
         SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING
         ) AS cum
  FROM s
)
SELECT doc_id, n_tokens, shard,
       ((cum - n_tokens) // 512)::BIGINT AS pack_id,
       (cum - n_tokens - ((cum - n_tokens) // 512) * 512)::BIGINT AS pack_offset
FROM c ORDER BY doc_id
"""


def t10_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning WITHOUT the global-window trap: `ntile(10)` over the
    whole corpus is one reducer sorting 100 TB; instead the 9 exact decile
    boundaries come from ONE aggregate (1-row broadcast) and the bucket
    assignment is a map-side comparison against the boundary array.  Both
    engines compute linear-interpolated quantiles; boundaries round to 6 dp
    so the comparison set is bit-identical cross-engine."""
    doc = load_table(spark, sf_dir, "documents")
    q = doc.select("doc_id", tx.quality_score(F.col("text")).alias("quality"))
    ps = ", ".join(str(i / 10) for i in range(1, 10))
    bounds = q.agg(
        F.expr(f"transform(percentile(quality, array({ps})), x -> round(x, 6))").alias(
            "__bs"
        )
    )
    return (
        q.join(bounds)
        .select(
            "doc_id",
            "quality",
            (F.expr("1 + size(filter(__bs, b -> quality > b))")).cast("int").alias("decile"),
        )
        .orderBy("doc_id")
    )


T10_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len({_sql_tokens("text")})::BIGINT AS n_tokens,
         length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS n_nonspace,
         len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
         length(text)::BIGINT AS n_chars,
         {_sql_stopword_count("en")}::BIGINT AS n_stop
  FROM documents
),
q AS (
  SELECT doc_id,
         round(
           (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
           + least(round(n_stop / greatest(n_tokens, 1), 6) * 4, 0.3::DOUBLE)
           + 0.3::DOUBLE
           - least(round(n_punct / greatest(n_chars, 1), 6) * 2, 0.3::DOUBLE), 6
         ) AS quality
  FROM base
),
b AS (
  SELECT list_transform(
           quantile_cont(quality, [{", ".join(str(i / 10) for i in range(1, 10))}]),
           x -> round(x, 6)
         ) AS bs
  FROM q
)
SELECT doc_id, quality,
       (1 + len(list_filter(b.bs, x -> quality > x)))::INT AS decile
FROM q, b
ORDER BY doc_id
"""


def u9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus thinning: each doc survives with probability
    quality², decided by one map-side hash-vs-threshold compare — no
    shuffle, no state, append-stable membership.  The oracle replays the
    identical 60-bit hash and pow threshold."""
    doc = load_table(spark, sf_dir, "documents")
    scored = doc.select(
        "doc_id", "lang", tx.quality_score(F.col("text")).alias("quality")
    )
    return (
        sampling.weighted_sample(
            scored, weight_col="quality", key_col="doc_id", alpha=2.0, seed="w0"
        )
        .select("doc_id", "lang", "quality")
        .orderBy("doc_id")
    )


U9_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         len({_sql_tokens("text")})::BIGINT AS n_tokens,
         length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS n_nonspace,
         len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
         length(text)::BIGINT AS n_chars,
         {_sql_stopword_count("en")}::BIGINT AS n_stop
  FROM documents
),
q AS (
  SELECT doc_id, lang,
         round(
           (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
           + least(round(n_stop / greatest(n_tokens, 1), 6) * 4, 0.3::DOUBLE)
           + 0.3::DOUBLE
           - least(round(n_punct / greatest(n_chars, 1), 6) * 2, 0.3::DOUBLE), 6
         ) AS quality
  FROM base
)
SELECT doc_id, lang, quality
FROM q
WHERE {_sql_md5_long("('w0' || doc_id::VARCHAR)")} <
      CAST(floor(pow(least(greatest(quality, 0.0), 1.0), 2.0) * 1152921504606846976) AS BIGINT)
ORDER BY doc_id
"""


def u10_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted 50/30/20 source mixture: each source contributes its
    deterministic hash-ordered prefix of documents until its share of the
    largest feasible TOKEN budget is spent (real mixtures are specified in
    tokens, not rows).  The bucketed implementation windows only the one
    boundary bucket per source; the oracle replays the semantics as a
    global per-source window cumsum."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        tx.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return (
        sampling.mixture_sample_tokens(
            doc,
            source_col="source",
            weights={"src0": 0.5, "src1": 0.3, "src2": 0.2},
            token_col="n_tokens",
            key_col="doc_id",
        )
        .select("doc_id", "source", "n_tokens")
        .orderBy("doc_id")
    )


U10_SQL = f"""
WITH w(source, w) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
base AS (
  SELECT doc_id, source,
         len({_sql_tokens("text")})::BIGINT AS n_tokens,
         {_sql_md5_long("'mixt' || doc_id::VARCHAR")} AS h
  FROM documents WHERE source IN ('src0', 'src1', 'src2')
),
tot AS (SELECT source, SUM(n_tokens)::DOUBLE AS n FROM base GROUP BY source),
j AS (SELECT t.source, t.n, w.w FROM tot t JOIN w USING (source)),
tm AS (SELECT MIN(n / w) AS T FROM j),
bud AS (SELECT j.source, CAST(floor(j.w * tm.T) AS BIGINT) AS budget FROM j, tm),
r AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum
  FROM base
)
SELECT r.doc_id, r.source, r.n_tokens
FROM r JOIN bud USING (source)
WHERE r.cum <= bud.budget
ORDER BY doc_id
"""


def u11_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment: greedy packing of the corpus into
    ~5000-token shards in deterministic hash order.  The implementation
    computes exact global running totals with 1024 parallel bounded
    per-bucket windows; the oracle replays them as ONE global window."""
    from .functions import layout

    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", tx.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return (
        layout.token_balanced_shards(
            doc, token_col="n_tokens", key_col="doc_id", tokens_per_shard=5000
        )
        .select("doc_id", "n_tokens", "shard")
        .orderBy("doc_id")
    )


U11_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len({_sql_tokens("text")})::BIGINT AS n_tokens,
         {_sql_md5_long("'shard' || doc_id::VARCHAR")} AS h
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_prev
  FROM base
)
SELECT doc_id, n_tokens, CAST(floor(cum_prev / 5000) AS INT) AS shard
FROM r
ORDER BY doc_id
"""


def t11_char_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: per-document mean log-probability
    under the corpus's own add-one-smoothed char-trigram model.  The model
    vocabulary is charset³-bounded (broadcasts at ANY corpus size); the
    mean goes through 1e6-scaled integer sums so partial-sum order can't
    perturb the hash."""
    doc = load_table(spark, sf_dir, "documents")
    return tx.char_trigram_score(doc).orderBy("doc_id")


T11_SQL = """
WITH g AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(length(lower(text)) - 2, 1) + 1),
           i -> substr(lower(text), i, 3)
         )) AS gram
  FROM documents
),
counts AS (SELECT gram, COUNT(*)::BIGINT AS c FROM g GROUP BY gram),
tot AS (SELECT SUM(c)::BIGINT AS t, COUNT(*)::BIGINT AS v FROM counts),
model AS (
  SELECT gram, round(ln((c + 1)::DOUBLE / (t + v)), 6) AS lp
  FROM counts, tot
)
SELECT g.doc_id,
       COUNT(*)::BIGINT AS n_grams,
       round(SUM(CAST(round(m.lp * 1000000) AS BIGINT)) / (COUNT(*) * 1000000.0), 6)
         AS mean_logprob
FROM g JOIN model m ON g.gram = m.gram
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


def t12_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: fraction of a doc's distinct word-trigram
    shingles with corpus document-frequency 1 — the boilerplate/novel-prose
    axis.  One explode + doc-freq groupBy on 60-bit shingle hashes; no
    self-join."""
    doc = load_table(spark, sf_dir, "documents")
    return tx.ngram_novelty(doc).orderBy("doc_id")


T12_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
fr AS (SELECT h, COUNT(*)::BIGINT AS df FROM p GROUP BY h)
SELECT p.doc_id,
       COUNT(*)::BIGINT AS n_shingles,
       round(AVG(CASE WHEN fr.df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty
FROM p JOIN fr USING (h)
GROUP BY p.doc_id
ORDER BY p.doc_id
"""


def u8_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k deterministic sample PER GROUP — a uniform per-language
    holdout: rows ordered by a salted md5 of their id inside each language,
    first 10 kept.  Composition of the skew-safe grouped_topk with hash
    ordering: no global sort, no reservoir state, append-stable membership
    ranks (a new doc can only displace later ranks).  The oracle is the
    plain window over the identical hash."""
    doc = load_table(spark, sf_dir, "documents")
    scored = doc.select(
        "lang",
        "doc_id",
        tx.md5_long(F.concat(F.lit("g0"), F.col("doc_id").cast("string"))).alias("__h"),
    )
    return (
        curation.grouped_topk(
            scored,
            ["lang"],
            [F.col("__h").asc(), F.col("doc_id").asc()],
            10,
            salt_col="doc_id",
            n_salts=16,
        )
        .select("lang", "doc_id", F.col("rank").cast("int").alias("rank"))
        .orderBy("lang", "rank")
    )


U8_SQL = f"""
WITH h AS (
  SELECT lang, doc_id,
         {_sql_md5_long("('g0' || doc_id::VARCHAR)")} AS hh
  FROM documents
),
r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY hh ASC, doc_id ASC)::INT AS rank
  FROM h
)
SELECT lang, doc_id, rank FROM r WHERE rank <= 10
ORDER BY lang, rank
"""


def u7_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic: heaviest event types by share of rows (the number
    that says whether a shuffle on this key needs salting).  Distributed
    top-k (TakeOrderedAndProject), never a global sort of the key table."""
    from .functions import skew

    return skew.detect_hot_keys(
        load_table(spark, sf_dir, "events"), ["event_type"], top_n=5
    ).withColumn("rank", F.col("rank").cast("int"))


U7_SQL = """
WITH c AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_rows FROM events GROUP BY event_type
),
t AS (SELECT SUM(n_rows) AS total FROM c)
SELECT event_type, n_rows,
       round(n_rows / t.total, 6) AS share,
       row_number() OVER (ORDER BY n_rows DESC, event_type)::INT AS rank
FROM c, t
ORDER BY n_rows DESC, event_type
LIMIT 5
"""


def u7b_salted_join_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """salted_join equivalence gate on a DELIBERATELY skewed key: ~40% of
    event rows collapse onto key 0 (the hot-key shape that serializes one
    sort-merge task at scale), the join runs SALTED on (k, salt) with the
    dim replicated 8x, and the grouped result must hash-match the plain
    SQL join — salting must never change semantics, only task balance."""
    from .functions import skew

    ev = load_table(spark, sf_dir, "events")
    large = ev.select(
        F.when(F.pmod(F.col("user_id"), F.lit(5)) < 2, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("k"),
        "value",
    )
    dim = (
        large.select("k")
        .distinct()
        .withColumn("bucket", F.pmod(F.col("k"), F.lit(7)).cast("int"))
    )
    return (
        skew.salted_join(large, dim, ["k"], n_salts=8)
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("bucket")
    )


U7B_SQL = """
WITH large AS (
  SELECT (CASE WHEN user_id % 5 < 2 THEN 0 ELSE user_id END)::BIGINT AS k,
         value
  FROM events
),
dim AS (SELECT DISTINCT k, (k % 7)::INT AS bucket FROM large)
SELECT bucket, COUNT(*)::BIGINT AS n, round(SUM(value), 2) AS sum_value
FROM large JOIN dim USING (k)
GROUP BY bucket
ORDER BY bucket
"""


def u7c_two_phase_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """two_phase_agg equivalence gate for a high-cardinality-state agg:
    phase 1 collect_lists per (event_type, salt), phase 2 flattens the
    partials — row count from the CARRIED LISTS (proving no partial was
    lost) and the value sum must match the plain one-shot aggregation."""
    from .functions import skew

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return (
        skew.two_phase_agg(
            ev,
            ["event_type"],
            [F.collect_list("value").alias("pv")],
            [
                F.size(F.flatten(F.collect_list("pv")))
                .cast("long")
                .alias("n"),
                F.round(
                    F.aggregate(
                        F.flatten(F.collect_list("pv")),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    2,
                ).alias("sum_value"),
            ],
            n_salts=8,
        )
        .orderBy("event_type")
    )


U7C_SQL = """
SELECT event_type, COUNT(*)::BIGINT AS n, round(SUM(value), 2) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def t13_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style hard quality gates: word-count band, mean-word-length
    band, symbol-ratio cap, stopword floor, duplicate-bigram cap, and the
    combined keep verdict — one pure-Catalyst projection pass, verdicts
    computed on 6-dp-rounded metrics so they are bit-identical
    cross-engine."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id", *tx.gopher_quality_stats(F.col("text"))
    ).orderBy("doc_id")


T13_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len({_sql_tokens("text")})::BIGINT AS n_words,
         round(length(regexp_replace(text, '\\s', '', 'g'))
               / greatest(len({_sql_tokens("text")}), 1), 6) AS avg_word_len,
         round(len(regexp_extract_all(text, '[^\\w\\s]'))
               / greatest(length(text), 1), 6) AS symbol_ratio,
         {_sql_stopword_count("en")}::BIGINT AS n_stopwords,
         {_sql_tokens("lower(text)")} AS lt
  FROM documents
),
grams AS (
  SELECT *, list_transform(range(1, greatest(len(lt) - 2, 0) + 2),
                           i -> array_to_string(lt[i:i+1], ' ')) AS g
  FROM base
),
m AS (
  SELECT doc_id, n_words, avg_word_len, symbol_ratio, n_stopwords,
         round(1.0 - len(list_distinct(g))::DOUBLE / len(g)::DOUBLE, 6)
           AS rep_ratio
  FROM grams
)
SELECT doc_id, n_words, avg_word_len, symbol_ratio, n_stopwords, rep_ratio,
       CASE WHEN n_words BETWEEN 20 AND 400
             AND avg_word_len >= 3.0 AND avg_word_len <= 12.0
             AND symbol_ratio <= 0.1
             AND n_stopwords >= 2
             AND rep_ratio <= 0.6
       THEN 1 ELSE 0 END AS keep
FROM m
ORDER BY doc_id
"""


def t14_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-ngram linear quality classifier: uni+bi-grams
    hash into a 2^18-bucket feature space, each bucket carries a
    deterministic md5-derived weight in [-1, 1] (6-dp rational, summed as
    exact integers), score = mean weight.  Entirely map-side — the
    classifier adds ZERO shuffles to a curation pass; swap in trained
    weights via functions.text.apply_linear_classifier (broadcast join,
    parity-tested against this path)."""
    from .tables import ensure_parallelism

    # the testdata corpus is one row group -> one scan task; rebalance so
    # the per-gram hashing uses every core (no-op on multi-split tables)
    doc = ensure_parallelism(spark, load_table(spark, sf_dir, "documents"))
    return doc.select(
        "doc_id",
        *tx.hashed_linear_columns(F.col("text"), n_buckets=262144, seed="qcls"),
    ).orderBy("doc_id")


T14_SQL = f"""
WITH t AS (SELECT doc_id, {_sql_tokens("lower(text)")} AS tk FROM documents),
g AS (
  SELECT doc_id,
         tk || list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
                 i -> CASE WHEN tk[i+1] IS NULL THEN tk[i]
                           ELSE tk[i] || ' ' || tk[i+1] END) AS grams
  FROM t
),
s AS (
  SELECT doc_id,
         len(grams)::BIGINT AS n_features,
         list_sum(list_transform(grams,
           s -> (({_sql_md5_long("'qcls:' || s", 8)} % 262144) * 2654435761 + 12345)
                % 2000001 - 1000000))::BIGINT AS tot
  FROM g
)
SELECT doc_id, n_features,
       round(tot / (n_features * 1000000.0), 6) AS quality_logit,
       (round(tot / (n_features * 1000000.0), 6) >= 0) AS keep
FROM s
ORDER BY doc_id
"""


def g3_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution: how many near-dup clusters of
    each size exist — the audit a dedup pass publishes (a 10k-document
    cluster means template spam; a long tail of pairs means crawl echo).
    Composition of d9's connected components + two bounded groupBys."""
    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.12
    )
    clusters = dedup.connected_components(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .orderBy("cluster_size")
    )


G3_SQL = f"""
WITH RECURSIVE {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN p pa ON pa.doc_id = c.id_a
  JOIN p pb ON pb.doc_id = c.id_b AND pb.h = pa.h
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
prs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.12),
edges AS (
  SELECT id_a AS a, id_b AS b FROM prs
  UNION
  SELECT id_b, id_a FROM prs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
),
csizes AS (
  SELECT cluster_id, COUNT(*)::BIGINT AS cluster_size FROM labels GROUP BY cluster_id
)
SELECT cluster_size, COUNT(*)::BIGINT AS n_clusters
FROM csizes GROUP BY cluster_size ORDER BY cluster_size
"""


def u15_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-publish data-quality profile of the documents table: one agg
    pass computes per-column null/distinct/length metrics (multi-distinct
    via Catalyst expand), stack() reshapes wide->long map-side — the
    deequ-style health report a pipeline gates on before a batch ships."""
    from .functions.profiling import data_profile

    doc = load_table(spark, sf_dir, "documents")
    return data_profile(doc, ["doc_id", "lang", "source", "n_chars", "text"])


U15_SQL = """
WITH w AS (
  SELECT COUNT(*)::BIGINT AS n,
         SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu_doc_id,
         COUNT(DISTINCT doc_id)::BIGINT AS d_doc_id,
         SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu_lang,
         COUNT(DISTINCT lang)::BIGINT AS d_lang,
         COALESCE(MIN(length(lang)), 0)::BIGINT AS mn_lang,
         COALESCE(MAX(length(lang)), 0)::BIGINT AS mx_lang,
         SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu_source,
         COUNT(DISTINCT source)::BIGINT AS d_source,
         COALESCE(MIN(length(source)), 0)::BIGINT AS mn_source,
         COALESCE(MAX(length(source)), 0)::BIGINT AS mx_source,
         SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu_n_chars,
         COUNT(DISTINCT n_chars)::BIGINT AS d_n_chars,
         SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu_text,
         COUNT(DISTINCT text)::BIGINT AS d_text,
         COALESCE(MIN(length(text)), 0)::BIGINT AS mn_text,
         COALESCE(MAX(length(text)), 0)::BIGINT AS mx_text
  FROM documents
),
long AS (
  SELECT 'doc_id' AS column_name, 'n_rows' AS metric, n AS value FROM w
  UNION ALL SELECT 'doc_id', 'n_nulls', nu_doc_id FROM w
  UNION ALL SELECT 'doc_id', 'n_distinct', d_doc_id FROM w
  UNION ALL SELECT 'lang', 'n_rows', n FROM w
  UNION ALL SELECT 'lang', 'n_nulls', nu_lang FROM w
  UNION ALL SELECT 'lang', 'n_distinct', d_lang FROM w
  UNION ALL SELECT 'lang', 'min_len', mn_lang FROM w
  UNION ALL SELECT 'lang', 'max_len', mx_lang FROM w
  UNION ALL SELECT 'source', 'n_rows', n FROM w
  UNION ALL SELECT 'source', 'n_nulls', nu_source FROM w
  UNION ALL SELECT 'source', 'n_distinct', d_source FROM w
  UNION ALL SELECT 'source', 'min_len', mn_source FROM w
  UNION ALL SELECT 'source', 'max_len', mx_source FROM w
  UNION ALL SELECT 'n_chars', 'n_rows', n FROM w
  UNION ALL SELECT 'n_chars', 'n_nulls', nu_n_chars FROM w
  UNION ALL SELECT 'n_chars', 'n_distinct', d_n_chars FROM w
  UNION ALL SELECT 'text', 'n_rows', n FROM w
  UNION ALL SELECT 'text', 'n_nulls', nu_text FROM w
  UNION ALL SELECT 'text', 'n_distinct', d_text FROM w
  UNION ALL SELECT 'text', 'min_len', mn_text FROM w
  UNION ALL SELECT 'text', 'max_len', mx_text FROM w
)
SELECT column_name, metric, value FROM long ORDER BY column_name, metric
"""


def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup similarity graph (d6's MinHash-LSH pairs,
    symmetrized): rank concentrates on documents sitting in dense duplicate
    neighborhoods — a centrality signal for canonical-pick and crawl-seed
    weighting.  Fixed 5 iterations of EXACT integer arithmetic (scaled
    ranks, div contributions, integer damping), so the ITERATIVE result is
    hash-verified against a DuckDB replay with the iterations unrolled as
    chained CTEs."""
    from .functions.graph import pagerank

    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.12
    ).select("id_a", "id_b")
    edges = pairs.union(pairs.select(F.col("id_b"), F.col("id_a"))).toDF(
        "src", "dst"
    )
    return (
        pagerank(edges, iterations=5)
        .select(F.col("node").alias("doc_id"), "rank")
        .orderBy("doc_id")
    )


def _g1_sql() -> str:
    prev = "r0"
    iter_ctes = []
    joined_sep = ",\n"
    for i in range(1, 6):
        cur = f"r{i}"
        iter_ctes.append(
            f"""{cur} AS (
  SELECT n.node,
         (150000 + (85 * COALESCE(s.s, 0)) // 100)::BIGINT AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // d.deg)::BIGINT AS s
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg d ON e.src = d.src
    GROUP BY e.dst
  ) s ON n.node = s.node
)"""
        )
        prev = cur
    return f"""
WITH {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN p pa ON pa.doc_id = c.id_a
  JOIN p pb ON pb.doc_id = c.id_b AND pb.h = pa.h
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.12),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
deg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM deg),
r0 AS (SELECT node, 1000000::BIGINT AS rank FROM nodes),
{joined_sep.join(iter_ctes)}
SELECT node AS doc_id, rank FROM r5 ORDER BY doc_id
"""


G1_SQL = _g1_sql()


def g2_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the near-dup graph: per-document triangle
    membership over canonical (a<b) edges — the standard clustering-
    coefficient numerator, and the classic two-self-join graph benchmark.
    The ordered-edge formulation enumerates each triangle exactly once;
    both self-joins are equi-joins on node ids (no cross product)."""
    # materialize the pair list once: three self-joins would otherwise
    # re-run the whole LSH pipeline three times (6.6s -> ~2.5s at sf0.1).
    # localCheckpoint, NOT scoped_persist (round-11 A/B): the joins need
    # the PLAN truncation, not just block reuse — a persist keeps the
    # full LSH lineage and Catalyst re-optimizes it once per self-join
    # branch (measured 6.0s persist+eager-count vs 1.2s checkpoint at
    # sf0.1).  Chain-owned (round 12): the bare localCheckpoint leaked
    # one RDD per call until JVM GC; the blocks now free at the release
    # point after the caller's.
    from .functions.iterutils import CheckpointChain

    _chain = CheckpointChain(spark)
    pairs = _chain.next(
        dedup.minhash_lsh_pairs(
            load_table(spark, sf_dir, "documents"), threshold=0.12
        ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    _chain.defer_release(keep=pairs)
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    members = (
        tri.select(F.col("x").alias("doc_id"))
        .union(tri.select("y"))
        .union(tri.select("z"))
    )
    return (
        members.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_triangles"))
        .orderBy("doc_id")
    )


G2_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN p pa ON pa.doc_id = c.id_a
  JOIN p pb ON pb.doc_id = c.id_b AND pb.h = pa.h
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
e AS (SELECT id_a AS a, id_b AS b FROM scored WHERE jaccard >= 0.12),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
members AS (
  SELECT x AS doc_id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT doc_id, COUNT(*)::BIGINT AS n_triangles
FROM members GROUP BY doc_id ORDER BY doc_id
"""


def t15_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability: sentence/word/syllable-group counts (pure
    regexp_count — zero shuffle) and the reading-ease score over exact
    integer ratios, 6-dp rounded for the cross-engine hash.  The classic
    dictionary-free quality axis alongside Gopher gates and the hashed
    classifier."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id", *tx.readability_columns(F.col("text"))
    ).orderBy("doc_id")


T15_SQL = f"""
SELECT doc_id,
       greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS n_sentences,
       greatest(len({_sql_tokens("text")}), 1)::BIGINT AS n_words,
       greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)::BIGINT
         AS n_syllables,
       round(206.835
             - 1.015 * (greatest(len({_sql_tokens("text")}), 1)
                        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
             - 84.6 * (greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                       / greatest(len({_sql_tokens("text")}), 1)),
             6) AS reading_ease
FROM documents
ORDER BY doc_id
"""


def u12_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token chunks every 16): the
    long-document → training-example expansion.  Pure map-side array ops —
    zero shuffle, chunk membership a deterministic function of the text."""
    doc = load_table(spark, sf_dir, "documents")
    return layout.sliding_chunks(
        doc, chunk_tokens=32, stride=16
    ).orderBy("doc_id", "chunk_index")


U12_SQL = f"""
WITH t AS (SELECT doc_id, {_sql_tokens("text")} AS tk FROM documents),
s AS (
  SELECT doc_id, tk,
         unnest(range(0, greatest(len(tk) - 1, 0) + 1, 16)) AS start
  FROM t
)
SELECT doc_id,
       CAST(start // 16 AS INT) AS chunk_index,
       CAST(start AS INT) AS start,
       least(len(tk) - start, 32)::BIGINT AS n_tokens,
       array_to_string(tk[start+1:start+32], ' ') AS chunk_text
FROM s
ORDER BY doc_id, chunk_index
"""


def s8_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class centroids by element-wise mean-pooling: one (label, pos) row
    per dimension with the exact mean over every vector in the class.
    Means go through 1e6-scaled integer sums, so partition order can't
    perturb the hash; the shuffle moves ≤ n_labels×dim combined rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.label_centroids(emb).orderBy("label", "pos")


S8_SQL = """
WITH e AS (
  SELECT label,
         unnest(range(0, len(embedding))) AS pos,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT label, CAST(pos AS INT) AS pos, COUNT(*)::BIGINT AS n_vectors,
       round(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
             / (COUNT(*) * 1000000.0), 6) AS centroid_val
FROM e
GROUP BY label, pos
ORDER BY label, pos
"""


def r27_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the events.props JSON string with
    ``from_json`` (typed schema, not regex) and aggregate the extracted
    field per event type.  Parsing is a map-side projection; the agg is one
    partial-aggregated shuffle on event_type."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count("k").cast("long").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.sum(F.col("k").cast("long")) / F.count("k"), 6).alias(
                "avg_k"
            ),
        )
        .orderBy("event_type")
    )


R27_SQL = """
WITH p AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INT) AS k
  FROM events
)
SELECT event_type,
       COUNT(*)::BIGINT AS n_events,
       COUNT(k)::BIGINT AS n_with_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       round(CAST(SUM(CAST(k AS BIGINT)) AS DOUBLE) / COUNT(k), 6) AS avg_k
FROM p
GROUP BY event_type
ORDER BY event_type
"""


def d15_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal: every occurrence of any 3-word chunk
    appearing in more than 2 distinct documents is dropped, survivors
    reassembled in order.  Doc frequency is a two-level agg on the chunk
    digest; reassembly is byte-exact against the oracle."""
    doc = load_table(spark, sf_dir, "documents")
    return dedup.strip_frequent_chunks(
        doc, chunk_words=3, max_doc_freq=2
    ).orderBy("doc_id")


D15_SQL = f"""
WITH toks AS (SELECT doc_id, {_sql_tokens("text")} AS t FROM documents),
ch0 AS (
  SELECT doc_id, t, unnest(range(0, (len(t) + 2) // 3)) AS ci FROM toks
),
ch AS (
  SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
         array_to_string(t[ci*3+1 : ci*3+3], ' ') AS chunk
  FROM ch0
),
meta AS (SELECT doc_id, ((len(t) + 2) // 3)::BIGINT AS n_chunks FROM toks),
freq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM ch GROUP BY chunk),
kept AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_kept,
         array_to_string(list(chunk ORDER BY chunk_idx), ' ') AS clean_text
  FROM ch JOIN freq USING (chunk)
  WHERE df <= 2
  GROUP BY doc_id
)
SELECT m.doc_id, m.n_chunks,
       COALESCE(k.n_kept, 0)::BIGINT AS n_kept,
       COALESCE(k.clean_text, '') AS clean_text
FROM meta m LEFT JOIN kept k USING (doc_id)
ORDER BY m.doc_id
"""


def r28_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel analysis: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that click.  Each stage is a
    per-user min-timestamp aggregate joined forward — three hash
    aggregations + two equi-joins on user_id, no window over the raw
    event stream and no per-user sort."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    s1 = v.agg(F.count("*").alias("n_users")).select(
        F.lit("1_view").alias("stage"), "n_users"
    )
    s2 = c.agg(F.count("*").alias("n_users")).select(
        F.lit("2_click_after_view").alias("stage"), "n_users"
    )
    s3 = p.agg(F.count("*").alias("n_users")).select(
        F.lit("3_purchase_after_click").alias("stage"), "n_users"
    )
    return s1.union(s2).union(s3).orderBy("stage")


R28_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT '1_view' AS stage, COUNT(*)::BIGINT AS n_users FROM v
UNION ALL
SELECT '2_click_after_view', COUNT(*)::BIGINT FROM c
UNION ALL
SELECT '3_purchase_after_click', COUNT(*)::BIGINT FROM p
ORDER BY stage
"""


def r29_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join coverage: per-user high-value click stats against
    per-user purchase stats, users missing from either side kept with
    NULLs.  Both sides are pre-aggregated to user cardinality before the
    join, so the outer join moves #users rows, not #events."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter((F.col("event_type") == "click") & (F.col("value") > 450))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_big_clicks"),
            _spark_dsum(F.col("value"), "click_value"),
        )
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            _spark_dsum(F.col("value"), "purchase_value"),
        )
    )
    return clicks.join(purchases, "user_id", "full_outer").orderBy("user_id")


R29_SQL = f"""
WITH c AS (
  SELECT user_id, COUNT(*)::BIGINT AS n_big_clicks,
         {_dsum("value", "click_value")}
  FROM events WHERE event_type = 'click' AND value > 450
  GROUP BY user_id
),
p AS (
  SELECT user_id, COUNT(*)::BIGINT AS n_purchases,
         {_dsum("value", "purchase_value")}
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT user_id, n_big_clicks, click_value, n_purchases, purchase_value
FROM c FULL JOIN p USING (user_id)
ORDER BY user_id
"""


def r30_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window coverage: per-user inter-event gap statistics over the
    (ts, event_id)-ordered stream.  One shuffle on user_id shared by the
    window and the aggregate; gaps are exact µs longs, the mean divides
    exact longs so partition order can't perturb the hash."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    g = ev.select(
        "user_id",
        "ts",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    ).withColumn("gap", F.col("us") - F.lag("us").over(w))
    return (
        g.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count("gap").cast("long").alias("n_gaps"),
            # single IEEE division of exact longs — identical cross-engine;
            # round()ing a 1e10-magnitude double at 6 dp is NOT (the two
            # engines' round implementations pick different nearest doubles)
            (F.sum("gap").cast("double") / F.count("gap")).alias("avg_gap_us"),
            F.max("gap").alias("max_gap_us"),
        )
        .orderBy("user_id")
    )


R30_SQL = """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev
  FROM events
)
SELECT user_id, COUNT(*)::BIGINT AS n_events,
       COUNT(us - prev)::BIGINT AS n_gaps,
       CAST(SUM(us - prev) AS DOUBLE) / COUNT(us - prev) AS avg_gap_us,
       MAX(us - prev)::BIGINT AS max_gap_us
FROM s
GROUP BY user_id
ORDER BY user_id
"""


def s9_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between class centroids (label confusion geometry).
    Composes label_centroids, then self-joins the FLAT (label, pos, value)
    rows on pos — n_labels²·dim pair terms, all integer arithmetic on
    1e6-scaled centroid values until the final sqrt, so the hash is
    engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.label_centroids(emb)
    scaled = cents.select(
        "label",
        "pos",
        F.round(F.col("centroid_val") * 1_000_000).cast("long").alias("sv"),
    )
    a, b = scaled.alias("a"), scaled.alias("b")
    return (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.sum(F.col("a.sv") * F.col("b.sv")).alias("dp"),
            F.sum(F.col("a.sv") * F.col("a.sv")).alias("na"),
            F.sum(F.col("b.sv") * F.col("b.sv")).alias("nb"),
        )
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dp")
                / F.sqrt(
                    F.col("na").cast("double") * F.col("nb").cast("double")
                ),
                6,
            ).alias("cosine_sim"),
        )
        .orderBy("label_a", "label_b")
    )


S9_SQL = """
WITH e AS (
  SELECT label,
         unnest(range(0, len(embedding))) AS pos,
         unnest(embedding) AS v
  FROM embeddings
),
c AS (
  SELECT label, pos,
         round(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
               / (COUNT(*) * 1000000.0), 6) AS cv
  FROM e GROUP BY label, pos
),
s AS (SELECT label, pos, CAST(round(cv * 1000000) AS BIGINT) AS sv FROM c)
SELECT a.label AS label_a, b.label AS label_b,
       round(SUM(a.sv * b.sv)
             / sqrt(CAST(SUM(a.sv * a.sv) AS DOUBLE)
                    * CAST(SUM(b.sv * b.sv) AS DOUBLE)), 6) AS cosine_sim
FROM s a JOIN s b ON a.pos = b.pos AND a.label < b.label
GROUP BY a.label, b.label
ORDER BY label_a, label_b
"""


def s11_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval: score every vector by cosine to the GLOBAL
    corpus centroid (scaled-integer arithmetic end-to-end, like s8/s9),
    then take a cluster-interleaved top-12 — the answer spans every label
    before any label repeats, the bucketed-diversity alternative to
    sequential greedy MMR.  One explode + pos-join for scoring, one
    label-keyed window, one TakeOrdered — no global sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    sc = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.round(F.col("v").cast("double") * 1_000_000).cast("long").alias("sv"),
    )
    cent = sc.groupBy("pos").agg(
        F.round(F.sum("sv") / (F.count("*") * 1_000_000.0), 6).alias("cv")
    ).select(
        "pos", F.round(F.col("cv") * 1_000_000).cast("long").alias("csv")
    )
    # every vector spans every pos, so the per-vec sum of csv^2 IS the
    # centroid norm — folding it into the same agg avoids a scalar join
    scored = (
        sc.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("sv") * F.col("csv")).alias("dp"),
            F.sum(F.col("sv") * F.col("sv")).alias("na"),
            F.sum(F.col("csv") * F.col("csv")).alias("nb"),
        )
        .select(
            "vec_id",
            "label",
            F.round(
                F.col("dp")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("score"),
        )
    )
    return similarity.diversified_topk(
        scored, group_col="label", score_col="score", id_col="vec_id", k=12
    ).orderBy("final_rank")


S11_SQL = """
WITH sc AS (
  SELECT vec_id, label,
         unnest(range(0, len(embedding))) AS pos,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS sv
  FROM embeddings
),
c AS (
  SELECT pos,
         CAST(round(round(SUM(sv) / (COUNT(*) * 1000000.0), 6) * 1000000)
              AS BIGINT) AS csv
  FROM sc GROUP BY pos
),
nb AS (SELECT SUM(csv * csv)::BIGINT AS nb FROM c),
scored AS (
  SELECT s.vec_id, MIN(s.label) AS label,
         round(SUM(s.sv * c.csv)
               / sqrt(CAST(SUM(s.sv * s.sv) AS DOUBLE) * CAST(MIN(nb.nb) AS DOUBLE)),
               6) AS score
  FROM sc s JOIN c ON s.pos = c.pos, nb
  GROUP BY s.vec_id
),
ranked AS (
  SELECT vec_id, label, score,
         row_number() OVER (PARTITION BY label ORDER BY score DESC, vec_id)::BIGINT
           AS cluster_rank
  FROM scored
)
SELECT vec_id, label, score, cluster_rank,
       row_number() OVER (ORDER BY cluster_rank, score DESC, vec_id)::BIGINT
         AS final_rank
FROM ranked
ORDER BY cluster_rank, score DESC, vec_id
LIMIT 12
"""


def u13_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles WITHOUT a global sort: one map-side binning pass (fixed
    width) feeds a bounded-cardinality histogram; the cumulative scan and
    total run as windows over the BIN TABLE (≤ #bins rows, not the
    corpus), and each quantile is the first bin whose cumulative count
    crosses q·N.  Bounded error (one bin width) at any corpus size — the
    scale path where exact percentile_cont would global-sort 100 TB.  The
    quantile probes ride as an exploded literal array (no cross join, no
    NLJ node)."""
    o = load_table(spark, sf_dir, "orders")
    width = 10_000
    hist = (
        o.select(
            F.floor(F.col("o_totalprice") / width).cast("long").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy()
    cum = hist.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "total", F.sum("n").over(w_tot)
    )
    probes = F.array(*[F.lit(q) for q in (0.25, 0.5, 0.75, 0.9)])
    return (
        cum.select("*", F.explode(probes).alias("q"))
        .filter(F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy("q")
        .agg(
            F.min("total").alias("n_total"),
            F.min("bin").alias("bin"),
            (F.min("bin") * float(width)).alias("est_quantile"),
        )
        .orderBy("q")
    )


U13_SQL = """
WITH h AS (
  SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bin,
         COUNT(*)::BIGINT AS n
  FROM orders GROUP BY 1
),
c AS (
  SELECT bin, n,
         SUM(n) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::BIGINT AS cum,
         SUM(n) OVER ()::BIGINT AS total
  FROM h
),
e AS (SELECT c.*, unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE, 0.9::DOUBLE]) AS q FROM c)
SELECT q, MIN(total)::BIGINT AS n_total, MIN(bin)::BIGINT AS bin,
       CAST(MIN(bin) * 10000 AS DOUBLE) AS est_quantile
FROM e WHERE cum >= q * total
GROUP BY q
ORDER BY q
"""


def u14_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual rebalancing (XLM-R/mT5 recipe):
    each language's output share ∝ sqrt(count), total budget 50% of the
    corpus — head languages thin, tail languages keep everything (rate
    clamps at 1).  Counts groupBy + broadcast thresholds + one hash
    compare per row; sqrt weights go through exact integer micro-units so
    the surviving row SET is hash-verified cross-engine."""
    doc = load_table(spark, sf_dir, "documents")
    return (
        sampling.temperature_sample(
            doc, group_col="lang", key_col="doc_id", alpha=0.5, total_frac=0.5
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


U14_SQL = f"""
WITH cnt AS (SELECT lang, COUNT(*)::DOUBLE AS n FROM documents GROUP BY lang),
q AS (SELECT lang, n, CAST(round(sqrt(n) * 1000000.0) AS BIGINT) AS qi FROM cnt),
tot AS (SELECT SUM(qi)::BIGINT AS Q, SUM(n)::DOUBLE AS N FROM q),
thr AS (
  SELECT q.lang,
         CAST(floor(least(1.0, 0.5 * t.N * q.qi / t.Q / q.n)
                    * {float(1 << 60)!r}) AS BIGINT) AS thr
  FROM q, tot t
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr ON d.lang = thr.lang
WHERE {_sql_md5_long("'temp' || d.doc_id::VARCHAR")} < thr.thr
ORDER BY d.doc_id
"""


def r31_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by their first-activity week, counted
    distinct per week offset since the cohort week.  One per-user min-ts
    agg broadcast-joined back (user cardinality), then one distinct-count
    shuffle on (cohort, offset) — never a window over raw events."""
    ev = load_table(spark, sf_dir, "events")
    # cast to DATE: Spark's date_trunc yields midnight TIMESTAMP, DuckDB's
    # yields DATE — the date is the portable common type
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


R31_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
         AS week_offset,
       COUNT(DISTINCT e.user_id)::BIGINT AS n_users
FROM events e JOIN first f USING (user_id)
GROUP BY f.cohort_week, week_offset
ORDER BY f.cohort_week, week_offset
"""


def s10_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: per query, the most similar DIFFERENT-label
    vectors from its sign-sketch bucket — the banded (equi-join) shape, so
    the corpus streams once with no nested-loop node."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return similarity.hard_negatives(
        emb, queries, dim=64, k=5, n_planes=4
    ).orderBy("query_id", "rank")


S10_SQL = f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
vb AS (SELECT vec_id, label, e, {_sql_sketch("e")} AS bucket FROM v),
q AS (
  SELECT vec_id AS query_id, label AS qlabel, e AS qe, bucket
  FROM vb WHERE vec_id < 8
),
s AS (
  SELECT query_id, vec_id, vb.label, round({_SQL_COSINE}, 6) AS c
  FROM q JOIN vb ON q.bucket = vb.bucket
   AND vb.vec_id <> q.query_id AND vb.label <> q.qlabel
),
r AS (
  SELECT query_id, vec_id, label, c AS cosine_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, label, cosine_sim, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 5
ORDER BY query_id, rank
"""


def r32_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType coverage: parse props as MAP<STRING,INT> and explode its
    entries — the generic path for open-schema JSON payloads where keys
    aren't known up front (r27 is the typed-struct counterpart).  Parse +
    explode are map-side; one partial-agged shuffle on (key, event_type)."""
    ev = load_table(spark, sf_dir, "events")
    entries = ev.select(
        "event_type",
        F.explode(F.from_json("props", "map<string,int>")).alias("key", "val"),
    )
    return (
        entries.groupBy("key", "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("val").cast("long")).alias("sum_val"),
        )
        .orderBy("key", "event_type")
    )


R32_SQL = """
WITH p AS (
  SELECT event_type, 'k' AS key,
         TRY_CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INT) AS val
  FROM events
  WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
)
SELECT key, event_type, COUNT(*)::BIGINT AS n,
       SUM(CAST(val AS BIGINT))::BIGINT AS sum_val
FROM p
GROUP BY key, event_type
ORDER BY key, event_type
"""


def r33_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via ``stack``: melt the per-user event-count
    matrix back to (user_id, event_type, n) rows and keep the non-zero
    cells.  stack() is a map-side expression — the wide→long reshape adds
    no shuffle beyond the pivot that built the matrix."""
    types = ["click", "error", "purchase", "signup", "view"]
    wide = r22_pivot_event_counts(spark, sf_dir)
    stack_expr = ", ".join(f"'{t}', n_{t}" for t in types)
    return (
        wide.select(
            "user_id",
            F.expr(
                f"stack({len(types)}, {stack_expr}) AS (event_type, n)"
            ),
        )
        .filter(F.col("n") > 0)
        .orderBy("user_id", "event_type")
    )


R33_SQL = """
SELECT user_id, event_type, COUNT(*)::BIGINT AS n
FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


def r35_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (the remaining GROUPING SETS variant next to the
    ROLLUP and explicit-sets entries): event revenue across ALL subsets of
    (event_type, source-lang of nothing — use events alone: type x hour
    bucket), with grouping_id to disambiguate NULL group values from NULL
    data.  One EXPAND + hash agg, the canonical Catalyst plan."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        "value",
    )
    return (
        base.cube("event_type", "hr")
        .agg(
            F.count("*").cast("long").alias("n"),
            _spark_dsum(F.col("value"), "revenue"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


R35_SQL = f"""
SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr, COUNT(*)::BIGINT AS n,
       {_dsum("value", "revenue")},
       CAST(GROUPING(event_type, hour(ts)) AS INTEGER) AS gid
FROM events
GROUP BY CUBE (event_type, hour(ts))
"""


def r34_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding click — the standard marketing-analytics join of a
    conversion stream onto its touchpoint stream.  One per-user window
    (keyed, ROWS unbounded-to-current, ignore-nulls last) carries the
    click timestamp forward; per-user aggregates stay hash-exact via the
    scaled-integer double sum and microsecond-exact latencies
    (unix_micros vs DuckDB epoch_us — both exact bigints, no float
    seconds truncation mismatch)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.withColumn(
        "last_click_ts",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    att = F.col("last_click_ts").isNotNull()
    return (
        flagged.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum(att.cast("long")).cast("long").alias("n_attributed"),
            _spark_dsum(
                F.when(att, F.col("value")).otherwise(F.lit(0.0)),
                "attributed_value",
            ),
            F.sum(
                F.when(
                    att,
                    F.unix_micros(F.col("ts"))
                    - F.unix_micros(F.col("last_click_ts")),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("latency_us_total"),
        )
        .orderBy("user_id")
    )


R34_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_type, ts, value, event_id,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_click_ts
  FROM events
)
SELECT user_id,
       COUNT(*)::BIGINT AS n_purchases,
       SUM(CASE WHEN last_click_ts IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_attributed,
       {_dsum("CASE WHEN last_click_ts IS NOT NULL THEN value ELSE 0.0 END",
              "attributed_value")},
       SUM(CASE WHEN last_click_ts IS NOT NULL
                THEN epoch_us(ts) - epoch_us(last_click_ts) ELSE 0 END)::BIGINT
         AS latency_us_total
FROM flagged
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY user_id
"""


_T16_TERMS = ["join", "hash", "vector", "stream"]


def t16_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval ranking: top-20 documents for a fixed query-term
    set (the classic lexical ranker over the corpus the engine curates).
    Float math but hash-verifiable: integer-exact inputs, fixed-order
    term addition, exact (sum_dl, n_docs) instead of a float avgdl — see
    text.bm25_topk."""
    return tx.bm25_topk(
        load_table(spark, sf_dir, "documents"), _T16_TERMS, k=20
    )


def _t16_sql(k1: float = 1.2, b: float = 0.75) -> str:
    tf_cols = ",\n         ".join(
        f"SUM(CASE WHEN term = '{t}' THEN 1 ELSE 0 END)::BIGINT AS tf_{i}"
        for i, t in enumerate(_T16_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{i}"
        for i in range(len(_T16_TERMS))
    )
    rel = (
        "(CAST(b.dl AS DOUBLE) * CAST(s.n_docs AS DOUBLE) "
        "/ CAST(s.sum_dl AS DOUBLE))"
    )
    # mirror the Spark float expression EXACTLY: same literals (repr of
    # the same Python doubles), same left-associated addition order
    parts = []
    for i in range(len(_T16_TERMS)):
        idf = (
            f"ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(s.df_{i} AS DOUBLE)"
            f" + 0.5) / (CAST(s.df_{i} AS DOUBLE) + 0.5))"
        )
        tfn = (
            f"CAST(b.tf_{i} AS DOUBLE) * {k1 + 1.0!r} /"
            f" (CAST(b.tf_{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r}"
            f" * {rel}))"
        )
        parts.append(f"{idf} * ({tfn})")
    score = "0.0\n           + " + "\n           + ".join(parts)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_sql_tokens("lower(text)")}) AS term FROM documents
),
tt AS (SELECT doc_id, term FROM toks WHERE term <> ''),
base AS (
  SELECT doc_id, COUNT(*)::BIGINT AS dl,
         {tf_cols}
  FROM tt GROUP BY doc_id
),
stats AS (
  SELECT SUM(dl)::BIGINT AS sum_dl, COUNT(*)::BIGINT AS n_docs, {df_cols}
  FROM base
),
scored AS (
  SELECT b.doc_id,
         round({score}, 6) AS score
  FROM base b, stats s
),
topk AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
FROM topk
"""


T16_SQL = _t16_sql()


def t17_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-pair PMI lift over document co-occurrence (topic-pair mining /
    query expansion).  Integer-exact lift_ppm — floor-divided bigints —
    so the ranking hash-matches any engine; vocabulary bounded at 32
    terms by doc-freq before the per-doc pair join (text.term_pmi)."""
    return tx.term_pmi(
        load_table(spark, sf_dir, "documents"), max_vocab=32, min_pair_count=5
    ).orderBy("term_a", "term_b")


T17_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_sql_tokens("lower(text)")})) AS term
  FROM documents
),
dt AS (SELECT doc_id AS doc, term FROM toks WHERE term <> ''),
dfreq AS (SELECT term, COUNT(*)::BIGINT AS c FROM dt GROUP BY term),
vocab AS (SELECT term, c FROM dfreq ORDER BY c DESC, term ASC LIMIT 32),
nd AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents),
dv AS (SELECT dt.doc, dt.term, v.c FROM dt JOIN vocab v USING (term)),
pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, a.c AS c_a, b.c AS c_b,
         COUNT(*)::BIGINT AS c_ab
  FROM dv a JOIN dv b ON a.doc = b.doc AND a.term < b.term
  GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) >= 5
)
SELECT term_a, term_b, c_ab, c_a, c_b,
       ((c_ab * n_docs * 1000000) // (c_a * c_b))::BIGINT AS lift_ppm
FROM pairs, nd
ORDER BY term_a, term_b
"""


def t18_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: top-15 stopword-delimited phrases by the
    classic degree/frequency word score — integer-exact (floor-scaled
    word scores, summed as bigints) so the extraction hash-matches the
    DuckDB replay.  See text.rake_keywords for the plan shape."""
    return tx.rake_keywords(load_table(spark, sf_dir, "documents"), k=15)


def _t18_sql(k: int = 15) -> str:
    stops = ", ".join(f"'{w}'" for w in tx.STOPWORDS["en"])
    return f"""
WITH d AS (
  SELECT doc_id AS doc, {_sql_tokens("lower(text)")} AS a FROM documents
),
toks AS (
  SELECT doc, u.i - 1 AS pos, a[u.i] AS word,
         (a[u.i] IN ({stops}) OR a[u.i] = '') AS stop
  FROM d, unnest(range(1, len(a) + 1)) AS u(i)
),
pw AS (
  SELECT doc, pos, word,
         SUM(CASE WHEN stop THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
  FROM toks
  QUALIFY NOT stop
),
phrases AS (
  SELECT doc, phrase_id, COUNT(*)::BIGINT AS plen,
         string_agg(word, ' ' ORDER BY pos) AS phrase
  FROM pw GROUP BY doc, phrase_id
),
word_scores AS (
  SELECT word, ((SUM(plen) * 1000000) // COUNT(*))::BIGINT AS wscore
  FROM pw JOIN phrases USING (doc, phrase_id)
  GROUP BY word
),
phrase_scores AS (
  SELECT doc, phrase_id, SUM(wscore)::BIGINT AS score_ppm
  FROM pw JOIN word_scores USING (word)
  GROUP BY doc, phrase_id
)
SELECT phrase, MAX(plen)::BIGINT AS n_words, COUNT(*)::BIGINT AS n_occurrences,
       MAX(score_ppm)::BIGINT AS score_ppm
FROM phrases JOIN phrase_scores USING (doc, phrase_id)
GROUP BY phrase
ORDER BY score_ppm DESC, phrase ASC
LIMIT {k}
"""


T18_SQL = _t18_sql()


def g4_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection via synchronous label propagation over the
    near-dup similarity graph (same LSH edges as g1/g2) — 3 rounds of
    mode-with-min-tiebreak label adoption, fully deterministic, so the
    ITERATIVE result is hash-verified against an unrolled-CTE replay
    (the g1 contract applied to LPA)."""
    from .functions.graph import label_propagation

    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.12
    ).select("id_a", "id_b")
    edges = pairs.union(pairs.select(F.col("id_b"), F.col("id_a"))).toDF(
        "src", "dst"
    )
    return (
        label_propagation(edges, iterations=3)
        .select(F.col("node").alias("doc_id"), F.col("label").alias("community"))
        .orderBy("doc_id")
    )


def _g4_sql(iterations: int = 3) -> str:
    prev = "l0"
    ctes = []
    for i in range(1, iterations + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS node, l.label, COUNT(*) AS c
  FROM edges e JOIN {prev} l ON e.src = l.node
  GROUP BY 1, 2
),
p{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
),
l{i} AS (
  SELECT l.node, coalesce(p.label, l.label)::BIGINT AS label
  FROM {prev} l LEFT JOIN p{i} p ON l.node = p.node
)"""
        )
        prev = f"l{i}"
    joined = ",\n".join(ctes)
    return f"""
WITH {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN p pa ON pa.doc_id = c.id_a
  JOIN p pb ON pb.doc_id = c.id_b AND pb.h = pa.h
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.12),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
l0 AS (SELECT DISTINCT src AS node, src::BIGINT AS label FROM edges),
{joined}
SELECT node AS doc_id, label AS community FROM l{iterations} ORDER BY doc_id
"""


G4_SQL = _g4_sql()


def g5_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance over the near-dup similarity graph
    (same LSH edges as g1/g2/g4): seeds are every 7th graph node — a
    stand-in for a labeled/trusted set — and each reached document gets
    its MIN hop count within 3 hops (contamination-radius /
    influence-neighborhood analysis).  Frontier-based (per-round join cost
    tracks the frontier, not the reached set); hop counts are exact
    integers, so the iterative result is hash-verified against an unrolled
    min-relaxation CTE chain (the g1 contract applied to BFS)."""
    from .functions.graph import bfs_distances

    docs = load_table(spark, sf_dir, "documents")
    # materialize the LSH pair list ONCE (the g2 pattern): `seeds` is a
    # separate action root from the edge checkpoint bfs_distances takes
    # internally, so an unmaterialized plan re-ran the whole LSH verify
    # for the seed set (exchange reuse only spans a single execution) —
    # round-12 profile: 42 -> 35 jobs / 82 -> 66 stages.  Chain-owned
    # blocks free at the release point after the caller's.
    from .functions.iterutils import CheckpointChain

    _chain = CheckpointChain(spark)
    pairs = _chain.next(
        dedup.minhash_lsh_pairs(docs, threshold=0.12).select("id_a", "id_b")
    )
    _chain.defer_release(keep=pairs)
    edges = pairs.union(pairs.select(F.col("id_b"), F.col("id_a"))).toDF(
        "src", "dst"
    )
    seeds = edges.select(F.col("src").alias("node")).filter(
        F.col("node") % 7 == 0
    )
    return (
        bfs_distances(edges, seeds, max_hops=3)
        .select(F.col("node").alias("doc_id"), F.col("dist").alias("hops"))
        .orderBy("doc_id")
    )


def _g5_sql(max_hops: int = 3) -> str:
    prev = "d0"
    ctes = []
    for i in range(1, max_hops + 1):
        ctes.append(
            f"""d{i} AS (
  SELECT node, MIN(hops)::BIGINT AS hops FROM (
    SELECT node, hops FROM {prev}
    UNION ALL
    SELECT e.dst AS node, d.hops + 1 AS hops
    FROM edges e JOIN {prev} d ON e.src = d.node
  ) GROUP BY node
)"""
        )
        prev = f"d{i}"
    joined = ",\n".join(ctes)
    return f"""
WITH {_SQL_SHINGLE_CTE},
{_SQL_H32_CTE},
sigs AS (SELECT doc_id, {_SQL_MINHASH_MINS} FROM sh32 GROUP BY doc_id),
bands AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN p pa ON pa.doc_id = c.id_a
  JOIN p pb ON pb.doc_id = c.id_b AND pb.h = pa.h
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b, round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
pairs AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.12),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
d0 AS (
  SELECT DISTINCT src AS node, 0::BIGINT AS hops
  FROM edges WHERE src % 7 = 0
),
{joined}
SELECT node AS doc_id, hops FROM d{max_hops} ORDER BY doc_id
"""


G5_SQL = _g5_sql()


# --------------------------------------------------------------------------
# Funnel / gap-fill / count-min sketch (r36, r37, u18)
# --------------------------------------------------------------------------

_R36_STEPS = ["signup", "view", "click", "purchase"]
_R36_WINDOW_US = 72 * 3600 * 1_000_000  # funnel must complete within 72h


def r36_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (the ClickHouse ``windowFunnel`` shape):
    per user, how far through signup → view → click → purchase did they
    get, each step STRICTLY after the previous and within 72h of the
    anchor (the user's FIRST signup — anchored semantics, so the greedy
    earliest-match walk equals the SQL min-chain oracle exactly).

    Plan: ONE shuffle — groupBy(user) collects the user's step events as a
    sorted (us, type) array, then a single ``F.aggregate`` lambda walks it
    carrying (stage, t1..t4); per-user event counts bound the array, so
    this scales as a plain keyed aggregation (no self-joins — the naive
    k-step funnel is k-1 joins of events against itself).  Latencies are
    integer microseconds (unix_micros ↔ epoch_us), hash-exact."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type").isin(_R36_STEPS))
        .select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("us"),
            "event_type",
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("us", "event_type"))).alias("evs"))
    )

    def _st(stage, t1, t2, t3, t4):
        return F.struct(
            stage.alias("stage"),
            t1.alias("t1"),
            t2.alias("t2"),
            t3.alias("t3"),
            t4.alias("t4"),
        )

    zero_t = F.lit(0).cast("long")
    zero = _st(F.lit(0), zero_t, zero_t, zero_t, zero_t)
    w_us = F.lit(_R36_WINDOW_US)

    def walk(acc, e):
        in_w = e["us"] <= acc["t1"] + w_us
        return (
            F.when(
                (acc["stage"] == 0) & (e["event_type"] == _R36_STEPS[0]),
                _st(F.lit(1), e["us"], acc["t2"], acc["t3"], acc["t4"]),
            )
            .when(
                (acc["stage"] == 1)
                & (e["event_type"] == _R36_STEPS[1])
                & (e["us"] > acc["t1"])
                & in_w,
                _st(F.lit(2), acc["t1"], e["us"], acc["t3"], acc["t4"]),
            )
            .when(
                (acc["stage"] == 2)
                & (e["event_type"] == _R36_STEPS[2])
                & (e["us"] > acc["t2"])
                & in_w,
                _st(F.lit(3), acc["t1"], acc["t2"], e["us"], acc["t4"]),
            )
            .when(
                (acc["stage"] == 3)
                & (e["event_type"] == _R36_STEPS[3])
                & (e["us"] > acc["t3"])
                & in_w,
                _st(F.lit(4), acc["t1"], acc["t2"], acc["t3"], e["us"]),
            )
            .otherwise(acc)
        )

    st = per_user.select(F.aggregate("evs", zero, walk).alias("s"))
    lat = [
        F.coalesce(
            F.sum(
                F.when(
                    F.col("s.stage") >= k,
                    F.col(f"s.t{k}") - F.col("s.t1"),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias(f"l{k}")
        for k in (2, 3, 4)
    ]
    summary = st.agg(
        *[
            F.coalesce(F.sum((F.col("s.stage") >= k).cast("long")), F.lit(0))
            .cast("long")
            .alias(f"n{k}")
            for k in (1, 2, 3, 4)
        ],
        *lat,
    )
    rows = [
        F.struct(
            F.lit(k).alias("step"),
            F.lit(name).alias("event_type"),
            F.col(f"n{k}").alias("n_users"),
            (F.col(f"l{k}") if k > 1 else F.lit(0).cast("long")).alias(
                "latency_us_total"
            ),
        )
        for k, name in enumerate(_R36_STEPS, start=1)
    ]
    return (
        summary.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("step")
    )


R36_SQL = f"""
WITH s0 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s1 AS (
  SELECT s0.user_id, s0.t1, MIN(epoch_us(e.ts)) AS t2
  FROM s0 JOIN events e ON e.user_id = s0.user_id AND e.event_type = 'view'
   AND epoch_us(e.ts) > s0.t1 AND epoch_us(e.ts) <= s0.t1 + {_R36_WINDOW_US}
  GROUP BY 1, 2
),
s2 AS (
  SELECT s1.user_id, s1.t1, MIN(epoch_us(e.ts)) AS t3
  FROM s1 JOIN events e ON e.user_id = s1.user_id AND e.event_type = 'click'
   AND epoch_us(e.ts) > s1.t2 AND epoch_us(e.ts) <= s1.t1 + {_R36_WINDOW_US}
  GROUP BY 1, 2
),
s3 AS (
  SELECT s2.user_id, s2.t1, MIN(epoch_us(e.ts)) AS t4
  FROM s2 JOIN events e ON e.user_id = s2.user_id AND e.event_type = 'purchase'
   AND epoch_us(e.ts) > s2.t3 AND epoch_us(e.ts) <= s2.t1 + {_R36_WINDOW_US}
  GROUP BY 1, 2
)
SELECT 1 AS step, 'signup' AS event_type, COUNT(*)::BIGINT AS n_users,
       0::BIGINT AS latency_us_total FROM s0
UNION ALL
SELECT 2, 'view', COUNT(*)::BIGINT, COALESCE(SUM(t2 - t1), 0)::BIGINT FROM s1
UNION ALL
SELECT 3, 'click', COUNT(*)::BIGINT, COALESCE(SUM(t3 - t1), 0)::BIGINT FROM s2
UNION ALL
SELECT 4, 'purchase', COUNT(*)::BIGINT, COALESCE(SUM(t4 - t1), 0)::BIGINT FROM s3
ORDER BY step
"""


def r37_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: hourly revenue per event type on a
    DENSE hour grid (each type's own min..max hour), missing hours
    forward-filled from the last observed hour (the standard prep step
    before any time-series model sees the data — ~5% of hours are empty in
    this corpus).

    Plan: hourly pre-agg (the only full shuffle) → per-type grid via
    sequence()+explode (grid size = hours in range, bounded regardless of
    row count) → left join back (post-agg side, tiny) → ffill as an
    ignore-nulls last() window.  The window partitions by event type, so
    its per-partition work is bounded by the grid length, not the data."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.count("*").cast("long").alias("n"),
        _spark_dsum(F.col("value"), "rev"),
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.last("rev", ignorenulls=True).over(w).alias("revenue_ffill"),
            F.col("n").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "hr")
    )


R37_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*)::BIGINT AS n,
         {_dsum("value", "rev")}
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly GROUP BY 1
),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
  FROM bounds
)
SELECT g.event_type, g.hr, COALESCE(h.n, 0)::BIGINT AS n_events,
       last_value(h.rev IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_ffill,
       (h.n IS NULL) AS is_gap
FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hr = g.hr
ORDER BY g.event_type, g.hr
"""


_U18_DEPTH, _U18_WIDTH, _U18_MIN = 4, 32768, 5


def u18_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy hitters: estimate each 3-word shingle's
    document frequency from a fixed-memory 4x32768 sketch and emit the
    shingles estimated in >= 5 documents next to their exact counts (15 of
    166 are honest sketch false positives at sf0.01 — CMS only ever
    OVERcounts, so threshold recall is exact by construction).

    This is the sketch-side version of d15's boilerplate detection: the
    sketch is a bounded (depth*width cells) linear aggregate that map-side
    combines and merges across batches (sketches.cms_merge), and the
    estimate pass BROADCASTS it — the corpus is never reshuffled.  The
    oracle replays the identical salted-md5 sketch in SQL."""
    from .functions import sketches as sk

    docs = load_table(spark, sf_dir, "documents")
    stream = docs.select(
        F.explode(tx.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    # ONE explode+groupBy: the pre-aggregated counts feed BOTH the exact
    # column and (as weights) the sketch — identical cells to building
    # from the raw stream, at half the corpus scans
    exact = stream.groupBy("shingle").agg(
        F.count("*").cast("long").alias("exact_count")
    )
    sketch = sk.cms_build(
        exact,
        key_col="shingle",
        depth=_U18_DEPTH,
        width=_U18_WIDTH,
        weight_col="exact_count",
    )
    est = sk.cms_estimate(
        sketch,
        exact,
        key_col="shingle",
        depth=_U18_DEPTH,
        width=_U18_WIDTH,
        out_col="est_count",
    )
    return (
        est.filter(F.col("est_count") >= _U18_MIN)
        .select("shingle", "est_count", "exact_count")
        .orderBy(F.desc("est_count"), "shingle")
    )


U18_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
cells AS (
  SELECT r.range AS row,
         {_sql_md5_long("shingle || ':cms' || r.range")} % {_U18_WIDTH} AS col,
         COUNT(*)::BIGINT AS cnt
  FROM sh, range({_U18_DEPTH}) r GROUP BY 1, 2
),
exact AS (SELECT shingle, COUNT(*)::BIGINT AS exact_count FROM sh GROUP BY 1),
pos AS (
  SELECT e.shingle, e.exact_count, r.range AS row,
         {_sql_md5_long("e.shingle || ':cms' || r.range")} % {_U18_WIDTH} AS col
  FROM exact e, range({_U18_DEPTH}) r
),
est AS (
  SELECT shingle, MIN(exact_count)::BIGINT AS exact_count,
         MIN(COALESCE(c.cnt, 0))::BIGINT AS est_count
  FROM pos p LEFT JOIN cells c USING (row, col) GROUP BY shingle
)
SELECT shingle, est_count, exact_count FROM est
WHERE est_count >= {_U18_MIN}
ORDER BY est_count DESC, shingle
"""


def r38_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user CONSECUTIVE-day activity streaks via the
    row_number-difference trick (days-since-epoch minus per-user rank is
    constant within an island) — the classic islands shape the registry's
    time-gap sessionization (events_sessionize) does not cover.

    Plan: distinct (user, day) → one ranking window on the user
    partitioning → groupBy(user, island) → per-user rollup; the two aggs
    after the window share its exchange.  Day counts per user are bounded
    by the calendar, so windows never see unbounded partitions."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("__g"),
    )
    streaks = islands.groupBy("user_id", "__g").agg(
        F.count("*").cast("long").alias("len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.count("*").cast("long").alias("n_streaks"),
            F.max("len").cast("long").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


R38_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
islands AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', d)
           - row_number() OVER (PARTITION BY user_id ORDER BY d) AS g
  FROM days
),
streaks AS (
  SELECT user_id, g, COUNT(*)::BIGINT AS len FROM islands GROUP BY 1, 2
)
SELECT user_id, SUM(len)::BIGINT AS n_active_days,
       COUNT(*)::BIGINT AS n_streaks, MAX(len)::BIGINT AS longest_streak
FROM streaks GROUP BY user_id ORDER BY user_id
"""


def d17_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join via prefix filtering (the all-pairs
    / PPJoin lineage): every pair with shingle-Jaccard >= 0.4, NO false
    negatives — candidates come only from collisions between the docs'
    rarest-first shingle prefixes (sz - ceil(0.4*sz) + 1 long), then the
    candidate-only array-intersect verification scores them.  The oracle
    computes the UNFILTERED exact pair set — equality proves the prefix
    filter dropped nothing."""
    return dedup.prefix_filter_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.4
    )


D17_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM p a JOIN p b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a, id_b,
         round(n_common / (sa.sz + sb.sz - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.4
ORDER BY id_a, id_b
"""


_U19_QS = [0.5, 0.9, 0.99]
_U19_K = 256


def u19_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a bounded bottom-k-by-hash sample sketch
    (sketches.quantile_sketch — the quantile leg of the deterministic
    sketch trio next to KMV and CMS), reported beside the full-data
    nearest-rank quantile so sampling error is visible in the output.

    Scale: the sketch path is one keyed shuffle + a k-bounded ranking
    window; the exact path is the u13-style full ranking — at 100 TB you
    would keep ONLY the sketch columns and drop the exact join (it exists
    here to hash-pin the estimator against its oracle replay)."""
    from .functions import sketches as sk

    ev = load_table(spark, sf_dir, "events")
    skdf = sk.quantile_sketch(
        ev,
        group_cols=["event_type"],
        value_col="value",
        id_col="event_id",
        k=_U19_K,
    )
    est = skdf.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        sk.quantile_estimate_expr("qsk", q).alias("est_value"),
                    )
                    for q in _U19_QS
                ]
            )
        ).alias("r"),
    ).select("event_type", "r.q", "r.est_value")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    exact = (
        ranked.select(
            "event_type",
            "value",
            "rn",
            "n",
            F.explode(F.array(*[F.lit(q) for q in _U19_QS])).alias("q"),
        )
        .filter(
            F.col("rn")
            == F.greatest(
                F.lit(1),
                F.least(
                    F.col("n"), F.ceil(F.col("q") * F.col("n")).cast("int")
                ),
            )
        )
        .select("event_type", "q", F.col("value").alias("exact_value"))
    )
    return est.join(exact, ["event_type", "q"]).orderBy("event_type", "q")


_U19_SQL_QS = ", ".join(f"(CAST({q} AS DOUBLE))" for q in _U19_QS)

U19_SQL = f"""
WITH hh AS (
  SELECT event_type, value,
         {_sql_md5_long("CAST(event_id AS VARCHAR) || ':qs'")} AS h
  FROM events
),
h AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h, value)
         AS r FROM hh
),
samp AS (
  SELECT event_type, list_sort(list(value)) AS vals
  FROM h WHERE r <= {_U19_K} GROUP BY 1
),
qs(q) AS (VALUES {_U19_SQL_QS}),
est AS (
  SELECT event_type, q,
         vals[greatest(1, least(len(vals),
              CAST(ceil(q * len(vals)) AS INT)))] AS est_value
  FROM samp, qs
),
rk AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
exact AS (
  SELECT event_type, q, value AS exact_value
  FROM rk, qs
  WHERE rn = greatest(1, least(n, CAST(ceil(q * n) AS INT)))
)
SELECT e.event_type, e.q, e.est_value, x.exact_value
FROM est e JOIN exact x USING (event_type, q)
ORDER BY event_type, q
"""


def r39_session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join (joins.interval_overlap_join): user
    activity sessions (native session_window, 30-min gap, padded 10 min
    past the last event) against global error-incident windows (15-min
    tumbling windows holding >= 3 errors).

    Scale shape: both interval sets explode to 15-minute cells and
    equi-join on the cell; the canonical-cell filter (cell of the later
    start) keeps each overlapping pair exactly once with no distinct, so
    cost is O(pairs sharing a cell), never the nested-loop O(|L|·|R|) a
    raw inequality join plans.  Session end = w.end − gap + pad, all
    inside the session_window agg's single shuffle."""
    from .functions import joins

    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_ev"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            # w.end = last event + 30-min gap; trim to a 10-min trailing pad
            (F.col("w.end") - F.expr("INTERVAL 20 MINUTES")).alias("s_end"),
            "n_ev",
        )
    )
    incidents = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.window(F.col("ts"), "15 minutes").alias("w"))
        .agg(F.count("*").cast("long").alias("n_errors"))
        .filter(F.col("n_errors") >= 3)
        .select(
            F.col("w.start").alias("incident_start"),
            F.col("w.end").alias("i_end"),
            "n_errors",
        )
    )
    pairs = joins.interval_overlap_join(
        sessions,
        incidents,
        left_start="session_start",
        left_end="s_end",
        right_start="incident_start",
        right_end="i_end",
        bucket="INTERVAL 15 MINUTES",
    )
    return pairs.select(
        "user_id",
        "session_start",
        "n_ev",
        F.col("incident_start_r").alias("incident_start"),
        F.col("n_errors_r").alias("n_errors"),
    ).orderBy("user_id", "session_start", "incident_start")


R39_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
sessions AS (
  SELECT user_id, MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 10 MINUTE AS s_end, COUNT(*)::BIGINT AS n_ev
  FROM sess GROUP BY user_id, sid
),
incidents AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS incident_start,
         time_bucket(INTERVAL 15 MINUTE, ts) + INTERVAL 15 MINUTE AS i_end,
         COUNT(*)::BIGINT AS n_errors
  FROM events WHERE event_type = 'error' GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT s.user_id, s.session_start, s.n_ev, i.incident_start, i.n_errors
FROM sessions s JOIN incidents i
  ON s.session_start < i.i_end AND i.incident_start < s.s_end
ORDER BY user_id, session_start, incident_start
"""


def r40_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences: for each
    (from_type, to_type) consecutive pair, the count and the transition
    probability P(to | from).  One ranking window on the user partitioning
    (deterministic tie-break on event_id) + one 25-cell agg; the
    probability divides two integer counts, rounded to 6 dp so the hash is
    engine-portable.  Output is |types|² rows — constant, never a scale
    concern; the window partitions by user so no global sort exists."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    wf = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(wf), 6)
        )
        .orderBy("from_type", "to_type")
    )


R40_SQL = """
WITH steps AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, COUNT(*)::BIGINT AS n
  FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(n / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM counts ORDER BY from_type, to_type
"""


def d18_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional near-dup containment: pairs where >= 60% of doc A's
    word-3-gram shingles also appear in doc B (Jaccard CONTAINMENT
    |A∩B| / |A| — catches a short doc embedded in a long one, which
    symmetric Jaccard misses because the union is dominated by the long
    doc).  Same posting-list shape as d4: candidates only from shared
    shingles, scored by integer intersection counts over the candidate
    set — no all-pairs work."""
    return dedup.containment_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.6
    )


D18_SQL = f"""
WITH {_SQL_SHINGLE_CTE},
p AS (SELECT doc_id, {_sql_md5_long("shingle")} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM p GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM p a JOIN p b ON a.h = b.h AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT id_a AS contained_id, id_b AS container_id,
         round(n_common / sa.sz, 6) AS containment
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
)
SELECT contained_id, container_id, containment
FROM scored WHERE containment >= 0.6
ORDER BY contained_id, container_id
"""


def r41_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 event PATHS per session (clickstream path analysis): sessions
    are 17-minute-gap islands per user (the events_sessionize definition),
    a session's path is its event types joined in (ts, event_id) order,
    and the output is the most common paths with their session counts.

    Plan: one user-keyed window pass marks session breaks (lag + cumsum —
    the same shuffle serves both window steps), one groupBy(user, session)
    builds each path via array_sort(collect_list(struct)) — per-session
    arrays are inactivity-bounded, never corpus-sized — and the final
    top-20 is a TakeOrdered over the path counts, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    ).withColumn(
        "brk",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) >= 17 * 60 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = marked.withColumn(
        "sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    paths = sessions.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("us", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


R41_SQL = """
WITH marked AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 17 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, event_type, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sessions GROUP BY user_id, sid
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


def s14_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH ANN index (s2) against the exact cosine top-k
    (s1), per query — the evaluation harness every approximate index
    needs before it replaces an exact scan in production.  Both sides are
    deterministic, so the metric itself sits under the hash oracle.

    Plan: the two top-k plans join on (query_id, vec_id) — tiny frames,
    k rows per query — then one left join back to the query set so
    zero-overlap queries still report 0.0."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = similarity.cosine_topk(emb, queries, k=5).select(
        "query_id", "vec_id"
    )
    ann = similarity.lsh_ann_topk(emb, queries, dim=64, k=5, n_planes=4).select(
        "query_id", "vec_id"
    )
    hits = exact.join(ann, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_overlap")
    )
    return (
        queries.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias(
                "n_overlap"
            ),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / F.lit(5.0), 6
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


S14_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 8),
se AS (
  SELECT query_id, vec_id, round({_SQL_COSINE}, 6) AS c
  FROM q, v WHERE vec_id <> query_id
),
ex AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
    FROM se
  ) WHERE rank <= 5
),
vb AS (SELECT vec_id, e, {_sql_sketch("e")} AS bucket FROM v),
qb AS (SELECT vec_id AS query_id, e AS qe, bucket FROM vb WHERE vec_id < 8),
sa AS (
  SELECT query_id, vb.vec_id, round({_SQL_COSINE}, 6) AS c
  FROM qb q JOIN vb ON q.bucket = vb.bucket AND vb.vec_id <> q.query_id
),
an AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
    FROM sa
  ) WHERE rank <= 5
),
hits AS (
  SELECT e.query_id, COUNT(*) AS n
  FROM ex e JOIN an a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
  GROUP BY e.query_id
)
SELECT q.query_id,
       CAST(coalesce(n, 0) AS BIGINT) AS n_overlap,
       round(coalesce(n, 0) / 5.0, 6) AS recall_at_5
FROM q LEFT JOIN hits ON q.query_id = hits.query_id
ORDER BY q.query_id
"""


_T19_VOCAB_SIZE = 500


def t19_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage analysis: build the top-V token vocabulary by
    corpus frequency (ties to the lexicographically smallest token —
    deterministic) and report each document's out-of-vocabulary token
    count and ratio — the coverage check every tokenizer/vocab pipeline
    runs before committing to a vocab size.

    Plan: one explode + hash agg builds the token counts, a TakeOrdered
    picks the vocab (V rows — broadcast-sized by construction), and the
    per-doc pass is explode → broadcast left-anti-ish marker join → one
    keyed agg.  No sort-based windows, no driver collect; the vocab stays
    on executors via the broadcast."""
    doc = load_table(spark, sf_dir, "documents")
    toks = doc.select(
        "doc_id", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("__n"))
        .orderBy(F.desc("__n"), F.asc("tok"))
        .limit(_T19_VOCAB_SIZE)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    marked = toks.join(F.broadcast(vocab), "tok", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_ratio", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
        .orderBy("doc_id")
    )


T19_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_sql_tokens("lower(text)")}) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ORDER BY n DESC, tok ASC LIMIT {_T19_VOCAB_SIZE}
  )
)
SELECT t.doc_id,
       COUNT(*)::BIGINT AS n_tokens,
       SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
       round(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
             / COUNT(*), 6) AS oov_ratio
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


def s13_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence similarity (the collaborative-filtering
    primitive): event types scored by the cosine of their binary
    user-incidence vectors — n_both / sqrt(n_a · n_b) over DISTINCT
    (user, type) pairs.

    Scale: the self-join is keyed on user_id and each user contributes at
    most |types| distinct rows, so per-user work is the constant
    |types|², never O(events²); counts stay integers until one final
    rounded division."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("n_users"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    both = (
        ut.join(b, "user_id")
        .filter(F.col("event_type") < F.col("type_b"))
        .groupBy(F.col("event_type").alias("type_a"), "type_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    return (
        both.join(n.withColumnRenamed("event_type", "type_a"), "type_a")
        .withColumnRenamed("n_users", "n_a")
        .join(n.withColumnRenamed("event_type", "type_b"), "type_b")
        .withColumnRenamed("n_users", "n_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both") / F.sqrt(F.col("n_a") * F.col("n_b")), 6
            ).alias("cosine"),
        )
        .orderBy("type_a", "type_b")
    )


S13_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT event_type, COUNT(*)::BIGINT AS n_users FROM ut GROUP BY 1),
both_ AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*)::BIGINT AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both,
       round(n_both / sqrt(na.n_users * nb.n_users), 6) AS cosine
FROM both_
JOIN n na ON na.event_type = type_a
JOIN n nb ON nb.event_type = type_b
ORDER BY type_a, type_b
"""


def u20_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET OPERATIONS: estimate |users(A) ∪ users(B)| and
    |users(A) ∩ users(B)| for every pair of event types from the same
    per-type bottom-k sketches u4 builds — union by merging sketches
    (bottom-k of the combined hash set), intersection via the standard
    KMV Jaccard estimator (fraction of the union sketch's members present
    in both sides).  Everything derives from md5 hashes + integer ranks,
    so unlike HLL the estimates are engine-reproducible and fully
    hash-verified; sketches are mergeable, which is the property that
    matters at 100 TB (combine per-partition sketches, never re-scan).
    Exact counts ride beside the estimates so sketch error is visible."""
    from .functions import sketches as sk

    return sk.kmv_set_ops(
        load_table(spark, sf_dir, "events"),
        group_col="event_type",
        value_col="user_id",
        k=32,
    ).orderBy("type_a", "type_b")


_U20_M = float(1 << 60)

U20_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type, user_id,
         {_sql_md5_long("user_id::VARCHAR")} AS h
  FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
),
sk AS (SELECT event_type, h FROM r WHERE rn <= 32),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM h) a
  JOIN (SELECT DISTINCT event_type FROM h) b ON a.event_type < b.event_type
),
umem AS (
  -- distinct FIRST: a hash in both side sketches must count once in the
  -- merged bottom-k, or the kth-min shrinks and the estimate doubles
  SELECT DISTINCT p.type_a, p.type_b, s.h
  FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
),
merged AS (
  SELECT type_a, type_b, h,
         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
  FROM umem
),
uni AS (
  SELECT type_a, type_b, COUNT(*) AS n,
         MAX(CASE WHEN rn = 32 THEN h END) AS kth
  FROM merged WHERE rn <= 32 GROUP BY 1, 2
),
est_u AS (
  SELECT type_a, type_b,
         CASE WHEN n < 32 THEN n::BIGINT
              ELSE CAST(round(31.0 * {_U20_M!r} / kth) AS BIGINT)
         END AS est_union
  FROM uni
),
jac AS (
  SELECT m.type_a, m.type_b,
         SUM(CASE WHEN ia.h IS NOT NULL AND ib.h IS NOT NULL
                  THEN 1 ELSE 0 END) AS n_both,
         COUNT(*) AS n_samp
  FROM merged m
  LEFT JOIN sk ia ON ia.event_type = m.type_a AND ia.h = m.h
  LEFT JOIN sk ib ON ib.event_type = m.type_b AND ib.h = m.h
  WHERE m.rn <= 32
  GROUP BY 1, 2
),
exact AS (
  SELECT p.type_a, p.type_b,
         (SELECT COUNT(DISTINCT user_id) FROM h
           WHERE event_type IN (p.type_a, p.type_b)) AS exact_union,
         (SELECT COUNT(*) FROM
             (SELECT user_id FROM h WHERE event_type = p.type_a
              INTERSECT
              SELECT user_id FROM h WHERE event_type = p.type_b) t)
           AS exact_intersection
  FROM pairs p
)
SELECT e.type_a, e.type_b, e.est_union,
       CAST(round(e.est_union * j.n_both / j.n_samp) AS BIGINT)
         AS est_intersection,
       x.exact_union::BIGINT AS exact_union,
       x.exact_intersection::BIGINT AS exact_intersection
FROM est_u e
JOIN jac j USING (type_a, type_b)
JOIN exact x USING (type_a, type_b)
ORDER BY type_a, type_b
"""


def u21_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-count (functions/sketches.py):
    fixed 2^6 registers per group vs KMV's k values — the standard
    industry sketch, made engine-reproducible (string-length ranks, exact
    integer harmonic sum, baked float literals; see the module notes).

    The Spark path deliberately goes through the MERGE: per-batch sketches
    (batch = event_id % 7, standing in for per-partition/per-day partial
    sketches at 100 TB) are register-max-merged, then estimated.  The
    oracle computes the estimate DIRECTLY from the full table — a hash
    match proves merge is lossless, the roll-up-without-history property
    the incremental engine relies on."""
    from .functions import sketches as sk

    events = load_table(spark, sf_dir, "events").withColumn(
        "__batch", F.pmod(F.col("event_id"), F.lit(7))
    )
    batched = sk.hll_sketch(
        events, group_cols=["event_type", "__batch"], value_col="user_id", b=6
    )
    merged = sk.hll_merge(batched, group_cols=["event_type"])
    return merged.select(
        "event_type",
        sk.hll_estimate_expr("hll_regs", b=6).alias("approx_distinct"),
    ).orderBy("event_type")


U21_SQL = (
    _sketches_mod.sql_hll_estimate(
        "events",
        group_col="event_type",
        value_expr=_sql_md5_long("user_id::VARCHAR"),
        b=6,
    )
    + " ORDER BY event_type"
)


def u22_distinct_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-NOVELTY curve from sketch algebra: per ingest batch, the
    cumulative approx-distinct user count and the newly-seen delta vs the
    previous batch — the 'how much NEW data did this crawl add' metric a
    training-data pipeline tracks, computed without ever rescanning
    history: per-batch HLL registers merge cumulatively
    (sketches.hll_cumulative), so batch k's row costs one register-max
    over ≤ 2^b·k rows of SKETCH state, not a pass over batches 0..k.
    Batch = user_id % 7 (cohort-partitioned ingest, so each batch DOES
    add unseen users and the curve/deltas exercise register growth —
    event_id-based batching would see every user in batch 0).

    ``new_distinct`` is clamped at 0: registers merge monotonically, but
    the ESTIMATOR's linear-counting/raw branch switch is not monotone —
    consecutive batches landing on opposite sides of the branch can
    produce a (small) negative raw delta, which would read as negative
    novelty.  The clamp is applied identically in the SQL twin."""
    from .functions import sketches as sk

    events = load_table(spark, sf_dir, "events").withColumn(
        "batch", F.pmod(F.col("user_id"), F.lit(7)).cast("int")
    )
    per_batch = sk.hll_sketch(
        events, group_cols=["batch"], value_col="user_id", b=6
    )
    cum = sk.hll_cumulative(per_batch, order_col="batch")
    est = cum.select(
        "batch", sk.hll_estimate_expr("hll_regs", b=6).alias("cum_distinct")
    )
    w = Window.orderBy("batch")
    delta = F.col("cum_distinct") - F.lag("cum_distinct").over(w)
    return est.select(
        "batch",
        "cum_distinct",
        F.when(delta < 0, F.lit(0).cast("long"))
        .otherwise(delta)
        .alias("new_distinct"),
    ).orderBy("batch")


_U22_JX, _U22_RX = _sketches_mod.sql_hll_reg_exprs(b=6)
_U22_EST = _sketches_mod.sql_hll_estimate_over(
    "cum", group_col="batch", b=6, out_col="cum_distinct"
)
U22_SQL = f"""
WITH h AS (
  SELECT DISTINCT CAST(user_id % 7 AS INTEGER) AS batch,
         {_sql_md5_long("user_id::VARCHAR")} AS h
  FROM events
),
reg AS (SELECT batch, {_U22_JX} AS j, {_U22_RX} AS r FROM h),
m AS (SELECT batch, j, MAX(r) AS mr FROM reg GROUP BY batch, j),
ks AS (SELECT DISTINCT batch AS k FROM m),
cum AS (
  SELECT ks.k AS batch, m.j, MAX(m.mr) AS mr
  FROM ks JOIN m ON m.batch <= ks.k
  GROUP BY ks.k, m.j
),
est AS ({_U22_EST})
SELECT batch, cum_distinct,
       CASE WHEN cum_distinct - lag(cum_distinct) OVER (ORDER BY batch) < 0
            THEN 0
            ELSE cum_distinct - lag(cum_distinct) OVER (ORDER BY batch)
       END AS new_distinct
FROM est ORDER BY batch
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

# name -> (spark_callable, oracle_sql | None)
#
# ORDERING IS LOAD-BEARING: the driver grades exactly the first 50 dict
# entries per round (CORRECTNESS_r{N}.json).  The window is ROTATED each
# round so that, over rounds, every entry receives a hard driver row while
# previously-verified entries keep getting re-checked by the local replica
# (tools/check_correctness.py runs all entries every time).
#
# Round-6 window (first 50): the never-graded round-6 additions (r34-r37,
# t16-t18, s12, g4, d16, u17-u19, d17, r38, m5-m7 and the sketch-family u19), the 11 entries whose implementation or oracle
# CHANGED this round (the r25 tz fix, m1/s5b's first hash oracles, the
# d10/d15 no-text-shuffle rewrites, s5's Arrow assignment, the
# pagerank/CC iteration optimizations) + the 33 entries whose latest
# driver rows date to ROUND 2 on pre-drift testdata (rotated out in r5) +
# 6 timestamp-trafficking r4-graded sentinels.  Rotated out: the 47
# entries driver-graded green in CORRECTNESS_r05 (freshest rows) and the
# remaining r4-green pool — all re-verified by the local strict replica
# every round.
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # --- new in round 6: first driver rows ---
    "t19_vocab_oov": (t19_vocab_oov, T19_SQL),
    "m8_video_index": (m8_video_index, M8_SQL),
    "r41_session_paths": (r41_session_paths, R41_SQL),
    "s14_ann_recall": (s14_ann_recall, S14_SQL),
    "g5_bfs_reach": (g5_bfs_reach, G5_SQL),
    "r39_session_incident_overlap": (r39_session_incident_overlap, R39_SQL),
    "r40_event_transitions": (r40_event_transitions, R40_SQL),
    "d18_containment_pairs": (d18_containment_pairs, D18_SQL),
    "s13_event_cooccurrence": (s13_event_cooccurrence, S13_SQL),
    "u20_kmv_set_ops": (u20_kmv_set_ops, U20_SQL),
    "r36_funnel": (r36_funnel, R36_SQL),
    "r37_gap_fill": (r37_gap_fill, R37_SQL),
    "u18_cms_heavy_hitters": (u18_cms_heavy_hitters, U18_SQL),
    "u19_quantile_sketch": (u19_quantile_sketch, U19_SQL),
    "d17_prefix_filter_join": (d17_prefix_filter_join, D17_SQL),
    "r38_activity_streaks": (r38_activity_streaks, R38_SQL),
    "r34_attribution": (r34_attribution, R34_SQL),
    "r35_cube_revenue": (r35_cube_revenue, R35_SQL),
    "t16_bm25_topk": (t16_bm25_topk, T16_SQL),
    "t17_term_pmi": (t17_term_pmi, T17_SQL),
    "t18_rake_keywords": (t18_rake_keywords, T18_SQL),
    "s12_pq_topk": (s12_pq_topk, S12_SQL),
    "g4_communities": (g4_communities, G4_SQL),
    "d16_duplicated_spans": (d16_duplicated_spans, D16_SQL),
    "u17_leakage_safe_split": (u17_leakage_safe_split, U17_SQL),
    "m5_image_transform": (m5_image_transform, M5_SQL),
    "m6_audio_frames": (m6_audio_frames, M6_SQL),
    "m7_scene_changes": (m7_scene_changes, M7_SQL),
    # --- changed in round 6: oracle or implementation (11) ---
    "r25_sliding_window": (r25_sliding_window, R25_SQL),
    "m1_multimodal_features": (m1_multimodal_features, M1_SQL),
    "s5b_ivf_refined_topk": (s5b_ivf_refined_topk, S5B_SQL),
    "d10_chunk_dedup": (d10_chunk_dedup, D10_SQL),
    "d15_boilerplate_strip": (d15_boilerplate_strip, D15_SQL),
    "s5_ivf_topk": (s5_ivf_topk, S5_SQL),
    "g1_pagerank": (g1_pagerank, G1_SQL),
    "d9_dup_clusters": (d9_dup_clusters, D9_SQL),
    "d13_dedup_canonical": (d13_dedup_canonical, D13_SQL),
    "s7_semantic_dedup": (s7_semantic_dedup, S7_SQL),
    "g3_cluster_sizes": (g3_cluster_sizes, G3_SQL),
    # --- last driver-graded in round 2, pre-drift data (33) ---
    "q17_small_qty_revenue": (q17_small_qty_revenue, Q17_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q21_waiting_supplier": (q21_waiting_supplier, Q21_SQL),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL),
    "r01_scan_count": (r01_scan_count, "SELECT COUNT(*) AS n_rows FROM lineitem"),
    "r12_topk_sort": (r12_topk_sort, R12_SQL),
    "r14_anti_join": (r14_anti_join, R14_SQL),
    "r21_distinct_keys": (r21_distinct_keys, R21_SQL),
    "rollup_order_totals": (rollup_order_totals, ROLLUP_SQL),
    "q7_price_percentiles": (q7_price_percentiles, Q7_SQL),
    "q8_grouping_sets": (q8_grouping_sets, Q8_SQL),
    "d5_minhash_signatures": (d5_minhash_signatures, D5_SQL),
    "q4_priority_check": (q4_priority_check, Q4_SQL),
    "q7_nation_volume": (q7_nation_volume, TPCH7_SQL),
    "q8_market_share": (q8_market_share, TPCH8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q13_order_histogram": (q13_order_histogram, Q13_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_count": (q16_supplier_count, Q16_SQL),
    "q19_bracket_revenue": (q19_bracket_revenue, Q19_SQL),
    "q20_heavy_shippers": (q20_heavy_shippers, Q20_SQL),
    "r05_expression": (r05_expression, R05_SQL),
    "r07_null_literal": (r07_null_literal, R07_SQL),
    "r08_case_when": (r08_case_when, R08_SQL),
    "r09_struct_json": (r09_struct_json, R09_SQL),
    "d4_ngram_jaccard": (d4_ngram_jaccard, D4_SQL),
    "d7_simhash": (d7_simhash, D7_SQL),
    "s4_cosine_near_dup_exact": (s4_cosine_near_dup_exact, S4_SQL),
    "r03_projection": (r03_projection, R03_SQL),
    "r04_filter_isin": (r04_filter_isin, R04_SQL),
    "r06_cast": (r06_cast, R06_SQL),
    # --- r4-graded timestamp sentinels (6) ---
    "events_window_1m": (events_window, EVENTS_WINDOW_SQL),
    # ================= driver window boundary (entry 50) =================
    "events_sessionize": (events_sessionize, SESSIONIZE_SQL),
    "asof_error_after_click": (asof_error_after_click, ASOF_SQL),
    "range_clicks_before_error": (range_clicks_before_error, RANGE_SQL),
    "cdc_merge_latest": (cdc_merge_latest, CDC_MERGE_SQL),
    "w1_drop_late": (w1_drop_late, W1_SQL),
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "q12_late_priority_lines": (q12_late_priority_lines, Q12_SQL),
    "d12_bloom_decontaminate": (d12_bloom_decontaminate, D12_SQL),
    "d14_edit_distance_pairs": (d14_edit_distance_pairs, D14_SQL),
    "t9_curate_topk": (t9_curate_topk, T9_SQL),
    "t10_quality_deciles": (t10_quality_deciles, T10_SQL),
    "t11_char_lm_score": (t11_char_lm_score, T11_SQL),
    "u8_group_sample": (u8_group_sample, U8_SQL),
    "u9_weighted_sample": (u9_weighted_sample, U9_SQL),
    "r24_trailing_hour": (r24_trailing_hour, R24_SQL),
    "r26_ranking_functions": (r26_ranking_functions, R26_SQL),
    "m2_frame_sample": (m2_frame_sample, M2_SQL),
    "m3_image_decode": (m3_image_decode, M3_SQL),
    "asof_fwd_click_after_error": (asof_fwd_click_after_error, ASOF_FWD_SQL),
    "u10_token_mixture": (u10_token_mixture, U10_SQL),
    "u11_token_shards": (u11_token_shards, U11_SQL),
    "t12_ngram_novelty": (t12_ngram_novelty, T12_SQL),
    "t13_gopher_quality": (t13_gopher_quality, T13_SQL),
    "u12_sliding_chunks": (u12_sliding_chunks, U12_SQL),
    "s8_label_centroids": (s8_label_centroids, S8_SQL),
    "s9_centroid_similarity": (s9_centroid_similarity, S9_SQL),
    "r27_json_props": (r27_json_props, R27_SQL),
    "r28_funnel": (r28_funnel, R28_SQL),
    "r29_full_outer": (r29_full_outer, R29_SQL),
    "r30_lead_lag": (r30_lead_lag, R30_SQL),
    "r31_cohort_retention": (r31_cohort_retention, R31_SQL),
    "u13_histogram_quantiles": (u13_histogram_quantiles, U13_SQL),
    "s10_hard_negatives": (s10_hard_negatives, S10_SQL),
    "r32_map_props": (r32_map_props, R32_SQL),
    "r33_unpivot": (r33_unpivot, R33_SQL),
    "t14_linear_classifier": (t14_linear_classifier, T14_SQL),
    "u14_temperature_sample": (u14_temperature_sample, U14_SQL),
    "m4_audio_decode": (m4_audio_decode, M4_SQL),
    "s11_diverse_topk": (s11_diverse_topk, S11_SQL),
    "t15_readability": (t15_readability, T15_SQL),
    "g2_triangles": (g2_triangles, G2_SQL),
    "u15_data_profile": (u15_data_profile, U15_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, Q5_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "r02_json_roundtrip": (r02_json_roundtrip, R02_SQL),
    "r13_latest_per_key": (r13_latest_per_key, R13_SQL),
    "r15_union_by_name": (r15_union_by_name, R15_SQL),
    "r16_remap": (r16_remap, R16_SQL),
    "r17_limit0": (r17_limit0, R17_SQL),
    "r18_scalar_agg": (r18_scalar_agg, R18_SQL),
    "r19_sql_report": (r19_sql_report, R19_SQL),
    "r20_drop_cols": (r20_drop_cols, R20_SQL),
    "r22_pivot_event_counts": (r22_pivot_event_counts, R22_SQL),
    "r23_user_running_totals": (r23_user_running_totals, R23_SQL),
    "except_intersect_users": (except_intersect_users, EXCEPT_SQL),
    "schema_evolve_add": (schema_evolve_add, SCHEMA_EVOLVE_SQL),
    "schema_type_widen": (schema_type_widen, SCHEMA_WIDEN_SQL),
    "schema_rescue": (schema_rescue, SCHEMA_RESCUE_SQL),
    "d1_exact_duplicates": (d1_exact_duplicates, D1_SQL),
    "d2_dedup_exact": (d2_dedup_exact, D2_SQL),
    "d3_fingerprint_duplicates": (d3_fingerprint_duplicates, D3_SQL),
    "d4b_ngram_jaccard_capped": (d4b_ngram_jaccard_capped, D4B_SQL),
    "d6_minhash_lsh": (d6_minhash_lsh, D6_SQL),
    "d8_simhash_near_dup": (d8_simhash_near_dup, D8_SQL),
    "d11_decontaminate": (d11_decontaminate, D11_SQL),
    "t1_text_stats": (t1_text_stats, T1_SQL),
    "t2_lang_id": (t2_lang_id, T2_SQL),
    "t3_fingerprint": (t3_fingerprint, T3_SQL),
    "t4_token_counts": (t4_token_counts, T4_SQL),
    "t5_top_ngrams": (t5_top_ngrams, T5_SQL),
    "t6_repetition": (t6_repetition, T6_SQL),
    "t7_pii_redaction": (t7_pii_redaction, T7_SQL),
    "t8_tfidf_top_terms": (t8_tfidf_top_terms, T8_SQL),
    "s1_cosine_topk": (s1_cosine_topk, S1_SQL),
    "s2_lsh_ann_topk": (s2_lsh_ann_topk, S2_SQL),
    "s3_cosine_near_dup": (s3_cosine_near_dup, S3_SQL),
    "s6_quantized_topk": (s6_quantized_topk, S6_SQL),
    "u1_hash_sample": (u1_hash_sample, U1_SQL),
    "u2_stratified_sample": (u2_stratified_sample, U2_SQL),
    "u3_hash_split": (u3_hash_split, U3_SQL),
    "u4_kmv_distinct": (u4_kmv_distinct, U4_SQL),
    "u5_mixture_sample": (u5_mixture_sample, U5_SQL),
    "u6_pack_sequences": (u6_pack_sequences, U6_SQL),
    "u7_hot_keys": (u7_hot_keys, U7_SQL),
    "u7b_salted_join_groups": (u7b_salted_join_groups, U7B_SQL),
    "u7c_two_phase_collect": (u7c_two_phase_collect, U7C_SQL),
    "u21_hll_distinct": (u21_hll_distinct, U21_SQL),
    "u22_distinct_growth": (u22_distinct_growth, U22_SQL),
    "m1b_multimodal_meta": (m1b_multimodal_meta, M1B_SQL),
}

# Driver grading-window rotation: the driver hash-grades the FIRST 50
# registry entries each round, so the dict is reordered stalest-graded
# first.  Round 13 (re-derived from the union of CORRECTNESS_r01..r12
# key sets — last-graded round per query: 15 entries at round 8, 50 at
# round 10, 50 at round 11, 50 at round 12): the 15 round-8-stale
# entries lead (queued at positions 51-65 last round, exactly as the
# round-12 rotation planned), then 35 of the round-10 block — ordered
# so the families whose code paths moved THIS round grade first (the
# graph loop folds g1/g4/g5, the d17/d18 verify whose parallelism the
# AQE-floor change altered, and the u20/r39 pair round 12 flagged as
# unadjudicated regressions) — and the 15 remaining round-10 entries
# sit at positions 51-65 to lead round 14.
_GRADE_FIRST = [
    # --- last driver-graded round 8 (stalest; r12 verdict item #7) ---
    "t1_text_stats", "t2_lang_id", "t3_fingerprint", "t4_token_counts",
    "t5_top_ngrams", "t6_repetition", "t7_pii_redaction",
    "t8_tfidf_top_terms", "t12_ngram_novelty", "t13_gopher_quality",
    "u1_hash_sample", "u2_stratified_sample", "u3_hash_split",
    "u5_mixture_sample", "u6_pack_sequences",
    # --- round-10 block, touched-this-round first ---
    # graph loops folded r13 (self-loop aggregation, no join-back)
    "g1_pagerank", "g4_communities", "g5_bfs_reach", "g2_triangles",
    # exact-verify operators whose stage parallelism the r13 AQE
    # minPartitionSize change re-shaped
    "d17_prefix_filter_join", "d18_containment_pairs",
    "d16_duplicated_spans", "d10_chunk_dedup", "d15_boilerplate_strip",
    # the two round-12 "regressed" queries — fresh hash verdicts on the
    # adjudicated-noise claim
    "u20_kmv_set_ops", "r39_session_incident_overlap",
    # sketch family sharing u20's store helpers
    "u18_cms_heavy_hitters", "u19_quantile_sketch", "u21_hll_distinct",
    "u22_distinct_growth", "u13_histogram_quantiles",
    # similarity/ANN family (norm-hoist r12, re-measured r13)
    "s5_ivf_topk", "s5b_ivf_refined_topk", "s12_pq_topk",
    "s14_ann_recall", "s13_event_cooccurrence", "s10_hard_negatives",
    "s11_diverse_topk",
    # text scoring on touched helpers
    "t16_bm25_topk", "t17_term_pmi", "t18_rake_keywords",
    "t14_linear_classifier",
    # multimodal block
    "m1_multimodal_features", "m4_audio_decode", "m5_image_transform",
    "m6_audio_frames", "m7_scene_changes", "m8_video_index",
    # relational/window round-10 block
    "r36_funnel", "r41_session_paths",
    # --- positions 51-65: remaining round-10 entries, lead round 14 ---
    "t19_vocab_oov", "t15_readability", "u14_temperature_sample",
    "u15_data_profile", "u17_leakage_safe_split",
    "r25_sliding_window", "r30_lead_lag", "r31_cohort_retention",
    "r32_map_props", "r33_unpivot", "r34_attribution",
    "r35_cube_revenue", "r37_gap_fill", "r38_activity_streaks",
    "r40_event_transitions",
]
# dict merge keeps the FIRST insertion position for duplicate keys, so
# this is exactly "graded-first entries, then everything else in place"
REGISTRY = {**{k: REGISTRY[k] for k in _GRADE_FIRST}, **REGISTRY}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
