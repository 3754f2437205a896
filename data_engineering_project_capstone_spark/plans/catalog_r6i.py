"""Round-6i catalog entries — the classic TPC-H analytics shapes the
flagship trio (q1-q3) doesn't cover, re-expressed Spark-first:

- ``q5_local_volume``   (TPC-H Q5 shape): local-supplier revenue per
  nation inside one region/year — the 6-table join with the
  same-nation (c_nationkey = s_nationkey) constraint.
- ``q8_market_share``   (Q8): one nation's share of a region's promo
  revenue per year — conditional-sum-over-sum on a 7-table join.
- ``q10_returned_items``(Q10): top-20 customers by returned-item
  revenue in a half-year window.
- ``q14_promo_revenue`` (Q14): promo revenue percentage over a
  3-month ship window — global conditional ratio, one row.
- ``q15_top_supplier``  (Q15): supplier(s) achieving the MAXIMUM
  quarterly revenue — the scalar-subquery-equality query.

Float-parity design: revenue is computed in EXACT INTEGER UNITS of
10^-4 dollars — ``round(l_extendedprice·100)·(100 − round(l_discount·
100))`` — so every sum is an int64 fold that is bit-identical across
engines AND across partition orders. That makes Q15's revenue-equals-
max comparison exact (the textbook formulation compares two
independently-summed doubles — partition-order-dependent in any
distributed engine), and Q8's share a ratio of two exact integers.
Doubles appear only in final rounded readout columns. Int64 headroom:
unit values are ≤ ~10^10 per row, so a single group overflows only
past ~9·10^8 rows; per-nation/supplier/year groups are far below that
at any SF this engine targets, and the upgrade path at extreme scale
is summing as DECIMAL(38,4) on both engines (same exactness, wider).

All dims ride explicit broadcasts where bounded (nation, region);
supplier/customer/part grow with SF, so those joins stay shuffle
joins for AQE to convert when small. Citations: reference queries are
the capstone's star-schema analytics (see SURVEY §2 Q1-Q3); these add
the standard decision-support shapes a switching user would expect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t


def _units() -> Column:
    """Exact integer revenue units (10^-4 dollars) for a lineitem row."""
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc = F.round(F.col("l_discount") * 100, 0).cast("long")
    return cents * (F.lit(100) - disc)


_SQL_UNITS = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


# ---------------------------------------------------------------------------
# Q5 — local supplier volume
# ---------------------------------------------------------------------------

_Q5_REGION = "ASIA"
_Q5_LO, _Q5_HI = "1996-01-01", "1997-01-01"


def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation from LOCAL supply chains (customer and
    supplier in the same nation) within one region and order-year.

    Scale shape: nation⋈region collapses to a broadcast ≤25-row nation
    filter applied to BOTH customer and supplier sides; the fact-side
    chain orders⋈lineitem⋈supplier shuffles on its join keys with the
    date filter pushed to the orders scan; the same-nation constraint
    is an equi-condition of the customer join, not a post-filter."""
    nr = (
        t(spark, sf_dir, "nation")
        .join(
            t(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer").join(
        F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey")
    )
    supp = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _units().alias("units")
    )
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        # ≤25 output groups at ANY SF: a 100 TB fact puts ~2.4e10 rows
        # of ≤1.1e11-unit summands into one nation — past int64. Sum as
        # DECIMAL(38,0); the oracle's HUGEINT is already exact.
        .agg(F.sum(F.col("units").cast("decimal(38,0)")).alias("_u"))
        .select(
            "n_name", ieee_round(F.col("_u") / 10000.0, 2).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name,
       {sql_ieee_round("sum(" + _SQL_UNITS + ") / 10000.0", 2)} AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{_Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{_Q5_LO}'
  AND o_orderdate <  TIMESTAMP '{_Q5_HI}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

_Q8_NATION = "NATION_7"
_Q8_REGION = "AMERICA"
_Q8_TYPE = "PROMO"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{nation}'s share of {type}-part revenue sold to {region}
    customers, per order year — conditional-sum over sum on exact
    integer units, so the share is a ratio of two exact int64s.

    Scale shape: part is filtered BEFORE its join (predicate pushdown
    to the scan, then a key shuffle); the supplier→nation attachment
    that decides numerator membership is a broadcast of the ≤25-row
    nation dim onto the supplier dim; region filtering of customers
    reuses the same broadcast pattern as Q5."""
    nr = (
        t(spark, sf_dir, "nation")
        .join(
            t(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cust_nk"))
    )
    cust = t(spark, sf_dir, "customer").join(
        F.broadcast(nr), F.col("c_nationkey") == F.col("cust_nk")
    )
    supp = t(spark, sf_dir, "supplier").join(
        F.broadcast(
            t(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("supp_nk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("supp_nk"),
    )
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE)
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _units().alias("units")
    )
    orders = t(spark, sf_dir, "orders")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        # bounded year count → DECIMAL(38,0) sums (see q5); the share
        # divides through explicit double casts, mirroring the oracle's
        # hugeint→double conversions (decimal/decimal would be DECIMAL
        # division — a different op than DuckDB's)
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == _Q8_NATION, F.col("units"))
                .otherwise(F.lit(0))
                .cast("decimal(38,0)")
            ).alias("_num"),
            F.sum(F.col("units").cast("decimal(38,0)")).alias("_den"),
        )
        .select(
            F.col("o_year").cast("int").alias("o_year"),
            # try_divide: a year whose units all round to zero (possible
            # with zero-price/zero-qty lines) has no defined share —
            # NULL on both engines (DuckDB x/0 is NULL; Spark ANSI `/`
            # would THROW — caught by the combined fuzz, r9)
            ieee_round(
                F.try_divide(
                    F.col("_num").cast("double"), F.col("_den").cast("double")
                ),
                6,
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
WITH vol AS (
    SELECT year(o_orderdate) AS o_year,
           CASE WHEN sn.n_name = '{_Q8_NATION}' THEN {_SQL_UNITS}
                ELSE 0 END AS num_units,
           {_SQL_UNITS} AS units
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = '{_Q8_REGION}' AND p_type = '{_Q8_TYPE}'
)
SELECT CAST(o_year AS INTEGER) AS o_year,
       {sql_ieee_round("sum(num_units) * 1.0 / sum(units)", 6)} AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q10 — returned items
# ---------------------------------------------------------------------------

_Q10_LO, _Q10_HI = "1996-01-01", "1996-07-01"
_Q10_TOP_K = 20


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K customers by revenue of RETURNED items ordered in a
    half-year window, with their nation.

    Scale shape: the returnflag filter is pushed to the lineitem scan
    and the date filter to the orders scan before their key shuffle;
    the customer join shuffles on custkey; nation rides a broadcast.
    The top-K is a TakeOrdered on exact integer revenue (ties broken
    by custkey), never a global sort."""
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", _units().alias("units"))
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    )
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum("units").alias("_u"))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "n_name",
            ieee_round(F.col("_u") / 10000.0, 2).alias("revenue"),
            F.col("_u").alias("_units"),
        )
        .orderBy(F.desc("_units"), "c_custkey")
        .limit(_Q10_TOP_K)
        .drop("_units")
    )


Q10_SQL = f"""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       {sql_ieee_round("sum(" + _SQL_UNITS + ") / 10000.0", 2)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{_Q10_LO}'
  AND o_orderdate <  TIMESTAMP '{_Q10_HI}'
GROUP BY c_custkey, c_name, n_name
ORDER BY sum({_SQL_UNITS}) DESC, c_custkey
LIMIT {_Q10_TOP_K}
"""


# ---------------------------------------------------------------------------
# Q14 — promo revenue percentage
# ---------------------------------------------------------------------------

_Q14_LO, _Q14_HI = "1996-01-01", "1996-04-01"


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage of revenue from PROMO parts in a 3-month ship
    window — one global conditional ratio row on exact integer sums.

    Scale shape: date filter pushed to the lineitem scan; the part
    join shuffles on partkey (part grows with SF — not broadcast by
    design, AQE may still choose to); the final agg is a 1-row
    all-reduce with map-side partials."""
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q14_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q14_HI).cast("timestamp"))
        )
        .select("l_partkey", _units().alias("units"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            # 1-row global fold → DECIMAL(38,0) (see q5's headroom note)
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("units"))
                .otherwise(F.lit(0))
                .cast("decimal(38,0)")
            ).alias("_num"),
            F.sum(F.col("units").cast("decimal(38,0)")).alias("_den"),
        )
        .select(
            # try_divide: same zero-denominator guard as q8 (all units
            # in the window rounding to zero) — NULL on both engines
            ieee_round(
                F.try_divide(
                    F.lit(100.0) * F.col("_num").cast("double"),
                    F.col("_den").cast("double"),
                ),
                6,
            ).alias("promo_pct")
        )
    )


Q14_SQL = f"""
SELECT {sql_ieee_round(
    "100.0 * sum(CASE WHEN p_type = 'PROMO' THEN " + _SQL_UNITS
    + " ELSE 0 END) / sum(" + _SQL_UNITS + ")", 6)} AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{_Q14_LO}'
  AND l_shipdate <  TIMESTAMP '{_Q14_HI}'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier(s)
# ---------------------------------------------------------------------------

_Q15_LO, _Q15_HI = "1996-01-01", "1996-04-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the MAXIMUM quarterly revenue. The textbook
    formulation compares an independently-recomputed double sum
    against a scalar max — partition-order-dependent in any
    distributed engine; here both the per-supplier totals and the max
    are exact int64 units, so the equality is deterministic.

    Scale shape: per-supplier agg shuffles on suppkey with map-side
    combine; the scalar max rides back as a 1-row broadcast crossJoin
    filter — no second scan, no self-join of aggregates."""
    rev = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_units()).alias("_u"))
    )
    mx = rev.agg(F.max("_u").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("_u") == F.col("_mx"))
        .join(
            t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            ieee_round(F.col("_u") / 10000.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
    SELECT l_suppkey, sum({_SQL_UNITS}) AS u
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
      AND l_shipdate <  TIMESTAMP '{_Q15_HI}'
    GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       {sql_ieee_round("u / 10000.0", 2)} AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE u = (SELECT max(u) FROM rev)
ORDER BY s_suppkey
"""


R6I_ENTRIES: dict[str, Entry] = {
    "q5_local_volume": Entry(q5_local_volume, Q5_SQL),
    "q8_market_share": Entry(q8_market_share, Q8_SQL),
    "q10_returned_items": Entry(q10_returned_items, Q10_SQL),
    "q14_promo_revenue": Entry(q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": Entry(q15_top_supplier, Q15_SQL),
}
