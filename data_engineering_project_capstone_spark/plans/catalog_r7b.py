"""Round-7b catalog entries — completing the TPC-H decision-support
family begun in catalog_r6i (q5/q8/q10/q14/q15). The driver testdata
omits partsupp, ship modes, comments, and receipt/commit dates, so
queries needing them are ADAPTED (same operator shape, different
predicate) and documented per entry; Q1/Q2/Q11/Q12/Q16/Q20 land in
catalog_r8 (Q1 faithful, the rest adapted), completing all 22 shapes.

- ``q3_unshipped_topk``   (Q3 shape): top-10 not-yet-shipped orders by
  open revenue (shippriority column absent — grouping key reduced).
- ``q4_late_exists``      (Q4 shape): order counts per priority where
  EXISTS a late lineitem; "late" = shipped > 90 days after the order
  date (receipt/commit dates absent).
- ``q6_forecast_delta``   (Q6): one-row revenue-change aggregate over a
  year × discount-band × quantity-cap filter — pure scan+filter+fold.
- ``q7_nation_volume``    (Q7): bilateral trade volume between two
  nations by ship year — supplier-nation ↔ customer-nation pairing.
- ``q9_profit_proxy``     (Q9 shape): profit per supplier-nation × year
  for a part-name token; cost side proxied by retailprice·quantity
  (ps_supplycost absent) — the join/agg shape is Q9's.
- ``q13_order_histogram`` (Q13): distribution of customers by order
  count INCLUDING zero-order customers (left outer + double agg).
- ``q17_small_qty_revenue`` (Q17): revenue locked in small-quantity
  lineitems (< 1/5 of the part's average) for one brand — the
  correlated-average query, decorrelated into one per-part agg.
- ``q18_large_orders``    (Q18): orders whose total quantity clears a
  threshold, with customer context — groupBy-HAVING over the fact.
- ``q19_disjunctive_join``(Q19): revenue under an OR-of-conjunctions
  join predicate (brand × size-band × quantity-band disjuncts).
- ``q21_sole_late_supplier`` (Q21 shape): suppliers who were the ONLY
  late shipper in a multi-supplier order — EXISTS/NOT-EXISTS
  semantics decorrelated into per-order counts.
- ``q22_dormant_customers`` (Q22 shape): above-average-balance
  customers with no orders at all, per nation (phone country codes
  absent — nation is the grouping key).

Float parity follows catalog_r6i exactly: revenue in integer 10^-4
dollar units, quantities as exact integers (TPC-H quantities are
whole numbers; round-cast asserts that), averages compared by
cross-multiplication (5·q·n < Σq, cents·n > Σcents) so no double is
ever compared across engines; doubles appear only in final rounded
readouts. Scale notes per entry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t
from .catalog_r6i import _SQL_UNITS, _units


def _li_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem joined to its order date, both as DATE — the shared
    input of the lateness queries (one fact⋈fact equi-join on
    l_orderkey; at scale both sides are bucketed on orderkey, see
    SCALE.md big-big join path)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.to_date("l_shipdate").alias("ship_d"),
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("order_d"),
    )
    return li.join(orders, li["l_orderkey"] == orders["o_orderkey"])


# ---------------------------------------------------------------------------
# Q3 — top open-revenue orders
# ---------------------------------------------------------------------------

_Q3_CUT = "1997-07-01"
_Q3_K = 10


def q3_unshipped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders placed before the cutoff whose lineitems ship
    after it, by open revenue. Scale: both date filters push to the
    scans; revenue is an exact int64 fold; top-K via TakeOrdered —
    never a global sort materialization."""
    orders = t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit(_Q3_CUT)
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit(_Q3_CUT)
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("o_date"))
        .agg(F.sum(_units()).alias("_u"))
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("o_date"),
            ieee_round(F.col("_u") / 10000.0, 2).alias("revenue"),
        )
        .orderBy(F.desc("_u"), "o_orderkey")
        .limit(_Q3_K)
    )


Q3_SQL = f"""
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_orderdate AS DATE) AS o_date,
       {sql_ieee_round("sum(" + _SQL_UNITS + ") / 10000.0", 2)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(o_orderdate AS DATE) < DATE '{_Q3_CUT}'
  AND CAST(l_shipdate AS DATE) > DATE '{_Q3_CUT}'
GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
ORDER BY sum({_SQL_UNITS}) DESC, o_orderkey
LIMIT {_Q3_K}
"""


# ---------------------------------------------------------------------------
# Q4 — EXISTS late lineitem, per priority
# ---------------------------------------------------------------------------

_Q4_LO, _Q4_HI = "1996-01-01", "1996-07-01"
_LATE_DAYS = 90


def q4_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority (within a half-year window) having at least
    one lineitem shipped > 90 days after the order date. The EXISTS is
    a left-semi join from orders to late lineitems — the fact never
    duplicates, the semi side prunes to (orderkey) only."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit(_Q4_LO))
        & (F.to_date("o_orderdate") < F.lit(_Q4_HI))
    )
    late = _li_dates(spark, sf_dir).filter(
        F.col("ship_d") > F.date_add("order_d", _LATE_DAYS)
    )
    return (
        orders.join(
            late.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
            "o_orderkey",
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '{_Q4_LO}'
  AND CAST(o_orderdate AS DATE) < DATE '{_Q4_HI}'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND CAST(l.l_shipdate AS DATE) >
            CAST(o.o_orderdate AS DATE) + {_LATE_DAYS}
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change
# ---------------------------------------------------------------------------

_Q6_LO, _Q6_HI = "1996-01-01", "1997-01-01"


def q6_forecast_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Σ(extendedprice·discount) over a ship-year, a discount
    band (5-7%), and a quantity cap — the purest scan+filter+fold in
    the family; every predicate reaches the parquet scan. Discount
    cents are exact ints, so the fold is an int64 sum."""
    li = t(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("ship_d"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc_c"),
    )
    return (
        li.filter(
            (F.col("ship_d") >= F.lit(_Q6_LO))
            & (F.col("ship_d") < F.lit(_Q6_HI))
            & (F.col("disc_c") >= 5)
            & (F.col("disc_c") <= 7)
            & (F.col("qty") < 24)
        )
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.col("cents") * F.col("disc_c")).alias("_u"),
        )
        .select(
            "n_lines",
            ieee_round(F.col("_u") / 10000.0, 2).alias("revenue_delta"),
        )
    )


Q6_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       {sql_ieee_round(
           "sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
           " * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0", 2)}
           AS revenue_delta
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '{_Q6_LO}'
  AND CAST(l_shipdate AS DATE) < DATE '{_Q6_HI}'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND CAST(round(l_quantity) AS BIGINT) < 24
"""


# ---------------------------------------------------------------------------
# Q7 — bilateral nation volume
# ---------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_1", "NATION_2", "NATION_3", "NATION_4")
_Q7_LO, _Q7_HI = "1996-01-01", "1998-01-01"


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between nations of a 4-nation trade bloc by ship
    year, all ordered cross pairs (the classic uses 2 nations; the
    driver's sf0.001 supplier dim covers only 10 of 25 nations, so a
    wider bloc keeps the result non-degenerate at every SF). Scale:
    the ≤25-row nation dim broadcasts onto supplier and customer; the
    fact chain shuffles on its keys only; the bloc filter prunes both
    dim sides before they touch the fact."""
    nations = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*_Q7_NATIONS)
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit(_Q7_LO))
        & (F.to_date("l_shipdate") < F.lit(_Q7_HI))
    )
    return (
        li.join(
            t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        # nation-pair × year groups are SF-bounded → DECIMAL(38,0) fold
        # (int64 overflows at ~10^7 units-scale rows per group)
        .agg(F.sum(_units().cast("decimal(38,0)")).alias("_u"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            ieee_round(F.col("_u") / 10000.0, 2).alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_q7_in = "(" + ", ".join(f"'{n}'" for n in _Q7_NATIONS) + ")"

Q7_SQL = f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       {sql_ieee_round("sum(" + _SQL_UNITS + ") / 10000.0", 2)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name IN {_q7_in}
  AND nc.n_name IN {_q7_in}
  AND ns.n_name <> nc.n_name
  AND CAST(l_shipdate AS DATE) >= DATE '{_Q7_LO}'
  AND CAST(l_shipdate AS DATE) < DATE '{_Q7_HI}'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q9 — profit by nation and year (cost proxied)
# ---------------------------------------------------------------------------

_Q9_TOKEN = "red"


def q9_profit_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier nation × order year for parts whose name
    contains a token. ps_supplycost is absent from this schema, so
    cost = retailprice·quantity stands in (documented adaptation; the
    5-table join/agg SHAPE is Q9's). Profit stays an exact int64:
    units − retail_cents·qty·100, both in 10^-4 dollars."""
    parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(_Q9_TOKEN))
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100, 0)
            .cast("long")
            .alias("retail_c"),
        )
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
        _units().alias("units"),
    )
    nations = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            t(spark, sf_dir, "orders").select(
                "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        # nation × year groups are SF-bounded → DECIMAL(38,0) fold of
        # the (possibly negative) per-line profit
        .agg(
            F.sum(
                (
                    F.col("units") - F.col("retail_c") * F.col("qty") * 100
                ).cast("decimal(38,0)")
            ).alias("_p")
        )
        .select(
            "nation",
            "o_year",
            ieee_round(F.col("_p") / 10000.0, 2).alias("profit"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       {sql_ieee_round(
           "sum(" + _SQL_UNITS + " - CAST(round(p_retailprice * 100) AS BIGINT)"
           " * CAST(round(l_quantity) AS BIGINT) * 100) / 10000.0", 2)}
           AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{_Q9_TOKEN}%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------


def q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by how many orders they placed,
    INCLUDING zero-order customers — the left-outer + double-aggregate
    classic. Scale: first agg shuffles orders on custkey (pre-agg
    count, map-side combined), the left join attaches it to the
    customer dim, the second agg is |distinct counts|-sized."""
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey")
        .join(
            per_cust, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select(
            F.col("c_count").cast("long").alias("c_count"),
            F.col("custdist").cast("long").alias("custdist"),
        )
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, coalesce(o.cnt, 0) AS c_count
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue for one brand
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#4"


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue locked in lineitems whose quantity is below 1/5 of their
    part's average quantity, for one brand — Q17's correlated average,
    decorrelated into one per-part aggregate and compared by exact
    cross-multiplication (5·q·n < Σq — no float average anywhere).
    Scale: the brand filter prunes the part dim FIRST; the per-part
    agg runs only over the brand's lineitems (semi-joined), then joins
    back. Both the brand subset and the per-part agg are a constant
    FRACTION of an SF-scaling table (~1/25 of part), not bounded, so
    neither carries a forced broadcast hint — AQE/stats pick broadcast
    at scales where it fits and shuffle where it doesn't."""
    brand_parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == _Q17_BRAND)
        .select("p_partkey")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .join(
            brand_parts,
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select(
            "l_partkey",
            F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    li = li.localCheckpoint()  # feeds the per-part agg AND the probe side
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").alias("n"), F.sum("qty").alias("sumq")
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(5 * F.col("qty") * F.col("n") < F.col("sumq"))
        .agg(
            F.count("*").cast("long").alias("n_small_lines"),
            F.coalesce(F.sum("cents"), F.lit(0)).alias("_c"),
        )
        .select(
            "n_small_lines",
            ieee_round(F.col("_c") / 100.0 / 7.0, 2).alias("avg_yearly"),
        )
    )


Q17_SQL = f"""
WITH li AS (
    SELECT l_partkey,
           CAST(round(l_quantity) AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem
    WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_brand = '{_Q17_BRAND}'
    )
),
per_part AS (
    SELECT l_partkey AS pk, count(*) AS n, sum(qty) AS sumq
    FROM li GROUP BY l_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
       {sql_ieee_round("coalesce(sum(cents), 0) / 100.0 / 7.0", 2)}
           AS avg_yearly
FROM li JOIN per_part ON l_partkey = pk
WHERE 5 * qty * n < sumq
"""


# ---------------------------------------------------------------------------
# Q18 — large-quantity orders
# ---------------------------------------------------------------------------

_Q18_QTY = 150


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose summed lineitem quantity exceeds the threshold,
    with customer name — groupBy-HAVING on the fact, then two
    hash joins to attach order/customer context to the tiny survivor
    set. Ordering ties broken by exact total-price cents."""
    big = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_QTY)
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("o_date"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_c"),
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_date",
            ieee_round(F.col("price_c") / 100.0, 2).alias("total_price"),
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_name,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_orderdate AS DATE) AS o_date,
       {sql_ieee_round(
           "CAST(round(o_totalprice * 100) AS BIGINT) / 100.0", 2)}
           AS total_price,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM (
    SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {_Q18_QTY}
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 — disjunctive join predicate
# ---------------------------------------------------------------------------

_Q19 = [
    ("Brand#4", 1, 15, 1, 20),
    ("Brand#19", 10, 30, 10, 30),
    ("Brand#2", 20, 50, 20, 40),
]


def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row revenue under an OR of (brand, size-band, quantity-band)
    conjunctions — the disjunctive-predicate join. Scale: the part side
    pre-filters to the UNION of brand×size disjuncts (so the join
    input is already pruned), the equi-join runs on partkey alone, and
    the residual disjunction evaluates post-join in codegen — the
    planner never falls back to a nested-loop join. The filtered part
    side is a constant fraction of an SF-scaling table, so it carries
    NO forced broadcast hint — the equi-join key keeps the plan
    hash/sort-merge-safe and AQE broadcasts only where stats fit."""
    part_pred = None
    for brand, slo, shi, _, _ in _Q19:
        p = (F.col("p_brand") == brand) & F.col("p_size").between(slo, shi)
        part_pred = p if part_pred is None else (part_pred | p)
    parts = (
        t(spark, sf_dir, "part")
        .filter(part_pred)
        .select("p_partkey", "p_brand", "p_size")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
        _units().alias("units"),
    )
    full_pred = None
    for brand, slo, shi, qlo, qhi in _Q19:
        p = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(slo, shi)
            & F.col("qty").between(qlo, qhi)
        )
        full_pred = p if full_pred is None else (full_pred | p)
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .filter(full_pred)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            # 1-row global fold → DECIMAL(38,0)
            F.coalesce(
                F.sum(F.col("units").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("_u"),
        )
        .select(
            "n_lines",
            ieee_round(F.col("_u") / 10000.0, 2).alias("revenue"),
        )
    )


def _q19_sql_disjunct(brand: str, slo: int, shi: int, qlo: int, qhi: int) -> str:
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND CAST(round(l_quantity) AS BIGINT) BETWEEN {qlo} AND {qhi})"
    )


Q19_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       {sql_ieee_round("coalesce(sum(" + _SQL_UNITS + "), 0) / 10000.0", 2)}
           AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {" OR ".join(_q19_sql_disjunct(*d) for d in _Q19)}
"""


# ---------------------------------------------------------------------------
# Q21 — sole late supplier in multi-supplier orders
# ---------------------------------------------------------------------------

_Q21_K = 20


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper (ship > order date +
    90d) in orders involving several suppliers — Q21's EXISTS/NOT
    EXISTS pair, decorrelated into one per-(order, supplier) aggregate
    plus one per-order rollup (each a single shuffle; the correlated
    form would rescan lineitem twice per order)."""
    per_os = (
        _li_dates(spark, sf_dir)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("ship_d") > F.date_add("order_d", _LATE_DAYS)).cast(
                    "int"
                )
            ).alias("late")
        )
    )
    # r18: the per-order rollup is a WINDOW over the same rows, not a
    # second aggregate + semi-join. The previous shape localCheckpointed
    # per_os (the ~594k-row table was written once and re-read by both
    # the rollup and the probe side — two 52 MB block-manager passes at
    # sf0.1) and then shuffled both sides of a LeftSemi. One window
    # partitioned by l_orderkey computes n_supp/n_late in a single pass
    # with identical semantics (count/sum over exactly the per_os rows
    # of the order), so the checkpoint, its double read, and the
    # semi-join all disappear.
    from pyspark.sql import Window

    per_order = Window.partitionBy("l_orderkey")
    return (
        per_os.withColumn("n_supp", F.count("*").over(per_order))
        .withColumn("n_late", F.sum("late").over(per_order))
        .filter(
            (F.col("late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(
            t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(_Q21_K)
    )


Q21_SQL = f"""
WITH per_os AS (
    SELECT l_orderkey, l_suppkey,
           max(CASE WHEN CAST(l_shipdate AS DATE) >
                         CAST(o_orderdate AS DATE) + {_LATE_DAYS}
                    THEN 1 ELSE 0 END) AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey, l_suppkey
),
per_order AS (
    SELECT l_orderkey AS ok, count(*) AS n_supp, sum(late) AS n_late
    FROM per_os GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_os
JOIN per_order ON l_orderkey = ok AND n_supp > 1 AND n_late = 1
JOIN supplier  ON l_suppkey = s_suppkey
WHERE late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {_Q21_K}
"""


# ---------------------------------------------------------------------------
# Q22 — dormant above-average-balance customers
# ---------------------------------------------------------------------------


_Q22_CUT = "1999-01-01"


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: customers with above-average positive balance and no
    order since the cutoff (the classic's 7-year dormancy window — in
    THIS testdata every customer has ordered at least once, so
    "no orders ever" is the degenerate empty set; the windowed form is
    the faithful Q22 semantics). The average is compared by exact
    cross-multiplication (cents·n > Σcents over positives), the
    dormancy test is an anti join against the date-filtered orders
    scan (filter pushed), and the nation dim broadcasts."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_c"),
    )
    pos = cust.filter(F.col("bal_c") > 0)
    stats = pos.agg(
        F.count("*").alias("n_pos"), F.sum("bal_c").alias("sum_pos")
    )
    return (
        pos.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_pos"))
        .join(
            t(spark, sf_dir, "orders")
            .filter(F.to_date("o_orderdate") >= F.lit(_Q22_CUT))
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum("bal_c").alias("_b"),
        )
        .select(
            "nation",
            "numcust",
            ieee_round(F.col("_b") / 100.0, 2).alias("total_acctbal"),
        )
        .orderBy("nation")
    )


Q22_SQL = f"""
WITH cust AS (
    SELECT c_custkey, c_nationkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
    FROM customer
),
pos AS (SELECT * FROM cust WHERE bal_c > 0),
stats AS (SELECT count(*) AS n_pos, sum(bal_c) AS sum_pos FROM pos)
SELECT n_name AS nation,
       CAST(count(*) AS BIGINT) AS numcust,
       {sql_ieee_round('sum(bal_c) / 100.0', 2)} AS total_acctbal
FROM pos CROSS JOIN stats
JOIN nation ON c_nationkey = n_nationkey
WHERE bal_c * n_pos > sum_pos
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND CAST(o_orderdate AS DATE) >= DATE '{_Q22_CUT}'
  )
GROUP BY n_name
ORDER BY nation
"""


R7B_ENTRIES: dict[str, Entry] = {
    "q3_unshipped_topk": Entry(q3_unshipped_topk, Q3_SQL),
    "q4_late_exists": Entry(q4_late_exists, Q4_SQL),
    "q6_forecast_delta": Entry(q6_forecast_delta, Q6_SQL),
    "q7_nation_volume": Entry(q7_nation_volume, Q7_SQL),
    "q9_profit_proxy": Entry(q9_profit_proxy, Q9_SQL),
    "q13_order_histogram": Entry(q13_order_histogram, Q13_SQL),
    "q17_small_qty_revenue": Entry(q17_small_qty_revenue, Q17_SQL),
    "q18_large_orders": Entry(q18_large_orders, Q18_SQL),
    "q19_disjunctive_join": Entry(q19_disjunctive_join, Q19_SQL),
    "q21_sole_late_supplier": Entry(q21_sole_late_supplier, Q21_SQL),
    "q22_dormant_customers": Entry(q22_dormant_customers, Q22_SQL),
}
