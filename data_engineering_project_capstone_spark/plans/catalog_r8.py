"""Round-8 catalog entries — closing the TPC-H family. catalog_r6i and
catalog_r7b covered Q3-Q10 and Q13-Q22 except the partsupp-bound four;
this module adds the remaining six shapes so every one of the 22
classic decision-support queries has a runnable analog on this schema:

- ``q1_pricing_summary``   (Q1, FAITHFUL): the pricing summary report —
  every column of the classic exists in this lineitem, so this is the
  one query that needs no adaptation at all. Exact integer folds
  (quantity, cents, 10^-4 disc units, 10^-6 charge units summed as
  DECIMAL(38,0) so a 100 TB sum cannot overflow BIGINT), averages as
  one double division of exact integers at readout.
- ``q2_min_cost_supplier`` (Q2 shape, ADAPTED): partsupp is absent, so
  the supply relationship is proxied by observed lineitems and the
  supply cost by the minimum observed unit price (exact cents BIGINT /
  quantity — ONE IEEE division of identical inputs, so the double is
  bit-equal across engines and the min-equality join is sound). The
  correlated "cost = (SELECT min ...)" subquery decorrelates into a
  per-part min + join back, Q2's shape.
- ``q11_important_share``  (Q11 shape, ADAPTED): ps_supplycost·availqty
  proxied by revenue units for one supplier nation; the HAVING
  > FRACTION · SUM(...) scalar subquery is an exact integer
  cross-multiplication (v·1000 > total, DECIMAL(38,0) on the Spark
  side, HUGEINT on DuckDB's) — no float threshold at any scale.
- ``q12_priority_lateness`` (Q12 shape, ADAPTED): l_shipmode is absent,
  so lines are classified into ship-delay bands (the CASE dimension Q12
  groups by) and counted into high- / low-priority columns — the exact
  CASE-IN pivot of the classic, NULL priorities landing in ELSE on
  both engines.
- ``q16_supplier_part_counts`` (Q16 shape, ADAPTED): suppliers per
  (brand, type, size) attribute triple via distinct observed pairs;
  the "customer complaints" NOT IN exclusion becomes a negative-
  balance NOT EXISTS (anti-join semantics — NOT IN's NULL trap is the
  merge_scd2 lesson, pinned there).
- ``q20_volume_share_suppliers`` (Q20 shape, ADAPTED): ps_availqty is
  absent, so "excess stock" becomes "supplied more than half of a
  part's yearly volume" — the nested IN subqueries decorrelate into a
  per-(part,supplier) agg joined to a per-part rollup with an exact
  2·q_ps > q_p integer compare.

Reference scope note: the reference capstone (/root/reference) ships
three Redshift report queries (README.md:173-213); this TPC-H family is
engine surface beyond reference parity, registered so a migrating
analytics user finds the classic shapes ready-made.

Float parity follows catalog_r6i: money in exact integer units, cross-
engine comparisons only on integers or on doubles produced by ONE
identical IEEE op sequence (sql_ieee_round mirrors ieee_round); every
LIMIT query orders by a total order with explicit NULLS LAST so a
pathological NULL sort key cannot make the kept set engine-dependent.
Scale notes per entry docstring."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t
from .catalog_r6i import _SQL_UNITS, _units

# ---------------------------------------------------------------------------
# Q1 — pricing summary report (faithful)
# ---------------------------------------------------------------------------

_Q1_CUT = "2001-09-01"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: per (returnflag, linestatus) sums/averages over all
    lineitems shipped on or before the cutoff. Scale: single scan with
    the date filter pushed, one partial+final hash aggregate on a
    2x2-ish key space (map-side combine absorbs virtually everything
    before the shuffle); charge units are 10^-6 dollars summed as
    DECIMAL(38,0) because a 100 TB fact would overflow a BIGINT fold;
    averages are computed from the exact integer sums at readout, never
    via engine avg() (whose intermediate rounding is engine-specific)."""
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc = F.round(F.col("l_discount") * 100, 0).cast("long")
    tax = F.round(F.col("l_tax") * 100, 0).cast("long")
    # disc units (10^-4 dollars, ≤1e9/row) and charge units (10^-6,
    # ≤1e11/row) both overflow an int64 fold at a ~100 TB row count, so
    # both sum as DECIMAL(38,0) — DuckDB's integer sums are HUGEINT
    # already. cents (≤1e7/row) and qty (≤50/row) keep int64 headroom
    # past 1e11 rows.
    disc_u = (cents * (F.lit(100) - disc)).cast("decimal(38,0)")
    charge_u = (
        cents * (F.lit(100) - disc) * (F.lit(100) + tax)
    ).cast("decimal(38,0)")
    g = (
        t(spark, sf_dir, "lineitem")
        .filter(F.to_date("l_shipdate") <= F.lit(_Q1_CUT))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("_q"),
            F.sum(cents).alias("_c"),
            F.sum(disc_u).alias("_d"),
            F.sum(charge_u).alias("_ch"),
            F.sum(disc).alias("_disc"),
            F.count("*").alias("count_order"),
        )
    )
    n = F.col("count_order")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_q").alias("sum_qty"),
        ieee_round(F.col("_c") / 100.0, 2).alias("sum_base_price"),
        ieee_round(F.col("_d") / 10000.0, 2).alias("sum_disc_price"),
        ieee_round(F.col("_ch") / 1000000.0, 2).alias("sum_charge"),
        ieee_round(F.col("_q") / n, 2).alias("avg_qty"),
        ieee_round(F.col("_c") / 100.0 / n, 2).alias("avg_price"),
        ieee_round(F.col("_disc") / 100.0 / n, 4).alias("avg_disc"),
        n.cast("long").alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


_SQL_QTY = "CAST(round(l_quantity) AS BIGINT)"
_SQL_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_SQL_DISC = "CAST(round(l_discount * 100) AS BIGINT)"
_SQL_TAX = "CAST(round(l_tax * 100) AS BIGINT)"

Q1_SQL = f"""
WITH g AS (
    SELECT l_returnflag, l_linestatus,
           sum({_SQL_QTY}) AS _q,
           sum({_SQL_CENTS}) AS _c,
           sum({_SQL_CENTS} * (100 - {_SQL_DISC})) AS _d,
           sum({_SQL_CENTS} * (100 - {_SQL_DISC}) * (100 + {_SQL_TAX}))
               AS _ch,
           sum({_SQL_DISC}) AS _disc,
           count(*) AS n
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '{_Q1_CUT}'
    GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(_q AS BIGINT) AS sum_qty,
       {sql_ieee_round('_c / 100.0', 2)} AS sum_base_price,
       {sql_ieee_round('_d / 10000.0', 2)} AS sum_disc_price,
       {sql_ieee_round('_ch / 1000000.0', 2)} AS sum_charge,
       {sql_ieee_round('_q / n', 2)} AS avg_qty,
       {sql_ieee_round('_c / 100.0 / n', 2)} AS avg_price,
       {sql_ieee_round('_disc / 100.0 / n', 4)} AS avg_disc,
       CAST(n AS BIGINT) AS count_order
FROM g
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part (adapted: observed unit price)
# ---------------------------------------------------------------------------

_Q2_REGION = "EUROPE"
_Q2_TYPE = "SMALL"
_Q2_K = 100


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for every part of one type, the region's suppliers
    achieving the minimum observed unit price (ties kept, as in the
    classic). Scale: the per-(part,supplier) min is one partial+final
    agg on the fact; the constant nation/region dims carry the only
    broadcast hints — the supplier set and the type-filtered part slice
    grow with SF, so their joins are left to statistics + AQE
    (broadcast at test scale, plan-asserted; shuffle when genuinely
    large); the correlated min decorrelates into a min() window
    PARTITIONED BY part — partition-local after one hash exchange, no
    self-join, no rescan, and safe however many parts exist (a
    broadcast of a per-part min table would not be). Unit price = exact cents /
    quantity, a single IEEE division of bit-identical operands, so
    min() and the equality filter agree across engines exactly; rows
    with non-positive quantity carry no defined unit price and are
    excluded on both sides. Top-K ordered by a total order (acctbal
    DESC NULLS LAST, name, part, suppkey) so the kept set is unique
    even under duplicate names / NULL balances."""
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    # r18 (guide §3.2): the final join keeps only parts of _Q2_TYPE
    # (16.6% of parts in this data), so drop non-matching fact rows
    # BEFORE the (pk, sk) aggregate with a semi-join against the
    # type-filtered part keys — the agg exchange and the per-part
    # window downstream shrink ~6×, and per-(pk,sk) minima are
    # untouched for every surviving part (whole groups drop, never
    # single rows). The slice is dim-sized and filter-pruned; its join
    # strategy is left to statistics + AQE like the main part join.
    small_parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q2_TYPE)
        .select("p_partkey")
    )
    ps = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .join(
            small_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
        )
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.min(cents / F.col("l_quantity")).alias("cost"))
    )
    sup = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(
                    F.col("r_name") == _Q2_REGION
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # no broadcast hints on the supplier set or the type-filtered part
    # slice: both grow with SF (the module docstring's own argument
    # against broadcasting a parts-sized table), so the join strategy is
    # left to statistics + AQE — at test SFs both sides are far under
    # the 10 MB threshold and broadcast anyway (plan-asserted); at 100 TB
    # they shuffle on their keys. Only the constant-size nation/region
    # dims above carry explicit hints.
    eur = ps.join(sup, F.col("sk") == F.col("s_suppkey")).join(
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q2_TYPE)
        .select("p_partkey", "p_name"),
        F.col("pk") == F.col("p_partkey"),
    )
    from pyspark.sql import Window

    per_part = Window.partitionBy("pk")
    return (
        eur.withColumn("mc", F.min("cost").over(per_part))
        .filter(F.col("cost") == F.col("mc"))
        .select(
            ieee_round(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_name",
            F.col("sk").cast("long").alias("s_suppkey"),
            ieee_round(F.col("cost"), 4).alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc_nulls_last(),
            F.col("s_name").asc_nulls_last(),
            "p_partkey",
            "s_suppkey",
        )
        .limit(_Q2_K)
    )


Q2_SQL = f"""
WITH ps AS (
    SELECT l_partkey AS pk, l_suppkey AS sk,
           min({_SQL_CENTS} / l_quantity) AS cost
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_partkey, l_suppkey
),
eur AS (
    SELECT ps.*, s_name, s_acctbal, n_name, p_partkey, p_name
    FROM ps
    JOIN supplier ON sk = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    JOIN part     ON pk = p_partkey
    WHERE r_name = '{_Q2_REGION}' AND p_type = '{_Q2_TYPE}'
),
w AS (SELECT eur.*, min(cost) OVER (PARTITION BY pk) AS mc FROM eur)
SELECT {sql_ieee_round('s_acctbal', 2)} AS s_acctbal,
       s_name,
       n_name AS nation,
       CAST(p_partkey AS BIGINT) AS p_partkey,
       p_name,
       CAST(sk AS BIGINT) AS s_suppkey,
       {sql_ieee_round('cost', 4)} AS supply_cost
FROM w WHERE cost = mc
ORDER BY s_acctbal DESC NULLS LAST, s_name NULLS LAST, p_partkey, s_suppkey
LIMIT {_Q2_K}
"""


# ---------------------------------------------------------------------------
# Q11 — important parts by value share (adapted: revenue units)
# ---------------------------------------------------------------------------

_Q11_NATION = "NATION_7"
_Q11_FRAC_DEN = 1000  # keep parts whose value > total / 1000


def q11_important_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part value for one supplier nation, keeping parts
    whose value exceeds FRACTION of the nation total (the HAVING >
    scalar-subquery query). Scale: the constant nation dim carries the
    only broadcast hint; the one-nation supplier key set grows with SF,
    so its join is left to statistics + AQE (broadcast at test scale,
    shuffle when genuinely large); one partial+final agg per part, a
    1-row broadcast for the total, and an exact integer
    cross-multiplication for the threshold — DECIMAL(38,0)·1000 on the
    Spark side vs DuckDB's HUGEINT, so no float threshold and no BIGINT
    overflow at any SF. Exactness envelope: the two integer types
    diverge only in FAILURE MODE, not in value — past ~1e35 revenue
    units (~1e24 TB of data; unreachable) `v * 1000` overflows
    decimal(38,0), which ANSI-on Spark (this engine's setting, Spark 4
    default) raises as NUMERIC_VALUE_OUT_OF_RANGE while DuckDB's
    128-bit HUGEINT raises its own conversion error — both loud, never
    a silent wrong answer. Same convention as the r7 spearman 4n^4
    saturation note (corrected r11: an earlier note claimed non-ANSI
    NULL-on-overflow; the session runs ANSI ON engine-wide)."""
    sup = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == _Q11_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        t(spark, sf_dir, "lineitem")
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_units()).alias("v"))
    )
    per_part = per_part.localCheckpoint()  # feeds the total AND the probe
    total = per_part.agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("tot")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("v").cast("decimal(38,0)") * _Q11_FRAC_DEN > F.col("tot")
        )
        .select(
            F.col("l_partkey").cast("long").alias("p_partkey"),
            ieee_round(F.col("v") / 10000.0, 2).alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
    SELECT l_partkey, sum({_SQL_UNITS}) AS v
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = '{_Q11_NATION}'
    GROUP BY l_partkey
),
total AS (SELECT sum(v) AS tot FROM per_part)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       {sql_ieee_round('v / 10000.0', 2)} AS value
FROM per_part CROSS JOIN total
WHERE v * {_Q11_FRAC_DEN} > tot
ORDER BY value DESC, p_partkey
"""


# ---------------------------------------------------------------------------
# Q12 — priority mix by ship-delay band (adapted: no shipmode column)
# ---------------------------------------------------------------------------

_Q12_YEAR = 2000
_Q12_FAST = 30
_Q12_REG = 90


def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: lines shipped in one year, bucketed into delay bands
    (the grouping dimension the classic gets from l_shipmode), with
    high- vs low-priority order counts per band — the CASE-IN pivot.
    Scale: the year filter pushes to the lineitem scan, the orders join
    shuffles on orderkey (bucketed big-big path at scale), and the
    3-row aggregate is map-side combined. A NULL o_orderpriority lands
    in the low count on both engines (IN over NULL is not-true)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_d")
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("order_d"),
    )
    delay = F.datediff(F.col("ship_d"), F.col("order_d"))
    band = (
        F.when(delay <= _Q12_FAST, "FAST")
        .when(delay <= _Q12_REG, "REGULAR")
        .otherwise("SLOW")
    )
    high = (
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0)
    )
    return (
        li.filter(F.year("ship_d") == _Q12_YEAR)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(band.alias("delay_band"))
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(1 - high).cast("long").alias("low_line_count"),
        )
        .orderBy("delay_band")
    )


Q12_SQL = f"""
SELECT CASE
           WHEN datediff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) <= {_Q12_FAST}
               THEN 'FAST'
           WHEN datediff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) <= {_Q12_REG}
               THEN 'REGULAR'
           ELSE 'SLOW'
       END AS delay_band,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE EXTRACT(year FROM CAST(l_shipdate AS DATE)) = {_Q12_YEAR}
GROUP BY delay_band
ORDER BY delay_band
"""


# ---------------------------------------------------------------------------
# Q16 — supplier counts per attribute triple (adapted: observed pairs)
# ---------------------------------------------------------------------------

_Q16_EXCL_BRAND = "Brand#1"
_Q16_EXCL_TYPE_PREFIX = "PROMO"
_Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier counts per (brand, type, size)
    attribute triple over observed supply pairs, excluding one brand,
    one type prefix, sizes outside the list, and "complained-about"
    suppliers (negative balance — NOT EXISTS, matching the anti-join;
    NOT IN would drop every group if the exclusion list ever held a
    NULL key). Scale: the pair set is one partial+final distinct on
    the fact and the distinct count is a two-phase agg; the excluded-
    supplier set and the attribute-filtered part slice both grow with
    SF, so their joins carry NO broadcast hint — statistics + AQE
    broadcast them while they fit (plan-asserted at test scale) and
    shuffle them when they don't. NULL attribute rows vanish under the
    same not-true predicates on both engines."""
    pairs = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    excl = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        pairs.join(
            excl.select("s_suppkey"),
            F.col("sk") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            t(spark, sf_dir, "part").filter(
                (F.col("p_brand") != _Q16_EXCL_BRAND)
                & ~F.col("p_type").startswith(_Q16_EXCL_TYPE_PREFIX)
                & F.col("p_size").isin(*_Q16_SIZES)
            ),
            F.col("pk") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sk").cast("long").alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("int").alias("p_size"),
            "supplier_cnt",
        )
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = f"""
WITH pairs AS (
    SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem
)
SELECT p_brand, p_type, CAST(p_size AS INTEGER) AS p_size,
       CAST(count(DISTINCT sk) AS BIGINT) AS supplier_cnt
FROM pairs
JOIN part ON pk = p_partkey
WHERE p_brand <> '{_Q16_EXCL_BRAND}'
  AND p_type NOT LIKE '{_Q16_EXCL_TYPE_PREFIX}%'
  AND p_size IN {_Q16_SIZES}
  AND NOT EXISTS (
      SELECT 1 FROM supplier
      WHERE s_suppkey = sk AND s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 — suppliers with a dominant volume share (adapted: no availqty)
# ---------------------------------------------------------------------------

_Q20_NATION = "NATION_3"
_Q20_YEAR = 2000
_Q20_NAME_PREFIX = "small"


def q20_volume_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers of one nation who, for some part with the
    name prefix, shipped MORE THAN HALF of that part's total volume in
    one year — the classic's nested IN subqueries decorrelated into a
    per-(part,supplier) agg joined to a per-part rollup, with the half
    threshold as an exact 2·q_ps > q_p integer compare. Scale: year +
    name-prefix filters push to the scans; the name-filtered part slice
    and the one-nation supplier set grow with SF, so their joins carry
    no broadcast hint (statistics + AQE broadcast while small, shuffle
    when large — only the constant nation dim is hinted); the fact
    aggregates once; the final output is the distinct qualifying
    supplier set (small), totally ordered by key."""
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.year(F.to_date("l_shipdate")) == _Q20_YEAR)
        .join(
            t(spark, sf_dir, "part")
            .filter(F.col("p_name").startswith(_Q20_NAME_PREFIX))
            .select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    per_ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(qty).alias("q_ps"))
    per_ps = per_ps.localCheckpoint()  # feeds the rollup AND the probe
    per_p = per_ps.groupBy(F.col("pk").alias("ppk")).agg(
        F.sum("q_ps").alias("q_p")
    )
    nat_sup = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == _Q20_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        per_ps.join(per_p, F.col("pk") == F.col("ppk"))
        .filter(F.col("q_ps") * 2 > F.col("q_p"))
        .join(nat_sup, F.col("sk") == F.col("s_suppkey"))
        .select(F.col("sk").cast("long").alias("s_suppkey"), "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
WITH per_ps AS (
    SELECT l_partkey AS pk, l_suppkey AS sk,
           sum({_SQL_QTY}) AS q_ps
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE EXTRACT(year FROM CAST(l_shipdate AS DATE)) = {_Q20_YEAR}
      AND p_name LIKE '{_Q20_NAME_PREFIX}%'
    GROUP BY l_partkey, l_suppkey
),
per_p AS (SELECT pk AS ppk, sum(q_ps) AS q_p FROM per_ps GROUP BY pk)
SELECT DISTINCT CAST(sk AS BIGINT) AS s_suppkey, s_name
FROM per_ps
JOIN per_p ON pk = ppk
JOIN supplier ON sk = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE q_ps * 2 > q_p AND n_name = '{_Q20_NATION}'
ORDER BY s_suppkey
"""


R8_ENTRIES: dict[str, Entry] = {
    "q1_pricing_summary": Entry(q1_pricing_summary, Q1_SQL),
    "q2_min_cost_supplier": Entry(q2_min_cost_supplier, Q2_SQL),
    "q11_important_share": Entry(q11_important_share, Q11_SQL),
    "q12_priority_lateness": Entry(q12_priority_lateness, Q12_SQL),
    "q16_supplier_part_counts": Entry(q16_supplier_part_counts, Q16_SQL),
    "q20_volume_share_suppliers": Entry(q20_volume_share_suppliers, Q20_SQL),
}
