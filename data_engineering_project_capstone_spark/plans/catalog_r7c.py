"""Round-7c catalog entries — EXACT distributed quantiles with no
global sort or whole-table window. Several SCALE.md rows cite
"two-phase bucketed quantiles" as the extreme-scale fallback for rank
windows (orders_gini, calibration_curve, rfm_segments...); this module
IMPLEMENTS that pattern as first-class oracle-checked entries, so the
claim is load-bearing code rather than a footnote:

- ``two_phase_quantiles``: exact p50/p90/p99 of order totalprice via
  bucket histogram → cumulative bucket counts (bounded window) →
  rank-within-located-bucket. k-th-smallest (percentile_disc-style)
  semantics; target positions via INTEGER ceiling division, never a
  float position.
- ``weighted_median``: quantity-weighted median of lineitem unit
  revenue — the value where cumulative weight first reaches ⌈W/2⌉,
  same two-phase shape but at value granularity (no row_number at
  all: ties collapse into per-value weight sums).
- ``price_histogram``: 20 equal-width bins over order totalprice with
  pure-integer bin math — min/max ride one broadcast, bin edges are
  exact, and the whole thing is two scans + one bounded agg.

Parity: all positions/bins are int64 arithmetic ((q_num·n + q_den −
1) // q_den, (c − min)·K // span); the oracle twins compute the SAME
k-th element — DuckDB uses the direct ORDER BY/OFFSET or
value-cumulative form, which selects an identical value by definition
(k-th smallest is formulation-independent). Doubles only in final
rounded dollar readouts.

Scale: phase-1 bucket tables are price-domain-bounded (≤ ~10⁴ rows at
any SF), so their cumulative windows are presentation-sized; phase 2
touches only the located buckets (1/bucket-count of the fact); the
located-bucket descriptors broadcast. This is exactly the plan a
global rank window cannot give at 100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t

# (label, numerator, denominator) — position = ceil(q·n) as pure ints
_QUANTILES = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
_BUCKET_CENTS = 10_000  # $100-wide buckets


def two_phase_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of o_totalprice (k-th smallest at position
    ⌈q·n⌉) without sorting the fact: histogram on $100 buckets,
    bounded cumulative window locates each target's bucket, then a
    bucket-local rank finds the element. Ties collapse by value, so
    the result is partition-order independent."""
    # quantiles are over KNOWN values (percentile functions skip NULLs);
    # an unfiltered NULL price would land in a NULL bucket that sorts
    # FIRST in Spark's cumulative window and LAST in DuckDB's global
    # rank, shifting every position (degenerate-orders NULL-measure net)
    vals = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"))
    )
    vals = vals.localCheckpoint()  # feeds histogram + phase-2 probe
    hist = (
        vals.groupBy((F.col("c") / _BUCKET_CENTS).cast("long").alias("b"))
        .agg(F.count("*").alias("cnt"))
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "b",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("before"),
        (F.coalesce(F.sum("cnt").over(wb), F.lit(0)) + F.col("cnt")).alias(
            "through"
        ),
    )
    n_total = vals.agg(F.count("*").alias("n"))
    targets = (
        spark.createDataFrame(_QUANTILES, "q string, qn long, qd long")
        .crossJoin(F.broadcast(n_total))
        .select(
            "q",
            F.expr("(qn * n + qd - 1) div qd").alias("pos"),
        )
    )
    located = (
        cum.crossJoin(F.broadcast(targets))
        .filter((F.col("before") < F.col("pos")) & (F.col("pos") <= F.col("through")))
        .select("q", "pos", "b", "before")
    )
    in_bucket = vals.join(
        F.broadcast(located),
        (F.col("c") / _BUCKET_CENTS).cast("long") == F.col("b"),
    )
    wv = Window.partitionBy("q", "b").orderBy("c")
    return (
        in_bucket.select(
            "q",
            "pos",
            "c",
            (F.col("before") + F.row_number().over(wv)).alias("grank"),
        )
        .filter(F.col("grank") == F.col("pos"))
        .select(
            "q",
            F.col("pos").cast("long").alias("pos"),
            ieee_round(F.col("c") / 100.0, 2).alias("value"),
        )
        .orderBy("q")
    )


TWO_PHASE_QUANTILES_SQL = f"""
WITH vals AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
    FROM orders WHERE o_totalprice IS NOT NULL
),
n AS (SELECT count(*) AS n FROM vals),
targets AS (
    SELECT q, (qn * n.n + qd - 1) // qd AS pos
    FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
         t(q, qn, qd)
    CROSS JOIN n
),
ranked AS (
    SELECT c, row_number() OVER (ORDER BY c) AS grank FROM vals
)
SELECT t.q, CAST(t.pos AS BIGINT) AS pos,
       {sql_ieee_round("r.c / 100.0", 2)} AS value
FROM targets t JOIN ranked r ON r.grank = t.pos
ORDER BY t.q
"""


def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of lineitem extendedprice: the smallest
    value whose cumulative weight reaches ⌈W/2⌉. Two-phase at value
    granularity — per-bucket weight sums, bounded cumulative window to
    locate the bucket, then per-VALUE weight sums inside it (no
    row_number anywhere: duplicate values merge, so no tie ordering
    exists to depend on)."""
    # a NULL price has no bucket (its NULL bucket sorts FIRST in
    # Spark's cumulative window, LAST in the oracle's value order) and
    # a non-positive weight must not be electable as the median value
    # (a zero-weight row ties cumw with its predecessor at the
    # boundary) — both excluded on BOTH engines; random-corpus fuzz net
    vals = (
        t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_extendedprice").isNotNull()
            & (F.round(F.col("l_quantity"), 0) > 0)
        )
        .select(
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("c"),
            F.round(F.col("l_quantity"), 0).cast("long").alias("w"),
        )
    )
    vals = vals.localCheckpoint()  # feeds histogram + phase-2 probe
    hist = (
        vals.groupBy((F.col("c") / _BUCKET_CENTS).cast("long").alias("b"))
        .agg(F.sum("w").alias("wsum"))
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "b",
        F.coalesce(F.sum("wsum").over(wb), F.lit(0)).alias("before"),
        (F.coalesce(F.sum("wsum").over(wb), F.lit(0)) + F.col("wsum")).alias(
            "through"
        ),
    )
    tot = vals.agg(F.expr("(sum(w) + 1) div 2").alias("pos"))
    located = (
        cum.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("before") < F.col("pos")) & (F.col("pos") <= F.col("through"))
        )
        .select("pos", "b", "before")
    )
    in_bucket = (
        vals.join(
            F.broadcast(located),
            (F.col("c") / _BUCKET_CENTS).cast("long") == F.col("b"),
        )
        .groupBy("pos", "before", "c")
        .agg(F.sum("w").alias("wv"))
    )
    wv = Window.partitionBy("pos").orderBy("c")
    return (
        in_bucket.select(
            "pos",
            "c",
            (
                F.col("before") + F.sum("wv").over(wv.rowsBetween(Window.unboundedPreceding, 0))
            ).alias("cumw"),
        )
        .filter(F.col("cumw") >= F.col("pos"))
        .groupBy("pos")
        .agg(F.min("c").alias("c"))
        .select(
            F.col("pos").cast("long").alias("half_weight"),
            ieee_round(F.col("c") / 100.0, 2).alias("weighted_median"),
        )
    )


WEIGHTED_MEDIAN_SQL = f"""
WITH vals AS (
    SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
           CAST(round(l_quantity) AS BIGINT) AS w
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL AND round(l_quantity) > 0
),
tot AS (SELECT (sum(w) + 1) // 2 AS pos FROM vals),
by_val AS (
    SELECT c, sum(w) AS wv FROM vals GROUP BY c
),
cumv AS (
    SELECT c, sum(wv) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumw
    FROM by_val
)
SELECT CAST(tot.pos AS BIGINT) AS half_weight,
       {sql_ieee_round("min(c) / 100.0", 2)} AS weighted_median
FROM cumv CROSS JOIN tot
WHERE cumw >= tot.pos
GROUP BY tot.pos
"""


_N_BINS = 20


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 equal-width bins over o_totalprice with pure-integer bin
    math: bin = (c − min)·20 // (max − min + 1), edges reported
    exactly. One broadcast of the 1-row min/max, one bounded agg —
    the shape survives any fact size."""
    vals = t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c")
    )
    mm = vals.agg(
        F.min("c").alias("lo"), (F.max("c") - F.min("c") + 1).alias("span")
    )
    return (
        vals.crossJoin(F.broadcast(mm))
        .select(
            F.expr(f"((c - lo) * {_N_BINS}) div span").alias("bin"),
            "lo",
            "span",
        )
        .groupBy("bin", "lo", "span")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.col("bin").cast("long").alias("bin"),
            ieee_round(
                (F.col("lo") + F.col("bin") * F.col("span") / F.lit(_N_BINS))
                / 100.0,
                2,
            ).alias("bin_lo"),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("bin")
    )


PRICE_HISTOGRAM_SQL = f"""
WITH vals AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
),
mm AS (SELECT min(c) AS lo, max(c) - min(c) + 1 AS span FROM vals)
SELECT CAST(bin AS BIGINT) AS bin,
       {sql_ieee_round("(lo + bin * span / " + str(_N_BINS) + ".0) / 100.0", 2)}
           AS bin_lo,
       CAST(count(*) AS BIGINT) AS n_orders
FROM (
    SELECT ((c - lo) * {_N_BINS}) // span AS bin, lo, span
    FROM vals CROSS JOIN mm
)
GROUP BY bin, lo, span
ORDER BY bin
"""


R7C_ENTRIES: dict[str, Entry] = {
    "two_phase_quantiles": Entry(two_phase_quantiles, TWO_PHASE_QUANTILES_SQL),
    "weighted_median": Entry(weighted_median, WEIGHTED_MEDIAN_SQL),
    "price_histogram": Entry(price_histogram, PRICE_HISTOGRAM_SQL),
}
