"""Round-7d catalog entries — the gaps-and-islands pattern (absent
from the catalog until now) and compositional drift:

- ``events_burst_hours``: maximal runs of CONSECUTIVE above-threshold
  hours in the event stream — the classic islands construction
  (island id = hour_index − row_number over flagged hours), applied as
  a burst detector. Threshold = 1.5× the mean observed-hour rate,
  compared by integer cross-multiplication (2·cnt·n > 3·total).
- ``customer_active_streaks``: distribution of consecutive-active-
  month streak lengths across customers — the same islands trick
  PARTITIONED per customer (island id = month_index − per-customer
  row_number), aggregated to a streak-length histogram.
- ``priority_mix_shift``: month-over-month L1 distance between order-
  priority composition vectors — the compositional sibling of
  kl_source_drift (which is token-level). Shares are exact integer
  ratios; the lag runs over the calendar-bounded month spine.

Parity: island ids, month indexes, and thresholds are pure int64
arithmetic; the only doubles are share ratios built from identical
integers on both engines, and final rounded readouts. Windows run over
flagged hours / per-customer months / the month spine — all bounded by
calendar or per-key cardinality, never fact-sized without a partition
key (the per-customer islands window partitions on c_custkey)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, events_table, sql_ieee_round, t


def events_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bursts = maximal consecutive runs of hours whose event count
    exceeds 1.5× the mean observed-hour rate. One hour agg (calendar-
    bounded), one broadcast of the 2-number stats, one bounded window
    for the island ids, one island agg."""
    hours = (
        events_table(spark, sf_dir)
        .groupBy(
            F.expr("unix_seconds(ts) div 3600").alias("h")
        )
        .agg(F.count("*").alias("cnt"))
    )
    hours = hours.localCheckpoint()  # feeds stats + the flagged window
    stats = hours.agg(
        F.count("*").alias("n_hours"), F.sum("cnt").alias("total")
    )
    flagged = (
        hours.crossJoin(F.broadcast(stats))
        .filter(2 * F.col("cnt") * F.col("n_hours") > 3 * F.col("total"))
        .select("h", "cnt")
    )
    w = Window.orderBy("h")
    islands = flagged.select(
        "h", "cnt", (F.col("h") - F.row_number().over(w)).alias("grp")
    )
    return (
        islands.groupBy("grp")
        .agg(
            F.min("h").alias("_h0"),
            F.count("*").alias("n_hours"),
            F.sum("cnt").alias("total_events"),
            F.max("cnt").alias("peak_hour_events"),
        )
        .select(
            F.timestamp_seconds(F.col("_h0") * 3600).alias("burst_start"),
            F.col("n_hours").cast("long").alias("n_hours"),
            F.col("total_events").cast("long").alias("total_events"),
            F.col("peak_hour_events").cast("long").alias("peak_hour_events"),
        )
        .orderBy("burst_start")
    )


EVENTS_BURST_HOURS_SQL = """
WITH hours AS (
    -- floor, not round: epoch() is a DOUBLE with sub-second
    -- fraction and ::BIGINT rounds half-up, which flips events in the
    -- last half-second of an hour into the next bucket (off-by-one
    -- island vs Spark's truncating unix_seconds; caught at sf0.001)
    SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS cnt
    FROM events GROUP BY 1
),
stats AS (SELECT count(*) AS n_hours, sum(cnt) AS total FROM hours),
flagged AS (
    SELECT h, cnt FROM hours CROSS JOIN stats
    WHERE 2 * cnt * n_hours > 3 * total
),
islands AS (
    SELECT h, cnt, h - row_number() OVER (ORDER BY h) AS grp FROM flagged
)
SELECT make_timestamp(min(h) * 3600 * 1000000) AS burst_start,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(cnt) AS BIGINT) AS total_events,
       CAST(max(cnt) AS BIGINT) AS peak_hour_events
FROM islands
GROUP BY grp
ORDER BY burst_start
"""


def customer_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of consecutive-active-month streak lengths across all
    customers. The islands window partitions on c_custkey (per-key
    cardinality-bounded: a customer's distinct months ≤ corpus months),
    so the construction shuffles once on custkey and never runs a
    global window."""
    months = (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            ).alias("m"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("m")
    streaks = (
        months.select(
            "o_custkey", (F.col("m") - F.row_number().over(w)).alias("grp")
        )
        .groupBy("o_custkey", "grp")
        .agg(F.count("*").alias("len"))
    )
    return (
        streaks.groupBy("len")
        .agg(F.count("*").alias("n_streaks"))
        .select(
            F.col("len").cast("long").alias("streak_months"),
            F.col("n_streaks").cast("long").alias("n_streaks"),
        )
        .orderBy("streak_months")
    )


CUSTOMER_ACTIVE_STREAKS_SQL = """
WITH months AS (
    SELECT DISTINCT o_custkey,
           EXTRACT(YEAR FROM o_orderdate)::BIGINT * 12
               + EXTRACT(MONTH FROM o_orderdate)::BIGINT - 1 AS m
    FROM orders
),
streaks AS (
    SELECT o_custkey, grp, count(*) AS len
    FROM (
        SELECT o_custkey, m,
               m - row_number() OVER (PARTITION BY o_custkey ORDER BY m)
                   AS grp
        FROM months
    )
    GROUP BY o_custkey, grp
)
SELECT CAST(len AS BIGINT) AS streak_months,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM streaks
GROUP BY len
ORDER BY streak_months
"""


_PRIORITIES = 5  # o_orderpriority has a fixed 5-value domain


_MIX_PRIOS = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
)


def priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month L1 distance between order-priority composition
    vectors: drift = Σ_p |share_p(m) − share_p(m−1)|, NULL for the
    first month. One (month, priority) agg, a pivot to the fixed
    5-wide composition, and a lag over the calendar-bounded month
    spine. Shares are exact integer ratios (cnt/total built from the
    same int64s on both engines)."""
    # the composition is over the FIXED canonical priority taxonomy:
    # a dateless order has no month, and an off-enum or NULL priority
    # is not part of the 5-vector (unfixed, a NULL month diverges in
    # the lag's NULL sort placement, a NULL priority becomes a real
    # Spark pivot column the oracle's equality join drops, and a SIXTH
    # distinct value — the fuzz net's '' — overflows the oracle's
    # hardcoded 5-wide CASE while the Spark pivot widens dynamically).
    by_mp = (
        t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_orderpriority").isin(*_MIX_PRIOS)
        )
        .groupBy(
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            ).alias("m"),
            "o_orderpriority",
        )
        .agg(F.count("*").alias("cnt"))
    )
    # pivot over the EXPLICIT fixed domain: (a) skips the extra
    # distinct-values discovery job a bare pivot() runs, (b) the output
    # schema is static even when the filtered input is EMPTY — a bare
    # pivot on zero rows yields zero priority columns and the
    # composition fold below would have nothing to sum (empty/all-NULL
    # degenerate net).
    comp = (
        by_mp.groupBy("m")
        .pivot("o_orderpriority", list(_MIX_PRIOS))
        .sum("cnt")
        .na.fill(0)
    )
    prio_cols = [c for c in comp.columns if c != "m"]
    total = None
    for c in prio_cols:
        total = F.col(f"`{c}`") if total is None else total + F.col(f"`{c}`")
    comp = comp.select("m", total.alias("tot"), *[F.col(f"`{c}`").alias(f"p{i}") for i, c in enumerate(sorted(prio_cols))])
    w = Window.orderBy("m")
    lagged = comp.select(
        "m",
        "tot",
        F.lag("tot").over(w).alias("ptot"),
        *[F.col(f"p{i}") for i in range(len(prio_cols))],
        *[
            F.lag(f"p{i}").over(w).alias(f"q{i}")
            for i in range(len(prio_cols))
        ],
    )
    l1 = None
    for i in range(len(prio_cols)):
        term = F.abs(
            F.col(f"p{i}") / F.col("tot") - F.col(f"q{i}") / F.col("ptot")
        )
        l1 = term if l1 is None else l1 + term
    return lagged.select(
        F.col("m").cast("long").alias("month_index"),
        F.col("tot").cast("long").alias("n_orders"),
        ieee_round(
            F.when(F.col("ptot").isNotNull(), l1), 6
        ).alias("l1_shift"),
    ).orderBy("month_index")


PRIORITY_MIX_SHIFT_SQL = f"""
WITH by_mp AS (
    SELECT EXTRACT(YEAR FROM o_orderdate)::BIGINT * 12
               + EXTRACT(MONTH FROM o_orderdate)::BIGINT - 1 AS m,
           o_orderpriority AS prio, count(*) AS cnt
    FROM orders
    WHERE o_orderdate IS NOT NULL
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
    GROUP BY 1, 2
),
prios AS (
    SELECT prio, row_number() OVER (ORDER BY prio) - 1 AS i
    FROM (SELECT DISTINCT prio FROM by_mp)
),
comp AS (
    SELECT m,
           sum(cnt) AS tot,
           sum(CASE WHEN i = 0 THEN cnt ELSE 0 END) AS p0,
           sum(CASE WHEN i = 1 THEN cnt ELSE 0 END) AS p1,
           sum(CASE WHEN i = 2 THEN cnt ELSE 0 END) AS p2,
           sum(CASE WHEN i = 3 THEN cnt ELSE 0 END) AS p3,
           sum(CASE WHEN i = 4 THEN cnt ELSE 0 END) AS p4
    FROM by_mp JOIN prios USING (prio)
    GROUP BY m
),
lagged AS (
    SELECT m, tot,
           lag(tot) OVER (ORDER BY m) AS ptot,
           p0, p1, p2, p3, p4,
           lag(p0) OVER (ORDER BY m) AS q0,
           lag(p1) OVER (ORDER BY m) AS q1,
           lag(p2) OVER (ORDER BY m) AS q2,
           lag(p3) OVER (ORDER BY m) AS q3,
           lag(p4) OVER (ORDER BY m) AS q4
    FROM comp
)
SELECT CAST(m AS BIGINT) AS month_index,
       CAST(tot AS BIGINT) AS n_orders,
       {sql_ieee_round(
           "CASE WHEN ptot IS NOT NULL THEN "
           "abs(p0 * 1.0 / tot - q0 * 1.0 / ptot)"
           " + abs(p1 * 1.0 / tot - q1 * 1.0 / ptot)"
           " + abs(p2 * 1.0 / tot - q2 * 1.0 / ptot)"
           " + abs(p3 * 1.0 / tot - q3 * 1.0 / ptot)"
           " + abs(p4 * 1.0 / tot - q4 * 1.0 / ptot) END", 6)} AS l1_shift
FROM lagged
ORDER BY month_index
"""


R7D_ENTRIES: dict[str, Entry] = {
    "events_burst_hours": Entry(events_burst_hours, EVENTS_BURST_HOURS_SQL),
    "customer_active_streaks": Entry(
        customer_active_streaks, CUSTOMER_ACTIVE_STREAKS_SQL
    ),
    "priority_mix_shift": Entry(priority_mix_shift, PRIORITY_MIX_SHIFT_SQL),
}
