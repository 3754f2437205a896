"""Round-6n catalog entries — revenue analytics composites:

- ``orders_cohort_ltv``: the cohort-LTV triangle — customers grouped
  by first-order month, average CUMULATIVE revenue per customer
  tracked by months-since-first-order (ages 0-12). The
  analytics-engineering staple behind retention-revenue curves.
- ``abc_classification``: ABC inventory classes from cumulative
  revenue share (A = top 80%, B = next 15%, C = tail) with
  INTEGER-threshold comparisons (cum·100 ≤ tot·80) so class
  boundaries are exact on both engines.
- ``session_bounce_rate``: per-day session counts and bounce rate
  (single-event sessions), over the shared 30-min-gap sessionizer.

Month arithmetic is integer (year·12 + month), revenue is exact int64
cents/units — every grouping key and threshold is integer-derived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t
from .catalog_r6i import _SQL_UNITS, _units

_LTV_MAX_AGE = 12


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTV triangle rows (cohort_month, age_months, n_customers,
    avg_cum_revenue): average cumulative spend per cohort customer
    through each month-age ≤ 12.

    Scale shape: one per-customer aggregate (first-order month index),
    one (cohort, age) revenue aggregate, then a cumulative window over
    the AGGREGATE triangle (|cohorts|·|ages| rows). Cohort size joins
    back via broadcast. Month index = year·12 + month − exact integer
    on both engines (no date-diff semantics to disagree about)."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("midx").alias("cohort_idx"))
    cohort_size = first.groupBy("cohort_idx").agg(
        F.count("*").alias("n_customers")
    )
    aged = (
        orders.join(first, "o_custkey")
        .select(
            "cohort_idx",
            (F.col("midx") - F.col("cohort_idx")).alias("age_months"),
            "cents",
        )
        .filter(F.col("age_months") <= _LTV_MAX_AGE)
        .groupBy("cohort_idx", "age_months")
        .agg(F.sum("cents").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort_idx")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        aged.withColumn("cum_rev", F.sum("rev").over(w))
        .join(F.broadcast(cohort_size), "cohort_idx")
        .select(
            F.concat_ws(
                "-",
                F.floor((F.col("cohort_idx") - 1) / 12).cast("int"),
                F.lpad(
                    ((F.col("cohort_idx") - 1) % 12 + 1).cast("string"), 2, "0"
                ),
            ).alias("cohort_month"),
            F.col("age_months").cast("int").alias("age_months"),
            F.col("n_customers").cast("long").alias("n_customers"),
            ieee_round(
                F.col("cum_rev") / 100.0 / F.col("n_customers"), 2
            ).alias("avg_cum_revenue"),
        )
        .orderBy("cohort_month", "age_months")
    )


COHORT_LTV_SQL = f"""
WITH o AS (
    SELECT o_custkey,
           year(o_orderdate) * 12 + month(o_orderdate) AS midx,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
first AS (SELECT o_custkey, min(midx) AS cohort_idx FROM o GROUP BY o_custkey),
cohort_size AS (
    SELECT cohort_idx, count(*) AS n_customers FROM first GROUP BY cohort_idx
),
aged AS (
    SELECT f.cohort_idx, o.midx - f.cohort_idx AS age_months,
           sum(cents) AS rev
    FROM o JOIN first f ON o.o_custkey = f.o_custkey
    WHERE o.midx - f.cohort_idx <= {_LTV_MAX_AGE}
    GROUP BY 1, 2
),
cum AS (
    SELECT cohort_idx, age_months,
           sum(rev) OVER (PARTITION BY cohort_idx ORDER BY age_months
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev
    FROM aged
)
SELECT concat(CAST((cohort_idx - 1) // 12 AS VARCHAR), '-',
              lpad(CAST((cohort_idx - 1) % 12 + 1 AS VARCHAR), 2, '0'))
           AS cohort_month,
       CAST(age_months AS INTEGER) AS age_months,
       CAST(n_customers AS BIGINT) AS n_customers,
       {sql_ieee_round("cum_rev / 100.0 / n_customers", 2)}
           AS avg_cum_revenue
FROM cum JOIN cohort_size USING (cohort_idx)
ORDER BY cohort_month, age_months
"""


def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classes over parts by cumulative revenue share: A = parts
    covering the top 80% of revenue, B = next 15%, C = tail. Class
    assignment uses INTEGER comparisons on exact unit sums
    (cum·100 ≤ tot·80), so the boundary part lands identically on both
    engines. Readout: per class, part count and exact revenue share."""
    per_part = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(_units()).alias("u"))
    )
    w = Window.orderBy(F.desc("u"), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # per-part u keeps int64; the running sum and the total approach
    # GLOBAL revenue → DECIMAL(38,0) (class compares stay exact integer
    # arithmetic; DuckDB's side is HUGEINT already)
    tot = per_part.agg(
        F.sum(F.col("u").cast("decimal(38,0)")).alias("tot_u")
    )
    classed = (
        per_part.withColumn(
            "cum_u", F.sum(F.col("u").cast("decimal(38,0)")).over(w)
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "abc_class",
            F.when(F.col("cum_u") * 100 <= F.col("tot_u") * 80, "A")
            .when(F.col("cum_u") * 100 <= F.col("tot_u") * 95, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum(F.col("u").cast("decimal(38,0)")).alias("_cu"),
            F.max("tot_u").alias("_tu"),
        )
        .select(
            "abc_class",
            "n_parts",
            ieee_round(
                F.col("_cu").cast("double") / F.col("_tu").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


ABC_SQL = f"""
WITH per_part AS (
    SELECT l_partkey, sum({_SQL_UNITS}) AS u FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT sum(u) AS tot_u FROM per_part),
classed AS (
    SELECT u, tot_u,
           CASE WHEN cum_u * 100 <= tot_u * 80 THEN 'A'
                WHEN cum_u * 100 <= tot_u * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM (SELECT u,
                 sum(u) OVER (ORDER BY u DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_u
          FROM per_part), tot
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       {sql_ieee_round("sum(u) * 1.0 / max(tot_u)", 6)} AS revenue_share
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""


def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session quality: sessions started that day, bounces
    (single-event sessions), bounce rate. Built on the shared
    30-min-gap sessionizer (one user-keyed shuffle); the daily readout
    is a date-keyed aggregate over the session table."""
    from ..streaming.events import sessionize_batch
    from .catalog import events_table

    sess = sessionize_batch(events_table(spark, sf_dir), gap_minutes=30)
    return (
        sess.groupBy(F.to_date("session_start").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounces"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            ieee_round(F.col("n_bounces") / F.col("n_sessions"), 6).alias(
                "bounce_rate"
            ),
        )
        .orderBy("day")
    )


SESSION_BOUNCE_SQL = f"""
WITH g AS (
    SELECT ts, user_id, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR date_diff('second', lag(ts) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
    FROM g
),
sess AS (
    SELECT user_id, session_seq, min(ts) AS session_start,
           count(*) AS n_events
    FROM s GROUP BY user_id, session_seq
)
SELECT CAST(session_start AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       {sql_ieee_round(
           "sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0 / count(*)",
           6)} AS bounce_rate
FROM sess
GROUP BY 1
ORDER BY day
"""


R6N_ENTRIES: dict[str, Entry] = {
    "orders_cohort_ltv": Entry(orders_cohort_ltv, COHORT_LTV_SQL),
    "abc_classification": Entry(abc_classification, ABC_SQL),
    "session_bounce_rate": Entry(session_bounce_rate, SESSION_BOUNCE_SQL),
}
