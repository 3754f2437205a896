"""Round-7e catalog entries — forecast-quality and hierarchical
readouts:

- ``forecast_mase``: MASE-style error ratio of the seasonal-naive
  forecast (x̂_t = x_{t−7}) over the daily order-count series, scaled
  by the naive-1 benchmark — Σ|x_t − x_{t−7}| / Σ|x_t − x_{t−1}|. Both
  numerator and denominator are EXACT integer sums of absolute count
  differences (the rare error metric with perfect cross-engine
  parity); < 1 means weekly seasonality is real signal.
- ``conversion_wilson_ci``: daily signup→purchase user-conversion rate
  with the Wilson 95% score interval — the right CI for small daily
  denominators (never leaves [0,1], unlike the normal approximation).
  n and k are exact integer user counts; the Wilson formula is the
  identical op sequence on both engines.
- ``hierarchy_share``: revenue by region → nation with each level's
  share of its PARENT (nation-of-region, region-of-total) — the
  drill-down readout a flat GROUP BY doesn't give. Three bounded
  aggregates stitched with broadcast joins; shares are ratios of
  exact int64 revenue units.

Scale: all three operate on aggregate tables bounded by the calendar
or the dimension hierarchy after one fact pass; day-lag matching is a
self-join on the date spine (never a global window over the fact)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, events_table, sql_ieee_round, t


def forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row seasonal-naive quality ledger: matched-pair counts and
    the exact-integer MASE ratio (NULL if the naive-1 denominator is
    zero — a constant series)."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count("*").alias("x"))
    )
    daily = daily.localCheckpoint()  # 3 join consumers
    lag1 = daily.select(
        F.date_add("d", 1).alias("d"), F.col("x").alias("x1")
    )
    lag7 = daily.select(
        F.date_add("d", 7).alias("d"), F.col("x").alias("x7")
    )
    err = (
        daily.join(lag1, "d")
        .join(lag7, "d")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.abs(F.col("x") - F.col("x7"))).alias("e7"),
            F.sum(F.abs(F.col("x") - F.col("x1"))).alias("e1"),
        )
    )
    return err.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("e7").cast("long").alias("seasonal_abs_err"),
        F.col("e1").cast("long").alias("naive_abs_err"),
        ieee_round(
            F.when(F.col("e1") > 0, F.col("e7") / F.col("e1")), 6
        ).alias("mase"),
    )


FORECAST_MASE_SQL = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS x
    FROM orders GROUP BY 1
),
err AS (
    SELECT count(*) AS n_days,
           sum(abs(c.x - l7.x)) AS e7,
           sum(abs(c.x - l1.x)) AS e1
    FROM daily c
    JOIN daily l1 ON c.d = l1.d + 1
    JOIN daily l7 ON c.d = l7.d + 7
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       CAST(e7 AS BIGINT) AS seasonal_abs_err,
       CAST(e1 AS BIGINT) AS naive_abs_err,
       {sql_ieee_round("CASE WHEN e1 > 0 THEN e7 * 1.0 / e1 END", 6)} AS mase
FROM err
"""


_WILSON_Z = 1.96  # the same literal constant on both engines


def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: distinct signup users (n), of whom how many also
    purchased that same day (k), the conversion rate, and the Wilson
    95% interval. n/k are exact integer distinct-user counts; every
    double on both sides derives from (k, n, z) via the identical
    formula, so the hash gate holds."""
    ev = events_table(spark, sf_dir).select(
        F.to_date("ts").alias("d"), "user_id", "event_type"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .select("d", "user_id")
        .distinct()
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("d", "user_id")
        .distinct()
    )
    per_day = (
        signups.join(purchases, ["d", "user_id"], "left_semi")
        .groupBy("d")
        .agg(F.count("*").alias("k"))
        .join(
            signups.groupBy("d").agg(F.count("*").alias("n")),
            "d",
            "right_outer",
        )
        .select("d", F.coalesce(F.col("k"), F.lit(0)).alias("k"), "n")
    )
    z2 = _WILSON_Z * _WILSON_Z
    p = F.col("k") / F.col("n")
    denom = 1 + z2 / F.col("n")
    center = (p + z2 / (2 * F.col("n"))) / denom
    half = (
        F.lit(_WILSON_Z)
        * F.sqrt(
            p * (1 - p) / F.col("n") + z2 / (4 * F.col("n") * F.col("n"))
        )
        / denom
    )
    return per_day.select(
        "d",
        F.col("n").cast("long").alias("n_signups"),
        F.col("k").cast("long").alias("n_converted"),
        ieee_round(p, 6).alias("rate"),
        ieee_round(center - half, 6).alias("wilson_lo"),
        ieee_round(center + half, 6).alias("wilson_hi"),
    ).orderBy("d")


CONVERSION_WILSON_CI_SQL = f"""
WITH ev AS (
    SELECT CAST(ts AS DATE) AS d, user_id, event_type FROM events
),
signups AS (
    SELECT DISTINCT d, user_id FROM ev WHERE event_type = 'signup'
),
purchases AS (
    SELECT DISTINCT d, user_id FROM ev WHERE event_type = 'purchase'
),
per_day AS (
    SELECT s.d,
           count(*) AS n,
           sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS k
    FROM signups s
    LEFT JOIN purchases p ON s.d = p.d AND s.user_id = p.user_id
    GROUP BY s.d
)
SELECT d,
       CAST(n AS BIGINT) AS n_signups,
       CAST(k AS BIGINT) AS n_converted,
       {sql_ieee_round("k * 1.0 / n", 6)} AS rate,
       {sql_ieee_round(
           "((k * 1.0 / n) + {z2} / (2 * n)) / (1 + {z2} / n)"
           " - {z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n"
           " + {z2} / (4 * n * n)) / (1 + {z2} / n)", 6
       ).format(z=_WILSON_Z, z2=_WILSON_Z * _WILSON_Z)} AS wilson_lo,
       {sql_ieee_round(
           "((k * 1.0 / n) + {z2} / (2 * n)) / (1 + {z2} / n)"
           " + {z} * sqrt((k * 1.0 / n) * (1 - k * 1.0 / n) / n"
           " + {z2} / (4 * n * n)) / (1 + {z2} / n)", 6
       ).format(z=_WILSON_Z, z2=_WILSON_Z * _WILSON_Z)} AS wilson_hi
FROM per_day
ORDER BY d
"""


def hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(region, nation) revenue with nation-share-of-region and
    region-share-of-total: one fact pass to (nation) grain, then
    bounded rollups stitched by broadcast joins — the drill-down
    percent-of-parent readout."""
    nr = (
        t(spark, sf_dir, "nation")
        .join(
            t(spark, sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name", "r_name")
    )
    per_nation = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
        .join(
            F.broadcast(nr), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("u")
        )
    )
    per_nation = per_nation.localCheckpoint()  # 3 consumers
    per_region = per_nation.groupBy(F.col("r_name").alias("r2")).agg(
        F.sum("u").alias("ru")
    )
    total = per_nation.agg(F.sum("u").alias("tu"))
    return (
        per_nation.join(
            F.broadcast(per_region), F.col("r_name") == F.col("r2")
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            ieee_round(F.col("u") / 100.0, 2).alias("revenue"),
            ieee_round(F.col("u") / F.col("ru"), 6).alias(
                "share_of_region"
            ),
            ieee_round(F.col("ru") / F.col("tu"), 6).alias(
                "region_share_of_total"
            ),
        )
        .orderBy("region", "nation")
    )


HIERARCHY_SHARE_SQL = f"""
WITH per_nation AS (
    SELECT r.r_name, n.n_name,
           sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS u
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
),
per_region AS (
    SELECT r_name AS r2, sum(u) AS ru FROM per_nation GROUP BY 1
),
total AS (SELECT sum(u) AS tu FROM per_nation)
SELECT r_name AS region,
       n_name AS nation,
       {sql_ieee_round("u / 100.0", 2)} AS revenue,
       {sql_ieee_round("u * 1.0 / ru", 6)} AS share_of_region,
       {sql_ieee_round("ru * 1.0 / tu", 6)} AS region_share_of_total
FROM per_nation
JOIN per_region ON r_name = r2
CROSS JOIN total
ORDER BY region, nation
"""


R7E_ENTRIES: dict[str, Entry] = {
    "forecast_mase": Entry(forecast_mase, FORECAST_MASE_SQL),
    "conversion_wilson_ci": Entry(
        conversion_wilson_ci, CONVERSION_WILSON_CI_SQL
    ),
    "hierarchy_share": Entry(hierarchy_share, HIERARCHY_SHARE_SQL),
}
