"""Round-6g catalog entries — feature-engineering primitives for
training-set construction:

- ``user_activity_features``: the classic churn/engagement feature
  block per user (event counts, active days, recency vs corpus end,
  mean inter-event gap) in one pass.
- ``pit_features``: POINT-IN-TIME-correct feature join — for every
  purchase (label event), the user's history features computed ONLY
  from events strictly before it. The anti-leakage primitive of every
  feature store: a plain join of "current" features would let the
  label's own row (and its future) leak into its features; here the
  features are lagged cumulative windows, so correctness is by
  construction, not by filtering discipline.

Same contract as ``plans.catalog``: identical column aliases, floats
through the shared IEEE rounding helpers; NULL-ts events dropped on
both sides (events NULL policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, events_table, sql_ieee_round

# ---------------------------------------------------------------------------
# 1. Per-user activity feature block
# ---------------------------------------------------------------------------


def user_activity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-model feature block per user: total events, distinct active
    days, hours since last event (vs corpus max ts), mean inter-event
    gap in minutes.

    Scale shape: one groupBy on user_id with map-side combine for the
    counts/min/max; the mean gap needs no window — for n ordered events
    mean gap = (last - first)/(n - 1), an algebraic identity that turns
    a per-user sort into three aggregates. The corpus max ts is a 1-row
    broadcast crossJoin."""
    ev = events_table(spark, sf_dir).filter(F.col("ts").isNotNull())
    ref = ev.agg(F.max("ts").alias("ref_ts"))
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct(F.to_date("ts")).alias("n_active_days"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    gap_min = F.when(
        F.col("n_events") > 1,
        (F.unix_micros("last_ts") - F.unix_micros("first_ts"))
        / F.lit(60_000_000.0)
        / (F.col("n_events") - 1),
    )
    recency_h = (
        F.unix_micros(F.col("ref_ts")) - F.unix_micros(F.col("last_ts"))
    ) / F.lit(3_600_000_000.0)
    return (
        per_user.crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_active_days").cast("long").alias("n_active_days"),
            ieee_round(recency_h, 4).alias("recency_hours"),
            ieee_round(gap_min, 4).alias("mean_gap_minutes"),
        )
        .orderBy("user_id")
    )


USER_ACTIVITY_SQL = f"""
WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
ref AS (SELECT max(ts) AS ref_ts FROM ev),
per_user AS (
    SELECT user_id, count(*) AS n_events,
           count(DISTINCT CAST(ts AS DATE)) AS n_active_days,
           min(ts) AS first_ts, max(ts) AS last_ts
    FROM ev GROUP BY user_id
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_active_days AS BIGINT) AS n_active_days,
       {sql_ieee_round(
           "(epoch_us(ref_ts) - epoch_us(last_ts)) / 3600000000.0", 4
       )} AS recency_hours,
       {sql_ieee_round(
           "CASE WHEN n_events > 1 THEN (epoch_us(last_ts) - "
           "epoch_us(first_ts)) / 60000000.0 / (n_events - 1) END", 4
       )} AS mean_gap_minutes
FROM per_user, ref
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# 2. Point-in-time-correct feature join
# ---------------------------------------------------------------------------


def pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training rows for a purchase model with leakage-proof features:
    for each purchase, the user's event count, click count, and summed
    value STRICTLY BEFORE the purchase's timestamp.

    The implementation makes leakage impossible by construction: one
    per-user ordered window computes exclusive-prefix aggregates
    (frame = unbounded preceding → 1 preceding), so a row's features
    cannot see the row itself or anything after it; purchases then just
    filter the evented stream. No self-join, no between-join — one
    shuffle on user_id.

    Ties: events sharing a timestamp order by event_id, so "strictly
    before" is a total order on (ts, event_id) — deterministic on both
    engines."""
    ev = events_table(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    feat = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_prior_events"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .over(w)
        .alias("n_prior_clicks"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).over(w).alias(
            "_prior_value"
        ),
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.coalesce(F.col("n_prior_events"), F.lit(0))
            .cast("long")
            .alias("n_prior_events"),
            F.coalesce(F.col("n_prior_clicks"), F.lit(0))
            .cast("long")
            .alias("n_prior_clicks"),
            ieee_round(
                F.coalesce(F.col("_prior_value"), F.lit(0.0)), 4
            ).alias("prior_value_sum"),
        )
        .orderBy("purchase_id")
    )


PIT_FEATURES_SQL = f"""
WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
feat AS (
    SELECT user_id, event_id, event_type,
           count(*) OVER w AS n_prior_events,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER w AS n_prior_clicks,
           sum(coalesce(value, 0.0)) OVER w AS prior_value
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS purchase_id, user_id,
       CAST(coalesce(n_prior_events, 0) AS BIGINT) AS n_prior_events,
       CAST(coalesce(n_prior_clicks, 0) AS BIGINT) AS n_prior_clicks,
       {sql_ieee_round("coalesce(prior_value, 0.0)", 4)} AS prior_value_sum
FROM feat
WHERE event_type = 'purchase'
ORDER BY purchase_id
"""


R6G_ENTRIES: dict[str, Entry] = {
    "user_activity_features": Entry(
        user_activity_features, USER_ACTIVITY_SQL
    ),
    "pit_features": Entry(pit_features, PIT_FEATURES_SQL),
}
