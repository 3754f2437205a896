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
    engines. Keyless (NULL event_id) events are excluded on both: the
    id IS the tie order and purchase rows are identified by event_id
    (random-events fuzz net)."""
    ev = events_table(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
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
WITH ev AS (SELECT * FROM events
           WHERE ts IS NOT NULL AND event_id IS NOT NULL),
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


# ---------------------------------------------------------------------------
# 3. Churn label construction
# ---------------------------------------------------------------------------

_CHURN_CUTOFF_DAYS = 2  # cutoff = corpus max ts − 2d
_CHURN_OBS_HOURS = 12  # label window: (cutoff, cutoff + 12h]
# The corpus is a 30-day burst with ~2.2 events/user/day, so churn
# windows are sized to the data's time scale (a day-scale window is
# saturated for every user and the label degenerates to all-zero —
# measured before sizing these).


def churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training rows for a churn model: for every user with history
    BEFORE the cutoff (corpus max ts − 2d), features computed only
    from that history plus the binary label "no activity in the 12-hour
    observation window after the cutoff". The temporal-split sibling of
    ``pit_features``: there leakage-proofing is per-row (exclusive
    window frames); here it is a single global cutoff — features see
    only t ≤ cutoff, the label sees only the window after it.

    Scale shape: one conditional aggregation per user over a single
    scan — feature aggregates gated by ``ts <= cutoff``, the label by
    the window predicate — so the whole construction is one user-keyed
    shuffle with map-side combine, no self-join. The cutoff is a 1-row
    broadcast. Timestamp arithmetic is whole-day INTERVALs on µs
    timestamps — identical on both engines."""
    ev = events_table(spark, sf_dir).filter(F.col("ts").isNotNull())
    ref = ev.agg(
        (
            F.max("ts") - F.expr(f"INTERVAL {_CHURN_CUTOFF_DAYS} DAYS")
        ).alias("cutoff")
    )
    obs_end = F.col("cutoff") + F.expr(f"INTERVAL {_CHURN_OBS_HOURS} HOURS")
    before = F.col("ts") <= F.col("cutoff")
    in_obs = (F.col("ts") > F.col("cutoff")) & (F.col("ts") <= obs_end)
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(before, 1).otherwise(0)).alias("_n_before"),
            F.max(F.when(before, F.col("ts"))).alias("_last_before"),
            F.sum(F.when(in_obs, 1).otherwise(0)).alias("_n_obs"),
            F.max("cutoff").alias("_cutoff"),
        )
        .filter(F.col("_n_before") > 0)
        .select(
            "user_id",
            F.col("_n_before").cast("long").alias("n_events_before"),
            ieee_round(
                (
                    F.unix_micros(F.col("_cutoff"))
                    - F.unix_micros(F.col("_last_before"))
                )
                / F.lit(86_400_000_000.0),
                4,
            ).alias("days_inactive_at_cutoff"),
            F.when(F.col("_n_obs") == 0, 1).otherwise(0).cast("int").alias(
                "churned"
            ),
        )
        .orderBy("user_id")
    )


CHURN_LABELS_SQL = f"""
WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
ref AS (
    SELECT max(ts) - INTERVAL {_CHURN_CUTOFF_DAYS} DAY AS cutoff FROM ev
),
agg AS (
    SELECT user_id,
           sum(CASE WHEN ts <= cutoff THEN 1 ELSE 0 END) AS n_before,
           max(CASE WHEN ts <= cutoff THEN ts END) AS last_before,
           sum(CASE WHEN ts > cutoff
                     AND ts <= cutoff + INTERVAL {_CHURN_OBS_HOURS} HOUR
                    THEN 1 ELSE 0 END) AS n_obs,
           max(cutoff) AS cutoff
    FROM ev, ref
    GROUP BY user_id
)
SELECT user_id,
       CAST(n_before AS BIGINT) AS n_events_before,
       {sql_ieee_round(
           "(epoch_us(cutoff) - epoch_us(last_before)) / 86400000000.0", 4
       )} AS days_inactive_at_cutoff,
       CAST(CASE WHEN n_obs = 0 THEN 1 ELSE 0 END AS INTEGER) AS churned
FROM agg
WHERE n_before > 0
ORDER BY user_id
"""


R6G_ENTRIES: dict[str, Entry] = {
    "user_activity_features": Entry(
        user_activity_features, USER_ACTIVITY_SQL
    ),
    "pit_features": Entry(pit_features, PIT_FEATURES_SQL),
    "churn_labels": Entry(churn_labels, CHURN_LABELS_SQL),
}
