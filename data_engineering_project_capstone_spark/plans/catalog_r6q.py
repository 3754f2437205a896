"""Round-6q catalog entries — survival analysis and model-lift eval:

- ``survival_signup_purchase``: Kaplan-Meier survival curve of the
  signup→first-purchase duration in whole days, right-censored at the
  corpus end. S(d) = Π_{event days i ≤ d} (1 − d_i/n_i). The product
  is computed as an ORDERED multiplication fold over the (tiny,
  post-aggregation) day table — multiplication of identical doubles
  in a fixed order, so no ln/exp round-trip whose libm could differ
  by an ulp between engines.
- ``churn_feature_lift``: cumulative-gains readout for a 1-feature
  churn ranking — users bucketed into quintiles by
  days_inactive_at_cutoff (descending: most-stale first), per-bucket
  churn rate vs the base rate = lift. Consumes the ``churn_labels``
  entry's exact construction (and embeds its SQL twin), so the eval
  can never drift from the labeler.

Scale shape: both entries aggregate user-level rows first; every
window/self-join operates on the post-aggregation table (days ≤
corpus span; buckets = 5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, events_table, sql_ieee_round
from .catalog_r6g import CHURN_LABELS_SQL, churn_labels


def survival_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM table rows (day, n_at_risk, n_converted, survival) at each
    whole-day conversion time.

    Construction: per signup user, time-to-event = days from first
    signup to first subsequent purchase (event) or to the corpus max
    ts (censored). Day-level d_i/n_i come from one aggregate; the
    at-risk count n_i is total users minus the running count of users
    whose observation ended before day i (a window over the ≤|days|
    aggregate); survival multiplies (1 − d_i/n_i) over event days in
    ascending day order via a per-row sorted-array product fold (the
    day table is corpus-span-bounded, so the quadratic collect is
    trivially small)."""
    ev = events_table(spark, sf_dir).filter(F.col("ts").isNotNull())
    mx = ev.agg(F.max("ts").alias("mx"))
    s0 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s0"))
    )
    p0 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s0, "user_id")
        .filter(F.col("ts") > F.col("s0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p0"))
    )
    per_user = (
        s0.join(p0, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("p0").isNotNull().alias("is_event"),
            F.floor(
                (
                    F.unix_micros(F.coalesce("p0", "mx"))
                    - F.unix_micros("s0")
                )
                / F.lit(86_400_000_000.0)
            )
            .cast("int")
            .alias("tday"),
        )
    )
    tot = per_user.agg(F.count("*").alias("n_tot"))
    by_day = per_user.groupBy("tday").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("d_i"),
        F.count("*").alias("ended"),
    )
    w_prev = (
        Window.orderBy("tday").rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        by_day.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_at_risk",
            F.col("n_tot")
            - F.coalesce(F.sum("ended").over(w_prev), F.lit(0)),
        )
        .withColumn("factor", 1.0 - F.col("d_i") / F.col("n_at_risk"))
    )
    ev_days = risk.filter(F.col("d_i") > 0).select(
        "tday", "d_i", "n_at_risk", "factor"
    )
    a = ev_days.select(
        F.col("tday").alias("day_a"), F.col("factor").alias("f_a")
    )
    surv = (
        ev_days.join(a, F.col("day_a") <= F.col("tday"))
        .groupBy("tday", "d_i", "n_at_risk")
        .agg(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("day_a", "f_a"))),
                    lambda x: x["f_a"],
                ),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ).alias("s")
        )
    )
    return surv.select(
        F.col("tday").cast("int").alias("day"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("d_i").cast("long").alias("n_converted"),
        ieee_round(F.col("s"), 6).alias("survival"),
    ).orderBy("day")


SURVIVAL_SQL = """
WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
mx AS (SELECT max(ts) AS mx FROM ev),
s0 AS (SELECT user_id, min(ts) AS s0 FROM ev
       WHERE event_type = 'signup' GROUP BY user_id),
p0 AS (
    SELECT e.user_id, min(e.ts) AS p0
    FROM ev e JOIN s0 ON e.user_id = s0.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s0.s0
    GROUP BY e.user_id
),
per_user AS (
    SELECT p0.p0 IS NOT NULL AS is_event,
           CAST(floor((epoch_us(coalesce(p0.p0, mx.mx)) - epoch_us(s0.s0))
                      / 86400000000.0) AS INTEGER) AS tday
    FROM s0 LEFT JOIN p0 ON s0.user_id = p0.user_id, mx
),
tot AS (SELECT count(*) AS n_tot FROM per_user),
by_day AS (
    SELECT tday,
           sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS d_i,
           count(*) AS ended
    FROM per_user GROUP BY tday
),
risk AS (
    SELECT tday, d_i,
           n_tot - coalesce(sum(ended) OVER (ORDER BY tday
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
    FROM by_day, tot
),
ev_days AS (
    SELECT tday, d_i, n_at_risk,
           1.0 - d_i * 1.0 / n_at_risk AS factor
    FROM risk WHERE d_i > 0
)
SELECT CAST(e.tday AS INTEGER) AS day,
       CAST(e.n_at_risk AS BIGINT) AS n_at_risk,
       CAST(e.d_i AS BIGINT) AS n_converted,
       {surv} AS survival
FROM ev_days e
JOIN ev_days a ON a.tday <= e.tday
GROUP BY e.tday, e.n_at_risk, e.d_i
ORDER BY day
""".format(
    surv=sql_ieee_round(
        "list_reduce(list_prepend(1.0, list(a.factor ORDER BY a.tday)), "
        "(x, y) -> x * y)",
        6,
    )
)


_LIFT_BUCKETS = 5


def churn_feature_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quintile lift of ranking users by days_inactive_at_cutoff
    (most-stale first) against the churn label: per bucket, users,
    churners, churn rate, and lift over the base rate. Bucket
    assignment is ntile over the (user-level) label table with a
    user_id tiebreak — total-ordered, engine-identical."""
    labels = churn_labels(spark, sf_dir)
    w = Window.orderBy(F.desc("days_inactive_at_cutoff"), F.col("user_id"))
    base = labels.agg(
        F.count("*").alias("n_all"), F.sum("churned").alias("c_all")
    )
    return (
        labels.select(
            "user_id",
            "churned",
            F.ntile(_LIFT_BUCKETS).over(w).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("churned").alias("n_churned"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_churned").cast("long").alias("n_churned"),
            ieee_round(F.col("n_churned") / F.col("n_users"), 6).alias(
                "churn_rate"
            ),
            ieee_round(
                (F.col("n_churned") / F.col("n_users"))
                / (F.col("c_all") / F.col("n_all")),
                6,
            ).alias("lift"),
        )
        .orderBy("bucket")
    )


CHURN_LIFT_SQL = f"""
WITH labels AS ({CHURN_LABELS_SQL}),
base AS (SELECT count(*) AS n_all, sum(churned) AS c_all FROM labels),
bucketed AS (
    SELECT churned,
           ntile({_LIFT_BUCKETS}) OVER (
               ORDER BY days_inactive_at_cutoff DESC, user_id) AS bucket
    FROM labels
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(churned) AS BIGINT) AS n_churned,
       {sql_ieee_round("sum(churned) * 1.0 / count(*)", 6)} AS churn_rate,
       {sql_ieee_round(
           "(sum(churned) * 1.0 / count(*)) / (c_all * 1.0 / n_all)", 6)}
           AS lift
FROM bucketed, base
GROUP BY bucket, c_all, n_all
ORDER BY bucket
"""


R6Q_ENTRIES: dict[str, Entry] = {
    "survival_signup_purchase": Entry(
        survival_signup_purchase, SURVIVAL_SQL
    ),
    "churn_feature_lift": Entry(churn_feature_lift, CHURN_LIFT_SQL),
}
