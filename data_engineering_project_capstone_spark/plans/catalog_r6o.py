"""Round-6o catalog entries — sequential pattern matching and skew
diagnostics:

- ``funnel_strict_sequence``: the strict-order, time-bounded funnel
  signup → click → purchase (each hop within its own deadline),
  computed WITHOUT self-joins: per-user stage anchors fold left→right
  through user-keyed aggregates (Spark has no MATCH_RECOGNIZE; this is
  the scalable relational encoding of the 3-stage pattern).
- ``skew_profile``: the pre-salting diagnostic — per-key frequency
  profile of the events user_id key: top-5 hot keys with their share,
  plus the max/median frequency ratio every row carries (the number
  that decides whether a join needs salting).

Counts and µs-timestamp comparisons are exact; the only floats are
final rounded ratios (median via the percentile parity pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, events_table, sql_ieee_round

_HOP1_DAYS = 3  # signup → click deadline
_HOP2_DAYS = 3  # click → purchase deadline


def funnel_strict_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row strict-sequence funnel ledger: users with a signup,
    users whose FIRST post-signup click lands within 3 days, users
    whose FIRST post-click purchase lands within 3 more days, and the
    end-to-end conversion rate.

    Scale shape: three user-keyed aggregates chained by joins on
    user_id — each stage anchor is min(ts) over a filtered event set,
    so no event-level self-join ever forms (the naive encoding joins
    events×events per hop; this folds each hop into an aggregate then
    joins ONE row per user). All stage boundaries are strict-> µs
    comparisons — exact on both engines. conv_rate is NULL when no user
    ever signs up (ANSI would otherwise throw on 0/0 — caught by the
    degenerate-events sweep)."""
    ev = events_table(spark, sf_dir).filter(F.col("ts").isNotNull())
    s0 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s0"))
    )
    c0 = (
        ev.filter(F.col("event_type") == "click")
        .join(s0, "user_id")
        .filter(
            (F.col("ts") > F.col("s0"))
            & (F.col("ts") <= F.col("s0") + F.expr(f"INTERVAL {_HOP1_DAYS} DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c0"))
    )
    p0 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c0, "user_id")
        .filter(
            (F.col("ts") > F.col("c0"))
            & (F.col("ts") <= F.col("c0") + F.expr(f"INTERVAL {_HOP2_DAYS} DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p0"))
    )
    n_s = s0.agg(F.count("*").alias("n_signup"))
    n_c = c0.agg(F.count("*").alias("n_clicked"))
    n_p = p0.agg(F.count("*").alias("n_purchased"))
    return (
        n_s.crossJoin(F.broadcast(n_c))
        .crossJoin(F.broadcast(n_p))
        .select(
            F.col("n_signup").cast("long").alias("n_signup"),
            F.col("n_clicked").cast("long").alias("n_clicked"),
            F.col("n_purchased").cast("long").alias("n_purchased"),
            ieee_round(
                F.when(
                    F.col("n_signup") > 0,
                    F.col("n_purchased") / F.col("n_signup"),
                ),
                6,
            ).alias("conv_rate"),
        )
    )


FUNNEL_STRICT_SQL = f"""
WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
s0 AS (
    SELECT user_id, min(ts) AS s0 FROM ev
    WHERE event_type = 'signup' GROUP BY user_id
),
c0 AS (
    SELECT e.user_id, min(e.ts) AS c0
    FROM ev e JOIN s0 ON e.user_id = s0.user_id
    WHERE e.event_type = 'click' AND e.ts > s0.s0
      AND e.ts <= s0.s0 + INTERVAL {_HOP1_DAYS} DAY
    GROUP BY e.user_id
),
p0 AS (
    SELECT e.user_id, min(e.ts) AS p0
    FROM ev e JOIN c0 ON e.user_id = c0.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c0.c0
      AND e.ts <= c0.c0 + INTERVAL {_HOP2_DAYS} DAY
    GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM c0) AS BIGINT) AS n_clicked,
       CAST((SELECT count(*) FROM p0) AS BIGINT) AS n_purchased,
       {sql_ieee_round(
           "CASE WHEN (SELECT count(*) FROM s0) > 0 THEN "
           "(SELECT count(*) FROM p0) * 1.0 / (SELECT count(*) FROM s0) END",
           6)}
           AS conv_rate
"""


_SKEW_TOP_K = 5


def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency profile of the events user_id join key: the top-5 hot
    keys (rank, key, freq, share) with the max/median frequency ratio
    on every row — the diagnostic that decides whether a downstream
    join on this key needs the differential-salting path
    (skew_salted_join).

    Scale shape: one key-count aggregate; the profile stats (max,
    exact interpolated median) aggregate over the per-key COUNT table
    (|keys| rows), and the top-5 is a TakeOrdered."""
    ev = events_table(spark, sf_dir).filter(F.col("user_id").isNotNull())
    freq = ev.groupBy("user_id").agg(F.count("*").alias("freq"))
    stats = freq.agg(
        F.max("freq").alias("max_f"),
        F.expr("percentile(freq, 0.5)").alias("med_f"),
        F.sum("freq").alias("tot"),
    )
    return (
        freq.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "freq",
            ieee_round(F.col("freq") / F.col("tot"), 6).alias("share"),
            ieee_round(F.col("max_f") / F.col("med_f"), 4).alias(
                "max_over_median"
            ),
        )
        .orderBy(F.desc("freq"), "user_id")
        .limit(_SKEW_TOP_K)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("freq"), "user_id"))
            .cast("int")
            .alias("rank"),
            "user_id",
            F.col("freq").cast("long").alias("freq"),
            "share",
            "max_over_median",
        )
        .orderBy("rank")
    )


SKEW_PROFILE_SQL = f"""
WITH freq AS (
    SELECT user_id, count(*) AS freq FROM events
    WHERE user_id IS NOT NULL GROUP BY user_id
),
stats AS (
    SELECT max(freq) AS max_f, quantile_cont(freq, 0.5) AS med_f,
           sum(freq) AS tot
    FROM freq
)
SELECT CAST(row_number() OVER (ORDER BY freq DESC, user_id) AS INTEGER)
           AS rank,
       user_id, CAST(freq AS BIGINT) AS freq,
       {sql_ieee_round("freq * 1.0 / tot", 6)} AS share,
       {sql_ieee_round("max_f * 1.0 / med_f", 4)} AS max_over_median
FROM freq, stats
ORDER BY freq DESC, user_id
LIMIT {_SKEW_TOP_K}
"""


R6O_ENTRIES: dict[str, Entry] = {
    "funnel_strict_sequence": Entry(
        funnel_strict_sequence, FUNNEL_STRICT_SQL
    ),
    "skew_profile": Entry(skew_profile, SKEW_PROFILE_SQL),
}
