"""Round-6m catalog entries — Markov steady state and funnel timing:

- ``events_markov_stationary``: stationary distribution of the
  event-type transition chain by 3 unrolled power-iteration steps from
  the uniform vector. The matrix-vector products fold in a FIXED order
  (sorted-array aggregate on both engines), so every float op sequence
  is engine-identical — the established fixed-order-fold parity trick
  applied to linear algebra.
- ``funnel_time_to_convert``: distribution of click→purchase
  conversion lag — for each purchase, minutes since the user's most
  recent PRIOR click (exclusive-prefix window with IGNORE NULLS), then
  exact interpolated p50/p90 over all conversions (the Spark
  ``percentile`` ≡ DuckDB ``quantile_cont`` parity pair).

Scale shape: both entries do ONE user-partitioned window / bigram
shuffle at data size; everything after (the ≤|types|² matrix, the
iteration vectors, the 2-quantile readout) is types- or scalar-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, events_table, sql_ieee_round

_MARKOV_ITERS = 3


def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """π after 3 power-iteration steps of the row-stochastic event-type
    transition matrix, starting uniform. States with no incoming mass
    report 0.0; the vector is NOT renormalized between steps, so a
    leak from rows without outgoing transitions is visible in the sum
    (a diagnostic, not a bug — the test asserts conservation on the
    shipped corpus where every type both enters and leaves)."""
    # NULL-ts and NULL-id events dropped on both engines: no
    # position in an id-tie-broken sequence (random-events fuzz net)
    ev = events_table(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
    )
    mat = (
        seq.groupBy(
            F.col("prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
        .withColumn(
            "p",
            F.col("n")
            / F.sum("n").over(Window.partitionBy("from_type")),
        )
        .select("from_type", "to_type", "p")
    )
    states = (
        mat.select(F.col("from_type").alias("state"))
        .unionAll(mat.select(F.col("to_type").alias("state")))
        .distinct()
    )
    k = states.count()  # |types| — tiny by construction
    if k == 0:
        # no transitions at all (empty/all-NULL events): zero states,
        # zero output rows — matching the oracle, whose state CTE is
        # empty. Without this, 1.0/k is an ANSI divide-by-zero.
        return spark.createDataFrame(
            [], "event_type string, stationary_prob double"
        )
    v = states.select("state", (F.lit(1.0) / k).alias("v"))
    for _ in range(_MARKOV_ITERS):
        terms = mat.join(
            v.select(F.col("state").alias("from_type"), "v"), "from_type"
        ).select("to_type", "from_type", (F.col("p") * F.col("v")).alias("t"))
        # fixed-order fold: sort contributions by from_type, then sum
        # sequentially — the same op order DuckDB's ordered list fold uses
        nv = terms.groupBy("to_type").agg(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("from_type", "t"))),
                    lambda x: x["t"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("v")
        )
        v = states.join(
            nv.select(F.col("to_type").alias("state"), "v"), "state", "left"
        ).select("state", F.coalesce("v", F.lit(0.0)).alias("v"))
    return v.select(
        F.col("state").alias("event_type"),
        ieee_round(F.col("v"), 6).alias("stationary_prob"),
    ).orderBy("event_type")


def _markov_sql() -> str:
    prev = """
WITH ev AS (SELECT * FROM events
            WHERE ts IS NOT NULL AND event_id IS NOT NULL),
seq AS (
    SELECT event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM ev
),
mat AS (
    SELECT prev AS from_type, event_type AS to_type,
           count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev) AS p
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, event_type
),
states AS (
    SELECT DISTINCT state FROM (
        SELECT from_type AS state FROM mat
        UNION ALL SELECT to_type FROM mat)
),
k AS (SELECT count(*) AS k FROM states),
v0 AS (SELECT state, 1.0 / k.k AS v FROM states, k)"""
    body = ""
    cur = "v0"
    for i in range(1, _MARKOV_ITERS + 1):
        body += f""",
t{i} AS (
    SELECT m.to_type, m.from_type, m.p * {cur}.v AS t
    FROM mat m JOIN {cur} ON {cur}.state = m.from_type
),
s{i} AS (
    SELECT to_type,
           list_reduce(list(t ORDER BY from_type), (x, y) -> x + y) AS v
    FROM t{i} GROUP BY to_type
),
v{i} AS (
    SELECT s.state, coalesce(s{i}.v, 0.0) AS v
    FROM states s LEFT JOIN s{i} ON s{i}.to_type = s.state
)"""
        cur = f"v{i}"
    return (
        prev
        + body
        + f"""
SELECT state AS event_type, {sql_ieee_round("v", 6)} AS stationary_prob
FROM {cur}
ORDER BY event_type
"""
    )


MARKOV_STATIONARY_SQL = _markov_sql()


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row funnel-timing readout: conversions (purchases with a
    prior click by the same user), and exact interpolated p50/p90 of
    the click→purchase lag in minutes.

    The prior-click lookup is the exclusive-prefix window with IGNORE
    NULLS — the same leakage-proof frame as pit_features, so a
    purchase can never time itself against a click at or after it
    (ties break by event_id on both engines).

    NULL policy (r9 exploration fuzz, events seed 101): keyless events
    are excluded on both engines, completing the r8 sequence-family
    discipline this entry had escaped — event_id is the tie-break at
    equal timestamps, and a NULL id sorts first on Spark and last in
    DuckDB, so a keyless click tied with a purchase was visible to it
    on one engine only (unlike the sessionize/gap entries, whose
    outputs depend only on the sorted ts multiset and are tie-immune,
    this one reads event TYPE through the order)."""
    ev = events_table(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lagged = ev.select(
        "event_type",
        "ts",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_click"),
    )
    conv = lagged.filter(
        (F.col("event_type") == "purchase") & F.col("last_click").isNotNull()
    ).select(
        (
            (F.unix_micros("ts") - F.unix_micros("last_click"))
            / F.lit(60_000_000.0)
        ).alias("lag_min")
    )
    return conv.agg(
        F.count("*").cast("long").alias("n_conversions"),
        ieee_round(F.expr("percentile(lag_min, 0.5)"), 4).alias("p50_minutes"),
        ieee_round(F.expr("percentile(lag_min, 0.9)"), 4).alias("p90_minutes"),
    )


FUNNEL_TTC_SQL = f"""
WITH ev AS (SELECT * FROM events
            WHERE ts IS NOT NULL AND event_id IS NOT NULL),
lagged AS (
    SELECT event_type, ts,
           last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click
    FROM ev
),
conv AS (
    SELECT (epoch_us(ts) - epoch_us(last_click)) / 60000000.0 AS lag_min
    FROM lagged
    WHERE event_type = 'purchase' AND last_click IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_conversions,
       {sql_ieee_round("quantile_cont(lag_min, 0.5)", 4)} AS p50_minutes,
       {sql_ieee_round("quantile_cont(lag_min, 0.9)", 4)} AS p90_minutes
FROM conv
"""


R6M_ENTRIES: dict[str, Entry] = {
    "events_markov_stationary": Entry(
        events_markov_stationary, MARKOV_STATIONARY_SQL
    ),
    "funnel_time_to_convert": Entry(funnel_time_to_convert, FUNNEL_TTC_SQL),
}
