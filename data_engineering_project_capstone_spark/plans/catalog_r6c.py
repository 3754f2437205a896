"""Round-6c catalog entries — sketching, range joins, and event-stream
analytics families not yet covered by the catalog:

- ``sketch_cms_topk``: count-min sketch heavy hitters (Cormode &
  Muthukrishnan, 2005) — a *mergeable* frequency sketch built with
  cross-engine md5 hashing, plus the top-K estimate-vs-truth readout.
- ``join_range_buckets``: pure interval-containment join (no equi key)
  via the coarse-time-bucket expansion rewrite — the standard way to
  make a range join hash-partitionable instead of nested-loop.
- ``events_transition_matrix``: per-user event-type Markov transitions
  (lag window → bigram counts → row-normalized probabilities).
- ``events_anomaly_zscore``: rolling trailing-24h z-score anomaly flags
  on the hourly event series.
- ``events_time_decay``: exponentially time-decayed per-user engagement
  score (half-life-style recency weighting).
- ``agg_robust_mad``: robust per-group location/spread — median and
  median-absolute-deviation via the two-phase median-join-median shape.
- ``rolling_distinct_users``: trailing-7-day distinct users per day via
  the explode-into-covered-windows rewrite (distinct aggregates are not
  window-able natively; this is the scalable equivalent).

Same contract as ``plans.catalog``: every entry pairs a PySpark plan
with DuckDB oracle SQL over identical parquet, identical column
aliases, floats through the shared IEEE rounding helpers.

Reference parity note: the reference pipeline
(``/root/reference/dataprep.py``) has no sketching/range-join surface —
these extend the engine per the build brief (large-scale analytics and
training-data pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round, md5_bucket
from .catalog import Entry, events_table, sql_ieee_round, t
from .catalog_r5 import _SQL_TOKS, _toks

# ---------------------------------------------------------------------------
# 1. Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_D = 4  # depth (independent hash rows)
_CMS_W = 256  # width (buckets per row)
_CMS_K = 20  # heavy hitters reported


# the cross-engine md5 hash-bucket idiom, shared with the streaming
# sketch maintainer (streaming/sketches.py) which must bucket identically
_md5_bucket = md5_bucket


def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over document tokens + top-K heavy-hitter readout
    (est_count = min over the sketch's D rows; always ≥ true_count).

    Scale shape: the sketch is built from the DISTINCT-TOKEN count table
    (Heaps-sublinear), not the raw token stream — same cells, since CMS
    cells are sums. Shuffles: the token count (map-side combined) and
    the D×W cell sum (≤ 1024 groups — effectively free). The readout
    joins tokens back to cells with the D×W cell table BROADCAST, so
    estimating is map-side. The sketch itself is mergeable: shard-local
    sketches element-wise-add into the global one, which is exactly what
    the two-level groupBy here does. At 100 TB you'd readout only a
    candidate set (e.g. tokens surviving a per-partition pre-filter)
    rather than every distinct token; the sketch build is unchanged.

    Hashing is md5-derived on both engines (same idiom as
    ``split_assign``, catalog.py:3241) so buckets agree bit-for-bit.
    """
    docs = t(spark, sf_dir, "documents")
    cnts = (
        docs.select(F.explode(_toks()).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    keyed = cnts.select(
        "tok",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d"),
    ).withColumn("bucket", _md5_bucket(F.col("tok"), F.col("d"), _CMS_W))
    cms = keyed.groupBy("d", "bucket").agg(F.sum("c").alias("cell"))
    return (
        keyed.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("tok")
        .agg(
            F.min("cell").cast("long").alias("est_count"),
            F.max("c").cast("long").alias("true_count"),
        )
        .orderBy(F.desc("est_count"), "tok")
        .limit(_CMS_K)
    )


SKETCH_CMS_TOPK_SQL = f"""
WITH cnts AS (
    SELECT tok, count(*) AS c
    FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM documents)
    WHERE tok <> ''
    GROUP BY tok
), keyed AS (
    SELECT tok, c, d,
           CAST(concat('0x', substring(
               md5(concat(tok, ':', CAST(d AS VARCHAR))), 1, 15))
               AS BIGINT) % {_CMS_W} AS bucket
    FROM cnts, unnest([0, 1, 2, 3]) AS r(d)
), cms AS (
    SELECT d, bucket, sum(c) AS cell FROM keyed GROUP BY d, bucket
)
SELECT k.tok,
       CAST(min(m.cell) AS BIGINT) AS est_count,
       CAST(max(k.c) AS BIGINT) AS true_count
FROM keyed k JOIN cms m USING (d, bucket)
GROUP BY k.tok
ORDER BY est_count DESC, tok
LIMIT {_CMS_K}
"""


# ---------------------------------------------------------------------------
# 2. Interval-containment join via coarse time buckets
# ---------------------------------------------------------------------------

_RANGE_BUCKET_US = 300_000_000  # 5-minute buckets — equals the window span


def join_range_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): count events falling inside 5-minute
    "incident windows" opened by a deterministic sample of error events.

    Scale shape: a naive ``ts BETWEEN lo AND hi`` join with no equi key
    is a nested-loop (BroadcastNestedLoopJoin at best, cartesian at
    worst). The standard rewrite: explode each interval into the coarse
    time buckets it overlaps (bucket span == window span ⇒ ≤ 2 buckets
    per interval), equi-join probe rows on their single bucket, then
    re-check exact containment. The join becomes a hash join keyed on
    bucket — stats/AQE broadcast it where the interval side fits, and
    it shuffle-partitions on bucket when the interval side is large.
    No forced hint: the sampled subset is a constant fraction of an
    SF-scaling events table, so forcing a broadcast is OOM at the
    design point. An
    event's bucket is unique and interval buckets are distinct, so no
    post-join dedup is needed.
    """
    ev = events_table(spark, sf_dir)
    iv = ev.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 97 == 0)
    ).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("hi"),
    )
    ivb = iv.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros("lo") / F.lit(_RANGE_BUCKET_US)),
                # hi is exclusive: the last overlapped bucket is hi - 1µs's
                F.floor(
                    (F.unix_micros("hi") - F.lit(1)) / F.lit(_RANGE_BUCKET_US)
                ),
            )
        ),
    )
    probe = ev.withColumn(
        "bkt", F.floor(F.unix_micros("ts") / F.lit(_RANGE_BUCKET_US))
    )
    return (
        probe.join(ivb, "bkt")
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")))
        .groupBy("window_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_clicks"),
        )
        .orderBy("window_id")
    )


JOIN_RANGE_BUCKETS_SQL = """
WITH iv AS (
    SELECT event_id AS window_id, ts AS lo, ts + INTERVAL 5 MINUTE AS hi
    FROM events
    WHERE event_type = 'error' AND event_id % 97 = 0
)
SELECT window_id,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clicks
FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts < iv.hi
GROUP BY window_id
ORDER BY window_id
"""


# ---------------------------------------------------------------------------
# 3. Per-user event-type transition matrix (Markov bigrams)
# ---------------------------------------------------------------------------


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type Markov transition matrix: per-user lag-1 bigrams,
    row-normalized to transition probabilities.

    Scale shape: the lag window partitions on user_id (bounded per-user
    history — never a global sort), the bigram groupBy is
    |types|²-bounded, and the row-normalizing window runs over that tiny
    matrix. One real shuffle (the per-user sort); ties broken by
    event_id so the sequence is deterministic under duplicate
    timestamps. NULL-ts events are dropped on both sides (engine-wide
    events policy): an event with no timestamp has no position in a
    sequence, and engines disagree on NULL sort placement (Spark NULLS
    FIRST vs DuckDB NULLS LAST) — the degenerate sweep pins this.
    Keyless (NULL event_id) events are dropped too: the id is the tie
    order, and an id-ordered op gives a keyless row no position
    (random-events fuzz net)."""
    ev = events_table(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
    )
    mat = seq.groupBy(
        F.col("prev").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    wf = Window.partitionBy("from_type")
    return mat.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        ieee_round(F.col("n") / F.sum("n").over(wf), 4).alias("p"),
    ).orderBy("from_type", "to_type")


EVENTS_TRANSITION_SQL = f"""
WITH seq AS (
    SELECT event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
    WHERE ts IS NOT NULL AND event_id IS NOT NULL
), mat AS (
    SELECT prev AS from_type, event_type AS to_type, count(*) AS n
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, event_type
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       {sql_ieee_round(
           "n * 1.0 / sum(n) OVER (PARTITION BY from_type)", 4
       )} AS p
FROM mat
ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# 4. Rolling z-score anomaly flags on the hourly series
# ---------------------------------------------------------------------------

_Z_MIN_HISTORY = 12  # hours of trailing history required before scoring
_Z_THRESHOLD = 2.5


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h z-score anomaly detection on hourly event counts:
    each hour scored against the mean/stddev of the PRECEDING 24 hours
    (frame excludes the current row — no self-contamination).

    Scale shape: the hourly rollup is the only data-sized shuffle; the
    scoring window runs over the tiny hour series. The unpartitioned
    ORDER BY window is deliberate here (one global series); a per-metric
    deployment partitions the window by series key, which keeps every
    frame executor-local. z is computed from UNROUNDED mu/sigma, then
    all three round via the shared IEEE helper."""
    ev = events_table(spark, sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count("*").alias("n_events")
    )
    w = Window.orderBy("h").rowsBetween(-24, -1)
    mu = F.avg("n_events").over(w)
    sigma = F.stddev_samp("n_events").over(w)
    hist = F.count("n_events").over(w)
    z = F.when(sigma > 0, (F.col("n_events") - mu) / sigma)
    return (
        hourly.select(
            "h",
            F.col("n_events").cast("long").alias("n_events"),
            hist.alias("_hist"),
            ieee_round(mu, 4).alias("mu"),
            ieee_round(sigma, 4).alias("sigma"),
            ieee_round(z, 4).alias("z"),
            F.coalesce(z > _Z_THRESHOLD, F.lit(False)).alias("is_anomaly"),
        )
        .filter(F.col("_hist") >= _Z_MIN_HISTORY)
        .drop("_hist")
        .orderBy("h")
    )


EVENTS_ANOMALY_ZSCORE_SQL = f"""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h, count(*) AS n_events
    FROM events GROUP BY 1
), scored AS (
    SELECT h, n_events,
           count(n_events) OVER w AS hist,
           avg(n_events) OVER w AS mu,
           stddev_samp(n_events) OVER w AS sigma
    FROM hourly
    WINDOW w AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT h, CAST(n_events AS BIGINT) AS n_events,
       {sql_ieee_round("mu", 4)} AS mu,
       {sql_ieee_round("sigma", 4)} AS sigma,
       {sql_ieee_round(
           "CASE WHEN sigma > 0 THEN (n_events - mu) / sigma END", 4
       )} AS z,
       coalesce(
           CASE WHEN sigma > 0 THEN (n_events - mu) / sigma END
               > {_Z_THRESHOLD}, FALSE) AS is_anomaly
FROM scored
WHERE hist >= {_Z_MIN_HISTORY}
ORDER BY h
"""


# ---------------------------------------------------------------------------
# 5. Exponentially time-decayed engagement score
# ---------------------------------------------------------------------------

_DECAY_HALFLIFE_H = 168.0  # one week


def events_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recency-weighted engagement: Σ value·2^(-age_h/168),
    ages measured against the corpus max timestamp (half-life one week).

    Scale shape: the reference timestamp is a 1-row broadcast crossJoin
    (the established scalar pattern, flagship.py:137); the weighted sum
    is a single map-side-combined groupBy on user_id. Decay weights are
    pure IEEE ops (pow, divide) on both engines; cross-engine ulp noise
    is absorbed by the 4dp IEEE rounding."""
    ev = events_table(spark, sf_dir)
    ref = ev.agg(F.max("ts").alias("ref_ts"))
    age_h = (
        F.unix_micros(F.col("ref_ts")) - F.unix_micros(F.col("ts"))
    ) / F.lit(3_600_000_000.0)
    weight = F.pow(F.lit(2.0), -age_h / F.lit(_DECAY_HALFLIFE_H))
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0)) * weight).alias(
                "_score"
            ),
        )
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            ieee_round(F.col("_score"), 4).alias("decayed_score"),
        )
        .orderBy("user_id")
    )


EVENTS_TIME_DECAY_SQL = f"""
WITH ref AS (SELECT max(ts) AS ref_ts FROM events)
SELECT user_id,
       count(*) AS n_events,
       {sql_ieee_round(
           "sum(coalesce(value, 0.0) * pow(2.0, "
           "-((epoch_us(ref_ts) - epoch_us(ts)) / 3600000000.0) "
           f"/ {_DECAY_HALFLIFE_H}))", 4
       )} AS decayed_score
FROM events, ref
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# 6. Robust per-group stats: median + MAD
# ---------------------------------------------------------------------------


def agg_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust location/spread: median(n_chars) and the median
    absolute deviation — outlier-insensitive where mean/stddev are not.

    Scale shape: the two-phase median→join→median shape (group medians
    broadcast back to the fact) is the distributable formulation; both
    phases are single shuffles on source. Both engines compute the
    interpolated median, so even-count groups agree exactly."""
    docs = t(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(
        F.expr("median(n_chars)").alias("_med")
    )
    return (
        docs.join(F.broadcast(med), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("_med").alias("_m"),
            F.expr("median(abs(n_chars - _med))").alias("_mad"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            ieee_round(F.col("_m"), 2).alias("med_chars"),
            ieee_round(F.col("_mad"), 2).alias("mad_chars"),
        )
        .orderBy("source")
    )


AGG_ROBUST_MAD_SQL = f"""
WITH med AS (
    SELECT source, median(n_chars) AS m FROM documents GROUP BY source
)
SELECT d.source,
       count(*) AS n_docs,
       {sql_ieee_round("min(m)", 2)} AS med_chars,
       {sql_ieee_round("median(abs(d.n_chars - m))", 2)} AS mad_chars
FROM documents d JOIN med USING (source)
GROUP BY d.source
ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# 7. Trailing-7-day distinct users via window-cover expansion
# ---------------------------------------------------------------------------


def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the rolling
    COUNT(DISTINCT) no window function can express.

    Scale shape: the scalable rewrite is expansion, not a window — each
    distinct (user, active-day) pair is exploded into the ≤7 window-end
    days it counts toward, then a plain distinct-count groupBy on day.
    Cost is 7× the DISTINCT user-day table (already collapsed from raw
    events by the first groupBy), shuffled on day — versus a
    nested-loop re-scan per day in the naive formulation. Days with no
    events anchor no window (inner join back to observed days), matching
    the oracle's day spine. NULL-ts events are dropped on both sides
    (engine-wide policy): they belong to no day, and without the filter
    the engines diverge structurally — Spark's explode(sequence(NULL))
    drops the row while the oracle's day spine keeps a NULL day."""
    ev = events_table(spark, sf_dir).filter(F.col("ts").isNotNull())
    user_days = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    expanded = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
    )
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    return (
        expanded.groupBy("day")
        .agg(F.countDistinct("user_id").alias("u7"))
        .join(days, "day")
        .orderBy("day")
    )


ROLLING_DISTINCT_USERS_SQL = """
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
              WHERE ts IS NOT NULL)
SELECT day,
       CAST((SELECT count(DISTINCT user_id) FROM events e
             WHERE CAST(e.ts AS DATE) BETWEEN day - 6 AND day)
            AS BIGINT) AS u7
FROM days
ORDER BY day
"""


R6C_ENTRIES: dict[str, Entry] = {
    "sketch_cms_topk": Entry(sketch_cms_topk, SKETCH_CMS_TOPK_SQL),
    "join_range_buckets": Entry(join_range_buckets, JOIN_RANGE_BUCKETS_SQL),
    "events_transition_matrix": Entry(
        events_transition_matrix, EVENTS_TRANSITION_SQL
    ),
    "events_anomaly_zscore": Entry(
        events_anomaly_zscore, EVENTS_ANOMALY_ZSCORE_SQL
    ),
    "events_time_decay": Entry(events_time_decay, EVENTS_TIME_DECAY_SQL),
    "agg_robust_mad": Entry(agg_robust_mad, AGG_ROBUST_MAD_SQL),
    "rolling_distinct_users": Entry(
        rolling_distinct_users, ROLLING_DISTINCT_USERS_SQL
    ),
}
