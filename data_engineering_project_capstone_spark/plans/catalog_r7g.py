"""Round-7g catalog entries — evaluation and scale-technique readouts:

- ``roc_auc_eval``: EXACT tie-corrected ROC AUC of a score against a
  binary label via the value-granular sweep identity
  AUC = (2·concordant + tied) / (2·n_pos·n_neg) — concordant/tied pair
  counts assembled from a per-distinct-score histogram with one bounded
  cumulative window (never a per-row rank over the corpus), so both
  engines produce the identical BIGINT numerator/denominator and ONE
  trailing division. The demo pair is score=n_chars, label=lang='en'
  on ``documents``; the machinery is score/label-agnostic (this is the
  exact counterpart of the Mann-Whitney U relationship AUC = U/(n1·n2)
  already shipped in ``catalog_r7.mann_whitney_u``).
- ``ewma_control``: EWMA control chart over the daily order-count
  series with alpha = 1/2 — the dyadic smoothing constant makes every
  weight a power of two, so the trailing-40-day EWMA is assembled as an
  EXACT integer sum Σ x_{t-k}·2^(39-k) and divided by 2^40 once at the
  end (identical IEEE division of identical BIGINTs on both engines;
  no float fold, no summation-order hazard). Burst flag compares
  x_t·2^40 against 3× the previous day's integer EWMA sum — pure
  BIGINT comparison.
- ``bloom_prefilter_join``: the runtime-filter technique measured as a
  query — build a k=2, m=4096-bit Bloom filter over the BUILDING-
  segment customer keys (bit positions from two md5 slices, the
  engine's content-addressing convention), pre-filter the orders fact
  by membership (both bits set), and report exact true matches, bloom
  passes, false positives, and the measured FPR. No false negatives by
  construction (asserted by the twin: n_pass ≥ n_true). At 100 TB this
  is the shape of a semi-join runtime filter: the bit-position set is
  bounded by m (broadcast), and the fact is never shuffled.

Same contract as ``plans.catalog``: every entry is a PySpark plan paired
with DuckDB oracle SQL over the identical parquet, column names aliased
identically, floats rounded through the shared IEEE helper."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t

# ---------------------------------------------------------------------------
# 1. Exact tie-corrected ROC AUC via the distinct-score sweep
# ---------------------------------------------------------------------------


def roc_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row AUC ledger: pair counts and the exact AUC. A positive-
    score > negative-score pair is concordant; equal scores are tied
    and count half. The cumulative window runs over the DISTINCT-score
    histogram (value granularity — bounded by the score's cardinality,
    not the corpus), the same no-global-row-sort trick as
    ``weighted_median``. NULL AUC when either class is empty."""
    # NULL scores are excluded (unrankable — and the engines disagree on
    # default NULL sort position: Spark ASC is NULLS FIRST, DuckDB ASC is
    # NULLS LAST, so leaving them in would skew the sweep differently per
    # engine; the degenerate-docs corpus has a NULL n_chars that hits this)
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .select(
            F.col("n_chars").alias("s"),
            # eqNullSafe: NULL lang is a NEGATIVE (the SQL CASE yields
            # ELSE 1 for neg) — plain == makes y NULL, and a score group
            # whose only doc has NULL lang then sums pos AND neg to NULL
            # and silently vanishes from the sweep (degenerate-docs net)
            F.col("lang").eqNullSafe(F.lit("en")).cast("long").alias("y"),
        )
    )
    hist = docs.groupBy("s").agg(
        F.sum("y").alias("pos"),
        (F.count("*") - F.sum("y")).alias("neg"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    sweep = hist.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("neg_below"),
    )
    agg = sweep.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum(F.col("pos") * F.col("neg_below")).alias("conc"),
        F.sum(F.col("pos") * F.col("neg")).alias("tied"),
    )
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.col("conc").cast("long").alias("concordant_pairs"),
        F.col("tied").cast("long").alias("tied_pairs"),
        ieee_round(
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                (2 * F.col("conc") + F.col("tied"))
                / (2 * F.col("n_pos") * F.col("n_neg")),
            ),
            6,
        ).alias("auc"),
    )


ROC_AUC_EVAL_SQL = f"""
WITH hist AS (
    SELECT n_chars AS s,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
           sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg
    FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
),
sweep AS (
    SELECT pos, neg,
           coalesce(sum(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
    FROM hist
),
agg AS (
    SELECT sum(pos) AS n_pos, sum(neg) AS n_neg,
           sum(pos * neg_below) AS conc, sum(pos * neg) AS tied
    FROM sweep
)
SELECT CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(conc AS BIGINT) AS concordant_pairs,
       CAST(tied AS BIGINT) AS tied_pairs,
       {sql_ieee_round(
           "CASE WHEN n_pos > 0 AND n_neg > 0 THEN"
           " (2 * conc + tied) * 1.0 / (2 * n_pos * n_neg) END", 6
       )} AS auc
FROM agg
"""


# ---------------------------------------------------------------------------
# 2. Dyadic EWMA control chart (alpha = 1/2, exact integer assembly)
# ---------------------------------------------------------------------------

_EWMA_POW = 1099511627776.0  # 2^40, the one scaling division


def ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: order count, trailing-40-day EWMA (alpha=1/2), and a
    burst flag (count > 3× the previous OBSERVED day's smoothed level —
    lag over the day series, so a calendar gap compares against the
    last day that had data; both engines lag identically). The EWMA weight
    for lag k is 2^-(k+1); scaled by 2^40 every term x·2^(39-k) is a
    BIGINT, the per-day sum S is exact and summation-order-free, and
    ewma = S / 2^40 is one IEEE division of identical integers on both
    engines. Lag-41+ weights are below 2^-41 — the truncation is the
    same explicit 40-day window in both engines, not an approximation
    mismatch. Calendar gaps simply contribute no terms (both engines).

    Scale: one fact pass to day grain; the 40-day band self-join and
    the lag-1 window run over the calendar-bounded daily table."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count("*").alias("x"))
    )
    daily = daily.localCheckpoint()  # band join + current side
    lag = daily.select(F.col("d").alias("ld"), F.col("x").alias("lx"))
    k = F.datediff(F.col("d"), F.col("ld"))
    s = (
        daily.join(
            lag,
            (F.col("ld") <= F.col("d"))
            & (F.col("ld") >= F.date_sub(F.col("d"), 39)),
        )
        .groupBy("d", "x")
        .agg(
            F.sum(
                F.col("lx") * F.pow(F.lit(2.0), 39 - k).cast("long")
            ).alias("s40")
        )
    )
    wprev = Window.orderBy("d")
    s = s.withColumn("s_prev", F.lag("s40").over(wprev))
    return s.select(
        "d",
        F.col("x").cast("long").alias("n_orders"),
        ieee_round(F.col("s40") / F.lit(_EWMA_POW), 6).alias("ewma"),
        F.when(
            F.col("s_prev").isNotNull(),
            (F.col("x") * F.lit(2**40) > 3 * F.col("s_prev")).cast("long"),
        ).alias("burst_flag"),
    ).orderBy("d")


EWMA_CONTROL_SQL = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS x
    FROM orders GROUP BY 1
),
s AS (
    SELECT c.d, c.x,
           sum(l.x * CAST(power(2, 39 - (c.d - l.d)) AS BIGINT)) AS s40
    FROM daily c
    JOIN daily l ON l.d <= c.d AND l.d >= c.d - 39
    GROUP BY c.d, c.x
),
lagged AS (
    SELECT d, x, s40, lag(s40) OVER (ORDER BY d) AS s_prev FROM s
)
SELECT d,
       CAST(x AS BIGINT) AS n_orders,
       {sql_ieee_round("s40 / 1099511627776.0", 6)} AS ewma,
       CASE WHEN s_prev IS NOT NULL
            THEN CAST(x * 1099511627776 > 3 * s_prev AS BIGINT) END
           AS burst_flag
FROM lagged
ORDER BY d
"""


# ---------------------------------------------------------------------------
# 3. Bloom-prefilter join with measured false-positive rate
# ---------------------------------------------------------------------------

_BLOOM_M = 4096  # bits


def _bloom_bits(key):
    """Two bit positions from disjoint md5 slices (the engine's
    content-addressing convention, split_assign/doc_fingerprint)."""
    h = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _BLOOM_M
    h2 = F.conv(F.substring(h, 16, 15), 16, 10).cast("long") % _BLOOM_M
    return h1, h2


def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Bloom ledger for the dim-filtering fact join: BUILDING-
    segment customers → k=2 / m=4096 bit set → orders pre-filter.
    n_false_pos is the price of the filter, fpr its measured rate over
    the true negatives. The bit-position table is bounded by m and
    broadcast; the Bloom pass is two broadcast semi joins — the fact
    never shuffles on that path, which is the entire point at 100 TB.
    The true-match audit join (orders ⋉ keys) is un-hinted: keys is a
    constant fraction of customer (SF-scaling), so broadcast is left to
    stats/AQE (r13 de-hint)."""
    # NULL keys carry no Bloom bits (md5(NULL) -> NULL; the oracle's
    # '0x'||NULL cast would crash) and can never equality-match anyway —
    # excluded from build AND probe on both sides. Degenerate nets.
    keys = (
        t(spark, sf_dir, "customer")
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & F.col("c_custkey").isNotNull()
        )
        .select("c_custkey")
        .distinct()
    )
    keys = keys.localCheckpoint()  # bits + true-match consumers
    k1, k2 = _bloom_bits(F.col("c_custkey"))
    bits = (
        keys.select(k1.alias("b"))
        .union(keys.select(k2.alias("b")))
        .distinct()
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .select("o_custkey")
    )
    o1, o2 = _bloom_bits(F.col("o_custkey"))
    fact = orders.select("o_custkey", o1.alias("h1"), o2.alias("h2"))
    passed = fact.join(
        F.broadcast(bits.select(F.col("b").alias("h1"))), "h1", "left_semi"
    ).join(
        F.broadcast(bits.select(F.col("b").alias("h2"))), "h2", "left_semi"
    )
    # keys is a ~1/5 constant fraction of customer (SF-scaling: ~1.5B
    # rows at the 100 TB design point) — it must NOT carry a broadcast
    # hint; stats/AQE pick broadcast where it actually fits (r13 de-hint;
    # the two `bits` hints above stay: bounded by m=4096 by construction).
    true_m = orders.join(
        keys.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_semi",
    )
    ledger = (
        keys.agg(F.count("*").alias("n_keys"))
        .crossJoin(bits.agg(F.count("*").alias("n_bits_set")))
        .crossJoin(orders.agg(F.count("*").alias("n_fact")))
        .crossJoin(passed.agg(F.count("*").alias("n_pass")))
        .crossJoin(true_m.agg(F.count("*").alias("n_true")))
    )
    return ledger.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_bits_set").cast("long").alias("n_bits_set"),
        F.col("n_fact").cast("long").alias("n_fact"),
        F.col("n_true").cast("long").alias("n_true_match"),
        F.col("n_pass").cast("long").alias("n_bloom_pass"),
        (F.col("n_pass") - F.col("n_true")).cast("long").alias("n_false_pos"),
        ieee_round(
            F.when(
                F.col("n_fact") > F.col("n_true"),
                (F.col("n_pass") - F.col("n_true"))
                / (F.col("n_fact") - F.col("n_true")),
            ),
            6,
        ).alias("fpr"),
    )


BLOOM_PREFILTER_JOIN_SQL = f"""
WITH keys AS (
    SELECT DISTINCT c_custkey FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_custkey IS NOT NULL
),
bits AS (
    SELECT DISTINCT b FROM (
        SELECT CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                    1, 15)) AS BIGINT) % {_BLOOM_M} AS b FROM keys
        UNION
        SELECT CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                    16, 15)) AS BIGINT) % {_BLOOM_M} AS b FROM keys
    )
),
fact AS (
    SELECT o_custkey,
           CAST(concat('0x', substring(md5(CAST(o_custkey AS VARCHAR)),
                1, 15)) AS BIGINT) % {_BLOOM_M} AS h1,
           CAST(concat('0x', substring(md5(CAST(o_custkey AS VARCHAR)),
                16, 15)) AS BIGINT) % {_BLOOM_M} AS h2
    FROM orders
    WHERE o_custkey IS NOT NULL
),
ledger AS (
    SELECT (SELECT count(*) FROM keys) AS n_keys,
           (SELECT count(*) FROM bits) AS n_bits_set,
           (SELECT count(*) FROM fact) AS n_fact,
           (SELECT count(*) FROM fact f
             WHERE f.h1 IN (SELECT b FROM bits)
               AND f.h2 IN (SELECT b FROM bits)) AS n_pass,
           (SELECT count(*) FROM fact f
             WHERE f.o_custkey IN (SELECT c_custkey FROM keys)) AS n_true
)
SELECT CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n_bits_set AS BIGINT) AS n_bits_set,
       CAST(n_fact AS BIGINT) AS n_fact,
       CAST(n_true AS BIGINT) AS n_true_match,
       CAST(n_pass AS BIGINT) AS n_bloom_pass,
       CAST(n_pass - n_true AS BIGINT) AS n_false_pos,
       {sql_ieee_round(
           "CASE WHEN n_fact > n_true THEN"
           " (n_pass - n_true) * 1.0 / (n_fact - n_true) END", 6
       )} AS fpr
FROM ledger
"""


R7G_ENTRIES: dict[str, Entry] = {
    "roc_auc_eval": Entry(roc_auc_eval, ROC_AUC_EVAL_SQL),
    "ewma_control": Entry(ewma_control, EWMA_CONTROL_SQL),
    "bloom_prefilter_join": Entry(
        bloom_prefilter_join, BLOOM_PREFILTER_JOIN_SQL
    ),
}
