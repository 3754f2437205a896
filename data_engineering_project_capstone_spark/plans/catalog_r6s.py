"""Round-6s catalog entries — inequality and inference readouts:

- ``orders_gini``: Gini coefficient of per-customer spend — the
  single-number concentration stat the Pareto curve entry plots. Uses
  the rank formula G = (2·Σ i·xᵢ)/(n·Σxᵢ) − (n+1)/n over spend sorted
  ascending (ties broken by customer key), with spend in exact int64
  cents so both Σ-terms are exact integers (Σ i·xᵢ at int64: rank ≤
  ~10⁸ × cents ≤ ~10⁹ stays under 2⁶³ for any SF this engine
  targets; the wide-scale upgrade path is DECIMAL(38)).
- ``welch_ttest``: Welch's unequal-variance t statistic comparing
  per-customer spend between the BUILDING market segment and the
  rest — the two-sample inference readout (chi-square covers
  categorical drift; this is its numeric sibling). Means/variances
  derive from exact integer sums, so both engines build the identical
  doubles.

Scale shape: both entries do one per-customer aggregate; gini's rank
window runs over the aggregate (|customers| rows — same documented
tradeoff as rfm_segments, with the two-phase percentile pattern as
the extreme-scale fallback), and the t-test is a 2-group aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t


def orders_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row ledger: customers, total spend, Gini coefficient of the
    per-customer spend distribution."""
    # a customer whose every order has a NULL price has no defined
    # spend — excluded on BOTH engines before ranking (a NULL cents
    # would sort FIRST on Spark, LAST on DuckDB; random-corpus fuzz)
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("cents")
        )
        .filter(F.col("cents").isNotNull())
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = per_cust.select(
        "cents", F.row_number().over(w).alias("i")
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        # Σ i·cents is n²-scale (rank × global-ish cents): int64 dies
        # just past sf1; the OPERAND cast to DECIMAL(38,0) keeps even
        # the per-row product exact, matching the oracle's HUGEINT cast
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias(
            "si"
        ),
    )
    # n·s also outgrows int64; the exact product forms in DECIMAL and
    # converts to double at the division, exactly like DuckDB's
    # hugeint → double conversion
    gini = (2.0 * F.col("si")) / (
        F.col("n").cast("decimal(38,0)") * F.col("s")
    ) - (F.col("n") + 1.0) / F.col("n")
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        ieee_round(F.col("s") / 100.0, 2).alias("total_spend"),
        ieee_round(gini, 6).alias("gini"),
    )


ORDERS_GINI_SQL = f"""
WITH per_cust AS (
    SELECT o_custkey,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY o_custkey
    HAVING sum(CAST(round(o_totalprice * 100) AS BIGINT)) IS NOT NULL
),
ranked AS (
    SELECT cents,
           row_number() OVER (ORDER BY cents, o_custkey) AS i
    FROM per_cust
),
agg AS (
    SELECT count(*) AS n, sum(cents) AS s,
           -- HUGEINT operand: a BIGINT rank·cents product errors at scale
           sum(CAST(i AS HUGEINT) * cents) AS si
    FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       {sql_ieee_round("s / 100.0", 2)} AS total_spend,
       {sql_ieee_round("(2.0 * si) / (n * s) - (n + 1.0) / n", 6)} AS gini
FROM agg
"""


_TT_SEGMENT = "BUILDING"


def welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Welch two-sample readout: group sizes, mean spends, the
    t statistic, and the Welch-Satterthwaite degrees of freedom, for
    BUILDING-segment customers vs all others. Sample variance uses the
    exact-sum form (Σx² − (Σx)²/n)/(n−1); t is NULL when either group
    is too small (<2) or both variances are zero.

    Exact folds (random-dims fuzz, r9): Σx and Σx² accumulate as
    DECIMAL over integer cents and cents², not as raw double sums —
    Spark's partial-aggregation order varies run to run, and on a
    tie-heavy corpus the last-ulp drift in a double Σx² moved the
    4dp-rounded t statistic across a rounding boundary (a FLAKY
    cross-engine mismatch: same tree passed and failed alternate
    runs). The decimal folds are order-free; both engines convert the
    identical exact integers to double once, then run the identical
    scalar op sequence. cents² of a 1e11-cent customer is ~1e22 —
    DECIMAL(38,0) holds ~1e16 such customers before the documented
    overflow-to-NULL envelope (q11 note) engages."""
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("cents")
        )
        .join(
            t(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
        .select(
            (F.col("c_mktsegment") == _TT_SEGMENT).alias("grp"),
            F.col("cents").cast("decimal(19,0)").alias("c19"),
        )
    )
    stats = per_cust.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("c19").alias("sc"),
        F.sum(F.col("c19") * F.col("c19")).alias("qc"),
    )
    a = stats.filter(F.col("grp")).select(
        F.col("n").alias("na"),
        (F.col("sc").cast("double") / 100.0).alias("sa"),
        (F.col("qc").cast("double") / 10000.0).alias("qa"),
    )
    b = stats.filter(~F.col("grp")).select(
        F.col("n").alias("nb"),
        (F.col("sc").cast("double") / 100.0).alias("sb"),
        (F.col("qc").cast("double") / 10000.0).alias("qb"),
    )
    j = a.crossJoin(F.broadcast(b))
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    va = (F.col("qa") - F.col("sa") * F.col("sa") / F.col("na")) / (
        F.col("na") - 1
    )
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / F.col("nb")) / (
        F.col("nb") - 1
    )
    se2 = va / F.col("na") + vb / F.col("nb")
    tstat = F.when(
        (F.col("na") > 1) & (F.col("nb") > 1) & (se2 > 0),
        (ma - mb) / F.sqrt(se2),
    )
    dof = F.when(
        (F.col("na") > 1) & (F.col("nb") > 1) & (se2 > 0),
        (se2 * se2)
        / (
            (va / F.col("na")) * (va / F.col("na")) / (F.col("na") - 1)
            + (vb / F.col("nb")) * (vb / F.col("nb")) / (F.col("nb") - 1)
        ),
    )
    return j.select(
        F.col("na").cast("long").alias("n_building"),
        F.col("nb").cast("long").alias("n_other"),
        ieee_round(ma, 4).alias("mean_building"),
        ieee_round(mb, 4).alias("mean_other"),
        ieee_round(tstat, 4).alias("t_stat"),
        ieee_round(dof, 2).alias("welch_dof"),
    )


WELCH_TTEST_SQL = f"""
WITH per_cust AS (
    SELECT (c.c_mktsegment = '{_TT_SEGMENT}') AS grp,
           sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_custkey, c.c_mktsegment
),
stats AS (
    -- exact integer folds (HUGEINT ≡ the Spark form's DECIMAL): see
    -- the entry docstring — raw double sums are partial-agg-order
    -- dependent on the Spark side and flaked a 4dp rounding boundary
    SELECT grp, count(*) AS n,
           sum(CAST(cents AS HUGEINT)) AS sc,
           sum(CAST(cents AS HUGEINT) * cents) AS qc
    FROM per_cust GROUP BY grp
),
j AS (
    SELECT a.n AS na, CAST(a.sc AS DOUBLE) / 100.0 AS sa,
           CAST(a.qc AS DOUBLE) / 10000.0 AS qa,
           b.n AS nb, CAST(b.sc AS DOUBLE) / 100.0 AS sb,
           CAST(b.qc AS DOUBLE) / 10000.0 AS qb
    FROM (SELECT * FROM stats WHERE grp) a,
         (SELECT * FROM stats WHERE NOT grp) b
),
d AS (
    SELECT na, nb, sa / na AS ma, sb / nb AS mb,
           (qa - sa * sa / na) / (na - 1) AS va,
           (qb - sb * sb / nb) / (nb - 1) AS vb
    FROM j
)
SELECT CAST(na AS BIGINT) AS n_building,
       CAST(nb AS BIGINT) AS n_other,
       {sql_ieee_round("ma", 4)} AS mean_building,
       {sql_ieee_round("mb", 4)} AS mean_other,
       {sql_ieee_round(
           "CASE WHEN na > 1 AND nb > 1 AND va / na + vb / nb > 0 THEN "
           "(ma - mb) / sqrt(va / na + vb / nb) END", 4)} AS t_stat,
       {sql_ieee_round(
           "CASE WHEN na > 1 AND nb > 1 AND va / na + vb / nb > 0 THEN "
           "((va / na + vb / nb) * (va / na + vb / nb)) / "
           "((va / na) * (va / na) / (na - 1)"
           " + (vb / nb) * (vb / nb) / (nb - 1)) END", 2)} AS welch_dof
FROM d
"""


R6S_ENTRIES: dict[str, Entry] = {
    "orders_gini": Entry(orders_gini, ORDERS_GINI_SQL),
    "welch_ttest": Entry(welch_ttest, WELCH_TTEST_SQL),
}
