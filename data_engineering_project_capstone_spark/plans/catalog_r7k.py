"""Round-7k catalog entries — SQL-surface and robust-statistics
additions:

- ``lateral_topk``: per-customer most-expensive order via a CORRELATED
  LATERAL subquery with ORDER BY + LIMIT — the SQL-surface feature a
  migrating user writes naturally, here as proof the engine runs it
  with the RIGHT plan: Catalyst decorrelates the lateral into a
  partial+final ``WindowGroupLimit`` (per-partition top-1 pushdown
  BEFORE the shuffle — never a full per-group sort) feeding one hash
  join; verified by the plan test (tests/test_plan_shapes.py asserts
  WindowGroupLimit and no global Sort). DuckDB runs the identical
  LATERAL text. Ties break on orderkey — total order.
- ``trimmed_mean_price``: 10%-trimmed mean order price per nation —
  the robust location estimate that survives a corrupted tail. EXACT:
  trim bounds are nearest-rank positions (k = n//10 cut from each
  side), the kept mass is selected by a per-nation row_number over
  (cents, orderkey) — a total order, so ties at the trim boundary cut
  deterministically — and the mean is ONE division of exact BIGINT
  (sum, count). Window partitions BY NATION (group-sized partitions,
  never a global sort).

Scale notes sit on each entry; both are one fact pass plus
nation-bounded post-aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t

_LATERAL_SQL_TEXT = """
SELECT c.c_custkey AS custkey,
       t.o_orderkey AS top_orderkey,
       {price} AS top_price
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
           AND o.o_orderkey IS NOT NULL
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
ORDER BY custkey
"""
# o_orderkey IS NOT NULL (combined fuzz, r9): the orderkey is the
# LIMIT-1 tiebreak at tied prices AND the output identity, and a NULL
# key has no defined position in that order (Spark sorts NULLs first
# ascending — the keyless order WINS the tie — DuckDB last, so it
# loses). Keyless orders are excluded from the lateral on both
# engines, per the repo's NULL-key discipline.


def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the LATERAL text itself through spark.sql — the point is
    that the engine accepts the migrating user's query verbatim and
    Catalyst picks the WindowGroupLimit plan (asserted in the plan
    suite), not that we hand-rewrote it.

    Session caveat: this is the only catalog entry that registers temp
    views (customer/orders); concurrent invocations at DIFFERENT
    sf_dirs in ONE session would race on the view names. The test
    harness never does that (the determinism pool runs distinct
    entries concurrently, and only this entry uses views)."""
    from .catalog import _ensure_session_conf

    _ensure_session_conf(spark)
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        _LATERAL_SQL_TEXT.format(
            price="CAST(round(t.o_totalprice * 100) AS BIGINT)"
        )
    )


LATERAL_TOPK_SQL = _LATERAL_SQL_TEXT.format(
    price="CAST(round(t.o_totalprice * 100) AS BIGINT)"
)


_TRIM = 10  # cut n//10 from each tail


def trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: row count, trim size, and the exact 10%-trimmed
    mean price (NULL when trimming would consume the whole group).

    NULL policy (combined fuzz, r9): priceless and keyless orders are
    excluded on both engines — the trim is a rank operation over
    (cents, orderkey), and a NULL in either column has no defined rank
    position (Spark NULLS FIRST asc vs DuckDB NULLS LAST trimmed
    DIFFERENT tails: Spark cut the priceless rows, DuckDB cut the most
    expensive ones). Matches the two_phase_quantiles percentile
    semantics and the NULL-key discipline."""
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    rows = (
        t(spark, sf_dir, "orders")
        .filter(
            F.col("o_totalprice").isNotNull() & F.col("o_orderkey").isNotNull()
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .join(cust, "o_custkey")
        .select(F.col("c_nationkey").alias("g"), "c", "o_orderkey")
    )
    w = Window.partitionBy("g").orderBy("c", "o_orderkey")
    n_w = Window.partitionBy("g")
    ranked = rows.select(
        "g",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(n_w).alias("n"),
    )
    k = F.floor(F.col("n") / _TRIM)  # integer trim size, both bounds
    kept = ranked.filter((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k))
    agg = kept.groupBy("g").agg(
        F.max("n").alias("n"),
        F.count("*").alias("n_kept"),
        F.sum("c").alias("s"),
    )
    return agg.select(
        F.col("g").cast("long").alias("nation_key"),
        F.col("n").cast("long").alias("n_rows"),
        F.floor(F.col("n") / _TRIM).cast("long").alias("n_trimmed_each"),
        ieee_round(
            F.when(
                F.col("n_kept") > 0,
                F.col("s") / F.col("n_kept") / 100.0,
            ),
            4,
        ).alias("trimmed_mean"),
    ).orderBy("nation_key")


TRIMMED_MEAN_PRICE_SQL = f"""
WITH rows_ AS (
    SELECT c.c_nationkey AS g,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cts,
           o.o_orderkey
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice IS NOT NULL AND o.o_orderkey IS NOT NULL
),
ranked AS (
    SELECT g, cts,
           row_number() OVER (PARTITION BY g ORDER BY cts, o_orderkey)
               AS rn,
           count(*) OVER (PARTITION BY g) AS n
    FROM rows_
),
kept AS (
    SELECT * FROM ranked
    WHERE rn > n // {_TRIM} AND rn <= n - n // {_TRIM}
),
agg AS (
    SELECT g, max(n) AS n, count(*) AS n_kept, sum(cts) AS s
    FROM kept GROUP BY g
)
SELECT CAST(g AS BIGINT) AS nation_key,
       CAST(n AS BIGINT) AS n_rows,
       CAST(n // {_TRIM} AS BIGINT) AS n_trimmed_each,
       {sql_ieee_round(
           "CASE WHEN n_kept > 0 THEN s * 1.0 / n_kept / 100.0 END", 4
       )} AS trimmed_mean
FROM agg
ORDER BY nation_key
"""


R7K_ENTRIES: dict[str, Entry] = {
    "lateral_topk": Entry(lateral_topk, LATERAL_TOPK_SQL),
    "trimmed_mean_price": Entry(trimmed_mean_price, TRIMMED_MEAN_PRICE_SQL),
}
