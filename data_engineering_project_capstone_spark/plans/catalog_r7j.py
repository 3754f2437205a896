"""Round-7j catalog entries — leakage-safe ML feature/eval patterns,
both assembled from exact integers:

- ``target_encode_oof``: K-fold OUT-OF-FOLD target encoding of nation
  by mean order price — the leakage-safe form of the classic
  categorical encoding (a row's own fold is excluded from its
  encoding, so the feature never sees its own target). Folds are
  content-addressed (md5(orderkey) mod 5, the split_assign
  convention). The encoding is ONE division of exact BIGINTs:
  enc(g, f) = (S_g − S_{g,f}) / (n_g − n_{g,f}) — both engines build
  identical numerators/denominators, so the doubles are bit-identical.
  NULL when a nation's rows all sit in one fold (no out-of-fold data).
- ``conformal_interval``: split-conformal prediction coverage — the
  distribution-free interval wrapper used to calibrate any point
  model. Hash-split train/calibration/test (6/2/2), per-nation
  mean-price "model" from the train split, nearest-rank 90% quantile
  of calibration residuals, then MEASURED test coverage (the whole
  point of conformal: coverage ≈ 0.9 by construction, and the ledger
  shows it). The residual |c − S_g/n_g| is kept EXACT by scaling
  through the group size: r = |c·n_g − S_g| is a BIGINT, the quantile
  is nearest-rank (ceil(0.9·m) = (9m+9)//10, pure integer), and the
  coverage test r ≤ q_g is a BIGINT comparison — no float enters
  until the final coverage ratio.

Scale: both are one fact pass to (nation[, fold]) grain plus
bounded-size joins back; the conformal calibration quantile windows
partition BY NATION (≥25-way parallel, group-sized partitions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from .catalog import Entry, sql_ieee_round, t

_N_FOLDS = 5


def _with_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    # fold/bucket assignment hashes the orderkey: a NULL key has no
    # reproducible fold — excluded on both sides (degenerate-orders net)
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull())
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .join(cust, "o_custkey")
        .select("o_orderkey", F.col("c_nationkey").alias("g"), "c")
    )


def _bucket(key, m: int):
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
            "long"
        )
        % m
    )


def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (nation, fold): row count and the out-of-fold mean-price
    encoding that fold's rows would receive."""
    rows = _with_nation(spark, sf_dir).withColumn(
        "f", _bucket(F.col("o_orderkey"), _N_FOLDS)
    )
    per_gf = rows.groupBy("g", "f").agg(
        F.sum("c").alias("s_gf"), F.count("*").alias("n_gf")
    )
    per_g = per_gf.groupBy(F.col("g").alias("g2")).agg(
        F.sum("s_gf").alias("s_g"), F.sum("n_gf").alias("n_g")
    )
    return (
        per_gf.join(F.broadcast(per_g), per_gf.g == per_g.g2)
        .select(
            F.col("g").cast("long").alias("nation_key"),
            F.col("f").cast("long").alias("fold"),
            F.col("n_gf").cast("long").alias("n_rows"),
            ieee_round(
                F.when(
                    F.col("n_g") > F.col("n_gf"),
                    (F.col("s_g") - F.col("s_gf"))
                    / (F.col("n_g") - F.col("n_gf"))
                    / 100.0,
                ),
                4,
            ).alias("oof_encoding"),
        )
        .orderBy("nation_key", "fold")
    )


TARGET_ENCODE_OOF_SQL = f"""
WITH rows_ AS (
    SELECT o.o_orderkey,
           c.c_nationkey AS g,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cts,
           CAST(concat('0x', substring(md5(CAST(o.o_orderkey AS VARCHAR)),
                1, 15)) AS BIGINT) % {_N_FOLDS} AS f
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IS NOT NULL
),
per_gf AS (
    SELECT g, f, sum(cts) AS s_gf, count(*) AS n_gf
    FROM rows_ GROUP BY g, f
),
per_g AS (
    SELECT g, sum(s_gf) AS s_g, sum(n_gf) AS n_g FROM per_gf GROUP BY g
)
SELECT CAST(a.g AS BIGINT) AS nation_key,
       CAST(a.f AS BIGINT) AS fold,
       CAST(a.n_gf AS BIGINT) AS n_rows,
       {sql_ieee_round(
           "CASE WHEN b.n_g > a.n_gf THEN"
           " (b.s_g - a.s_gf) * 1.0 / (b.n_g - a.n_gf) / 100.0 END", 4
       )} AS oof_encoding
FROM per_gf a JOIN per_g b ON a.g = b.g
ORDER BY nation_key, fold
"""


def conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: split sizes, the scaled 90% conformal radius, and
    the measured test coverage. Nations missing from train or
    calibration drop out (inner joins — documented).

    NULL policy (combined fuzz, r9): priceless orders are excluded on
    both engines — a NULL price yields a NULL residual, which has no
    position in the calibration's rank order (Spark NULLS FIRST asc vs
    DuckDB NULLS LAST shifted the 90% quantile index onto different
    rows) and can never be covered or cover anything in the test
    split."""
    rows = _with_nation(spark, sf_dir).filter(
        F.col("c").isNotNull()
    ).withColumn(
        "b", _bucket(F.col("o_orderkey"), 10)
    )
    rows = rows.localCheckpoint()  # three split consumers
    train = (
        rows.filter(F.col("b") <= 5)
        .groupBy("g")
        .agg(F.sum("c").alias("s_g"), F.count("*").alias("n_g"))
    )
    resid = F.abs(F.col("c") * F.col("n_g") - F.col("s_g"))
    calib = (
        rows.filter((F.col("b") == 6) | (F.col("b") == 7))
        .join(F.broadcast(train), "g")
        .select("g", resid.alias("r"))
    )
    w = Window.partitionBy("g").orderBy("r")
    m = Window.partitionBy("g")
    q = (
        calib.withColumn("rn", F.row_number().over(w))
        .withColumn("m", F.count("*").over(m))
        .filter(F.col("rn") == F.floor((9 * F.col("m") + 9) / 10))
        .select("g", F.col("r").alias("q"), F.col("m").alias("n_calib"))
    )
    test = (
        rows.filter(F.col("b") >= 8)
        .join(F.broadcast(train), "g")
        .join(F.broadcast(q), "g")
        .groupBy("g")
        .agg(
            F.count("*").alias("n_test"),
            F.sum((resid <= F.col("q")).cast("long")).alias("covered"),
        )
    )
    return (
        test.join(F.broadcast(train), "g")
        .join(F.broadcast(q.select("g", "q", "n_calib")), "g")
        .select(
            F.col("g").cast("long").alias("nation_key"),
            F.col("n_g").cast("long").alias("n_train"),
            F.col("n_calib").cast("long").alias("n_calib"),
            F.col("n_test").cast("long").alias("n_test"),
            F.col("q").cast("long").alias("q_scaled"),
            ieee_round(F.col("covered") / F.col("n_test"), 4).alias(
                "coverage"
            ),
        )
        .orderBy("nation_key")
    )


CONFORMAL_INTERVAL_SQL = f"""
WITH rows_ AS (
    SELECT o.o_orderkey,
           c.c_nationkey AS g,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cts,
           CAST(concat('0x', substring(md5(CAST(o.o_orderkey AS VARCHAR)),
                1, 15)) AS BIGINT) % 10 AS b
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IS NOT NULL AND o.o_totalprice IS NOT NULL
),
train AS (
    SELECT g, sum(cts) AS s_g, count(*) AS n_g
    FROM rows_ WHERE b <= 5 GROUP BY g
),
calib AS (
    SELECT r.g, abs(r.cts * t.n_g - t.s_g) AS res
    FROM rows_ r JOIN train t ON r.g = t.g
    WHERE r.b IN (6, 7)
),
q AS (
    SELECT g, res AS q, m AS n_calib FROM (
        SELECT g, res,
               row_number() OVER (PARTITION BY g ORDER BY res) AS rn,
               count(*) OVER (PARTITION BY g) AS m
        FROM calib
    ) WHERE rn = (9 * m + 9) // 10
),
test AS (
    SELECT r.g, count(*) AS n_test,
           sum(CASE WHEN abs(r.cts * t.n_g - t.s_g) <= q.q
                    THEN 1 ELSE 0 END) AS covered
    FROM rows_ r
    JOIN train t ON r.g = t.g
    JOIN q ON r.g = q.g
    WHERE r.b >= 8
    GROUP BY r.g
)
SELECT CAST(test.g AS BIGINT) AS nation_key,
       CAST(t.n_g AS BIGINT) AS n_train,
       CAST(q.n_calib AS BIGINT) AS n_calib,
       CAST(test.n_test AS BIGINT) AS n_test,
       CAST(q.q AS BIGINT) AS q_scaled,
       {sql_ieee_round("covered * 1.0 / n_test", 4)} AS coverage
FROM test
JOIN train t ON test.g = t.g
JOIN q ON test.g = q.g
ORDER BY nation_key
"""


R7J_ENTRIES: dict[str, Entry] = {
    "target_encode_oof": Entry(target_encode_oof, TARGET_ENCODE_OOF_SQL),
    "conformal_interval": Entry(conformal_interval, CONFORMAL_INTERVAL_SQL),
}
