"""Semantic invariants for the round-6d entries (sampling, skew join,
statistics) — properties the oracle differential can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t
from data_engineering_project_capstone_spark.plans.catalog_r6d import (
    _SALT_N,
    _WS_K,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# sample_weighted
# ---------------------------------------------------------------------------


def test_weighted_sample_is_size_k_and_biased_toward_weight(spark):
    """Exactly K distinct docs, and the E-S keys bias selection toward
    heavy docs: the sample's mean n_chars must exceed the corpus mean
    (P(select) ∝ n_chars, so the expectation is the length-biased mean;
    at sf0.01's 2000 docs the gap is far outside chance)."""
    rows = CATALOG["sample_weighted"].spark_fn(spark, SF01).collect()
    assert len(rows) == _WS_K
    assert len({r["doc_id"] for r in rows}) == _WS_K
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = (
        t(spark, SF01, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_weighted_sample_stable_across_reruns(spark):
    a = [tuple(r) for r in CATALOG["sample_weighted"].spark_fn(spark, SF).collect()]
    b = [tuple(r) for r in CATALOG["sample_weighted"].spark_fn(spark, SF).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# skew_salted_join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    """The salted rewrite must be row-identical to the plain join+agg it
    replaces — computed here entirely in Spark (the oracle already
    proves it against DuckDB's plain join)."""
    from data_engineering_project_capstone_spark.functions.scalar import (
        ieee_round,
    )

    li = t(spark, SF, "lineitem")
    orders = t(spark, SF, "orders")
    plain = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            ieee_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
    got = CATALOG["skew_salted_join"].spark_fn(spark, SF)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_salt_spreads_hot_key_across_buckets(spark):
    """The point of salting: a key's fact rows must land in >1 salt
    bucket (take the orderkey with the most lineitems)."""
    li = t(spark, SF, "lineitem")
    hot = (
        li.groupBy("l_orderkey")
        .count()
        .orderBy(F.desc("count"), "l_orderkey")
        .first()
    )
    salt = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _SALT_N
    )
    n_buckets = (
        li.filter(F.col("l_orderkey") == hot["l_orderkey"])
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets > 1, f"hot key with {hot['count']} rows in 1 bucket"


# ---------------------------------------------------------------------------
# agg_correlation / chi_square_independence
# ---------------------------------------------------------------------------


def test_correlation_in_bounds(spark):
    row = CATALOG["agg_correlation"].spark_fn(spark, SF).collect()[0]
    assert row["n_days"] > 0
    assert -1.0 <= row["corr_cp"] <= 1.0


def test_chi_square_nonnegative_with_correct_dof(spark):
    row = CATALOG["chi_square_independence"].spark_fn(spark, SF).collect()[0]
    docs = t(spark, SF, "documents")
    n_src = docs.select("source").distinct().count()
    n_lang = docs.select("lang").distinct().count()
    assert row["chi2"] >= 0
    assert row["dof"] == (n_src - 1) * (n_lang - 1)


# ---------------------------------------------------------------------------
# table_fingerprints
# ---------------------------------------------------------------------------


def test_fingerprint_is_partition_and_order_independent(spark):
    from data_engineering_project_capstone_spark.plans.catalog_r6d import (
        _fp_expr,
    )

    docs = t(spark, SF, "documents")
    base = (
        docs.withColumn("fp", _fp_expr())
        .agg(F.expr("bit_xor(fp)").alias("x"))
        .collect()[0]["x"]
    )
    shuffled = (
        docs.repartition(17)
        .sortWithinPartitions(F.desc("n_chars"))
        .withColumn("fp", _fp_expr())
        .agg(F.expr("bit_xor(fp)").alias("x"))
        .collect()[0]["x"]
    )
    assert base == shuffled


def test_fingerprint_detects_single_row_change(spark):
    from data_engineering_project_capstone_spark.plans.catalog_r6d import (
        _fp_expr,
    )

    docs = t(spark, SF, "documents")
    base = (
        docs.withColumn("fp", _fp_expr())
        .agg(F.expr("bit_xor(fp)").alias("x"))
        .collect()[0]["x"]
    )
    first_id = docs.agg(F.min("doc_id")).collect()[0][0]
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == first_id, F.lit("tampered")).otherwise(
            F.col("text")
        ),
    )
    changed = (
        mutated.withColumn("fp", _fp_expr())
        .agg(F.expr("bit_xor(fp)").alias("x"))
        .collect()[0]["x"]
    )
    assert base != changed
