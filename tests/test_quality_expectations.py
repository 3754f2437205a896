"""Data-quality expectations: one-pass split + metrics semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators import quality
from data_engineering_project_capstone_spark.plans.catalog import t


def _rules():
    return {
        "positive_price": F.col("o_totalprice") > 0,
        "valid_status": F.col("o_orderstatus").isin("O", "F", "P"),
        "has_custkey": F.col("o_custkey").isNotNull(),
    }


def test_split_partitions_every_row(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    passing, quarantined = quality.split(orders, _rules())
    assert passing.count() + quarantined.count() == orders.count()
    assert "_failed_expectations" not in passing.columns
    assert "_failed_expectations" in quarantined.columns


def test_quarantine_names_failed_rules(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, 10.0, "X"), (4, -1.0, "X")],
        ["o_custkey", "o_totalprice", "o_orderstatus"],
    )
    _, quarantined = quality.split(df, _rules())
    failed = {
        r["o_custkey"]: sorted(r["_failed_expectations"])
        for r in quarantined.collect()
    }
    assert failed == {
        2: ["positive_price"],
        3: ["valid_status"],
        4: ["positive_price", "valid_status"],
    }


def test_null_predicate_counts_as_failure(spark):
    df = spark.createDataFrame(
        [(None, 10.0, "O")],
        "o_custkey bigint, o_totalprice double, o_orderstatus string",
    )
    _, quarantined = quality.split(df, _rules())
    assert quarantined.count() == 1
    assert quarantined.first()["_failed_expectations"] == ["has_custkey"]


def test_metrics_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, 10.0, "X"), (4, -1.0, "X")],
        ["o_custkey", "o_totalprice", "o_orderstatus"],
    )
    m = {r["rule"]: r for r in quality.metrics(df, _rules()).collect()}
    assert m["positive_price"]["n_failed"] == 2
    assert m["valid_status"]["n_failed"] == 2
    assert m["has_custkey"]["n_failed"] == 0
    assert all(r["n_total"] == 4 for r in m.values())
    assert m["positive_price"]["fail_rate"] == 0.5
    # one aggregation, no per-rule jobs: the plan has a single pair of
    # HashAggregates (partial+final) before the stack projection
    plan = (
        quality.metrics(df, _rules())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("HashAggregate") == 2
