"""Approximate aggregates: bounded error against exact values.

agg_approx now emits exact anchors + within-tolerance verdict booleans
(driver-comparable); this test checks the verdicts are TRUE and cross-checks
the raw sketch error directly against exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import agg_approx

SF = "/root/testdata/sf0.01"


def test_approx_verdicts_true(spark):
    for r in agg_approx(spark, SF).collect():
        assert r["approx_parts_ok"], r
        assert r["approx_median_ok"], r


def test_raw_sketch_error_bounded(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("ap"),
            F.countDistinct("l_partkey").alias("ex"),
            F.percentile_approx("l_extendedprice", 0.5).alias("am"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("em"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["ap"] - r["ex"]) / r["ex"] < 0.05
        assert abs(r["am"] - r["em"]) / r["em"] < 0.05
