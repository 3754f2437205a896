"""Approximate aggregates: bounded error against exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import agg_approx

SF = "/root/testdata/sf0.01"


def test_approx_within_tolerance(spark):
    approx = {r["l_returnflag"]: r for r in agg_approx(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.05
        assert abs(a["approx_median_price"] - e["median"]) / e["median"] < 0.05
