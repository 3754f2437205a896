"""Two-phase top-k must equal the single-window answer exactly."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators.topk import topk_per_group_scalable


def test_scalable_topk_equals_single_window(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = orders.join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
    ).select("c_nationkey", "o_orderkey", "o_totalprice")

    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    w = Window.partitionBy("c_nationkey").orderBy(*order)
    single = (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    )
    scalable = topk_per_group_scalable(
        joined, ["c_nationkey"], order, k=3, n_salts=8
    ).collect()
    key = lambda r: (r["c_nationkey"], r["rk"], r["o_orderkey"], r["o_totalprice"])
    assert sorted(map(key, single)) == sorted(map(key, scalable))


def test_scalable_topk_small_groups(spark):
    rows = [(g, i, float(100 - i)) for g in ("a", "b") for i in range(5)]
    df = spark.createDataFrame(rows, ["g", "i", "v"])
    out = topk_per_group_scalable(
        df, ["g"], [F.col("v").desc(), F.col("i")], k=2, n_salts=4
    ).collect()
    got = {(r["g"], r["rk"]): r["i"] for r in out}
    assert got == {("a", 1): 0, ("a", 2): 1, ("b", 1): 0, ("b", 2): 1}
