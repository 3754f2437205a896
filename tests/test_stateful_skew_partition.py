"""Stateful streaming operator, salted join equivalence, and
partition-pruned writes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators.skew import salted_join
from data_engineering_project_capstone_spark.streaming.events import (
    read_events_stream,
)
from data_engineering_project_capstone_spark.streaming.stateful import (
    anomaly_monitor,
    anomaly_monitor_batch,
)
from data_engineering_project_capstone_spark.plans.catalog import events_table


def test_stateful_anomaly_monitor_stream_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    q = (
        anomaly_monitor(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("anomaly_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode: take the LAST emitted row per user
    got_rows = spark.sql(
        "SELECT * FROM anomaly_out"
    ).toPandas().groupby("user_id").last()
    batch = anomaly_monitor_batch(events_table(spark, sf_dir)).set_index("user_id")
    assert len(got_rows) == len(batch)
    for uid in batch.index:
        g, b = got_rows.loc[uid], batch.loc[uid]
        assert g["n_events"] == b["n_events"], uid
        assert g["n_anomalies"] == b["n_anomalies"], uid
        assert abs(g["running_mean"] - b["running_mean"]) < 1e-9, uid


def test_salted_join_equivalence(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_and_mode_guard(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    # left join parity (unmatched big-side rows survive exactly once)
    plain = orders.join(customer, "o_custkey", "left").select(
        "o_orderkey", "c_name"
    )
    salted = salted_join(orders, customer, "o_custkey", n_salts=8, how="left").select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # outer modes would emit unmatched small-side rows once per salt → refuse
    import pytest as _pytest

    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError, match="salted_join supports"):
            salted_join(orders, customer, "o_custkey", how=how)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """The 100 TB fact layout: partition by a date column; a filtered scan
    must read only matching partitions (PartitionFilters in the plan)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)

    scan = spark.read.parquet(out).filter(F.col("o_year") == 1995)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # count only 1995 rows and confirm against unpartitioned filter
    expect = orders.filter(F.year("o_orderdate") == 1995).count()
    assert scan.count() == expect
    import glob
    import os

    dirs = [d for d in os.listdir(out) if d.startswith("o_year=")]
    assert len(dirs) > 1, "expected one directory per year partition"


def test_transform_with_state_matches_batch(spark, sf_dir):
    """The Spark 4 transformWithStateInPandas twin must produce the same
    per-user state as the applyInPandasWithState operator and the batch
    oracle (shared semantics pinned across all three).

    Environment gate: the TWS state protocol speaks protobuf between the
    JVM and the Python driver worker; this container ships no
    google.protobuf, so the test skips where the API cannot run (the
    operator itself is real and exercised wherever protobuf exists).
    Round-6 audit: google.protobuf confirmed absent and uninstallable
    here (no pip/network in the environment) — the skip is pinned until
    a protobuf-equipped CI leg exists; the applyInPandasWithState twin
    below covers the shared semantics against the batch oracle."""
    pytest.importorskip("google.protobuf")
    from data_engineering_project_capstone_spark.streaming.stateful import (
        anomaly_monitor_tws,
    )

    stream = read_events_stream(spark, sf_dir)
    q = (
        anomaly_monitor_tws(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("anomaly_tws_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.sql("SELECT * FROM anomaly_tws_out")
        .toPandas()
        .groupby("user_id")
        .last()
    )
    batch = anomaly_monitor_batch(events_table(spark, sf_dir)).set_index("user_id")
    assert len(got) == len(batch)
    for uid in batch.index:
        g, b = got.loc[uid], batch.loc[uid]
        assert g["n_events"] == b["n_events"], uid
        assert g["n_anomalies"] == b["n_anomalies"], uid
        assert abs(g["running_mean"] - b["running_mean"]) < 1e-9, uid


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Runtime DPP — the other half of the 100 TB layout story: a fact
    partitioned on the join key must be pruned by a SELECTIVE dim
    filter at runtime (the dim's matching keys become a subquery-driven
    PartitionFilter), so a 1000-partition fact reads only the
    partitions the dim filter selects.

    Gotcha pinned here: Spark's PartitionPruning rule only fires for
    predicate shapes it considers selective (EqualTo/In/Like/binary
    comparisons). A bare boolean column filter (``.filter("is_focus")``)
    is NOT recognized and silently disables DPP — which is why the dim
    uses an equality on a string tag."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    fact_path = str(tmp_path / "fact_by_year")
    orders.write.mode("overwrite").partitionBy("o_year").parquet(fact_path)
    dim_path = str(tmp_path / "year_dim")
    orders.select("o_year").distinct().withColumn(
        "tag", F.concat(F.lit("Y"), F.col("o_year"))
    ).write.mode("overwrite").parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "Y1996")
    j = fact.join(dim, "o_year").agg(F.sum("o_totalprice").alias("tp"))
    opt = j._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in opt.lower(), "DPP filter must be inserted"
    [row] = j.collect()
    [expect] = (
        orders.filter(F.col("o_year") == 1996)
        .agg(F.sum("o_totalprice").alias("tp"))
        .collect()
    )
    assert abs(row["tp"] - expect["tp"]) < 1e-6 * max(1.0, abs(expect["tp"]))
