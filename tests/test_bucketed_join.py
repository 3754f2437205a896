"""Bucketing: pre-shuffled table layout makes fact-fact joins exchange-free.

The 100 TB play: lineitem⋈orders on orderkey is the one join in this
workload that can't broadcast. Bucketing both sides by the join key at
write time moves the shuffle to ingest (once), and every subsequent join
reads co-located buckets — the plan must show a SortMergeJoin with NO
Exchange on either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
    spark.sql("DROP TABLE IF EXISTS bktdb.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bktdb.orders_b")
    # the default catalog is in-memory per session: DROP can't see tables
    # from previous sessions, but their warehouse dirs persist — clear them
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/bktdb.db", ignore_errors=True)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bktdb.lineitem_b")
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bktdb.orders_b")
    )
    return spark.table("bktdb.lineitem_b"), spark.table("bktdb.orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li_b, orders_b = bucketed
    # disable broadcast so the planner must sort-merge — the scenario
    # bucketing exists for (at 100 TB neither fact side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li_b.join(
            orders_b, li_b["l_orderkey"] == orders_b["o_orderkey"]
        ).select("l_orderkey", "l_quantity", "o_totalprice")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed):
    li_b, orders_b = bucketed
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = (
        li_b.join(orders_b, li_b["l_orderkey"] == orders_b["o_orderkey"])
        .agg(F.count("*"), F.round(F.sum("o_totalprice"), 2))
        .collect()
    )
    b = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .agg(F.count("*"), F.round(F.sum("o_totalprice"), 2))
        .collect()
    )
    assert a == b
