"""Semantic invariants for the round-6n revenue-analytics entries."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
    t,
)
from data_engineering_project_capstone_spark.streaming.events import (
    sessionize_batch,
)

SF = "/root/testdata/sf0.001"


def test_cohort_ltv_triangle_shape(spark):
    rows = CATALOG["orders_cohort_ltv"].spark_fn(spark, SF).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_month"]].append(r)
    n_cust_orders = t(spark, SF, "orders").select("o_custkey").distinct().count()
    sizes = {c: rs[0]["n_customers"] for c, rs in by_cohort.items()}
    assert sum(sizes.values()) == n_cust_orders
    for c, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_months"])
        assert rs[0]["age_months"] == 0, f"{c}: cohort must have an age-0 row"
        vals = [r["avg_cum_revenue"] for r in rs]
        assert vals == sorted(vals), f"{c}: cumulative LTV must be monotone"
        assert len({r["n_customers"] for r in rs}) == 1


def test_abc_classes_partition_parts(spark):
    rows = {r["abc_class"]: r for r in
            CATALOG["abc_classification"].spark_fn(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts = t(spark, SF, "lineitem").select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-4
    # A stops at the first part crossing 80% → its share can exceed 0.8
    # only by less than one part's contribution, and B analogously
    assert rows["A"]["revenue_share"] <= 0.8 + 1e-9
    assert rows["A"]["revenue_share"] + rows["B"]["revenue_share"] <= 0.95 + 1e-9


def test_bounce_rate_consistent_with_sessionizer(spark):
    rows = CATALOG["session_bounce_rate"].spark_fn(spark, SF).collect()
    sess = sessionize_batch(events_table(spark, SF), gap_minutes=30)
    assert sum(r["n_sessions"] for r in rows) == sess.count()
    assert sum(r["n_bounces"] for r in rows) == sess.filter(
        F.col("n_events") == 1
    ).count()
    for r in rows:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]
        assert abs(
            r["bounce_rate"] - round(r["n_bounces"] / r["n_sessions"], 6)
        ) < 1e-9
