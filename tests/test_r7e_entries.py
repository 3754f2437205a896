"""Semantic invariants for the round-7e forecast/CI/hierarchy entries."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
    t,
)

SF = "/root/testdata/sf0.001"


def test_mase_matches_python(spark):
    daily = Counter()
    for r in t(spark, SF, "orders").select(
        F.to_date("o_orderdate").alias("d")
    ).collect():
        daily[r["d"]] += 1
    one = dt.timedelta(days=1)
    e7 = e1 = n = 0
    for d, x in daily.items():
        if (d - one) in daily and (d - 7 * one) in daily:
            n += 1
            e7 += abs(x - daily[d - 7 * one])
            e1 += abs(x - daily[d - one])
    [row] = CATALOG["forecast_mase"].spark_fn(spark, SF).collect()
    assert (row["n_days"], row["seasonal_abs_err"], row["naive_abs_err"]) == (
        n,
        e7,
        e1,
    )
    assert abs(row["mase"] - e7 / e1) < 1e-6
    assert row["mase"] > 0


def test_wilson_ci_matches_python_and_bounds(spark):
    by_day = defaultdict(lambda: [set(), set()])
    for r in events_table(spark, SF).select(
        F.to_date("ts").alias("d"), "user_id", "event_type"
    ).collect():
        if r["event_type"] == "signup":
            by_day[r["d"]][0].add(r["user_id"])
        elif r["event_type"] == "purchase":
            by_day[r["d"]][1].add(r["user_id"])
    z = 1.96
    rows = CATALOG["conversion_wilson_ci"].spark_fn(spark, SF).collect()
    days_with_signups = {d for d, (s, _) in by_day.items() if s}
    assert {r["d"] for r in rows} == days_with_signups
    for r in rows:
        s, p_ = by_day[r["d"]]
        n, k = len(s), len(s & p_)
        assert (r["n_signups"], r["n_converted"]) == (n, k)
        p = k / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        assert abs(r["rate"] - p) < 1e-6
        assert abs(r["wilson_lo"] - (center - half)) < 1e-6
        assert abs(r["wilson_hi"] - (center + half)) < 1e-6
        # the Wilson interval never leaves [0, 1] and brackets the rate
        assert -1e-9 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1 + 1e-9


def test_hierarchy_shares_sum_to_one(spark):
    rows = CATALOG["hierarchy_share"].spark_fn(spark, SF).collect()
    assert rows
    by_region = defaultdict(list)
    for r in rows:
        by_region[r["region"]].append(r)
    # nation shares within each region sum to 1 (up to rounding)
    for region, rs in by_region.items():
        assert abs(sum(r["share_of_region"] for r in rs) - 1.0) < 1e-4
        # region share is constant across the region's rows
        assert len({r["region_share_of_total"] for r in rs}) == 1
    # region shares sum to 1
    total = sum(
        rs[0]["region_share_of_total"] for rs in by_region.values()
    )
    assert abs(total - 1.0) < 1e-4
    # revenue recomputation for one nation
    first = rows[0]
    cents = 0
    nk = {
        r["n_nationkey"]: r["n_name"] for r in t(spark, SF, "nation").collect()
    }
    cust_nation = {
        r["c_custkey"]: nk[r["c_nationkey"]]
        for r in t(spark, SF, "customer").collect()
    }
    for r in t(spark, SF, "orders").select("o_custkey", "o_totalprice").collect():
        if cust_nation[r["o_custkey"]] == first["nation"]:
            cents += round(r["o_totalprice"] * 100)
    assert abs(first["revenue"] - round(cents / 100.0, 2)) < 1e-6
