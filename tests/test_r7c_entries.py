"""Semantic invariants for the round-7c exact-quantile entries — each
checked against a plain-Python sort (the thing the distributed plan
must never do), plus the structural property that makes them scale:
no global sort or fact-sized window in the physical plan."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t

SF = "/root/testdata/sf0.001"


def test_two_phase_quantiles_match_sorted_python(spark):
    cents = sorted(
        round(r["o_totalprice"] * 100)
        for r in t(spark, SF, "orders").collect()
    )
    n = len(cents)
    want = {}
    for q, qn, qd in [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]:
        pos = (qn * n + qd - 1) // qd
        want[q] = (pos, cents[pos - 1])
    rows = CATALOG["two_phase_quantiles"].spark_fn(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        pos, c = want[r["q"]]
        assert r["pos"] == pos
        assert abs(r["value"] - round(c / 100.0, 2)) < 1e-6
    vals = [r["value"] for r in sorted(rows, key=lambda r: r["q"])]
    assert vals == sorted(vals)  # p50 <= p90 <= p99


def test_two_phase_quantiles_plan_has_no_global_sort_on_fact(spark):
    """The point of the entry: the FACT is never globally sorted. The
    only Sorts allowed are inside the bucket-local window (partitioned
    by q/bucket) and the 3-row presentation orderBy."""
    df = CATALOG["two_phase_quantiles"].spark_fn(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Sort " in line and "rangepartitioning" not in line:
            # bucket-local sort must be partitioned by the located bucket
            assert "q#" in line or "b#" in line, line
    assert "Window" in plan


def test_weighted_median_matches_python(spark):
    by_val = defaultdict(int)
    for r in t(spark, SF, "lineitem").collect():
        by_val[round(r["l_extendedprice"] * 100)] += round(r["l_quantity"])
    total_w = sum(by_val.values())
    pos = (total_w + 1) // 2
    cum = 0
    for v in sorted(by_val):
        cum += by_val[v]
        if cum >= pos:
            want = v
            break
    [row] = CATALOG["weighted_median"].spark_fn(spark, SF).collect()
    assert row["half_weight"] == pos
    assert abs(row["weighted_median"] - round(want / 100.0, 2)) < 1e-6


def test_price_histogram_mass_and_edges(spark):
    cents = [
        round(r["o_totalprice"] * 100)
        for r in t(spark, SF, "orders").collect()
    ]
    lo, hi = min(cents), max(cents)
    span = hi - lo + 1
    want = defaultdict(int)
    for c in cents:
        want[((c - lo) * 20) // span] += 1
    rows = CATALOG["price_histogram"].spark_fn(spark, SF).collect()
    got = {r["bin"]: r["n_orders"] for r in rows}
    assert got == dict(want)
    assert sum(got.values()) == len(cents)
    assert all(0 <= b < 20 for b in got)
    # bin edges are exact integer math scaled to dollars; compare the
    # UNROUNDED rational edge with half-cent tolerance (python round()
    # is banker's, the engines' ieee_round is not — a .005 boundary
    # would false-fail an exact-match assertion)
    for r in rows:
        exact = (lo + r["bin"] * span / 20) / 100.0
        assert abs(r["bin_lo"] - exact) <= 0.005 + 1e-9
