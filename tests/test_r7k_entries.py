"""Semantic invariants for the round-7k entries: brute-force Python
twins for the lateral top-1 and the exact trimmed mean."""

from __future__ import annotations

from collections import defaultdict

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t

SF = "/root/testdata/sf0.001"


def _orders_by_cust(spark):
    by_cust = defaultdict(list)
    for r in t(spark, SF, "orders").collect():
        by_cust[r["o_custkey"]].append(
            (round(r["o_totalprice"] * 100), r["o_orderkey"])
        )
    return by_cust


def test_lateral_topk_matches_python(spark):
    by_cust = _orders_by_cust(spark)
    custs = {r["c_custkey"] for r in t(spark, SF, "customer").collect()}
    want = {}
    for ck in custs:
        if by_cust[ck]:
            # max price, ties -> smallest orderkey
            c, k = max(by_cust[ck], key=lambda t_: (t_[0], -t_[1]))
            want[ck] = (k, c)
    got = {
        r["custkey"]: (r["top_orderkey"], r["top_price"])
        for r in CATALOG["lateral_topk"].spark_fn(spark, SF).collect()
    }
    assert got == want  # customers with no orders drop (lateral inner)


def test_trimmed_mean_matches_python_and_is_robust(spark):
    nat = {
        r["c_custkey"]: r["c_nationkey"]
        for r in t(spark, SF, "customer").collect()
    }
    by_g = defaultdict(list)
    for r in t(spark, SF, "orders").collect():
        if r["o_custkey"] in nat:
            by_g[nat[r["o_custkey"]]].append(
                (round(r["o_totalprice"] * 100), r["o_orderkey"])
            )
    got = {
        r["nation_key"]: r
        for r in CATALOG["trimmed_mean_price"].spark_fn(spark, SF).collect()
    }
    assert set(got) == {g for g, v in by_g.items() if v}
    for g, vals in by_g.items():
        vals.sort()  # (cents, orderkey) — the entry's total order
        n = len(vals)
        k = n // 10
        kept = [c for c, _ in vals[k : n - k]]
        r = got[g]
        assert (r["n_rows"], r["n_trimmed_each"]) == (n, k)
        if kept:
            assert abs(r["trimmed_mean"] - sum(kept) / len(kept) / 100.0) < 1e-4
            # robustness: the trimmed mean must sit within the kept range
            assert kept[0] / 100.0 <= r["trimmed_mean"] <= kept[-1] / 100.0
        else:
            assert r["trimmed_mean"] is None
