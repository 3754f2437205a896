"""Semantic invariants for the round-7b TPC-H completion batch —
brute-force recomputation in plain Python from the raw rows (no code
shared with the Spark or DuckDB forms)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t
from data_engineering_project_capstone_spark.plans.catalog_r7b import (
    _LATE_DAYS,
    _Q4_HI,
    _Q4_LO,
    _Q17_BRAND,
    _Q18_QTY,
    _Q19,
    _Q22_CUT,
)

SF = "/root/testdata/sf0.001"


def _li(spark):
    return [
        (
            r["l_orderkey"],
            r["l_partkey"],
            r["l_suppkey"],
            round(r["l_quantity"]),
            round(r["l_extendedprice"] * 100),
            round(r["l_discount"] * 100),
            r["l_shipdate"].date(),
        )
        for r in t(spark, SF, "lineitem").collect()
    ]


def _orders(spark):
    return {
        r["o_orderkey"]: (
            r["o_custkey"],
            r["o_orderpriority"],
            r["o_orderdate"].date(),
            round(r["o_totalprice"] * 100),
        )
        for r in t(spark, SF, "orders").collect()
    }


def _units(cents, disc):
    return cents * (100 - disc)


def test_q4_exists_matches_bruteforce(spark):
    li, orders = _li(spark), _orders(spark)
    lo = dt.date.fromisoformat(_Q4_LO)
    hi = dt.date.fromisoformat(_Q4_HI)
    late_orders = {
        ok
        for ok, _, _, _, _, _, ship in li
        if ok in orders
        and ship > orders[ok][2] + dt.timedelta(days=_LATE_DAYS)
    }
    want = defaultdict(int)
    for ok, (cust, prio, od, _) in orders.items():
        if lo <= od < hi and ok in late_orders:
            want[prio] += 1
    got = {
        r["o_orderpriority"]: r["order_count"]
        for r in CATALOG["q4_late_exists"].spark_fn(spark, SF).collect()
    }
    assert got == dict(want)
    assert want, "window must contain late orders at sf0.001"


def test_q13_histogram_mass_conservation(spark):
    rows = CATALOG["q13_order_histogram"].spark_fn(spark, SF).collect()
    n_cust = t(spark, SF, "customer").count()
    n_orders = t(spark, SF, "orders").count()
    assert sum(r["custdist"] for r in rows) == n_cust
    assert sum(r["c_count"] * r["custdist"] for r in rows) == n_orders


def test_q17_small_quantity_matches_bruteforce(spark):
    li = _li(spark)
    brand = {
        r["p_partkey"]
        for r in t(spark, SF, "part")
        .filter(F.col("p_brand") == _Q17_BRAND)
        .collect()
    }
    per_part = defaultdict(lambda: [0, 0])  # n, sumq
    for _, pk, _, qty, _, _, _ in li:
        if pk in brand:
            per_part[pk][0] += 1
            per_part[pk][1] += qty
    n_small, cents_sum = 0, 0
    for _, pk, _, qty, cents, _, _ in li:
        if pk in brand:
            n, sumq = per_part[pk]
            if 5 * qty * n < sumq:
                n_small += 1
                cents_sum += cents
    [row] = CATALOG["q17_small_qty_revenue"].spark_fn(spark, SF).collect()
    assert row["n_small_lines"] == n_small
    assert abs(row["avg_yearly"] - round(cents_sum / 100.0 / 7.0, 2)) < 1e-6


def test_q18_thresholds_and_set(spark):
    li, orders = _li(spark), _orders(spark)
    per_order = defaultdict(int)
    for ok, _, _, qty, _, _, _ in li:
        per_order[ok] += qty
    want = {ok for ok, sq in per_order.items() if sq > _Q18_QTY}
    rows = CATALOG["q18_large_orders"].spark_fn(spark, SF).collect()
    got = {r["o_orderkey"] for r in rows}
    if len(want) <= 100:
        assert got == want
    else:
        assert got <= want and len(got) == 100
    for r in rows:
        assert r["sum_qty"] == per_order[r["o_orderkey"]]
        assert r["sum_qty"] > _Q18_QTY


def test_q19_disjunction_matches_bruteforce(spark):
    li = _li(spark)
    pinfo = {
        r["p_partkey"]: (r["p_brand"], r["p_size"])
        for r in t(spark, SF, "part").collect()
    }
    n, total = 0, 0
    for _, pk, _, qty, cents, disc, _ in li:
        brand, size = pinfo[pk]
        if any(
            brand == b and slo <= size <= shi and qlo <= qty <= qhi
            for b, slo, shi, qlo, qhi in _Q19
        ):
            n += 1
            total += _units(cents, disc)
    [row] = CATALOG["q19_disjunctive_join"].spark_fn(spark, SF).collect()
    assert row["n_lines"] == n
    assert abs(row["revenue"] - round(total / 10000.0, 2)) < 1e-6
    assert n > 0, "disjuncts must match rows at sf0.001"


def test_q21_sole_late_matches_bruteforce(spark):
    li, orders = _li(spark), _orders(spark)
    late_flag = defaultdict(int)  # (ok, sk) -> late?
    supps = defaultdict(set)
    for ok, _, sk, _, _, _, ship in li:
        if ok not in orders:
            continue
        supps[ok].add(sk)
        if ship > orders[ok][2] + dt.timedelta(days=_LATE_DAYS):
            late_flag[(ok, sk)] = 1
    per_order_late = defaultdict(set)
    for (ok, sk), v in late_flag.items():
        if v:
            per_order_late[ok].add(sk)
    s_name = {
        r["s_suppkey"]: r["s_name"]
        for r in t(spark, SF, "supplier").collect()
    }
    want = defaultdict(int)
    for ok, late_set in per_order_late.items():
        if len(supps[ok]) > 1 and len(late_set) == 1:
            want[s_name[next(iter(late_set))]] += 1
    rows = CATALOG["q21_sole_late_supplier"].spark_fn(spark, SF).collect()
    for r in rows:
        assert want[r["s_name"]] == r["numwait"]
    # the K-cut keeps the true top block
    floor = rows[-1]["numwait"]
    outside = set(want) - {r["s_name"] for r in rows}
    assert all(want[s] <= floor for s in outside)


def test_q22_dormancy_and_average(spark):
    cust = {
        r["c_custkey"]: (r["c_nationkey"], round(r["c_acctbal"] * 100))
        for r in t(spark, SF, "customer").collect()
    }
    cut = dt.date.fromisoformat(_Q22_CUT)
    active = {
        o[0]
        for o in _orders(spark).values()
        if o[2] >= cut
    }
    pos = [b for _, b in cust.values() if b > 0]
    n_pos, sum_pos = len(pos), sum(pos)
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in t(spark, SF, "nation").collect()
    }
    want = defaultdict(lambda: [0, 0])
    for ck, (nk, b) in cust.items():
        if b > 0 and b * n_pos > sum_pos and ck not in active:
            want[nations[nk]][0] += 1
            want[nations[nk]][1] += b
    rows = CATALOG["q22_dormant_customers"].spark_fn(spark, SF).collect()
    got = {
        r["nation"]: (r["numcust"], r["total_acctbal"]) for r in rows
    }
    assert set(got) == set(want)
    for nat, (n, bal) in want.items():
        assert got[nat][0] == n
        assert abs(got[nat][1] - round(bal / 100.0, 2)) < 1e-6
    assert want, "dormant above-average customers must exist at sf0.001"


def test_q3_topk_matches_bruteforce(spark):
    li, orders = _li(spark), _orders(spark)
    cut = dt.date.fromisoformat("1997-07-01")
    rev = defaultdict(int)
    for ok, _, _, _, cents, disc, ship in li:
        if ok in orders and orders[ok][2] < cut and ship > cut:
            rev[ok] += _units(cents, disc)
    want = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = CATALOG["q3_unshipped_topk"].spark_fn(spark, SF).collect()
    assert [(r["o_orderkey"]) for r in rows] == [ok for ok, _ in want]
    for r, (ok, u) in zip(rows, want):
        assert abs(r["revenue"] - round(u / 10000.0, 2)) < 1e-6
        assert r["o_date"] == orders[ok][2]


def test_q6_matches_bruteforce(spark):
    li = _li(spark)
    lo, hi = dt.date(1996, 1, 1), dt.date(1997, 1, 1)
    n, total = 0, 0
    for _, _, _, qty, cents, disc, ship in li:
        if lo <= ship < hi and 5 <= disc <= 7 and qty < 24:
            n += 1
            total += cents * disc
    [row] = CATALOG["q6_forecast_delta"].spark_fn(spark, SF).collect()
    assert row["n_lines"] == n
    assert abs(row["revenue_delta"] - round(total / 10000.0, 2)) < 1e-6
    assert n > 0
