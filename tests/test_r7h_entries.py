"""Semantic invariants for the round-7h spatial/bootstrap/PSI entries:
brute-force all-pairs proximity twin (the blocking must lose NOTHING
within the radius), an independent Poisson-multiplicity bootstrap twin,
and a pure-Python PSI twin."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t
from data_engineering_project_capstone_spark.plans.catalog_r7h import (
    _B,
    _GRID,
    _POIS_T,
    _PSI_BIN,
    _RADIUS,
)

SF = "/root/testdata/sf0.001"


def _md5_int(s, lo, hi):
    return int(hashlib.md5(s.encode()).hexdigest()[lo:hi], 16)


def test_geo_grid_join_matches_allpairs_bruteforce(spark):
    keys = [
        r["c_custkey"] for r in t(spark, SF, "customer").collect()
    ]
    pts = {
        k: (
            _md5_int(str(k), 0, 15) % _GRID,
            _md5_int(str(k), 15, 30) % _GRID,
        )
        for k in keys
    }
    ks = sorted(pts)
    n_hit = sum_d2 = 0
    r2 = _RADIUS * _RADIUS
    for i, a in enumerate(ks):  # O(n^2): every pair, no blocking
        xa, ya = pts[a]
        for b in ks[i + 1 :]:
            xb, yb = pts[b]
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r2:
                n_hit += 1
                sum_d2 += d2
    [row] = CATALOG["geo_grid_join"].spark_fn(spark, SF).collect()
    assert row["n_points"] == len(keys)
    # the defining blocking guarantee: the 3x3 probe loses nothing
    assert (row["n_within_radius"], row["sum_d2"]) == (n_hit, sum_d2)
    assert row["n_candidate_pairs"] >= row["n_within_radius"]


def _pois_m(key, b):
    u = _md5_int(f"{key}_{b}", 0, 15) % 1048576
    for k, thr in enumerate(_POIS_T):
        if u < thr:
            return k
    return 7


def test_bootstrap_ci_matches_python(spark):
    rows = [
        (r["o_orderkey"], round(r["o_totalprice"] * 100))
        for r in t(spark, SF, "orders").collect()
    ]
    means = []
    for b in range(_B):
        s = n = 0
        for k, c in rows:
            m = _pois_m(k, b)
            s += m * c
            n += m
        means.append(s / n / 100.0)
    means.sort()
    [row] = CATALOG["bootstrap_ci_mean"].spark_fn(spark, SF).collect()
    assert (row["n_rows"], row["n_resamples"]) == (len(rows), _B)
    obs = sum(c for _, c in rows) / len(rows) / 100.0
    assert abs(row["mean_price"] - obs) < 1e-4
    assert abs(row["ci_lo"] - means[2]) < 1e-4  # rank 3, 1-indexed
    assert abs(row["ci_hi"] - means[97]) < 1e-4  # rank 98
    assert row["ci_lo"] < row["mean_price"] < row["ci_hi"]


def test_psi_matches_python(spark):
    cnt = defaultdict(Counter)
    for r in t(spark, SF, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect():
        d = r["o_orderdate"]
        mon = d.year * 100 + d.month
        cnt[mon][round(r["o_totalprice"] * 100) // _PSI_BIN] += 1
    months = sorted(cnt)
    bins = sorted({b for c in cnt.values() for b in c})
    k = len(bins)

    def p(mon, b):
        n = sum(cnt[mon].values())
        return (cnt[mon][b] + 1) / (n + k)

    want = {}
    for prev, cur in zip(months, months[1:]):
        # consecutive calendar months only (the entry lags by month)
        nxt = prev + 89 if prev % 100 == 12 else prev + 1
        if nxt != cur:
            continue
        want[cur] = sum(
            (p(cur, b) - p(prev, b))
            * math.log(p(cur, b) / p(prev, b))
            for b in bins
        )
    got = {
        r["mon"]: r for r in CATALOG["psi_price_drift"].spark_fn(
            spark, SF
        ).collect()
    }
    assert set(got) == set(want)
    for mon, psi in want.items():
        assert got[mon]["n_bins"] == k
        assert abs(got[mon]["psi"] - psi) < 1e-3
        assert got[mon]["psi"] >= 0  # PSI is a symmetrized divergence
