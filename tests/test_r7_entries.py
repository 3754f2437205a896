"""Semantic invariants for the round-7 distribution/drift entries —
each statistic is recomputed in plain Python from the same raw rows
(no shared code path with the Spark or DuckDB forms)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t

SF = "/root/testdata/sf0.001"


def _spend(spark):
    spend = defaultdict(int)
    for r in t(spark, SF, "orders").select("o_custkey", "o_totalprice").collect():
        spend[r["o_custkey"]] += round(r["o_totalprice"] * 100)
    return spend


def _groups(spark):
    spend = _spend(spark)
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in t(spark, SF, "customer").collect()
    }
    a = sorted(c for k, c in spend.items() if seg[k] == "BUILDING")
    b = sorted(c for k, c in spend.items() if seg[k] != "BUILDING")
    return a, b


def test_ks_matches_python(spark):
    a, b = _groups(spark)
    support = sorted(set(a) | set(b))
    best_d, best_at = -1.0, None
    ca = cb = 0
    ia = ib = 0
    for v in support:
        while ia < len(a) and a[ia] <= v:
            ia += 1
        while ib < len(b) and b[ib] <= v:
            ib += 1
        d = abs(ia / len(a) - ib / len(b))
        if d > best_d:
            best_d, best_at = d, v
    [row] = CATALOG["ks_two_sample"].spark_fn(spark, SF).collect()
    assert (row["n_building"], row["n_other"]) == (len(a), len(b))
    assert abs(row["ks_d"] - best_d) < 1e-6
    assert abs(row["ks_at_spend"] - best_at / 100.0) < 1e-6
    assert 0.0 <= row["ks_d"] <= 1.0


def _avg_ranks(pooled):
    """value -> average rank (1-based, ties averaged)."""
    counts = Counter(pooled)
    ranks, before = {}, 0
    for v in sorted(counts):
        t_v = counts[v]
        ranks[v] = before + (t_v + 1) / 2
        before += t_v
    return ranks, counts


def test_mann_whitney_matches_python(spark):
    a, b = _groups(spark)
    ranks, counts = _avg_ranks(a + b)
    ra = sum(ranks[v] for v in a)
    na, nb = len(a), len(b)
    nn = na + nb
    u = ra - na * (na + 1) / 2
    ties = sum(t_v**3 - t_v for t_v in counts.values())
    var = na * nb / 12 * ((nn + 1) - ties / (nn * (nn - 1)))
    z = (u - na * nb / 2) / math.sqrt(var)
    [row] = CATALOG["mann_whitney_u"].spark_fn(spark, SF).collect()
    assert (row["n_building"], row["n_other"]) == (na, nb)
    assert abs(row["u_stat"] - u) < 1e-3
    assert abs(row["z_score"] - z) < 1e-3
    assert 0 <= row["u_stat"] <= na * nb


def test_spearman_matches_python(spark):
    rows = (
        t(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("x"),
            F.count("*").alias("y"),
        )
        .collect()
    )
    xs = [r["x"] for r in rows]
    ys = [r["y"] for r in rows]
    rx_map, _ = _avg_ranks(xs)
    ry_map, _ = _avg_ranks(ys)
    rx = [rx_map[v] for v in xs]
    ry = [ry_map[v] for v in ys]
    n = len(rows)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((p - mx) * (q - my) for p, q in zip(rx, ry))
    vx = sum((p - mx) ** 2 for p in rx)
    vy = sum((q - my) ** 2 for q in ry)
    rho = cov / math.sqrt(vx) / math.sqrt(vy)
    [row] = CATALOG["spearman_corr"].spark_fn(spark, SF).collect()
    assert row["n_customers"] == n
    assert abs(row["spearman_rho"] - rho) < 1e-6
    assert -1.0 <= row["spearman_rho"] <= 1.0


def test_kappa_matches_confusion_and_python(spark):
    """kappa recomputed from the langid_confusion entry's own matrix —
    the two entries must tell one story."""
    conf = CATALOG["langid_confusion"].spark_fn(spark, SF).collect()
    nn = sum(r["n"] for r in conf)
    hits = sum(r["n"] for r in conf if r["true_lang"] == r["pred_lang"])
    row_m = Counter()
    col_m = Counter()
    for r in conf:
        row_m[r["true_lang"]] += r["n"]
        col_m[r["pred_lang"]] += r["n"]
    pe = sum(row_m[k] * col_m.get(k, 0) for k in row_m) / nn**2
    po = hits / nn
    want = (po - pe) / (1 - pe)
    [row] = CATALOG["cohens_kappa"].spark_fn(spark, SF).collect()
    assert row["n_docs"] == nn
    assert abs(row["p_observed"] - po) < 1e-6
    assert abs(row["p_expected"] - pe) < 1e-6
    assert abs(row["kappa"] - want) < 1e-6
    assert -1.0 <= row["kappa"] <= 1.0


def test_calibration_deciles_partition_and_bound(spark):
    rows = CATALOG["calibration_curve"].spark_fn(spark, SF).collect()
    n_docs = t(spark, SF, "documents").count()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert sum(r["n_docs"] for r in rows) == n_docs
    # ntile balance: sizes differ by at most 1
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # deciles ordered by quality must have non-decreasing mean quality
    means = [r["mean_quality"] for r in rows]
    assert means == sorted(means)
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0


def test_pareto_skyline_matches_bruteforce(spark):
    parts = [
        (r["p_partkey"], round(r["p_retailprice"] * 100), r["p_size"])
        for r in t(spark, SF, "part").collect()
    ]
    want = set()
    for k, p, s in parts:
        dominated = any(
            (p2 <= p and s2 <= s and (p2 < p or s2 < s))
            for _, p2, s2 in parts
        )
        if not dominated:
            want.add(k)
    got = {r["p_partkey"] for r in CATALOG["pareto_skyline"].spark_fn(spark, SF).collect()}
    assert got == want
    assert want, "fixture must have a nonempty skyline"


def test_acf_matches_python(spark):
    daily = Counter()
    for r in t(spark, SF, "orders").select(F.to_date("o_orderdate").alias("d")).collect():
        daily[r["d"]] += 1
    n = len(daily)
    mu = sum(daily.values()) / n
    den = sum((x - mu) ** 2 for x in daily.values())
    got = {r["lag"]: r for r in CATALOG["orders_acf"].spark_fn(spark, SF).collect()}
    assert set(got) == set(range(1, 8))
    one_day = __import__("datetime").timedelta(days=1)
    for lag in range(1, 8):
        num, np = 0.0, 0
        for d, x in daily.items():
            d2 = d + lag * one_day
            if d2 in daily:
                num += (x - mu) * (daily[d2] - mu)
                np += 1
        assert got[lag]["n_pairs"] == np
        assert abs(got[lag]["acf"] - num / den) < 1e-6
        assert -1.5 <= got[lag]["acf"] <= 1.5


def test_cusum_matches_python(spark):
    daily = defaultdict(int)
    for r in (
        t(spark, SF, "orders")
        .select(F.to_date("o_orderdate").alias("d"), "o_totalprice")
        .collect()
    ):
        daily[r["d"]] += round(r["o_totalprice"] * 100)
    days = sorted(daily)
    n = len(days)
    tot = sum(daily.values())
    best = (-1, None, 0)
    cum = 0
    for i, d in enumerate(days, start=1):
        cum += daily[d]
        sn = n * cum - i * tot
        if abs(sn) > best[0]:
            best = (abs(sn), d, sn)
    [row] = CATALOG["cusum_drift"].spark_fn(spark, SF).collect()
    assert row["n_days"] == n
    assert row["peak_date"] == best[1]
    assert abs(row["max_excursion"] - best[0] / n / 100.0) < 0.01
    assert row["direction"] == (1 if best[2] > 0 else -1 if best[2] < 0 else 0)
