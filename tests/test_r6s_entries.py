"""Semantic invariants for the round-6s statistical entries."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t

SF = "/root/testdata/sf0.001"


def _spend(spark):
    spend = defaultdict(int)
    for r in t(spark, SF, "orders").select("o_custkey", "o_totalprice").collect():
        spend[r["o_custkey"]] += round(r["o_totalprice"] * 100)
    return spend


def test_gini_matches_rank_formula_and_bounds(spark):
    spend = _spend(spark)
    xs = [c for _, c in sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))]
    n, s = len(xs), sum(xs)
    si = sum((i + 1) * x for i, x in enumerate(xs))
    want = (2.0 * si) / (n * s) - (n + 1.0) / n
    [row] = CATALOG["orders_gini"].spark_fn(spark, SF).collect()
    assert row["n_customers"] == n
    assert abs(row["total_spend"] - round(s / 100.0, 2)) < 1e-6
    assert abs(row["gini"] - round(want, 6)) < 1e-6
    assert 0.0 <= row["gini"] < 1.0


def test_welch_matches_python(spark):
    spend = _spend(spark)
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in t(spark, SF, "customer").collect()
    }
    a = [c / 100.0 for k, c in spend.items() if seg[k] == "BUILDING"]
    b = [c / 100.0 for k, c in spend.items() if seg[k] != "BUILDING"]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    tstat = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    [row] = CATALOG["welch_ttest"].spark_fn(spark, SF).collect()
    assert (row["n_building"], row["n_other"]) == (len(a), len(b))
    assert abs(row["t_stat"] - tstat) < 1e-3
    assert abs(row["welch_dof"] - dof) < 0.5
    assert min(len(a), len(b)) - 1 <= row["welch_dof"] <= len(a) + len(b) - 2
