"""Semantic invariants for the round-6k entries."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t

SF = "/root/testdata/sf0.001"


def _in_sample(key: int) -> bool:
    """Python twin of the md5_bucket universe-membership predicate."""
    h = hashlib.md5(f"{key}:univ".encode()).hexdigest()
    return int(h[:15], 16) % 10 == 0


def test_sample_universe_is_join_consistent(spark):
    """Universe sampling must take EXACTLY the rows whose customer key
    hashes into the sample — recomputed bit-for-bit in Python — so a
    sampled customer keeps all their orders and lineitems."""
    custs = [r["c_custkey"] for r in t(spark, SF, "customer").collect()]
    sampled = {c for c in custs if _in_sample(c)}
    orders = t(spark, SF, "orders").select("o_orderkey", "o_custkey").collect()
    s_orders = {r["o_orderkey"] for r in orders if r["o_custkey"] in sampled}
    li_cnt = (
        t(spark, SF, "lineitem")
        .filter(F.col("l_orderkey").isin(list(s_orders)))
        .count()
        if s_orders
        else 0
    )
    [row] = CATALOG["sample_universe"].spark_fn(spark, SF).collect()
    assert row["n_cust_sampled"] == len(sampled)
    assert row["n_orders_sampled"] == len(s_orders)
    assert row["n_lineitems_sampled"] == li_cnt
    assert row["true_total_revenue"] > 0
    # 10× scale-up of a 1/10 key sample: same order of magnitude
    assert 0.2 < row["est_total_revenue"] / row["true_total_revenue"] < 5.0


def test_rfm_segments_partition_customers(spark):
    rows = CATALOG["rfm_segments"].spark_fn(spark, SF).collect()
    n_cust = t(spark, SF, "orders").select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        seg = r["segment"]
        assert seg[0] == "R" and seg[2] == "F" and seg[4] == "M"
        assert all(1 <= int(seg[i]) <= 5 for i in (1, 3, 5))
        assert r["avg_monetary"] > 0


def test_revenue_pareto_curve_shape(spark):
    rows = CATALOG["revenue_pareto"].spark_fn(spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares), "cumulative share must be monotone"
    assert abs(shares[-1] - 1.0) < 1e-9
    n_parts = t(spark, SF, "lineitem").select("l_partkey").distinct().count()
    assert rows[-1]["n_parts"] == n_parts
    # ranked desc ⇒ the curve is concave: first decile holds the
    # largest single-decile share
    gaps = [shares[0]] + [b - a for a, b in zip(shares, shares[1:])]
    assert gaps[0] == max(gaps)


def test_quantile_norm_preserves_ranks_and_matches_python(spark):
    """Within a source, normalization must be monotone in n_chars, and
    each doc's normalized value must equal the Python-interpolated
    global quantile at its within-source rank fraction."""
    rows = CATALOG["quantile_norm_lengths"].spark_fn(spark, SF).collect()
    assert rows
    lens = sorted(
        (r["n_chars"] or 0)
        for r in t(spark, SF, "documents").select("n_chars").collect()
    )

    def global_q(q: float) -> float:
        # linear interpolation, the percentile/quantile_cont definition
        pos = q * (len(lens) - 1)
        lo, hi = int(pos), min(int(pos) + 1, len(lens) - 1)
        return lens[lo] + (pos - lo) * (lens[hi] - lens[lo])

    from collections import defaultdict as dd

    by_src = dd(list)
    for r in rows:
        by_src[r["source"]].append(r)
    import math

    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r["n_chars"], r["doc_id"]))
        n_s = len(rs)
        prev = None
        for i, r in enumerate(rs):
            q = (i / (n_s - 1)) if n_s > 1 else 0.5
            idx = math.floor(q * 100 + 0.5)
            want = round(global_q(idx / 100.0), 2)
            assert abs(r["norm_chars"] - want) < 1e-6, (src, r)
            if prev is not None:
                assert r["norm_chars"] >= prev - 1e-9
            prev = r["norm_chars"]
