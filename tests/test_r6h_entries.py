"""Semantic invariants for the round-6h entries — above all, that the
prefix filter is LOSSLESS (finds exactly the brute-force pair set) and
that degree-oriented triangle counting matches an adjacency-set brute
force."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t
from data_engineering_project_capstone_spark.plans.catalog_r6h import (
    _SJ_DEN,
    _SJ_NUM,
)
from data_engineering_project_capstone_spark.operators.dedup import (
    shingles_from_tokens,
)
from data_engineering_project_capstone_spark.operators.text import tokens

SF = "/root/testdata/sf0.001"


def test_simjoin_prefix_is_lossless(spark):
    """The prefix-filtered join must return EXACTLY the pairs a
    brute-force all-pairs intersect finds — no candidate the rare-first
    prefix missed, none invented."""
    sets = {
        r["id"]: frozenset(r["sh"])
        for r in t(spark, SF, "documents")
        .select(
            F.col("doc_id").alias("id"),
            tokens(F.coalesce(F.col("text"), F.lit(""))).alias("_toks"),
        )
        .select("id", shingles_from_tokens("_toks", 3).alias("sh"))
        .filter(F.size("sh") > 0)
        .collect()
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * _SJ_DEN >= union * _SJ_NUM:
                want[(a, b)] = round(inter / union, 4)
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 4)
        for r in CATALOG["simjoin_prefix"].spark_fn(spark, SF).collect()
    }
    assert got == want
    assert want, "fixture must contain at least one qualifying pair"


def test_graph_triangles_match_adjacency_bruteforce(spark):
    """Per-node triangle counts from the oriented wedge join must equal
    the adjacency-set count: tri(v) = ½·Σ_{(v,u)∈E} |adj(v) ∩ adj(u)|."""
    li = (
        t(spark, SF, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r["ok"]].add(r["pk"])
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                adj[a].add(b)
                adj[b].add(a)
    tri = {
        v: sum(len(adj[v] & adj[u]) for u in adj[v]) // 2 for v in adj
    }
    rows = CATALOG["graph_triangles"].spark_fn(spark, SF).collect()
    assert rows, "co-order graph must contain triangles at sf0.001"
    # entry returns the top-K by (triangles desc, part_key): verify each
    # row against brute force AND that the K-cut is the true top-K
    for r in rows:
        v = r["part_key"]
        assert r["triangles"] == tri[v]
        assert r["degree"] == len(adj[v])
        d = r["degree"]
        assert abs(r["clustering_coeff"] - 2 * tri[v] / (d * (d - 1))) < 1e-6
    floor = rows[-1]["triangles"]
    outside = [v for v in tri if v not in {r["part_key"] for r in rows}]
    assert all(tri[v] <= floor for v in outside)


def test_graph_triangles_out_degree_is_orientation_bounded(spark):
    """The degree orientation must bound every COLLECTED out-list at
    O(√(2E)): a node with k out-neighbors implies k nodes of degree
    ≥ k, hence E ≥ k²/2. Drives the real `_triangle_oriented_adj`
    arrays (not a model of them), so any regression to full neighbor
    lists — the hub-node memory bomb the orientation removes — fails
    here: at sf0.001 the hub's full degree comfortably exceeds the
    bound."""
    import math

    from data_engineering_project_capstone_spark.plans.catalog_r6h import (
        _triangle_oriented_adj,
    )

    e, deg, _dir_e, adj = _triangle_oriented_adj(spark, SF)
    n_edges = e.count()
    bound = math.isqrt(2 * n_edges) + 1
    max_out = adj.select(F.max(F.size("outs"))).first()[0]
    assert max_out <= bound, (max_out, bound)
    # the bound must be a REAL constraint here, not vacuous: the hub's
    # full degree exceeds it
    assert deg.select(F.max("d")).first()[0] > bound


def test_basket_lift_directional_symmetry(spark):
    """support_count and lift are symmetric in (a, b); confidence is
    the directional column. Both directions of every surviving pair
    must agree on the symmetric stats."""
    rows = CATALOG["basket_lift"].spark_fn(spark, SF).collect()
    assert rows
    by_pair = {(r["brand_a"], r["brand_b"]): r for r in rows}
    for (a, b), r in by_pair.items():
        assert r["support_count"] >= 1
        assert 0.0 < r["confidence"] <= 1.0
        rev = by_pair.get((b, a))
        if rev is not None:
            assert rev["support_count"] == r["support_count"]
            assert abs(rev["lift"] - r["lift"]) < 1e-9


def test_graph_core_peel_matches_python_peel(spark):
    """The 2-round adaptive peel ledger must match a pure-Python
    recomputation: k = ceil(avg degree), drop nodes with current
    degree < k, induce, repeat."""
    li = (
        t(spark, SF, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r["ok"]].add(r["pk"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))

    def degs(es):
        d = defaultdict(int)
        for a, b in es:
            d[a] += 1
            d[b] += 1
        return d

    d0 = degs(edges)
    two_e, n_v = sum(d0.values()), len(d0)
    k = -(-two_e // n_v)  # ceil
    want = [(0, len(d0), len(edges))]
    es = edges
    for rnd in (1, 2):
        d = degs(es)
        surv = {v for v, dv in d.items() if dv >= k}
        es = {(a, b) for a, b in es if a in surv and b in surv}
        want.append((rnd, len(degs(es)), len(es)))
    got = [
        (r["round"], r["nodes"], r["edges"])
        for r in CATALOG["graph_core_peel"].spark_fn(spark, SF).collect()
    ]
    assert got == want
    ns = [n for _, n, _ in got]
    assert ns == sorted(ns, reverse=True), "peel must shrink monotonically"
