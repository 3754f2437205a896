"""Semantic invariants for the round-7i density-clustering entries:
a TRUE-fixpoint union-find DBSCAN twin (verifies the 10-round
propagation bound, not just cross-engine agreement) and a brute-force
kNN twin."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t
from data_engineering_project_capstone_spark.plans.catalog_r7i import (
    _EPS2,
    _KNN_K,
    _MIN_PTS,
)
from data_engineering_project_capstone_spark.plans.catalog_r7h import _GRID

SF = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def _pts(spark, sf):
    out = {}
    for r in t(spark, sf, "customer").select("c_custkey").collect():
        k = r["c_custkey"]
        h = hashlib.md5(str(k).encode()).hexdigest()
        out[k] = (int(h[:15], 16) % _GRID, int(h[15:30], 16) % _GRID)
    return out


def _python_dbscan(pts):
    ks = sorted(pts)
    nbrs = defaultdict(set)
    for i, a in enumerate(ks):
        xa, ya = pts[a]
        for b in ks[i + 1 :]:
            xb, yb = pts[b]
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= _EPS2:
                nbrs[a].add(b)
                nbrs[b].add(a)
    core = {k for k in ks if len(nbrs[k]) + 1 >= _MIN_PTS}

    parent = {k: k for k in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in core:
        for b in nbrs[a]:
            if b in core:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    label = {k: find(k) for k in core}
    border = {}
    for k in ks:
        if k in core:
            continue
        cl = [label[b] for b in nbrs[k] if b in core]
        if cl:
            border[k] = min(cl)
    sizes = defaultdict(int)
    for lab in label.values():
        sizes[lab] += 1
    for lab in border.values():
        sizes[lab] += 1
    return ks, core, border, sizes


def _assert_matches(spark, sf):
    pts = _pts(spark, sf)
    ks, core, border, sizes = _python_dbscan(pts)
    [row] = CATALOG["dbscan_customers"].spark_fn(spark, sf).collect()
    assert row["n_points"] == len(ks)
    assert row["n_core"] == len(core)
    assert row["n_border"] == len(border)
    assert row["n_noise"] == len(ks) - len(core) - len(border)
    # TRUE-fixpoint comparison: if 10 propagation rounds under-converge,
    # n_clusters over-counts and this fails
    assert row["n_clusters"] == len(sizes)
    assert row["max_cluster_size"] == (max(sizes.values()) if sizes else 0)


def test_dbscan_matches_true_fixpoint_sf0001(spark):
    _assert_matches(spark, SF)


def test_dbscan_matches_true_fixpoint_sf001(spark):
    # denser graph, longer chains — the real test of the round bound
    _assert_matches(spark, SF2)


def test_knn_graph_matches_bruteforce(spark):
    pts = _pts(spark, SF)
    ks = sorted(pts)
    hist = defaultdict(int)
    nn1_sum = 0
    for a in ks:
        xa, ya = pts[a]
        ds = sorted(
            ((xa - pts[b][0]) ** 2 + (ya - pts[b][1]) ** 2, b)
            for b in ks
            if b != a
        )
        within = [d for d in ds if d[0] <= _EPS2][:_KNN_K]
        hist[len(within)] += 1
        if within:
            nn1_sum += within[0][0]
    rows = CATALOG["knn_graph_radius"].spark_fn(spark, SF).collect()
    got = {r["neighbors_found"]: r["n_points"] for r in rows}
    assert got == dict(hist)
    assert all(r["sum_nn1_d2"] == nn1_sum for r in rows)


def test_check_dbscan_fixpoint_zero_at_both_sfs(spark):
    """One extra propagation round changes zero labels — the bounded
    K-round contract, driver-visible (constant-0 oracle)."""
    fn = CATALOG["check_dbscan_fixpoint"].spark_fn
    for sf in (SF, SF2):
        [row] = fn(spark, sf).collect()
        assert row["changed_labels"] == 0, sf
