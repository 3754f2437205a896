"""Semantic invariants for the round-7l entries: Python BFS twin for
the recursive reachability and a brute-force tolerance-asof twin on
the real events data."""

from __future__ import annotations

import hashlib
from collections import defaultdict, deque

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
    t,
)
from data_engineering_project_capstone_spark.plans.catalog_r7h import _GRID
from data_engineering_project_capstone_spark.plans.catalog_r7i import (
    _EPS2,
    _KNN_K,
)
from data_engineering_project_capstone_spark.plans.catalog_r7l import (
    _BFS_DEPTH,
    _TOL_S,
)

SF = "/root/testdata/sf0.001"


def test_recursive_reachability_matches_python_bfs(spark):
    keys = sorted(
        r["c_custkey"] for r in t(spark, SF, "customer").collect()
    )
    pts = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        pts[k] = (int(h[:15], 16) % _GRID, int(h[15:30], 16) % _GRID)
    adj = defaultdict(list)
    for a in keys:
        xa, ya = pts[a]
        ds = sorted(
            ((xa - pts[b][0]) ** 2 + (ya - pts[b][1]) ** 2, b)
            for b in keys
            if b != a
        )
        adj[a] = [b for d, b in ds if d <= _EPS2][:_KNN_K]
    # seed = left node of the globally tightest kept pair
    kept = []
    for a in keys:
        xa, ya = pts[a]
        ds = sorted(
            ((xa - pts[b][0]) ** 2 + (ya - pts[b][1]) ** 2, b)
            for b in keys
            if b != a
        )
        for d, b in [p for p in ds if p[0] <= _EPS2][:_KNN_K]:
            kept.append((d, a, b))
    assert kept, "no kNN edges at this SF"
    seed = min(kept)[1]
    depth = {seed: 0}
    dq = deque([seed])
    while dq:
        u = dq.popleft()
        if depth[u] >= _BFS_DEPTH:
            continue
        for v in adj[u]:
            if v not in depth:
                depth[v] = depth[u] + 1
                dq.append(v)
    want = defaultdict(int)
    for d in depth.values():
        want[d] += 1
    got = {
        r["depth"]: r["n_first_reached"]
        for r in CATALOG["recursive_reachability"].spark_fn(
            spark, SF
        ).collect()
    }
    assert got == dict(want)
    assert got[0] == 1  # the seed itself


def test_asof_tolerance_matches_python(spark):
    ev = events_table(spark, SF).select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    clicks = defaultdict(list)
    for r in ev:
        if r["event_type"] == "click":
            clicks[r["user_id"]].append((r["ts"], r["event_id"]))
    want = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        best = None
        for cts, cid in clicks[r["user_id"]]:
            if cts <= r["ts"]:
                cand = (cts, cid)
                if best is None or cand > best:
                    best = cand
        if best is not None:
            gap = int((r["ts"] - best[0]).total_seconds() * 1_000_000)
            if gap > _TOL_S * 1_000_000:
                best = None
        want[r["event_id"]] = (
            (best[1], int((r["ts"] - best[0]).total_seconds() * 1_000_000))
            if best
            else (None, None)
        )
    got = {
        r["event_id"]: (r["click_event_id"], r["gap_us"])
        for r in CATALOG["join_asof_tolerance"].spark_fn(spark, SF).collect()
    }
    assert got == want
    # the bound is real: at least one purchase must be nulled BY the
    # tolerance (has a prior click, but too old) on this data
    nulled_by_tol = [
        eid
        for eid, (cid, _) in want.items()
        if cid is None
        and any(
            cts <= p_ts
            for p in [e for e in ev if e["event_id"] == eid]
            for p_ts in [p["ts"]]
            for cts, _ in clicks[p["user_id"]]
        )
    ]
    assert nulled_by_tol, "tolerance never fired — test data too easy"
