"""Semantic invariants for the round-6m entries — the power iteration
must match a NumPy-free Python matrix recomputation, and funnel lags
must match a brute-force prior-click scan."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
)

SF = "/root/testdata/sf0.001"


def _ordered_events(spark):
    rows = [
        (r["user_id"], r["ts"], r["event_id"], r["event_type"])
        for r in events_table(spark, SF)
        .filter(F.col("ts").isNotNull())
        .collect()
    ]
    by_user = defaultdict(list)
    for u, ts, eid, et in rows:
        by_user[u].append((ts, eid, et))
    for lst in by_user.values():
        lst.sort()
    return by_user


def test_markov_stationary_matches_python_power_iteration(spark):
    by_user = _ordered_events(spark)
    counts = defaultdict(lambda: defaultdict(int))
    for lst in by_user.values():
        for (_, _, a), (_, _, b) in zip(lst, lst[1:]):
            counts[a][b] += 1
    p = {
        a: {b: n / sum(tos.values()) for b, n in tos.items()}
        for a, tos in counts.items()
    }
    states = sorted(
        set(p) | {b for tos in counts.values() for b in tos}
    )
    v = {s: 1.0 / len(states) for s in states}
    for _ in range(3):
        nv = {s: 0.0 for s in states}
        for s in states:
            # fixed order: contributions sorted by from-state
            acc = 0.0
            for a in sorted(p):
                if s in p[a]:
                    acc += p[a][s] * v[a]
            nv[s] = acc
        v = nv
    got = {
        r["event_type"]: r["stationary_prob"]
        for r in CATALOG["events_markov_stationary"].spark_fn(spark, SF).collect()
    }
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s] - round(v[s], 6)) < 1e-6
    # every type both enters and leaves on the shipped corpus → the
    # un-renormalized iteration conserves mass
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_funnel_lags_match_bruteforce(spark):
    by_user = _ordered_events(spark)
    lags = []
    for lst in by_user.values():
        last_click = None
        for ts, _, et in lst:
            if et == "purchase" and last_click is not None:
                lags.append((ts - last_click).total_seconds() / 60.0)
            if et == "click":
                last_click = ts
    [row] = CATALOG["funnel_time_to_convert"].spark_fn(spark, SF).collect()
    assert row["n_conversions"] == len(lags)
    lags.sort()

    def q(frac):
        pos = frac * (len(lags) - 1)
        lo = int(pos)
        hi = min(lo + 1, len(lags) - 1)
        return lags[lo] + (pos - lo) * (lags[hi] - lags[lo])

    assert abs(row["p50_minutes"] - round(q(0.5), 4)) < 1e-3
    assert abs(row["p90_minutes"] - round(q(0.9), 4)) < 1e-3
    assert row["p50_minutes"] <= row["p90_minutes"]
