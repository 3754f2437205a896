"""Semantic invariants for the round-6g feature-engineering entries —
above all, that pit_features can NEVER leak the future."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
)

SF = "/root/testdata/sf0.001"


def test_pit_features_match_bruteforce_no_leakage(spark):
    """Brute-force recomputation: for every purchase, features must
    equal aggregates over the user's events STRICTLY before it in
    (ts, event_id) order — the label row itself and anything after must
    contribute nothing."""
    ev = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"], r["value"])
            for r in events_table(spark, SF)
            .filter(F.col("ts").isNotNull())
            .collect()
        ),
        key=lambda t: (t[1], t[2]),
    )
    by_user = defaultdict(list)
    for u, ts, eid, etype, value in ev:
        by_user[u].append((ts, eid, etype, value))
    want = {}
    for u, rows in by_user.items():
        n = clicks = 0
        val = 0.0
        for ts, eid, etype, value in rows:  # already (ts, eid)-sorted
            if etype == "purchase":
                want[eid] = (u, n, clicks, round(val, 3))
            n += 1
            clicks += etype == "click"
            val += value or 0.0
    got = {
        r["purchase_id"]: (
            r["user_id"],
            r["n_prior_events"],
            r["n_prior_clicks"],
            round(r["prior_value_sum"], 3),
        )
        for r in CATALOG["pit_features"].spark_fn(spark, SF).collect()
    }
    assert got == want


def test_user_activity_features_sane(spark):
    ev = events_table(spark, SF).filter(F.col("ts").isNotNull())
    n_users = ev.select("user_id").distinct().count()
    rows = CATALOG["user_activity_features"].spark_fn(spark, SF).collect()
    assert len(rows) == n_users
    for r in rows:
        assert r["n_events"] >= 1
        assert 1 <= r["n_active_days"] <= r["n_events"]
        assert r["recency_hours"] >= 0
        if r["n_events"] == 1:
            assert r["mean_gap_minutes"] is None
        else:
            assert r["mean_gap_minutes"] >= 0


def test_churn_labels_match_bruteforce(spark):
    """Label and features recomputed in Python from raw events: features
    see only t <= cutoff, the label only the 12h window after it; users
    with no pre-cutoff history are excluded."""
    import datetime as dt

    rows = [
        (r["user_id"], r["ts"])
        for r in events_table(spark, SF)
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts")
        .collect()
    ]
    mx = max(ts for _, ts in rows)
    cutoff = mx - dt.timedelta(days=2)
    obs_end = cutoff + dt.timedelta(hours=12)
    want = {}
    for u in {u for u, _ in rows}:
        uts = [ts for x, ts in rows if x == u]
        before = [ts for ts in uts if ts <= cutoff]
        if not before:
            continue
        n_obs = sum(1 for ts in uts if cutoff < ts <= obs_end)
        days = (cutoff - max(before)).total_seconds() / 86400.0
        want[u] = (len(before), round(days, 4), int(n_obs == 0))
    got = {
        r["user_id"]: (
            r["n_events_before"],
            round(r["days_inactive_at_cutoff"], 4),
            r["churned"],
        )
        for r in CATALOG["churn_labels"].spark_fn(spark, SF).collect()
    }
    assert got == want
    assert any(v[2] == 1 for v in want.values()), "label must vary"
    assert any(v[2] == 0 for v in want.values())
