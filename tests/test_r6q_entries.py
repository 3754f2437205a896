"""Semantic invariants for the round-6q survival/lift entries."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
)

SF = "/root/testdata/sf0.001"


def test_km_curve_matches_python_estimator(spark):
    """Survival values recomputed with a plain-Python Kaplan-Meier on
    the same (time, event) pairs must match to 1e-6, and the curve must
    be monotone non-increasing from ≤ 1."""
    rows = [
        (r["user_id"], r["ts"], r["event_type"])
        for r in events_table(spark, SF)
        .filter(F.col("ts").isNotNull())
        .collect()
    ]
    mx = max(ts for _, ts, _ in rows)
    by_user = defaultdict(list)
    for u, ts, et in rows:
        by_user[u].append((ts, et))
    samples = []
    for lst in by_user.values():
        s0 = min((ts for ts, et in lst if et == "signup"), default=None)
        if s0 is None:
            continue
        p0 = min(
            (ts for ts, et in lst if et == "purchase" and ts > s0),
            default=None,
        )
        end = p0 if p0 is not None else mx
        samples.append((int((end - s0).total_seconds() // 86400), p0 is not None))
    by_day = defaultdict(lambda: [0, 0])  # day -> [d_i, ended]
    for d, ev in samples:
        by_day[d][0] += ev
        by_day[d][1] += 1
    n_risk = len(samples)
    s = 1.0
    want = {}
    for d in sorted(by_day):
        d_i, ended = by_day[d]
        if d_i > 0:
            s *= 1.0 - d_i / n_risk
            want[d] = (n_risk, d_i, round(s, 6))
        n_risk -= ended
    got = {
        r["day"]: (r["n_at_risk"], r["n_converted"], r["survival"])
        for r in CATALOG["survival_signup_purchase"].spark_fn(spark, SF).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0] and got[d][1] == want[d][1]
        assert abs(got[d][2] - want[d][2]) < 1e-6
    vals = [got[d][2] for d in sorted(got)]
    assert all(b <= a + 1e-9 for a, b in zip(vals, vals[1:]))
    assert vals and vals[0] <= 1.0


def test_churn_lift_front_loads_and_partitions(spark):
    rows = CATALOG["churn_feature_lift"].spark_fn(spark, SF).collect()
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4, 5]
    labels = CATALOG["churn_labels"].spark_fn(spark, SF).collect()
    assert sum(r["n_users"] for r in rows) == len(labels)
    assert sum(r["n_churned"] for r in rows) == sum(
        r["churned"] for r in labels
    )
    # lift identity: every row's lift is its churn rate over the base
    # rate (directionality is a property of the data, not the operator —
    # uniform synthetic streams carry no staleness signal at tiny SF)
    base = sum(r["churned"] for r in labels) / len(labels)
    for r in rows:
        assert abs(r["churn_rate"] - round(r["n_churned"] / r["n_users"], 6)) < 1e-9
        assert abs(r["lift"] - round((r["n_churned"] / r["n_users"]) / base, 6)) < 1e-5
