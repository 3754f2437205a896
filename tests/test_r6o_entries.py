"""Semantic invariants for the round-6o entries."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
)

SF = "/root/testdata/sf0.001"


def test_strict_funnel_matches_bruteforce(spark):
    """Stage counts recomputed by per-user forward scan: first signup,
    first click within 3d strictly after it, first purchase within 3d
    strictly after that."""
    import datetime as dt

    rows = [
        (r["user_id"], r["ts"], r["event_type"])
        for r in events_table(spark, SF)
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_type")
        .collect()
    ]
    by_user = defaultdict(list)
    for u, ts, et in rows:
        by_user[u].append((ts, et))
    n_s = n_c = n_p = 0
    for lst in by_user.values():
        lst.sort()
        s0 = min((ts for ts, et in lst if et == "signup"), default=None)
        if s0 is None:
            continue
        n_s += 1
        c0 = min(
            (
                ts
                for ts, et in lst
                if et == "click" and s0 < ts <= s0 + dt.timedelta(days=3)
            ),
            default=None,
        )
        if c0 is None:
            continue
        n_c += 1
        p0 = min(
            (
                ts
                for ts, et in lst
                if et == "purchase" and c0 < ts <= c0 + dt.timedelta(days=3)
            ),
            default=None,
        )
        if p0 is not None:
            n_p += 1
    [row] = CATALOG["funnel_strict_sequence"].spark_fn(spark, SF).collect()
    assert (row["n_signup"], row["n_clicked"], row["n_purchased"]) == (
        n_s,
        n_c,
        n_p,
    )
    assert row["n_signup"] >= row["n_clicked"] >= row["n_purchased"]
    assert row["n_purchased"] > 0, "funnel must complete for some users"


def test_skew_profile_top_keys_exact(spark):
    counts = defaultdict(int)
    for r in (
        events_table(spark, SF)
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .collect()
    ):
        counts[r["user_id"]] += 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    rows = CATALOG["skew_profile"].spark_fn(spark, SF).collect()
    assert [(r["user_id"], r["freq"]) for r in rows] == top
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    tot = sum(counts.values())
    for r in rows:
        assert abs(r["share"] - round(r["freq"] / tot, 6)) < 1e-9
    assert len({r["max_over_median"] for r in rows}) == 1
    assert rows[0]["max_over_median"] >= 1.0
