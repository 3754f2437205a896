"""Semantic invariants for the round-7d islands/drift entries."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
    t,
)

SF = "/root/testdata/sf0.001"


def test_burst_islands_match_python(spark):
    hours = Counter()
    for r in events_table(spark, SF).select(
        F.expr("unix_seconds(ts) div 3600").alias("h")
    ).collect():
        hours[r["h"]] += 1
    n, total = len(hours), sum(hours.values())
    flagged = sorted(h for h, c in hours.items() if 2 * c * n > 3 * total)
    # group consecutive hours
    want = []
    cur = None
    for h in flagged:
        if cur and h == cur[-1] + 1:
            cur.append(h)
        else:
            cur = [h]
            want.append(cur)
    rows = CATALOG["events_burst_hours"].spark_fn(spark, SF).collect()
    assert len(rows) == len(want)
    for r, hs in zip(rows, want):
        assert r["n_hours"] == len(hs)
        assert r["total_events"] == sum(hours[h] for h in hs)
        assert r["peak_hour_events"] == max(hours[h] for h in hs)
        assert r["burst_start"].timestamp() == hs[0] * 3600
    assert want, "burst threshold must flag hours at sf0.001"


def test_streak_histogram_matches_python(spark):
    months = defaultdict(set)
    for r in (
        t(spark, SF, "orders")
        .select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
                "m"
            ),
        )
        .collect()
    ):
        months[r["o_custkey"]].add(r["m"])
    want = Counter()
    for ms in months.values():
        ms = sorted(ms)
        run = 1
        for a, b in zip(ms, ms[1:]):
            if b == a + 1:
                run += 1
            else:
                want[run] += 1
                run = 1
        want[run] += 1
    got = {
        r["streak_months"]: r["n_streaks"]
        for r in CATALOG["customer_active_streaks"].spark_fn(spark, SF).collect()
    }
    assert got == dict(want)
    # mass conservation: Σ len·count = Σ distinct active months
    assert sum(k * v for k, v in got.items()) == sum(
        len(ms) for ms in months.values()
    )


def test_priority_mix_shift_matches_python(spark):
    by_m = defaultdict(Counter)
    for r in t(spark, SF, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
        "o_orderpriority",
    ).collect():
        by_m[r["m"]][r["o_orderpriority"]] += 1
    prios = sorted({p for c in by_m.values() for p in c})
    rows = CATALOG["priority_mix_shift"].spark_fn(spark, SF).collect()
    ms = sorted(by_m)
    assert [r["month_index"] for r in rows] == ms
    assert rows[0]["l1_shift"] is None
    for prev, cur, r in zip(ms, ms[1:], rows[1:]):
        ta, tb = sum(by_m[prev].values()), sum(by_m[cur].values())
        want = sum(
            abs(by_m[cur][p] / tb - by_m[prev][p] / ta) for p in prios
        )
        assert r["n_orders"] == tb
        assert abs(r["l1_shift"] - want) < 1e-6
        assert 0.0 <= r["l1_shift"] <= 2.0
