"""Semantic invariants for the round-6f mining entries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import (
    CATALOG,
    events_table,
    t,
)

SF = "/root/testdata/sf0.001"


def test_info_gain_bounded_by_label_entropy(spark):
    """0 <= IG(t) <= H(lang) for every ranked token (information gain
    can neither be negative nor exceed the label entropy)."""
    docs = t(spark, SF, "documents").filter(F.col("lang").isNotNull())
    n = docs.count()
    counts = [r["c"] for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()]
    h_lang = -sum((c / n) * math.log(c / n) for c in counts)
    rows = CATALOG["info_gain_terms"].spark_fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["info_gain"] <= h_lang + 1e-9, r
        assert 1 <= r["n_docs_with"] <= n


def test_info_gain_of_perfect_predictor_equals_label_entropy(spark):
    """A synthetic token present in exactly the docs of one lang has
    IG = H(lang) contribution bound check via direct formula on a tiny
    in-memory frame — validates the entropy algebra itself."""
    # two langs, 2 docs each; token "zz" appears only in lang a docs
    rows = [
        (1, "zz q", "a"),
        (2, "zz r", "a"),
        (3, "s t", "b"),
        (4, "u v", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    n = 4
    # replicate the entry's math in python
    h_lang = -sum((2 / 4) * math.log(2 / 4) for _ in range(2))
    # token zz: present in 2 docs, all lang a -> H(lang|t)=0
    # absent in 2 docs, all lang b -> H(lang|!t)=0 -> IG = H(lang)
    # now compute via the same long-form ops the entry uses
    doc_toks = (
        df.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    tl = doc_toks.groupBy("tok", "lang").agg(F.count("*").alias("n_tl"))
    zz = {r["lang"]: r["n_tl"] for r in tl.filter(F.col("tok") == "zz").collect()}
    assert zz == {"a": 2}
    # IG(zz) = h_lang exactly (both conditional entropies are zero)
    assert abs(h_lang - math.log(2)) < 1e-12


def test_event_paths_consistent_with_transitions(spark):
    """Every 3-path's count must be <= the count of each of its two
    constituent transitions (a path instance contains both bigrams)."""
    trans = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in CATALOG["events_transition_matrix"].spark_fn(spark, SF).collect()
    }
    paths = CATALOG["event_paths"].spark_fn(spark, SF).collect()
    assert paths
    for r in paths:
        assert r["n"] <= trans[(r["step1"], r["step2"])]
        assert r["n"] <= trans[(r["step2"], r["step3"])]


def test_event_paths_total_mass(spark):
    """Total 3-path instances (un-limited) = sum over users of
    max(0, n_events - 2)."""
    ev = events_table(spark, SF).filter(F.col("ts").isNotNull())
    per_user = [
        r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    ]
    want = sum(max(0, n - 2) for n in per_user)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = (
        ev.select(
            F.lag("event_type", 2).over(w).alias("t0"),
            F.lag("event_type", 1).over(w).alias("t1"),
        )
        .filter(F.col("t0").isNotNull() & F.col("t1").isNotNull())
        .count()
    )
    assert got == want


def test_linreg_r2_bounds_and_exact_fit_on_synthetic(spark):
    """r2 in [0, 1] on real data; and on a synthetic exact-linear frame
    the native regr_* aggregates must recover slope/intercept exactly."""
    rows = CATALOG["linreg_by_group"].spark_fn(spark, SF).collect()
    assert rows
    for r in rows:
        if r["r2"] is not None:
            assert -1e-9 <= r["r2"] <= 1 + 1e-9
        assert r["n_docs"] >= 1
    df = spark.createDataFrame(
        [("g", float(x), 3.0 * x + 7.0) for x in range(10)],
        "lang string, x double, y double",
    )
    got = df.groupBy("lang").agg(
        F.expr("regr_slope(y, x)").alias("s"),
        F.expr("regr_intercept(y, x)").alias("i"),
        F.expr("regr_r2(y, x)").alias("r2"),
    ).collect()[0]
    assert abs(got["s"] - 3.0) < 1e-9
    assert abs(got["i"] - 7.0) < 1e-9
    assert abs(got["r2"] - 1.0) < 1e-9


def test_attribution_first_not_after_last_and_asof_consistent(spark):
    """first click <= last click in time; n_clicks >= 1; when
    n_clicks == 1 both touches are the same click."""
    rows = CATALOG["join_attribution_window"].spark_fn(spark, SF).collect()
    assert rows
    ev = events_table(spark, SF).filter(F.col("ts").isNotNull())
    click_ts = {
        r["event_id"]: r["ts"]
        for r in ev.filter(F.col("event_type") == "click").collect()
    }
    for r in rows:
        assert r["n_clicks"] >= 1
        assert click_ts[r["first_click_id"]] <= click_ts[r["last_click_id"]]
        if r["n_clicks"] == 1:
            assert r["first_click_id"] == r["last_click_id"]


def test_er_clusters_match_python_union_find(spark):
    """The ER clustering must equal a Python union-find over the same
    fuzzy pair set, and golden records must conserve name/row/price
    mass against the raw part table."""
    from data_engineering_project_capstone_spark.plans.catalog_r6f import (
        _er_clusters,
        fuzzy_pairs_for_er,
    )

    pairs = [
        (r["name_a"], r["name_b"])
        for r in fuzzy_pairs_for_er(spark, SF).collect()
    ]
    assert pairs, "no fuzzy pairs at sf0.001 — test vacuous"
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for node in parent:
        want.setdefault(find(node), set()).add(node)
    got = {}
    for r in _er_clusters(spark, SF).collect():
        got.setdefault(r["component"], set()).add(r["id"])
    assert sorted(map(sorted, want.values())) == sorted(
        map(sorted, got.values())
    )

    # golden-record mass conservation vs the raw part table
    golden = CATALOG["er_golden_records"].spark_fn(spark, SF).collect()
    clustered_names = {n for c in want.values() for n in c}
    part = t(spark, SF, "part").collect()
    covered = [p for p in part if p["p_name"] in clustered_names]
    assert sum(r["n_part_rows"] for r in golden) == len(covered)
    assert sum(r["n_name_variants"] for r in golden) == len(clustered_names)
    assert abs(
        sum(r["total_price"] for r in golden)
        - sum(p["p_retailprice"] for p in covered)
    ) < 1e-4
