"""Semantic invariants for the round-6c entries — properties the oracle
differential can't express (cross-engine agreement proves the two
implementations agree, not that the math means what the docstring says).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG
from data_engineering_project_capstone_spark.plans.catalog import (
    events_table,
    t,
)
from data_engineering_project_capstone_spark.plans.catalog_r5 import _toks
from data_engineering_project_capstone_spark.plans.catalog_r6c import (
    _CMS_D,
    _CMS_W,
    _md5_bucket,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# sketch_cms_topk
# ---------------------------------------------------------------------------


def _token_counts(spark):
    return (
        t(spark, SF, "documents")
        .select(F.explode(_toks()).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )


def _full_estimates(spark, cnts):
    """CMS estimate for EVERY distinct token (not just the top-K)."""
    keyed = cnts.select(
        "tok",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d"),
    ).withColumn("bucket", _md5_bucket(F.col("tok"), F.col("d"), _CMS_W))
    cms = keyed.groupBy("d", "bucket").agg(F.sum("c").alias("cell"))
    return (
        keyed.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("tok")
        .agg(F.min("cell").alias("est"), F.max("c").alias("true"))
    )


def test_cms_never_underestimates(spark):
    """The defining CMS guarantee: est >= true count, for every token."""
    cnts = _token_counts(spark)
    est = _full_estimates(spark, cnts)
    n_under = est.filter(F.col("est") < F.col("true")).count()
    assert n_under == 0


def test_cms_topk_contains_true_heavy_hitters(spark):
    """Every true top-5 token must appear in the reported top-20: CMS
    only overestimates, so a true heavy hitter cannot be displaced below
    rank K by more than the collision inflation of K lighter tokens."""
    truth = {
        r["tok"]
        for r in _token_counts(spark)
        .orderBy(F.desc("c"), "tok")
        .limit(5)
        .collect()
    }
    reported = {
        r["tok"]
        for r in CATALOG["sketch_cms_topk"].spark_fn(spark, SF).collect()
    }
    assert truth <= reported, truth - reported


def test_cms_sketch_is_mergeable(spark):
    """Shard-local sketches cell-wise-ADD into the global sketch — the
    property that makes CMS distributable. Build one sketch per source
    and compare their cell-wise sum to the single-pass global sketch."""
    docs = t(spark, SF, "documents")

    def cells(df):
        keyed = (
            df.select(F.explode(_toks()).alias("tok"))
            .filter(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count("*").alias("c"))
            .select(
                "c",
                F.explode(
                    F.sequence(F.lit(0), F.lit(_CMS_D - 1))
                ).alias("d"),
                F.col("tok"),
            )
            .withColumn(
                "bucket", _md5_bucket(F.col("tok"), F.col("d"), _CMS_W)
            )
        )
        out = defaultdict(int)
        for r in (
            keyed.groupBy("d", "bucket").agg(F.sum("c").alias("cell"))
        ).collect():
            out[(r["d"], r["bucket"])] = r["cell"]
        return out

    merged = defaultdict(int)
    for (src,) in docs.select("source").distinct().collect():
        for k, v in cells(docs.filter(F.col("source") == src)).items():
            merged[k] += v
    assert dict(merged) == dict(cells(docs))


# ---------------------------------------------------------------------------
# join_range_buckets
# ---------------------------------------------------------------------------


def test_range_bucket_join_equals_naive_range_join(spark):
    """The bucket-expansion rewrite must be row-identical to the naive
    nested-loop BETWEEN join it replaces."""
    ev = events_table(spark, SF)
    iv = ev.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 97 == 0)
    ).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("hi"),
    )
    naive = (
        ev.crossJoin(F.broadcast(iv))
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")))
        .groupBy("window_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("n_clicks"),
        )
        .orderBy("window_id")
    )
    got = CATALOG["join_range_buckets"].spark_fn(spark, SF)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in naive.collect()
    ]
    assert got.count() > 0  # the equivalence must not be vacuous


# ---------------------------------------------------------------------------
# events_transition_matrix
# ---------------------------------------------------------------------------


def test_transition_rows_normalize_to_one(spark):
    rows = CATALOG["events_transition_matrix"].spark_fn(spark, SF).collect()
    by_from = defaultdict(float)
    n_total = 0
    for r in rows:
        by_from[r["from_type"]] += r["p"]
        n_total += r["n"]
    for src, s in by_from.items():
        assert abs(s - 1.0) < 1e-3, (src, s)
    # bigram mass: one transition per event with a predecessor
    ev = events_table(spark, SF)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert n_total == n_events - n_users


# ---------------------------------------------------------------------------
# events_anomaly_zscore
# ---------------------------------------------------------------------------


def test_zscore_flags_match_recomputation(spark):
    rows = CATALOG["events_anomaly_zscore"].spark_fn(spark, SF).collect()
    assert rows, "zscore entry returned no scored hours"
    for r in rows:
        if r["z"] is not None and r["sigma"] and r["sigma"] > 0:
            recomputed = (r["n_events"] - r["mu"]) / r["sigma"]
            # mu/sigma are 4dp-rounded, so allow rounding slack
            assert abs(recomputed - r["z"]) < 5e-2
            assert r["is_anomaly"] == (r["z"] > 2.5)


# ---------------------------------------------------------------------------
# agg_robust_mad
# ---------------------------------------------------------------------------


def test_mad_bounded_by_range(spark):
    """med within [min, max]; MAD <= max |x - med| — sanity that the
    two-phase join computed deviations about the right center."""
    docs = t(spark, SF, "documents")
    stats = {
        r["source"]: r
        for r in docs.groupBy("source")
        .agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
        .collect()
    }
    for r in CATALOG["agg_robust_mad"].spark_fn(spark, SF).collect():
        s = stats[r["source"]]
        assert s["lo"] <= r["med_chars"] <= s["hi"]
        assert 0 <= r["mad_chars"] <= max(
            s["hi"] - r["med_chars"], r["med_chars"] - s["lo"]
        )


# ---------------------------------------------------------------------------
# rolling_distinct_users
# ---------------------------------------------------------------------------


def test_rolling_distinct_dominates_daily_and_is_capped(spark):
    """u7(day) >= distinct users ON day (window contains the day) and
    u7(day) <= total distinct users; and u7 is exactly the brute-force
    union of the trailing 7 days."""
    ev = events_table(spark, SF)
    daily = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    total = ev.select("user_id").distinct().count()
    day_users = defaultdict(set)
    for r in ev.select(F.to_date("ts").alias("day"), "user_id").collect():
        day_users[r["day"]].add(r["user_id"])
    for r in CATALOG["rolling_distinct_users"].spark_fn(spark, SF).collect():
        day = r["day"]
        assert daily[day] <= r["u7"] <= total
        brute = set()
        for d, users in day_users.items():
            if 0 <= (day - d).days <= 6:
                brute |= users
        assert r["u7"] == len(brute), day
