"""Semantic invariants for the round-7g eval/scale-technique entries:
brute-force Python twins for the exact AUC pair counts, the dyadic
EWMA, and the Bloom membership ledger."""

from __future__ import annotations

import datetime as dt
import hashlib
from collections import Counter

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t

SF = "/root/testdata/sf0.001"


def test_roc_auc_matches_bruteforce_pairs(spark):
    rows = t(spark, SF, "documents").select("n_chars", "lang").collect()
    pos = sorted(r["n_chars"] for r in rows if r["lang"] == "en")
    neg = sorted(r["n_chars"] for r in rows if r["lang"] != "en")
    conc = tied = 0
    for p in pos:  # O(n^2) brute force — the point of the twin
        for q in neg:
            if p > q:
                conc += 1
            elif p == q:
                tied += 1
    [row] = CATALOG["roc_auc_eval"].spark_fn(spark, SF).collect()
    assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
    assert (row["concordant_pairs"], row["tied_pairs"]) == (conc, tied)
    want = (2 * conc + tied) / (2 * len(pos) * len(neg))
    assert abs(row["auc"] - want) < 1e-6
    assert 0.0 <= row["auc"] <= 1.0


def test_ewma_matches_python_dyadic_fold(spark):
    daily = Counter()
    for r in (
        t(spark, SF, "orders")
        .select(F.to_date("o_orderdate").alias("d"))
        .collect()
    ):
        daily[r["d"]] += 1

    def s40(d):
        return sum(
            daily[d - dt.timedelta(days=k)] * (1 << (39 - k))
            for k in range(40)
            if (d - dt.timedelta(days=k)) in daily
        )

    rows = CATALOG["ewma_control"].spark_fn(spark, SF).collect()
    assert {r["d"] for r in rows} == set(daily)
    by_d = {r["d"]: r for r in rows}
    days = sorted(daily)
    for i, d in enumerate(days):
        r = by_d[d]
        assert r["n_orders"] == daily[d]
        assert abs(r["ewma"] - s40(d) / 2**40) < 1e-6
        if i == 0:
            # no prior day in the data -> no baseline -> NULL flag
            assert r["burst_flag"] is None
        else:
            prev = days[i - 1]
            want = int(daily[d] * 2**40 > 3 * s40(prev))
            # flag is vs the PREVIOUS ROW of the day series (lag), which
            # for a gap-free spine is yesterday; assert vs the lag row.
            assert r["burst_flag"] == want


def _bits(key, m=4096):
    h = hashlib.md5(str(key).encode()).hexdigest()
    return int(h[:15], 16) % m, int(h[15:30], 16) % m


def test_bloom_ledger_matches_python(spark):
    keys = {
        r["c_custkey"]
        for r in t(spark, SF, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .collect()
    }
    bits = set()
    for k in keys:
        h1, h2 = _bits(k)
        bits.update((h1, h2))
    facts = [r["o_custkey"] for r in t(spark, SF, "orders").collect()]
    n_true = sum(1 for c in facts if c in keys)
    n_pass = sum(
        1
        for c in facts
        if _bits(c)[0] in bits and _bits(c)[1] in bits
    )
    [row] = CATALOG["bloom_prefilter_join"].spark_fn(spark, SF).collect()
    assert row["n_keys"] == len(keys)
    assert row["n_bits_set"] == len(bits)
    assert row["n_fact"] == len(facts)
    assert (row["n_true_match"], row["n_bloom_pass"]) == (n_true, n_pass)
    assert row["n_false_pos"] == n_pass - n_true
    # the defining Bloom property: no false negatives
    assert row["n_bloom_pass"] >= row["n_true_match"]
    want_fpr = (n_pass - n_true) / (len(facts) - n_true)
    assert abs(row["fpr"] - want_fpr) < 1e-6
