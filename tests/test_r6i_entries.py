"""Semantic invariants for the round-6i TPC-H classic shapes — above
all, that the exact-integer-units revenue encoding reproduces true
decimal arithmetic (prices are 2dp decimals stored as doubles; the
entries sum ``round(price·100)·(100−round(disc·100))`` in int64)."""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t
from data_engineering_project_capstone_spark.plans.catalog_r6i import (
    _Q15_HI,
    _Q15_LO,
)

SF = "/root/testdata/sf0.001"


def _dec(x: float) -> Decimal:
    """The 2dp decimal a double-stored price/discount round-trips to."""
    return Decimal(str(round(x, 2)))


def test_q15_units_match_true_decimal_arithmetic(spark):
    """Per-supplier revenue from the int64-units fold must equal exact
    Decimal computation, and the winner set must be the true argmax."""
    rows = (
        t(spark, SF, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
        .collect()
    )
    per_supp: dict[int, Decimal] = defaultdict(Decimal)
    for r in rows:
        price, disc = _dec(r["l_extendedprice"]), _dec(r["l_discount"])
        per_supp[r["l_suppkey"]] += price * (1 - disc)
    mx = max(per_supp.values())
    want = {
        k: float(v.quantize(Decimal("0.01")))
        for k, v in per_supp.items()
        if v == mx
    }
    got = {
        r["s_suppkey"]: r["total_revenue"]
        for r in CATALOG["q15_top_supplier"].spark_fn(spark, SF).collect()
    }
    assert got == want


def test_q14_promo_pct_matches_decimal_bruteforce(spark):
    li = (
        t(spark, SF, "lineitem")
        .join(
            t(spark, SF, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("p_type", "l_extendedprice", "l_discount")
        .collect()
    )
    num = den = Decimal(0)
    for r in li:
        v = _dec(r["l_extendedprice"]) * (1 - _dec(r["l_discount"]))
        den += v
        if r["p_type"] == "PROMO":
            num += v
    want = round(float(100 * num / den), 6)
    [row] = CATALOG["q14_promo_revenue"].spark_fn(spark, SF).collect()
    assert abs(row["promo_pct"] - want) < 1e-6
    assert 0.0 <= row["promo_pct"] <= 100.0


def test_q8_share_bounds_and_q5_ordering(spark):
    shares = CATALOG["q8_market_share"].spark_fn(spark, SF).collect()
    assert shares
    years = [r["o_year"] for r in shares]
    assert years == sorted(years)
    assert all(0.0 <= r["mkt_share"] <= 1.0 for r in shares)
    q5 = CATALOG["q5_local_volume"].spark_fn(spark, SF).collect()
    revs = [r["revenue"] for r in q5]
    assert revs == sorted(revs, reverse=True)
