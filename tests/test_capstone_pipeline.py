"""End-to-end: fixtures → prep operators → star schema → flagship queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark import fixtures
from data_engineering_project_capstone_spark.operators import (
    build_star_schema,
    prep_airports,
    prep_cities,
    prep_temperatures,
    prep_travelers,
)
from data_engineering_project_capstone_spark.operators.star import validate_counts
from data_engineering_project_capstone_spark.plans import (
    flagship_q1,
    flagship_q2,
    flagship_q3,
)


@pytest.fixture(scope="module")
def staging(spark):
    raw = fixtures.all_staging(spark)
    return {
        "cities": prep_cities(raw["cities"]),
        "airports": prep_airports(raw["airports"]),
        "temperatures": prep_temperatures(raw["temperatures"]),
        "travelers": prep_travelers(raw["travelers"]),
    }


@pytest.fixture(scope="module")
def star(spark, staging):
    tables = build_star_schema(
        spark,
        staging["cities"],
        staging["airports"],
        staging["temperatures"],
        staging["travelers"],
    )
    return {k: v.cache() for k, v in tables.items()}


def test_prep_cities_wide_and_deduped(spark, staging):
    cities = staging["cities"].collect()
    keys = {(r["city"], r["state"]) for r in cities}
    assert len(keys) == len(cities), "one row per (city,state)"
    # the city with a missing race row must be dropped (inner-merge parity)
    assert ("San Diego", "California") not in keys
    for r in cities:
        for short in ["white", "asian", "his_latino"]:
            assert r[f"cnt_{short}"] is not None
            assert 0.0 <= r[f"per_{short}"] <= 1.0


def test_prep_airports_filters_and_format(spark, staging):
    rows = staging["airports"].collect()
    iatas = {r["iata_code"] for r in rows}
    assert None not in iatas and "0" not in iatas and "-" not in iatas
    assert "LHR" not in iatas, "non-US filtered"
    for r in rows:
        assert r["latitude"][-1] in "NS" and r["longitude"][-1] in "EW"
        assert r["state_code"] and len(r["state_code"]) == 2


def test_prep_temperatures_climatology(spark, staging):
    t = staging["temperatures"]
    assert t.filter(F.col("avg_temp").isNull()).count() == 0
    assert t.filter(F.col("city") == "London").count() == 0
    # climatology equals mean of rounded temps per (city,month)
    check = t.groupBy("city", "month").agg(
        F.round(F.avg("avg_temp"), 2).alias("expect"),
        F.first("average_temp_month").alias("got"),
        F.countDistinct("average_temp_month").alias("n_distinct"),
    )
    bad = check.filter(
        (F.col("n_distinct") != 1) | (F.abs(F.col("expect") - F.col("got")) > 1e-9)
    )
    assert bad.count() == 0


def test_prep_travelers(spark, staging):
    t = staging["travelers"]
    assert t.filter(F.col("iata_code") == "XXX").count() == 0
    assert t.filter(F.col("gender").isNull()).count() == 0
    row = t.filter(F.col("arrival_year").isNotNull()).first()
    assert row["arrival_year"] == 2016 and row["arrival_month"] in (4, 5)


def test_star_schema_counts_and_fks(spark, star):
    counts = validate_counts(star)
    assert counts["visa_codes"] == 3
    # FK closure
    trav, airports, city = star["travelers"], star["airports"], star["city"]
    orphans = trav.join(
        airports, trav["p_airport_id"] == airports["a_id"], "left_anti"
    )
    assert orphans.count() == 0
    a_orphans = airports.join(city, F.col("a_city_id") == F.col("c_id"), "left_anti")
    assert a_orphans.count() == 0
    # surrogate keys dense + unique
    ids = [r["c_id"] for r in city.orderBy("c_id").collect()]
    assert ids == list(range(1, len(ids) + 1))


def test_travelers_dropped_unknown_port(spark, staging, star):
    staged = staging["travelers"]
    kept = star["travelers"]
    n_qqq = staged.filter(F.col("iata_code") == "QQQ").count()
    assert n_qqq > 0
    assert staged.count() - kept.count() >= n_qqq


def test_flagship_queries(spark, star):
    q1 = flagship_q1(star).collect()
    assert q1 and {"c_name", "c_state_code", "s_median_age", "avg_age"} == set(
        q1[0].asDict()
    )
    ages = [r["s_median_age"] for r in q1]
    assert ages == sorted(ages, reverse=True)

    q2 = flagship_q2(star).collect()
    assert q2 and all(r["cnt"] > 0 for r in q2)

    q3 = flagship_q3(star).collect()
    assert q3
    total_pct = sum(r["pct_of_total"] for r in q3)
    assert 0 < total_pct <= 101  # subset of cities; never exceeds 100 (+rounding)
