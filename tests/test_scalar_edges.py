"""Edge semantics for the scalar layer (SURVEY §5 item 3): sign
formatting at 0.0, null SAS dates, rounding boundaries, ratio nulls."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.functions.scalar import (
    coord_format,
    ieee_round,
    pct_of,
    ratio_of,
    sas_date,
)


def rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_coord_format_edges(spark):
    df = rows(spark, [(0.0,), (-0.0,), (12.345,), (-12.345,), (None,)], "x double")
    out = [r["c"] for r in df.select(coord_format("x", "N", "S").alias("c")).collect()]
    # 0.0 and -0.0 format as northern hemisphere (matches the reference's
    # `if v < 0` lambda, dataprep.py:144-145, where -0.0 is not < 0)
    assert out[0] == "0.0N" and out[1] == "0.0N"
    assert out[2] == "12.35N" and out[3] == "12.35S"  # rounds to 2dp
    assert out[4] is None  # null in, null out


def test_sas_date_edges(spark):
    df = rows(spark, [(0.0,), (20545.0,), (None,), (-365.0,)], "d double")
    out = [r["x"] for r in df.select(sas_date("d").alias("x")).collect()]
    assert out[0] == dt.date(1960, 1, 1)
    assert out[1] == dt.date(2016, 4, 1)  # apr 2016 window start
    assert out[2] is None  # null-preserving (reference dataprep.py:210-212)
    assert out[3] == dt.date(1959, 1, 1)


def test_ieee_round_edges(spark):
    df = rows(
        spark,
        [(2.675,), (2.665,), (-2.675,), (0.005,), (1e13,)],
        "x double",
    )
    out = [r["y"] for r in df.select(ieee_round("x", 2).alias("y")).collect()]
    # deterministic: floor(x*100+0.5)/100 of the actual binary doubles
    import math

    expect = [math.floor(x * 100 + 0.5) / 100 for x in (2.675, 2.665, -2.675, 0.005, 1e13)]
    assert out == expect


def test_pct_and_ratio_nulls(spark):
    df = rows(spark, [(1.0, 4.0), (None, 4.0), (1.0, None), (1.0, 0.0)], "c double, t double")
    out = df.select(
        pct_of("c", "t").alias("p"), ratio_of("c", "t").alias("r")
    ).collect()
    assert out[0]["p"] == 25.0 and out[0]["r"] == 0.25
    assert out[1]["p"] is None and out[2]["r"] is None  # null propagates
    assert out[3]["p"] is None  # div-by-zero → null (Spark semantics)


def test_dropDuplicates_null_keys(spark):
    # A4 dedup: null keys form their own group (one survivor), matching
    # pandas drop_duplicates treating NaN keys as equal
    df = rows(
        spark,
        [(None, "a", 1), (None, "b", 2), ("x", "c", 3), ("x", "d", 4)],
        "k string, v string, i int",
    )
    out = df.dropDuplicates(["k"]).collect()
    assert len(out) == 2


def test_left_join_unmatched_null_payload(spark):
    # J2: left-join misses keep null climatology (reference dataprep.py:184)
    left = rows(spark, [("a", 1), ("b", 2)], "city string, month int")
    right = rows(spark, [("a", 1, 20.0)], "city string, month int, avg double")
    out = {
        r["city"]: r["avg"]
        for r in left.join(right, ["city", "month"], "left").collect()
    }
    assert out["a"] == 20.0 and out["b"] is None


def test_round_half_parity_with_duckdb(spark):
    """The money idiom pairs Spark F.round(x*100, 0) with DuckDB
    round(x*100) in every oracle. Both are round-half-AWAY-FROM-ZERO
    for doubles, but that claim is load-bearing across ~200 oracles, so
    pin it on inputs whose scaled value is EXACTLY representable as
    .5 in binary (2^-3 multiples) — the only place a HALF_UP vs
    HALF_EVEN divergence could ever show. Includes negatives (acctbal
    paths) and whole-number quantities through round(q)."""
    import duckdb

    vals = [128.125, 0.125, 0.625, 3.375, -0.125, -128.125, 2.5, -2.5]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        (r["c"], r["q"])
        for r in df.select(
            F.round(F.col("x") * 100, 0).cast("long").alias("c"),
            F.round(F.col("x"), 0).cast("long").alias("q"),
        ).collect()
    ]
    got_duck = duckdb.sql(
        "SELECT CAST(round(x * 100) AS BIGINT), CAST(round(x) AS BIGINT) "
        "FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        params=[vals],
    ).fetchall()
    assert got_spark == [tuple(r) for r in got_duck]
    # and the specific away-from-zero expectations, so a future engine
    # change fails loudly with the right message
    assert got_spark[0][0] == 12813 and got_spark[4][0] == -13
