"""End-to-end through the file-based source layer: fixtures written as the
reference's actual input formats (';'-CSV demographics, comma-CSV airports/
temperatures, SAS-shaped parquet), read back via sources.read_csv/read_parquet
with explicit schemas, then the full prep → star → flagship path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark import fixtures, schemas
from data_engineering_project_capstone_spark.operators import (
    build_star_schema,
    prep_airports,
    prep_cities,
    prep_temperatures,
    prep_travelers,
)
from data_engineering_project_capstone_spark.plans import flagship_q2
from data_engineering_project_capstone_spark.sources import (
    read_csv,
    read_parquet,
    write_csv,
    write_parquet,
)


@pytest.fixture(scope="module")
def staged_paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("capstone_inputs")
    raw = fixtures.all_staging(spark)
    # cities ship as ';'-separated CSV (reference dataprep.py:19)
    raw["cities"].write.mode("overwrite").option("header", True).option(
        "sep", ";"
    ).csv(str(root / "cities"))
    write_csv(raw["airports"], str(root / "airports"))
    write_csv(raw["temperatures"], str(root / "temperatures"))
    # travelers are SAS-shaped; the SAS connector is gated, so the source
    # layer ingests the same columns from parquet (SURVEY §7 step 2)
    write_parquet(raw["travelers"], str(root / "travelers"))
    return root


def test_csv_roundtrip_to_flagship(spark, staged_paths):
    cities_raw = read_csv(
        spark, str(staged_paths / "cities"), schemas.STAGING_CITIES, sep=";"
    )
    airports_raw = read_csv(
        spark, str(staged_paths / "airports"), schemas.STAGING_AIRPORTS
    )
    temps_raw = read_csv(
        spark, str(staged_paths / "temperatures"), schemas.STAGING_TEMPERATURES
    )
    travelers_raw = read_parquet(spark, str(staged_paths / "travelers"))

    star = build_star_schema(
        spark,
        prep_cities(cities_raw),
        prep_airports(airports_raw),
        prep_temperatures(temps_raw),
        prep_travelers(travelers_raw),
    )
    q2 = flagship_q2(star).collect()
    assert q2 and all(r["cnt"] > 0 for r in q2)
    # the CSV hop must not change results vs the in-memory path
    raw = fixtures.all_staging(spark)
    star_mem = build_star_schema(
        spark,
        prep_cities(raw["cities"]),
        prep_airports(raw["airports"]),
        prep_temperatures(raw["temperatures"]),
        prep_travelers(raw["travelers"]),
    )
    q2_mem = flagship_q2(star_mem).collect()
    as_set = lambda rows: {(r["c_name"], r["cnt"], r["s_per_foreign_born"]) for r in rows}
    assert as_set(q2) == as_set(q2_mem)


def test_csv_schema_projection_pushdown(spark, staged_paths):
    df = read_csv(spark, str(staged_paths / "airports"), schemas.STAGING_AIRPORTS)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in schemas.STAGING_AIRPORTS.fields
    ]
    # null handling survives the round trip (empty CSV cell → null)
    assert df.filter(F.col("iata_code").isNull()).count() >= 1


def test_csv_permissive_survives_malformed_rows(spark, tmp_path):
    """PERMISSIVE mode (the reader default here): a malformed row nulls
    the unparseable cells instead of failing the job — one bad row in
    100 TB must not kill a 12-hour ingest. The row count is preserved."""
    from pyspark.sql import types as T

    from data_engineering_project_capstone_spark.sources.readers import read_csv

    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,amount,label\n"
        "1,10.5,ok\n"
        "2,NOT_A_NUMBER,bad-amount\n"
        "3,30.0,ok\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("label", T.StringType()),
        ]
    )
    rows = {r["id"]: r for r in read_csv(spark, str(p), schema).collect()}
    assert len(rows) == 3  # nothing dropped, nothing thrown
    assert rows[2]["amount"] is None  # unparseable cell nulled
    assert rows[1]["amount"] == 10.5 and rows[3]["amount"] == 30.0
