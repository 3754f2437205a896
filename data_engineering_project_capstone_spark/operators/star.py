"""Star-schema builder.

Produces the reference's warehouse model (``/root/reference/sql_queries.py:
127-258``; prose at ``README.md:47-121``): fact ``travelers`` + dimensions
``visa_codes``, ``city``, ``airports``, ``temperatures``, ``statistics``.

The reference loads these with an *ordered list* of INSERT…SELECT statements
(``etl.py:19-29``) because FK ids must exist before dependents resolve them.
Here the ordering is just dataflow: each builder takes the DataFrames it
depends on. Dimensions are broadcast into fact joins (they are tiny against
a 100 TB fact), and the one ``UPDATE … FROM`` (city lat/long backfill,
``sql_queries.py:154-159``) folds into the city build as an aggregate —
no mutable table needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import STAR_VISA_CODES
from .keys import hash_key, surrogate_key

VISA_CODES = [(1, "Business"), (2, "Pleasure"), (3, "Student")]


def build_visa_codes(spark: SparkSession) -> DataFrame:
    """Static visa enum (reference sql_queries.py:127-137)."""
    return spark.createDataFrame(VISA_CODES, STAR_VISA_CODES)


def build_city(airports_staging: DataFrame) -> DataFrame:
    """Distinct (city, state) dim with lat/long backfilled from airports.

    Reference does GROUP-BY-distinct (sql_queries.py:149-152) then an
    ``UPDATE … FROM staging_airports`` (sql_queries.py:154-159) whose winning
    airport is arbitrary. Here both steps are one aggregate; the winner is
    pinned to the lexically-smallest iata_code so ids and coords are
    deterministic run-to-run (needed for oracle hash-matching).
    """
    dedup = airports_staging.groupBy(
        F.col("city").alias("c_name"), F.col("state_code").alias("c_state_code")
    ).agg(
        F.min_by("latitude", "iata_code").alias("c_lat"),
        F.min_by("longitude", "iata_code").alias("c_long"),
    )
    return surrogate_key(dedup, "c_id", ["c_name", "c_state_code"]).select(
        "c_id", "c_name", "c_state_code", "c_lat", "c_long"
    )


def build_airports(airports_staging: DataFrame, city: DataFrame) -> DataFrame:
    """Airports dim, FK to city (reference sql_queries.py:161-177, J3)."""
    joined = airports_staging.join(
        F.broadcast(city),
        (airports_staging["city"] == city["c_name"])
        & (airports_staging["state_code"] == city["c_state_code"]),
        "inner",
    )
    out = joined.select(
        F.col("c_id").alias("a_city_id"),
        F.col("iata_code").alias("a_iata_code"),
        F.col("type").alias("a_type"),
        F.col("name").alias("a_name"),
        F.col("elevation_ft").alias("a_elevation_ft"),
    )
    return surrogate_key(out, "a_id", ["a_iata_code", "a_name"]).select(
        "a_id", "a_city_id", "a_iata_code", "a_type", "a_name", "a_elevation_ft"
    )


def build_temperatures(temps_staging: DataFrame, city: DataFrame) -> DataFrame:
    """Temperatures, FK to city by *name only* (reference sql_queries.py:
    191-196, J4 — same-named cities in two states both match; kept as-is)."""
    return temps_staging.join(
        F.broadcast(city), temps_staging["city"] == city["c_name"], "inner"
    ).select(
        F.col("c_id").alias("t_city_id"),
        F.col("date").alias("t_date"),
        F.col("month").alias("t_month"),
        F.col("year").alias("t_year"),
        F.col("avg_temp").alias("t_avg_temp"),
        F.col("avg_temp_uncertainty").alias("t_avg_temp_uncertainty"),
        F.col("average_temp_month").alias("t_average_temp_month"),
    )


def build_statistics(cities_staging: DataFrame, city: DataFrame) -> DataFrame:
    """Demographics dim, FK to city (reference sql_queries.py:198-237, J5)."""
    joined = cities_staging.join(
        F.broadcast(city),
        (cities_staging["city"] == city["c_name"])
        & (cities_staging["state_code"] == city["c_state_code"]),
        "inner",
    )
    return joined.select(
        F.col("c_id").alias("s_city_id"),
        F.col("total_population").alias("s_population"),
        F.col("median_age").alias("s_median_age"),
        F.col("avg_household_size").alias("s_avg_household"),
        F.col("cnt_male").alias("s_cnt_male"),
        F.col("per_male").alias("s_per_male"),
        F.col("cnt_female").alias("s_cnt_female"),
        F.col("per_female").alias("s_per_female"),
        F.col("cnt_veterans").alias("s_cnt_veterans"),
        F.col("per_veterans").alias("s_per_veterans"),
        F.col("cnt_foreign_born").alias("s_cnt_foreign_born"),
        F.col("per_foreign_born").alias("s_per_foreign_born"),
        F.col("cnt_white").alias("s_cnt_white"),
        F.col("per_white").alias("s_per_white"),
        F.col("cnt_his_latino").alias("s_cnt_his_latino"),
        F.col("per_his_latino").alias("s_per_his_latino"),
        F.col("cnt_asian").alias("s_cnt_asian"),
        F.col("per_asian").alias("s_per_asian"),
        F.col("cnt_amer_ind_ak_native").alias("s_cnt_amer_ind_ak_native"),
        F.col("per_amer_ind_ak_native").alias("s_per_amer_ind_ak_native"),
        F.col("cnt_black_afr_amer").alias("s_cnt_black"),
        F.col("per_black_afr_amer").alias("s_per_black_afr_amer"),
    )


def build_travelers(
    travelers_staging: DataFrame, airports: DataFrame, id_strategy: str = "dense"
) -> DataFrame:
    """Fact table: travelers joined to airports on IATA code.

    Inner join = dim-filtering semantics, dropping travelers whose port has
    no known airport (reference sql_queries.py:253-258; README.md:111). The
    airports dim is broadcast — at 100 TB this is a map-side join, the fact
    never shuffles.

    ``id_strategy``: "dense" row_number (test scale, oracle-stable) or
    "hash" xxhash64 over natural columns (cluster scale, shuffle-free).
    """
    joined = travelers_staging.join(
        F.broadcast(airports),
        travelers_staging["iata_code"] == airports["a_iata_code"],
        "inner",
    )
    out = joined.select(
        F.col("a_id").alias("p_airport_id"),
        F.col("age").alias("p_age"),
        F.col("visa_code").alias("p_visa_code"),
        F.col("gender").alias("p_gender"),
        F.col("year_of_birth").alias("p_year_of_birth"),
        F.col("arrival_year").alias("p_arrival_year"),
        F.col("arrival_month").alias("p_arrival_month"),
        F.col("arrival_day").alias("p_arrival_day"),
    )
    natural = [
        "p_airport_id",
        "p_age",
        "p_visa_code",
        "p_gender",
        "p_year_of_birth",
        "p_arrival_year",
        "p_arrival_month",
        "p_arrival_day",
    ]
    if id_strategy == "hash":
        keyed = hash_key(out, "p_id", natural)
    else:
        keyed = surrogate_key(out, "p_id", natural)
    return keyed.select("p_id", *natural)


def build_star_schema(
    spark: SparkSession,
    cities_staging: DataFrame,
    airports_staging: DataFrame,
    temps_staging: DataFrame,
    travelers_staging: DataFrame,
    id_strategy: str = "dense",
) -> dict[str, DataFrame]:
    """Build all six star tables; returns name → DataFrame.

    Mirrors the reference's ordered INSERT chain (etl.py:19-29) as pure
    dataflow. ``city`` and ``airports`` are reused by several dependents —
    callers that materialize should cache or write them first.
    """
    visa = build_visa_codes(spark)
    city = build_city(airports_staging)
    airports = build_airports(airports_staging, city)
    return {
        "visa_codes": visa,
        "city": city,
        "airports": airports,
        "temperatures": build_temperatures(temps_staging, city),
        "statistics": build_statistics(cities_staging, city),
        "travelers": build_travelers(travelers_staging, airports, id_strategy),
    }


def validate_counts(tables: dict[str, DataFrame]) -> dict[str, int]:
    """The reference's validation pass (sql_queries.py:261-272; etl.py:31-43)
    as real assertions: every table must be non-empty."""
    counts = {name: df.count() for name, df in tables.items()}
    empty = [n for n, c in counts.items() if c == 0]
    if empty:
        raise AssertionError(f"empty star tables: {empty}")
    return counts
