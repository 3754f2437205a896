"""Explicit schemas for every table the engine touches.

Declared (never inferred) so scans prune columns at I/O and the star schema
is stable across rounds. Three groups:

- STAGING_*  — the capstone raw inputs (reference: ``dataprep.py:19,102,155,204``
  and ``sql_queries.py:23-89``), i.e. the four staging tables.
- STAR_*     — the star schema the pipeline produces (reference:
  ``sql_queries.py:127-258``).
- TESTDATA_* — the driver's TPC-H-ish parquet tables (``/root/testdata``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Staging inputs (capstone raw sources)
# --------------------------------------------------------------------------

# us-cities-demographics.csv, ';'-separated (reference dataprep.py:19)
STAGING_CITIES = T.StructType(
    [
        T.StructField("City", T.StringType()),
        T.StructField("State", T.StringType()),
        T.StructField("Median Age", T.DoubleType()),
        T.StructField("Male Population", T.DoubleType()),
        T.StructField("Female Population", T.DoubleType()),
        T.StructField("Total Population", T.LongType()),
        T.StructField("Number of Veterans", T.DoubleType()),
        T.StructField("Foreign-born", T.DoubleType()),
        T.StructField("Average Household Size", T.DoubleType()),
        T.StructField("State Code", T.StringType()),
        T.StructField("Race", T.StringType()),
        T.StructField("Count", T.LongType()),
    ]
)

# airport-codes_csv.csv (reference dataprep.py:102-148)
STAGING_AIRPORTS = T.StructType(
    [
        T.StructField("ident", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("elevation_ft", T.DoubleType()),
        T.StructField("continent", T.StringType()),
        T.StructField("iso_country", T.StringType()),
        T.StructField("iso_region", T.StringType()),
        T.StructField("municipality", T.StringType()),
        T.StructField("gps_code", T.StringType()),
        T.StructField("iata_code", T.StringType()),
        T.StructField("local_code", T.StringType()),
        T.StructField("coordinates", T.StringType()),
    ]
)

# GlobalLandTemperaturesByCity.csv (reference dataprep.py:155-178)
STAGING_TEMPERATURES = T.StructType(
    [
        T.StructField("dt", T.StringType()),
        T.StructField("AverageTemperature", T.DoubleType()),
        T.StructField("AverageTemperatureUncertainty", T.DoubleType()),
        T.StructField("City", T.StringType()),
        T.StructField("Country", T.StringType()),
        T.StructField("Latitude", T.StringType()),
        T.StructField("Longitude", T.StringType()),
    ]
)

# I-94 SAS travelers extract — the 6 columns the pipeline reads
# (reference dataprep.py:204)
STAGING_TRAVELERS = T.StructType(
    [
        T.StructField("i94port", T.StringType()),
        T.StructField("arrdate", T.DoubleType()),
        T.StructField("i94bir", T.DoubleType()),
        T.StructField("i94visa", T.DoubleType()),
        T.StructField("biryear", T.DoubleType()),
        T.StructField("gender", T.StringType()),
    ]
)

# --------------------------------------------------------------------------
# Star schema (reference sql_queries.py:127-258)
# --------------------------------------------------------------------------

STAR_VISA_CODES = T.StructType(
    [
        T.StructField("v_code", T.IntegerType(), False),
        T.StructField("v_description", T.StringType()),
    ]
)

STAR_CITY = T.StructType(
    [
        T.StructField("c_id", T.LongType(), False),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_state_code", T.StringType()),
        T.StructField("c_lat", T.StringType()),
        T.StructField("c_long", T.StringType()),
    ]
)

STAR_AIRPORTS = T.StructType(
    [
        T.StructField("a_id", T.LongType(), False),
        T.StructField("a_city_id", T.LongType()),
        T.StructField("a_iata_code", T.StringType()),
        T.StructField("a_type", T.StringType()),
        T.StructField("a_name", T.StringType()),
        T.StructField("a_elevation_ft", T.DoubleType()),
    ]
)

STAR_TEMPERATURES = T.StructType(
    [
        T.StructField("t_city_id", T.LongType()),
        T.StructField("t_date", T.StringType()),
        T.StructField("t_month", T.IntegerType()),
        T.StructField("t_year", T.IntegerType()),
        T.StructField("t_avg_temp", T.DoubleType()),
        T.StructField("t_avg_temp_uncertainty", T.DoubleType()),
        T.StructField("t_average_temp_month", T.DoubleType()),
    ]
)

STAR_STATISTICS = T.StructType(
    [
        T.StructField("s_city_id", T.LongType()),
        T.StructField("s_population", T.LongType()),
        T.StructField("s_median_age", T.DoubleType()),
        T.StructField("s_avg_household", T.DoubleType()),
        T.StructField("s_cnt_male", T.LongType()),
        T.StructField("s_per_male", T.DoubleType()),
        T.StructField("s_cnt_female", T.LongType()),
        T.StructField("s_per_female", T.DoubleType()),
        T.StructField("s_cnt_veterans", T.LongType()),
        T.StructField("s_per_veterans", T.DoubleType()),
        T.StructField("s_cnt_foreign_born", T.LongType()),
        T.StructField("s_per_foreign_born", T.DoubleType()),
        T.StructField("s_cnt_white", T.LongType()),
        T.StructField("s_per_white", T.DoubleType()),
        T.StructField("s_cnt_his_latino", T.LongType()),
        T.StructField("s_per_his_latino", T.DoubleType()),
        T.StructField("s_cnt_asian", T.LongType()),
        T.StructField("s_per_asian", T.DoubleType()),
        T.StructField("s_cnt_amer_ind_ak_native", T.LongType()),
        T.StructField("s_per_amer_ind_ak_native", T.DoubleType()),
        T.StructField("s_cnt_black", T.LongType()),
        T.StructField("s_per_black_afr_amer", T.DoubleType()),
    ]
)

STAR_TRAVELERS = T.StructType(
    [
        T.StructField("p_id", T.LongType(), False),
        T.StructField("p_airport_id", T.LongType()),
        T.StructField("p_age", T.IntegerType()),
        T.StructField("p_visa_code", T.IntegerType()),
        T.StructField("p_gender", T.StringType()),
        T.StructField("p_year_of_birth", T.IntegerType()),
        T.StructField("p_arrival_year", T.IntegerType()),
        T.StructField("p_arrival_month", T.IntegerType()),
        T.StructField("p_arrival_day", T.IntegerType()),
    ]
)

STAR_TABLES = {
    "visa_codes": STAR_VISA_CODES,
    "city": STAR_CITY,
    "airports": STAR_AIRPORTS,
    "temperatures": STAR_TEMPERATURES,
    "statistics": STAR_STATISTICS,
    "travelers": STAR_TRAVELERS,
}

# --------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/: TPC-H-ish, see TESTDATA.md)
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
