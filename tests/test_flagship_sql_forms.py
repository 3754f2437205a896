"""DF-API and spark.sql() forms of the flagship queries must agree."""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark import fixtures
from data_engineering_project_capstone_spark.operators import (
    build_star_schema,
    prep_airports,
    prep_cities,
    prep_temperatures,
    prep_travelers,
)
from data_engineering_project_capstone_spark.plans import (
    flagship_q1,
    flagship_q2,
    flagship_q3,
)
from data_engineering_project_capstone_spark.plans.flagship import FLAGSHIP_SQL


@pytest.fixture(scope="module")
def star_views(spark):
    raw = fixtures.all_staging(spark)
    star = build_star_schema(
        spark,
        prep_cities(raw["cities"]),
        prep_airports(raw["airports"]),
        prep_temperatures(raw["temperatures"]),
        prep_travelers(raw["travelers"]),
    )
    for name, df in star.items():
        df.createOrReplaceTempView(name)
    return star


@pytest.mark.parametrize(
    "q,df_fn,cols",
    [
        ("q1", flagship_q1, ("c_name", "c_state_code", "avg_age")),
        ("q2", flagship_q2, ("c_name", "c_state_code", "cnt")),
        ("q3", flagship_q3, ("c_name", "c_state_code", "t_average_temp_month", "pct_of_total")),
    ],
)
def test_sql_form_matches_df_form(spark, star_views, q, df_fn, cols):
    df_rows = {tuple(r[c] for c in cols) for r in df_fn(star_views).collect()}
    sql_rows = {
        tuple(r[c] for c in cols) for r in spark.sql(FLAGSHIP_SQL[q]).collect()
    }
    assert df_rows == sql_rows
