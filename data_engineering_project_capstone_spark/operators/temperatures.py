"""Temperature-history preparation.

Same semantics as the reference's ``prep_temperature_data``
(``/root/reference/dataprep.py:150-190``): US rows only, month/year derived
from the date, null temperature rows dropped, and a denormalized
per-(city, month) all-years climatology column attached to every row.

The climatology is a classic pre-aggregation the data model *wants*
materialized (queries read it without re-aggregating). Spark shape: one
partial+final hash agg, then a join back. At scale the join key
(city, month) is low-cardinality → the aggregate side is tiny → Catalyst
broadcasts it; no second shuffle of the big table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prep_temperatures(raw: DataFrame) -> DataFrame:
    """Raw global temperatures → US staging rows + monthly climatology.

    Output: date (string YYYY-MM-DD), month, year, city, avg_temp,
    avg_temp_uncertainty, average_temp_month (all temps 2dp).
    """
    us = (
        raw.filter(F.col("Country") == "United States")
        .na.drop("any", subset=["AverageTemperature", "AverageTemperatureUncertainty"])
        .select(
            F.col("dt").alias("date"),
            F.month(F.to_date("dt")).alias("month"),
            F.year(F.to_date("dt")).alias("year"),
            F.col("City").alias("city"),
            F.round("AverageTemperature", 2).alias("avg_temp"),
            F.round("AverageTemperatureUncertainty", 2).alias(
                "avg_temp_uncertainty"
            ),
        )
    )
    # Per-(city,month) all-years mean (reference dataprep.py:181), joined back
    # (dataprep.py:184). Mean over *rounded* values matches the reference,
    # which aggregates after its own rounding pass.
    climatology = us.groupBy("city", "month").agg(
        F.round(F.avg("avg_temp"), 2).alias("average_temp_month")
    )
    return us.join(F.broadcast(climatology), ["city", "month"], "left")
