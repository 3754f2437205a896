"""I-94 traveler-records preparation — the fact-table input.

Same semantics as the reference's ``prep_travelers_data``
(``/root/reference/dataprep.py:192-232``), the reference's one real Spark
job: drop invalid ports and null genders, convert the SAS numeric arrival
date, extract date parts, cast to ints.

This is the 100 TB table. Everything here is a narrow, shuffle-free map
stage: pushed-down filters + codegen expressions. The reference's Python
date UDF (its only one) is replaced by a built-in ``date_add`` — see
:func:`...functions.scalar.sas_date`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import sas_date


def prep_travelers(raw: DataFrame) -> DataFrame:
    """Raw SAS-shaped traveler rows → clean fact staging.

    Output: iata_code, age, visa_code, gender, year_of_birth,
    arrival_year, arrival_month, arrival_day.
    """
    arrival = sas_date("arrdate")
    return (
        # reference dataprep.py:207 (port filter), :221 (gender filter)
        raw.filter((F.col("i94port") != "XXX") & F.col("gender").isNotNull())
        .select(
            F.col("i94port").alias("iata_code"),
            F.col("i94bir").cast("int").alias("age"),
            F.col("i94visa").cast("int").alias("visa_code"),
            F.col("gender").alias("gender"),
            F.col("biryear").cast("int").alias("year_of_birth"),
            F.year(arrival).alias("arrival_year"),
            F.month(arrival).alias("arrival_month"),
            F.dayofmonth(arrival).alias("arrival_day"),
        )
    )
