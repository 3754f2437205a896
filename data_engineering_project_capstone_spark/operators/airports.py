"""Airport-codes preparation.

Same semantics as the reference's ``prep_airport_data``
(``/root/reference/dataprep.py:97-148``): keep US airports with a real IATA
code, split the ``"<long>, <lat>"`` coordinate string, derive the state code
from ``iso_region`` (``"US-GA"``), and format coordinates as compass strings
(``"84.43W"``).

All filters sit directly on the scan so Catalyst pushes them into the
source; the row-wise coordinate formatting lambda from the reference is a
codegen-friendly ``when/concat`` expression here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import coord_format, split_part_col


def prep_airports(raw: DataFrame) -> DataFrame:
    """Raw airport codes → clean US airport staging table.

    Output: iata_code, type, name, elevation_ft, state_code, city,
    latitude, longitude (compass strings, 2dp).
    """
    # Invalid-IATA and US filters first (reference dataprep.py:105-107,119) —
    # they reach the scan as pushed predicates.
    flt = raw.filter(
        F.col("iata_code").isNotNull()
        & (F.col("iata_code") != "0")
        & (F.col("iata_code") != "-")
        & (F.col("iso_country") == "US")
    )
    # coordinates is "<longitude>, <latitude>" (reference dataprep.py:114).
    lon = split_part_col("coordinates", ",\\s*", 0).cast("double")
    lat = split_part_col("coordinates", ",\\s*", 1).cast("double")
    return flt.select(
        "iata_code",
        "type",
        "name",
        F.col("elevation_ft").cast("double").alias("elevation_ft"),
        # "US-GA" → "GA" (reference dataprep.py:122)
        split_part_col("iso_region", "-", 1).alias("state_code"),
        F.col("municipality").alias("city"),
        coord_format(lat, "N", "S").alias("latitude"),
        coord_format(lon, "E", "W").alias("longitude"),
    )
