"""City-demographics preparation.

Same semantics as the reference's ``prep_cities_data``
(``/root/reference/dataprep.py:11-95``): the raw file is *melted* — one row
per (city, state, race) — and must be widened to one row per (city, state)
with a count and a population-ratio column per race, plus gender/veteran/
foreign-born ratios.

The reference builds the wide shape with five filtered self-merges (one per
race) and a post-hoc dedup. Spark-first, that is one ``groupBy().pivot()`` —
a single shuffle instead of five joins, and the dedup disappears because the
group key makes output uniqueness structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import ratio_of

# The five race values in the raw data (reference dataprep.py:16) and the
# short column names they map to (reference dataprep.py:69-92).
RACES: dict[str, str] = {
    "White": "white",
    "Hispanic or Latino": "his_latino",
    "Asian": "asian",
    "American Indian and Alaska Native": "amer_ind_ak_native",
    "Black or African-American": "black_afr_amer",
}


def prep_cities(raw: DataFrame) -> DataFrame:
    """Melted demographics → one wide row per (city, state).

    Output columns: city, state, state_code, median_age, total_population,
    cnt_male/per_male, cnt_female/per_female, cnt_veterans/per_veterans,
    cnt_foreign_born/per_foreign_born, avg_household_size, and
    cnt_/per_<race> for the five races. Ratios are round(count/total, 2)
    (reference dataprep.py:32,37,57-66).

    Cities missing any race row are dropped — the reference's inner merges
    do the same (dataprep.py:31) — enforced here with a post-pivot filter.
    """
    # Pivot with explicit value list: Spark then skips the extra distinct()
    # pass it would otherwise run to discover pivot values.
    wide = (
        raw.groupBy(
            F.col("City").alias("city"),
            F.col("State").alias("state"),
            F.col("State Code").alias("state_code"),
            F.col("Median Age").alias("median_age"),
            F.col("Male Population").alias("cnt_male"),
            F.col("Female Population").alias("cnt_female"),
            F.col("Total Population").alias("total_population"),
            F.col("Number of Veterans").alias("cnt_veterans"),
            F.col("Foreign-born").alias("cnt_foreign_born"),
            F.col("Average Household Size").alias("avg_household_size"),
        )
        .pivot("Race", list(RACES))
        # min, not first: if the raw file repeats a (group, race) row with a
        # different Count, the survivor must not depend on partition order.
        .agg(F.min("Count"))
    )
    for raw_name, short in RACES.items():
        wide = wide.withColumnRenamed(raw_name, f"cnt_{short}")

    # Inner-merge semantics: every race must be present (reference drops
    # cities lacking any race row via 5 chained inner joins).
    for short in RACES.values():
        wide = wide.filter(F.col(f"cnt_{short}").isNotNull())

    ratios = {
        f"per_{short}": ratio_of(f"cnt_{short}", "total_population")
        for short in RACES.values()
    }
    ratios.update(
        {
            "per_male": ratio_of("cnt_male", "total_population"),
            "per_female": ratio_of("cnt_female", "total_population"),
            "per_veterans": ratio_of("cnt_veterans", "total_population"),
            "per_foreign_born": ratio_of("cnt_foreign_born", "total_population"),
            "median_age": F.round("median_age", 2),
            "avg_household_size": F.round("avg_household_size", 2),
        }
    )
    wide = wide.withColumns(ratios)

    int_casts = {
        c: F.col(c).cast("long")
        for c in wide.columns
        if c.startswith("cnt_") or c == "total_population"
    }
    # One row per (city,state) is structural post-pivot, but the raw file can
    # repeat a (city,state) group if demographic columns disagree
    # (reference dataprep.py:40 resolves with sort + drop_duplicates). A
    # declared sort order makes the survivor partition-independent:
    # lowest (median_age, total_population, cnt_male) wins, nulls last.
    wide = wide.withColumns(int_casts)
    order_cols = [
        F.col(c).asc_nulls_last()
        for c in ("median_age", "total_population", "cnt_male")
    ]
    w = Window.partitionBy("city", "state").orderBy(*order_cols)
    return (
        wide.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
