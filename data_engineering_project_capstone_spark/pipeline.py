"""End-to-end pipeline driver — the engine's analog of the reference's
``etl.py`` + ``create_tables.py`` (reference etl.py:46-71).

Where the reference runs an ordered list of Redshift statements (COPY →
INSERT…SELECT chain → count validation), this driver is one dataflow:

    read staging inputs → prep transforms → star-schema build
    → partitioned parquet write → count validation (asserted, not printed)

The write layout is the 100 TB posture: the travelers fact partitioned by
(arrival_year, arrival_month) so per-month analytics prune partitions at
the scan; dimensions are single-directory parquet (they broadcast anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import fixtures, schemas
from .operators import (
    build_star_schema,
    prep_airports,
    prep_cities,
    prep_temperatures,
    prep_travelers,
)
from .operators.star import validate_counts
from .sources import read_csv, read_parquet, write_parquet


def load_staging(
    spark: SparkSession, inputs: dict[str, str] | None = None
) -> dict[str, DataFrame]:
    """Read the four raw inputs. ``inputs`` maps name → path with formats:
    cities = ';'-CSV, airports/temperatures = CSV, travelers = parquet
    (SAS-shaped; the sas7bdat connector is gated behind sources.read_sas).
    With no inputs, deterministic fixtures stand in (test mode)."""
    if inputs is None:
        return fixtures.all_staging(spark)
    return {
        "cities": read_csv(spark, inputs["cities"], schemas.STAGING_CITIES, sep=";"),
        "airports": read_csv(spark, inputs["airports"], schemas.STAGING_AIRPORTS),
        "temperatures": read_csv(
            spark, inputs["temperatures"], schemas.STAGING_TEMPERATURES
        ),
        "travelers": read_parquet(spark, inputs["travelers"]),
    }


def run_pipeline(
    spark: SparkSession,
    out_dir: str,
    inputs: dict[str, str] | None = None,
    id_strategy: str = "dense",
) -> dict[str, int]:
    """Full run: staging → star schema → partitioned parquet → validation.

    Returns the per-table row counts (all asserted > 0, the reference's
    validate_tables made into a real gate: etl.py:31-43).
    """
    raw = load_staging(spark, inputs)
    star = build_star_schema(
        spark,
        prep_cities(raw["cities"]),
        prep_airports(raw["airports"]),
        prep_temperatures(raw["temperatures"]),
        prep_travelers(raw["travelers"]),
        id_strategy=id_strategy,
    )
    # city + airports feed multiple dependents — cache before fan-out
    star["city"].cache()
    star["airports"].cache()

    fact_obs = None
    for name, df in star.items():
        if name == "travelers":
            # the fact is the 100 TB table: its validation count is
            # collected DURING the write (DataFrame.observe), never by
            # re-scanning the output
            from .observability import observe_counts

            audited, fact_obs = observe_counts(df, "travelers_write")
            write_parquet(
                audited,
                f"{out_dir}/{name}",
                partition_by=("p_arrival_year", "p_arrival_month"),
            )
        else:
            write_parquet(df, f"{out_dir}/{name}")

    # dimensions are broadcast-sized: re-read counts are cheap and also
    # prove the written files parse
    written = {
        name: spark.read.parquet(f"{out_dir}/{name}")
        for name in star
        if name != "travelers"
    }
    counts = validate_counts(written)
    fact_rows = int(fact_obs.get["n_rows"])
    assert fact_rows > 0, "travelers fact wrote 0 rows"
    counts["travelers"] = fact_rows
    return counts


def register_star_views(spark: SparkSession, out_dir: str) -> None:
    """Expose the materialized star schema to spark.sql() — the engine's
    equivalent of the reference's queryable warehouse."""
    for name in schemas.STAR_TABLES:
        spark.read.parquet(f"{out_dir}/{name}").createOrReplaceTempView(name)
