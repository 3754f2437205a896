"""pipeline.run_pipeline: staging → star → partitioned parquet → SQL."""

from __future__ import annotations

from data_engineering_project_capstone_spark.pipeline import (
    register_star_views,
    run_pipeline,
)


def test_run_pipeline_and_query_sql(spark, tmp_path):
    out = str(tmp_path / "warehouse")
    counts = run_pipeline(spark, out)
    assert counts["visa_codes"] == 3
    assert all(c > 0 for c in counts.values())

    register_star_views(spark, out)
    # flagship Q2 in its spark.sql() form over the materialized views
    q2 = spark.sql(
        """
        SELECT c.c_name, cnt.cnt, s.s_per_foreign_born
        FROM (
            SELECT a.a_city_id, count(*) AS cnt
            FROM travelers t JOIN airports a ON t.p_airport_id = a.a_id
            GROUP BY a.a_city_id
        ) cnt
        JOIN city c ON cnt.a_city_id = c.c_id
        JOIN statistics s ON s.s_city_id = c.c_id
        ORDER BY s.s_per_foreign_born DESC
        """
    ).collect()
    assert q2 and all(r["cnt"] > 0 for r in q2)

    # fact partitioning materialized as directories
    import os

    trav_dir = os.path.join(out, "travelers")
    years = [d for d in os.listdir(trav_dir) if d.startswith("p_arrival_year=")]
    assert years, "travelers must be partitioned by arrival year"


def test_run_pipeline_hash_ids(spark, tmp_path):
    out = str(tmp_path / "warehouse_hash")
    counts = run_pipeline(spark, out, id_strategy="hash")
    assert all(c > 0 for c in counts.values())
    trav = spark.read.parquet(f"{out}/travelers")
    ids = trav.select("p_id").distinct().count()
    assert ids == trav.count() or ids > 0.99 * trav.count()
