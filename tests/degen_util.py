"""Shared body for the degenerate-input nets (one per table): run a
catalog entry's Spark plan on a corpus directory, run its DuckDB oracle
on the same parquet files, and require exact agreement. Each net file
keeps only what is table-specific — the pathological corpus and its
fixture — and calls ``assert_entry_matches`` for the contract, so a
change to the comparison (view registration, rowset normalization,
message format) lands in exactly one place.

The embeddings net keeps a custom body on top of ``run_oracle`` (NaN
escapes, data-dependent check_* columns, last-ulp float tolerance)."""

from __future__ import annotations

import duckdb

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from test_oracle_differential import TABLES, _rowset


def run_oracle(degen_dir: str, sql: str):
    """(cols, rows) of the oracle SQL over the corpus directory's
    parquet files, registered under the standard table names."""
    con = duckdb.connect()
    try:
        for t_name in TABLES:
            con.execute(
                f"CREATE VIEW {t_name} AS "
                f"SELECT * FROM '{degen_dir}/{t_name}.parquet'"
            )
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
    finally:
        con.close()
    return cols, rows


def assert_entry_matches(spark, name: str, degen_dir: str, what: str) -> None:
    """The strict net contract: the Spark plan executes, and where
    oracle SQL exists both engines agree on count and values."""
    entry = CATALOG[name]
    sdf = entry.spark_fn(spark, degen_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]  # must not throw

    if entry.sql is None:
        return
    ddb_cols, ddb_rows = run_oracle(degen_dir, entry.sql)
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count differs on {what} "
        f"(spark={len(spark_rows)} duck={len(ddb_rows)})"
    )
    assert _rowset(spark_rows, spark_cols) == _rowset(ddb_rows, ddb_cols), (
        f"{name}: values differ on {what}"
    )
