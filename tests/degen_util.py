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


# check_* columns whose booleans encode DATA-DEPENDENT expectations
# (k rows per query, recall floor) that hold on the driver corpus but
# not on a pathological/random one — LSH legitimately returns fewer
# than k candidates from a near-empty bucket. The universal columns
# (exact-top-1 parity, n_beats_exact) are still compared.
EMB_DATA_DEPENDENT_COLS = {
    "check_lsh_topk": {"rows_complete", "recall_floor_ok"},
    "check_ivf_topk": {"rows_complete", "recall_floor_ok"},
}


def assert_embeddings_entry_matches(
    spark, name: str, degen_dir: str, what: str
) -> None:
    """The embeddings-net contract (shared by the degenerate and fuzz
    nets): the Spark plan executes with no NaN/inf escapes; where
    oracle SQL exists both engines agree on count and values — floats
    within 2e-4, because synthetic vectors can land a 4dp-rounded
    aggregate exactly on a boundary where the engines' summation
    orders differ in the last ulp (a test-data artifact; the strict
    oracle sweep on real data stays exact)."""
    import math

    entry = CATALOG[name]
    sdf = entry.spark_fn(spark, degen_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]  # must not throw

    for row in spark_rows:  # no NaN/inf escapes into results
        for v in row:
            if isinstance(v, float):
                assert not math.isnan(v) and not math.isinf(v), (name, row)
            if isinstance(v, list):
                assert all(
                    not (isinstance(x, float) and (math.isnan(x) or math.isinf(x)))
                    for x in v
                ), (name, row)

    if entry.sql is None:
        return

    data_dependent = EMB_DATA_DEPENDENT_COLS.get(name, set())

    def drop_cols(cols, rows):
        keep = [c for c in cols if c not in data_dependent]
        idx = [cols.index(c) for c in keep]
        return keep, [tuple(r[i] for i in idx) for r in rows]

    if data_dependent:
        spark_cols, spark_rows = drop_cols(spark_cols, spark_rows)
    ddb_cols, ddb_rows = run_oracle(degen_dir, entry.sql)
    if data_dependent:
        ddb_cols, ddb_rows = drop_cols(ddb_cols, ddb_rows)
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count differs on {what} "
        f"(spark={len(spark_rows)} duck={len(ddb_rows)})"
    )
    sset = _rowset(spark_rows, spark_cols)
    dset = _rowset(ddb_rows, ddb_cols)
    for a, b in zip(sset, dset):
        assert len(a) == len(b), name
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) <= 2e-4, (name, a, b)
            else:
                assert x == y, (name, a, b)
