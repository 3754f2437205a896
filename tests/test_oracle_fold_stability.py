"""Oracle fold-stability: every DuckDB oracle must return bit-identical
results under multi-threaded and single-threaded execution (round 11).

The cross-engine differential assumes the ORACLE side is a fixed point —
but DuckDB parallelizes scans and aggregations per row group (~122k
rows), so at sf0.01 a raw-double SUM/AVG fold in an oracle is evaluated
in a thread-count-dependent order. The repo's parity discipline (exact
integer folds, rounding only at readout) exists precisely because fold
order moves the last ulp, and an ulp on a rounding boundary moves a
printed digit: that class bit ``rfm_segments`` at sf0.1 (round 10,
Spark-side) and ``welch_ttest`` at fuzz scale (round 9). This net
checks the SAME discipline held on the DuckDB side of all 239 paired
oracles: ``SET threads=1`` vs the default pool must agree exactly — no
6dp tolerance, the raw fetched values — or the oracle is flaky by
construction and could green/red the driver gate nondeterministically.

Comparison is order-insensitive (rows sorted by repr) but value-exact:
floats compare by equality with NaN normalized to a sentinel (NaN !=
NaN would false-alarm; -0.0 == 0.0 matches both engines' grouping
semantics, pinned in the r11 float-edge probe).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ORACLE_ENTRIES = sorted(n for n, e in CATALOG.items() if e.sql is not None)


def _connect(threads: int | None):
    con = duckdb.connect()
    if threads is not None:
        con.execute(f"SET threads={threads}")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    return con


@pytest.fixture(scope="module")
def ddb_parallel():
    con = _connect(None)  # default: one thread per core
    yield con
    con.close()


@pytest.fixture(scope="module")
def ddb_serial():
    con = _connect(1)
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return v


def _rowset(con, sql):
    rows = [tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()]
    return sorted(rows, key=lambda t: tuple(repr(v) for v in t))


@pytest.mark.parametrize("name", ORACLE_ENTRIES)
def test_oracle_threads_invariant(ddb_parallel, ddb_serial, name):
    sql = CATALOG[name].sql
    par = _rowset(ddb_parallel, sql)
    ser = _rowset(ddb_serial, sql)
    assert par == ser, (
        f"{name}: oracle result depends on DuckDB thread count "
        "(layout-dependent float fold in the oracle)"
    )
