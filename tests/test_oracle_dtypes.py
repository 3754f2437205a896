"""Dtype-faithfulness gate for every DuckDB oracle.

The driver's correctness gate hashes BOTH engines' results through a
pandas/arrow layer, so it is sensitive to *arrow dtypes*, not just
Python values.  The local differential (test_oracle_differential.py)
compares Python objects, which erases exactly the distinction that bit
us in round 9: DuckDB types ``sum(BIGINT)`` as HUGEINT, arrow renders
that as ``decimal128(38,0)``, and pandas turns it into float64
(``248095.0``) against Spark's int64 (``248095``) — a hash mismatch on
bit-identical values.

This test closes the class: every oracle's ``fetch_arrow_table()``
schema must contain no decimal128/decimal256 (the arrow image of
HUGEINT and of DECIMAL sums) output column.  Any oracle whose SQL lets
an integer sum escape un-cast goes red here in one pytest run instead
of in CORRECTNESS_r{N}.json a round later.

Runs at sf0.001 so the whole 239-entry pass is ~30 s.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF_DIR = os.environ.get("SPARK_GRAFT_DTYPE_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ORACLE_NAMES = sorted(n for n, e in CATALOG.items() if e.sql is not None)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def _decimal_cols(schema: pa.Schema) -> list[str]:
    return [
        f.name
        for f in schema
        if pa.types.is_decimal(f.type)
    ]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_has_no_decimal_output(ddb, name):
    tbl = ddb.execute(CATALOG[name].sql).fetch_arrow_table()
    bad = _decimal_cols(tbl.schema)
    assert not bad, (
        f"{name}: oracle emits decimal/hugeint column(s) {bad} — the "
        "driver's pandas hash will render these as float64 against "
        "Spark's int64 and hash-mismatch on identical values. CAST the "
        "column to BIGINT (or DOUBLE) in the oracle SQL."
    )
