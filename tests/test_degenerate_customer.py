"""Degenerate-input sweep over every customer-consuming catalog entry.

Completes the per-table robustness nets (docs / events / embeddings /
orders): the synthetic customers are too well-behaved — every segment
populated, every balance positive and non-NULL, every nationkey valid,
every customer with orders. This corpus makes the risky paths execute:

- only SIX customers, so nearly every order's o_custkey dangles
  (inner joins drop almost the whole fact; left joins must keep it)
- a NULL c_acctbal (aggregate NULL-skip parity; q22's avg filter)
- a NEGATIVE balance (positive-balance filters)
- a dangling c_nationkey (nation joins drop; RI audit counts)
- an empty-string market segment and only two BUILDING customers
  (the Bloom dim filter shrinks to 2 keys; segment groupings with
  empty groups)
- a duplicate c_name (entity-resolution blocking)
- six spatial points: the geo grid / kNN / DBSCAN family runs at the
  everything-is-noise extreme (no core points, empty edge lists)

Two assertions per entry, identical to the other nets: the Spark plan
executes, and where oracle SQL exists both engines agree."""

from __future__ import annotations

import shutil

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import assert_entry_matches
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

DEGENERATE_CUSTOMERS = [
    # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    (1, "alpha one", 0, 0.0, "BUILDING"),
    (2, "beta two", 0, -999.99, "BUILDING"),  # negative balance
    (3, "gamma three", 1, None, "MACHINERY"),  # NULL balance
    (4, "delta four", 999, 123.45, "AUTOMOBILE"),  # dangling nationkey
    (5, "epsilon five", 2, 500.0, ""),  # empty segment
    (6, "alpha one", 3, 500.0, "HOUSEHOLD"),  # duplicate name
    # r8 NULL-key probe: a keyless customer — order joins on custkey
    # must drop it on BOTH engines; groupings by custkey keep it as its
    # own NULL group identically
    (None, "zeta ghost", 0, 10.0, "BUILDING"),
    # r8 NULL-measure wave: NULL name (ER blocking, fuzzy pairs, string
    # splits, any name sort/tiebreak — Spark NULLS FIRST vs DuckDB
    # NULLS LAST), NULL segment (a real group, kept identically; CASE
    # and pivot paths must not invent or drop it), NULL nationkey
    # (nation joins drop it on BOTH engines — distinct from key 999,
    # which joins to nothing but sorts as a value).
    (7, None, 1, 42.0, "MACHINERY"),
    (8, "eta eight", 2, 77.0, None),
    (9, "theta nine", None, 88.0, "AUTOMOBILE"),
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """sf0.001 with customer.parquet swapped for the degenerate corpus."""
    d = tmp_path_factory.mktemp("degen_customer")
    for name in TABLES:
        if name != "customer":
            shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*DEGENERATE_CUSTOMERS))
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(cols[0], pa.int64()),
                "c_name": pa.array(cols[1], pa.string()),
                "c_nationkey": pa.array(cols[2], pa.int32()),
                "c_acctbal": pa.array(cols[3], pa.float64()),
                "c_mktsegment": pa.array(cols[4], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    return str(d)


def _customer_entries():
    return sorted(
        name
        for name, e in CATALOG.items()
        if e.sql is not None and "customer" in e.sql.lower()
    )


@pytest.mark.parametrize("name", _customer_entries())
def test_entry_survives_degenerate_customers(spark, degen_dir, name):
    assert_entry_matches(spark, name, degen_dir, "degenerate customers")
