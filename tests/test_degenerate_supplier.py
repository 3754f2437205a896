"""Degenerate-input sweep over every supplier-consuming catalog entry.

The synthetic suppliers are uniformly clean (10 suppliers, every
nationkey valid, every balance positive, unique enum-pattern names).
This corpus makes the risky paths execute:

- only FOUR suppliers (s_suppkey 0-3), so over half of lineitem
  l_suppkey (0-9) dangles: q15/q21's supplier joins drop most of the
  fact; RI audit counts the orphans
- a dangling s_nationkey (999) and a NULL s_nationkey — the q5/q7/q8
  nation joins must drop those suppliers on BOTH engines, not NPE
- a NULL s_acctbal and a NEGATIVE one (aggregate NULL-skip parity)
- a duplicate s_name and an empty-string s_name (set ops over names:
  UNION/EXCEPT distinct semantics with duplicates and '')

Two assertions per entry, identical to the other nets: the Spark plan
executes, and where oracle SQL exists both engines agree."""

from __future__ import annotations

import re
import shutil

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import assert_entry_matches
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

DEGENERATE_SUPPLIERS = [
    # (s_suppkey, s_name, s_nationkey, s_acctbal)
    (0, "Supplier#000000000", 0, 1000.0),
    (1, "", 999, None),  # empty name, dangling nationkey, NULL balance
    (2, "Supplier#000000000", 1, -500.0),  # duplicate name, negative
    (3, "acme", None, 0.0),  # NULL nationkey, zero balance
    # r8 NULL-measure probe: NULL name — distinct from the empty string
    # above for sorts (Spark NULLS FIRST vs DuckDB NULLS LAST), LIKE
    # predicates (not-true, dropped identically), and group-bys (a real
    # group, kept identically)
    (4, None, 2, 250.0),
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """sf0.001 with supplier.parquet swapped for the degenerate corpus."""
    d = tmp_path_factory.mktemp("degen_supplier")
    for name in TABLES:
        if name != "supplier":
            shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*DEGENERATE_SUPPLIERS))
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(cols[0], pa.int64()),
                "s_name": pa.array(cols[1], pa.string()),
                "s_nationkey": pa.array(cols[2], pa.int32()),
                "s_acctbal": pa.array(cols[3], pa.float64()),
            }
        ),
        str(d / "supplier.parquet"),
    )
    return str(d)


def _supplier_entries():
    return sorted(
        name
        for name, e in CATALOG.items()
        if e.sql is not None and re.search(r"\bsupplier\b", e.sql, re.I)
    )


@pytest.mark.parametrize("name", _supplier_entries())
def test_entry_survives_degenerate_suppliers(spark, degen_dir, name):
    assert_entry_matches(spark, name, degen_dir, "degenerate suppliers")
