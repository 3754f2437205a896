"""Degenerate-input sweep over every lineitem-consuming catalog entry
(completes the fact side of the per-table nets).

The synthetic lineitem is too well-behaved — quantities 1..50,
discounts 0..0.1, every orderkey resolvable, multi-line orders
everywhere. This corpus makes the risky paths execute:

- a ZERO extendedprice and a zero-revenue line (discount = 1.0):
  revenue ratios, Gini/Pareto folds, histogram bin 0
- discount exactly 0 and exactly 1 (the [lo, hi] BETWEEN boundaries
  of Q6-style predicates)
- a dangling l_orderkey (order joins drop it; RI audit counts it)
- one single-line order and one 5-line order (per-order aggregates at
  both extremes)
- duplicate (orderkey, partkey) with different line numbers
- a quantity far above the synthetic range (top-k/argmax/skyline tie
  paths, decorrelated-average cross-multiplications)
- all lines of one order shipped the same midnight timestamp (ties in
  every date window)

Two assertions per entry, identical to the other nets."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import assert_entry_matches
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

_TS = dt.datetime

DEGENERATE_LINEITEM = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    #  l_shipdate)
    (1, 1, 1, 1, 1.0, 0.0, 0.0, 0.0, "N", "O", _TS(2000, 1, 2)),  # zero price
    (1, 2, 1, 2, 5.0, 1000.0, 1.0, 0.05, "R", "F", _TS(2000, 1, 2)),  # disc=1
    (1, 2, 2, 3, 5.0, 1000.0, 0.0, 0.0, "A", "F", _TS(2000, 1, 2)),  # dup pk
    (1, 3, 2, 4, 500.0, 99999.99, 0.05, 0.08, "N", "O", _TS(2000, 1, 2)),
    (1, 4, 3, 5, 2.0, 50.5, 0.1, 0.0, "R", "O", _TS(2000, 1, 2)),
    (2, 1, 1, 1, 10.0, 500.0, 0.04, 0.02, "N", "O", _TS(2000, 3, 15)),
    (999999, 1, 1, 1, 3.0, 77.7, 0.06, 0.01, "A", "F", _TS(2000, 6, 1)),
    # two NULL-orderkey lines with distinct partkeys: a NULL key must
    # never form a "basket of unknowns" — SQL a = b drops NULLs, so any
    # groupBy-based co-occurrence (graph_triangles' basket rewrite) must
    # filter NULL keys or it invents a (1,4) co-order edge the oracle
    # never sees
    (None, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _TS(2000, 7, 1)),
    (None, 4, 2, 2, 1.0, 20.0, 0.0, 0.0, "N", "O", _TS(2000, 7, 1)),
    # r8 NULL-measure wave: every measure/dimension column nullable once.
    # sum/min/avg skip NULLs identically on both engines, but derived
    # expressions (units = cents*(100-disc)), NULL sort keys under
    # LIMIT/windows (Spark NULLS FIRST vs DuckDB NULLS LAST), date
    # functions over NULL, and count(*)-vs-count(col) denominators are
    # exactly where cross-engine divergence hides.
    (3, 5, 3, 1, None, 100.0, 0.02, 0.01, "N", "O", _TS(2000, 2, 2)),
    (3, 6, 3, 2, 4.0, None, 0.02, 0.01, "A", "F", _TS(2000, 2, 2)),
    (3, 7, 1, 3, 4.0, 200.0, None, 0.03, "R", "O", _TS(2000, 2, 3)),
    (4, 1, 2, 1, 2.0, 300.0, 0.05, None, "N", "F", _TS(2000, 4, 9)),
    (4, 2, 2, 2, 1.0, 50.0, 0.0, 0.0, None, None, _TS(2000, 4, 9)),
    (5, 3, 3, 1, 3.0, 75.0, 0.01, 0.02, "N", "O", None),
    (5, 4, 1, None, 2.0, 60.0, 0.03, 0.0, "A", "F", _TS(2000, 5, 5)),
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """sf0.001 with lineitem.parquet swapped for the degenerate corpus."""
    d = tmp_path_factory.mktemp("degen_lineitem")
    for name in TABLES:
        if name != "lineitem":
            shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*DEGENERATE_LINEITEM))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(cols[0], pa.int64()),
                "l_partkey": pa.array(cols[1], pa.int64()),
                "l_suppkey": pa.array(cols[2], pa.int64()),
                "l_linenumber": pa.array(cols[3], pa.int32()),
                "l_quantity": pa.array(cols[4], pa.float64()),
                "l_extendedprice": pa.array(cols[5], pa.float64()),
                "l_discount": pa.array(cols[6], pa.float64()),
                "l_tax": pa.array(cols[7], pa.float64()),
                "l_returnflag": pa.array(cols[8], pa.string()),
                "l_linestatus": pa.array(cols[9], pa.string()),
                "l_shipdate": pa.array(cols[10], pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


def _lineitem_entries():
    return sorted(
        name
        for name, e in CATALOG.items()
        if e.sql is not None and "lineitem" in e.sql.lower()
    )


@pytest.mark.parametrize("name", _lineitem_entries())
def test_entry_survives_degenerate_lineitem(spark, degen_dir, name):
    assert_entry_matches(spark, name, degen_dir, "degenerate lineitem")
