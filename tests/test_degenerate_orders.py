"""Degenerate-input sweep over every orders-consuming catalog entry.

Same rationale as the docs/events/embeddings nets: the synthetic orders
are too well-behaved (uniform dates, positive prices, dense calendar,
perfect referential integrity), so the paths that bite in production —
division by a zero price, December→January month rollover, calendar
gaps under lag/spine logic, midnight-vs-midday timestamp truncation,
an o_custkey that references no customer — never execute. This corpus
makes each of them execute:

- a ZERO price (ratio/log/bin paths)
- year-boundary dates (1999-12-31 → 2000-01-01: the mon+89 December
  rollover used by psi_price_drift and the month-spine family)
- a non-midnight timestamp (to_date vs CAST-AS-DATE truncation parity)
- five same-day orders with TWO tied prices (rank/tie paths)
- a missing month between observations (lag/gapfill under gaps)
- an o_custkey with no matching customer (RI-violation join paths)
- a single-order month (windows over n=1)

Two assertions per entry, identical to the docs net: the Spark plan
executes, and where oracle SQL exists both engines still agree."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import assert_entry_matches
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

_TS = dt.datetime

DEGENERATE_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    #  o_orderpriority)
    (1, 1, "O", 0.0, _TS(1999, 12, 31), "1-URGENT"),  # zero price, Dec 31
    (2, 2, "F", 123.45, _TS(2000, 1, 1), "2-HIGH"),  # rollover month
    (3, 999999, "O", 99999.99, _TS(2000, 1, 1), "3-MEDIUM"),  # bad FK
    (4, 1, "O", 50.0, _TS(2000, 1, 2), "4-NOT SPECIFIED"),
    (5, 1, "F", 50.0, _TS(2000, 1, 2), "5-LOW"),  # tied price, same day
    (6, 2, "P", 75.5, _TS(2000, 1, 2), "1-URGENT"),
    (7, 3, "O", 10.0, _TS(2000, 1, 2), "2-HIGH"),
    (8, 2, "O", 20.0, _TS(2000, 1, 2, 12, 34, 56), "3-MEDIUM"),  # midday
    (9, 3, "P", 55.55, _TS(2000, 3, 15), "5-LOW"),  # gap month (no Feb)
    # r8 NULL-key probes: an anonymous order (NULL custkey — customer
    # joins must drop it on BOTH engines, never NPE or invent a group
    # via a NULL-unsafe rejoin) and a keyless order (NULL orderkey —
    # lineitem joins drop it; id-ordered ops must not give it a position)
    (10, None, "O", 33.0, _TS(2000, 1, 3), "2-HIGH"),
    (None, 2, "O", 44.0, _TS(2000, 1, 3), "3-MEDIUM"),
    # r8 NULL-measure wave (the key probes above cover NULL keys; these
    # cover NULL values): NULL totalprice through revenue aggs and
    # quantile/histogram paths, NULL orderdate through date windows,
    # cohort months, streaks, and any date sort (Spark NULLS FIRST vs
    # DuckDB NULLS LAST is the classic divergence), NULL priority
    # through CASE-IN pivots (must land in ELSE on both engines), and
    # NULL status through group-bys (a real group, kept identically).
    (11, 3, "O", None, _TS(2000, 2, 7), "4-NOT SPECIFIED"),
    (12, 1, None, 66.0, _TS(2000, 2, 8), "5-LOW"),
    (13, 2, "F", 77.0, None, "1-URGENT"),
    (14, 3, "O", 88.0, _TS(2000, 2, 9), None),
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """sf0.001 with orders.parquet swapped for the degenerate corpus."""
    d = tmp_path_factory.mktemp("degen_orders")
    for name in TABLES:
        if name != "orders":
            shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*DEGENERATE_ORDERS))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(cols[0], pa.int64()),
                "o_custkey": pa.array(cols[1], pa.int64()),
                "o_orderstatus": pa.array(cols[2], pa.string()),
                "o_totalprice": pa.array(cols[3], pa.float64()),
                "o_orderdate": pa.array(cols[4], pa.timestamp("us")),
                "o_orderpriority": pa.array(cols[5], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


def _orders_entries():
    return sorted(
        name
        for name, e in CATALOG.items()
        if e.sql is not None and "orders" in e.sql.lower()
    )


@pytest.mark.parametrize("name", _orders_entries())
def test_entry_survives_degenerate_orders(spark, degen_dir, name):
    assert_entry_matches(spark, name, degen_dir, "degenerate orders")
