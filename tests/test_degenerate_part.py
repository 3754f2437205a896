"""Degenerate-input sweep over every part-consuming catalog entry.

Completes the per-table robustness nets (docs / events / embeddings /
orders / customer / lineitem): the synthetic parts are too
well-behaved — every name two lowercase tokens, every brand
'Brand#<n>', every price positive, every size in range. This corpus
makes the risky paths execute:

- only EIGHT parts (p_partkey 0-7), so most lineitem l_partkey (0-199)
  dangle: inner part joins drop ~96% of the fact, RI audit counts it
- a NULL p_name (string functions / LIKE / ER blocking over NULL)
- an empty-string p_name and a SINGLE-TOKEN p_name — the classic
  ANSI-mode hazard: a name split that assumes two tokens must yield
  NULL for the missing noun, not an array-index exception
- a duplicate p_name across distinct partkeys (fuzzy pairs / ER mass)
- NULL p_size and NULL p_retailprice (pareto skyline RANGE frame over
  a NULL sort key is engine-divergent — the entries must exclude it
  explicitly), plus zero and NEGATIVE price/size
- brand/type strings outside the enum ('B', '', 'Brand#00') so the
  q17/q19 brand filters shrink to 1-2 keys and promo ratios hit
  CASE-ELSE-only groups

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

DEGENERATE_PARTS = [
    # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    (0, "cold widget", "Brand#4", "PROMO", 5, 900.0),
    (1, None, "Brand#19", "ECONOMY", 20, 100.5),  # NULL name
    (2, "", "Brand#2", "", 30, 0.0),  # empty name/type, zero price
    (3, "widget", "B", "PROMO", None, None),  # 1 token, NULL size+price
    (4, "cold widget", "Brand#4", "STANDARD", -3, -12.34),  # dup name, negatives
    (5, "red gadget fine", "Brand#19", "PROMO", 10, 900.0),  # 3 tokens, %red%
    (6, "deluxe red widget", "Brand#00", "ECONOMY", 50, 1.0e7),  # huge price
    # NULL price with the SMALLEST size: the pareto_skyline probe — a
    # NULL sort key lands in every Spark prefix RANGE frame (NULLS
    # FIRST) but in none of DuckDB's (NULLS LAST); both entries must
    # exclude NULL axes explicitly or this row empties the Spark skyline
    (7, "tiny bolt", "Brand#7", "PROMO", 1, None),
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """sf0.001 with part.parquet swapped for the degenerate corpus."""
    d = tmp_path_factory.mktemp("degen_part")
    for name in TABLES:
        if name != "part":
            shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*DEGENERATE_PARTS))
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(cols[0], pa.int64()),
                "p_name": pa.array(cols[1], pa.string()),
                "p_brand": pa.array(cols[2], pa.string()),
                "p_type": pa.array(cols[3], pa.string()),
                "p_size": pa.array(cols[4], pa.int32()),
                "p_retailprice": pa.array(cols[5], pa.float64()),
            }
        ),
        str(d / "part.parquet"),
    )
    return str(d)


def _part_entries():
    # \bpart\b: the table name only — NOT 'partition', 'l_partkey',
    # 'p_partkey' (underscore is a word char, so no boundary inside them)
    return sorted(
        name
        for name, e in CATALOG.items()
        if e.sql is not None and re.search(r"\bpart\b", e.sql, re.I)
    )


@pytest.mark.parametrize("name", _part_entries())
def test_entry_survives_degenerate_parts(spark, degen_dir, name):
    assert_entry_matches(spark, name, degen_dir, "degenerate parts")
