"""Degenerate-input sweep over every nation/region-consuming entry —
the LAST two tables without a net (docs / events / embeddings / orders /
customer / lineitem / part / supplier all have one). The synthetic dims
are perfectly clean enums; this corpus makes the dim-side risky paths
execute:

- only FIVE nations (n_nationkey 0-4), so most customer/supplier
  nationkeys (0-24) dangle: the flagship star joins drop most of both
  dims; RI audit counts the orphans
- a NULL n_name and an empty-string n_name — the flagship queries GROUP
  BY n_name, so NULL must form its own group identically on both engines
- a DUPLICATE n_name across distinct nationkeys — grouping by name now
  merges two keys (the classic name-vs-key grain bug; both engines must
  agree, and any per-name aggregate must merge the same way)
- a dangling n_regionkey (999) and a NULL one — nation→region joins drop
- a duplicate r_name across regionkeys (region-name grouping merges)

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

DEGENERATE_NATIONS = [
    # (n_nationkey, n_name, n_regionkey)
    (0, "NATION_0", 0),
    (1, None, 1),  # NULL name
    (2, "NATION_0", 2),  # duplicate name, different key
    (3, "NATION_3", 999),  # dangling regionkey
    (4, "", None),  # empty name, NULL regionkey
]

DEGENERATE_REGIONS = [
    # (r_regionkey, r_name)
    (0, "AFRICA"),
    (1, "AMERICA"),
    (2, "AFRICA"),  # duplicate region name
]


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """sf0.001 with nation+region swapped for the degenerate corpora."""
    d = tmp_path_factory.mktemp("degen_nation_region")
    for name in TABLES:
        if name not in ("nation", "region"):
            shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    ncols = list(zip(*DEGENERATE_NATIONS))
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(ncols[0], pa.int64()),
                "n_name": pa.array(ncols[1], pa.string()),
                "n_regionkey": pa.array(ncols[2], pa.int64()),
            }
        ),
        str(d / "nation.parquet"),
    )
    rcols = list(zip(*DEGENERATE_REGIONS))
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(rcols[0], pa.int64()),
                "r_name": pa.array(rcols[1], pa.string()),
            }
        ),
        str(d / "region.parquet"),
    )
    return str(d)


def _nation_region_entries():
    return sorted(
        name
        for name, e in CATALOG.items()
        if e.sql is not None
        and re.search(r"\bnation\b|\bregion\b", e.sql, re.I)
    )


@pytest.mark.parametrize("name", _nation_region_entries())
def test_entry_survives_degenerate_dims(spark, degen_dir, name):
    assert_entry_matches(spark, name, degen_dir, "degenerate nation/region")
