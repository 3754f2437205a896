"""Seeded random-corpus fuzz for the dimension tables — customer,
supplier, and part randomized TOGETHER (real orders/lineitem/nation/
region kept), pointed at every catalog entry whose oracle touches any
of the three. The recipe's fourth net: orders/lineitem (r8), events
(r8), documents (r9) covered the fact and corpus sides; this one
attacks the DIM side, whose hazard surface is JOIN/ORDER identity:

- dangling and NULL nationkeys through the nation/region join chains
  (q5/q7/q8 must drop them identically, never NPE);
- duplicate, empty, and NULL names through sorts, set ops, and the
  q2 top-K total order;
- tie-heavy acctbal (incl. the binary-half 128.125 and exact
  duplicates) through rank statistics and ORDER BY ... LIMIT;
- off-enum and NULL segments/types/brands through CASE-IN pivots and
  literal filters — the filter constants (BUILDING, SMALL, PROMO,
  Brand#1, Brand#4) are IN the pools so the filtered paths do real
  work instead of going empty;
- sparse suppliers/parts so a large share of lineitem FKs dangle.

Entry list = union of the three degenerate nets' selectors, so the
sweeps can never drift apart. Seeds are FIXED — failures reproduce."""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from degen_util import assert_entry_matches
from test_degenerate_customer import _customer_entries
from test_degenerate_part import _part_entries
from test_degenerate_supplier import _supplier_entries
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

_ACCTBALS = [0.0, -500.0, 128.125, 128.125, 1000.0, 9999.99, None]
_NATIONS = list(range(31)) + [999, None]  # 31 real, one dangling, NULL
_SEGMENTS = ["BUILDING", "BUILDING", "FURNITURE", "MACHINERY", "weird", "", None]
_TYPES = ["SMALL", "SMALL", "PROMO", "ECONOMY", "MEDIUM", "LARGE", "", None]
_BRANDS = ["Brand#1", "Brand#4", "Brand#13", "Brand#13", "", None]
_NAMES = ["alpha", "alpha", "Supplier#000000000", "", None]
_SIZES = [1, 1, 5, 50, None]
_PRICES = [0.0, 50.5, 128.125, 128.125, 901.0, None]


def _pick(rng: np.random.RandomState, pool, n):
    return [pool[i] for i in rng.randint(0, len(pool), n)]


def _keys(rng: np.random.RandomState, n: int):
    """Unique-or-NULL primary keys (PK contract, as in the other nets)."""
    return [
        None if rng.rand() < 0.05 else int(k) for k in rng.permutation(n)
    ]


def _build_corpus(seed: int, d: str) -> None:
    rng = np.random.RandomState(seed)
    n_cust, n_supp, n_part = 120, 12, 150
    customer = pa.table(
        {
            "c_custkey": pa.array(_keys(rng, n_cust), pa.int64()),
            "c_name": pa.array(_pick(rng, _NAMES, n_cust), pa.string()),
            "c_nationkey": pa.array(
                [
                    None if v is None else int(v)
                    for v in _pick(rng, _NATIONS, n_cust)
                ],
                pa.int64(),
            ),
            "c_acctbal": pa.array(_pick(rng, _ACCTBALS, n_cust), pa.float64()),
            "c_mktsegment": pa.array(
                _pick(rng, _SEGMENTS, n_cust), pa.string()
            ),
        }
    )
    supplier = pa.table(
        {
            # sparse keys: real sf0.001 lineitem has l_suppkey 0-9, so a
            # 12-key permutation with NULL holes leaves some FKs dangling
            "s_suppkey": pa.array(_keys(rng, n_supp), pa.int64()),
            "s_name": pa.array(_pick(rng, _NAMES, n_supp), pa.string()),
            "s_nationkey": pa.array(
                [
                    None if v is None else int(v)
                    for v in _pick(rng, _NATIONS, n_supp)
                ],
                pa.int64(),
            ),
            "s_acctbal": pa.array(_pick(rng, _ACCTBALS, n_supp), pa.float64()),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(_keys(rng, n_part), pa.int64()),
            "p_name": pa.array(_pick(rng, _NAMES, n_part), pa.string()),
            "p_brand": pa.array(_pick(rng, _BRANDS, n_part), pa.string()),
            "p_type": pa.array(_pick(rng, _TYPES, n_part), pa.string()),
            "p_size": pa.array(
                [None if v is None else int(v) for v in _pick(rng, _SIZES, n_part)],
                pa.int64(),
            ),
            "p_retailprice": pa.array(
                _pick(rng, _PRICES, n_part), pa.float64()
            ),
        }
    )
    fuzzed = {"customer": customer, "supplier": supplier, "part": part}
    for name in TABLES:
        if name in fuzzed:
            pq.write_table(fuzzed[name], f"{d}/{name}.parquet")
        else:
            shutil.copy(f"{REAL_SF}/{name}.parquet", f"{d}/{name}.parquet")


def _dim_entries():
    return sorted(
        set(_customer_entries()) | set(_supplier_entries()) | set(_part_entries())
    )


@pytest.fixture(scope="module", params=[31, 4096])
def fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzz_dims_{request.param}")
    _build_corpus(request.param, str(d))
    return str(d)


@pytest.mark.parametrize("name", _dim_entries())
def test_dims_entry_survives_random_corpus(spark, fuzz_dir, name):
    assert_entry_matches(spark, name, fuzz_dir, "random dims corpus")
