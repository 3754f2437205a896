"""Seeded random-corpus differential fuzz — the breadth complement to
the hand-built per-table degenerate nets.

The degenerate corpora encode KNOWN hazard classes one row at a time
(NULL keys, NULL measures, boundary discounts, dangling FKs). This net
generates whole random orders+lineitem corpora from small, tie-heavy
value domains with NULLs sprinkled into every column, and re-runs the
most divergence-prone catalog entries (window frames, rank statistics,
quantiles, mode ties, the TPC-H closers) Spark-vs-DuckDB on each.
Random TIE PATTERNS are the point: a hand-built corpus places one tie
where the author expects trouble; a random corpus places hundreds
where nobody looked. Seeds are FIXED (deterministic corpora, no
Hypothesis shrinking cost) — a failure reproduces exactly.

Value domains deliberately include 128.125 (scaled value exactly .5 in
binary — the round-half case pinned in test_scalar_edges), discount
exactly 0 and 1, zero and huge quantities, three clustered dates plus
NULL, and off-enum/NULL priorities and statuses.
"""

from __future__ import annotations

import datetime as dt
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from degen_util import assert_entry_matches
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

# the divergence-prone set: every family that has EVER produced a
# cross-engine divergence in a degenerate net, plus the r8 closers
ENTRIES = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q14_promo_revenue",  # r9: zero-denominator guard (try_divide) pinned
    "q11_important_share",
    "q12_priority_lateness",
    "q16_supplier_part_counts",
    "q20_volume_share_suppliers",
    "window_running_sum",
    "window_lag_lead",
    "window_moving_avg",
    "window_value_functions",
    "agg_modes",
    "cusum_drift",
    "priority_mix_shift",
    "two_phase_quantiles",
    "weighted_median",
    "price_histogram",
    "orders_gini",
    "mann_whitney_u",
    "ks_two_sample",
    "welch_ttest",
    "spearman_corr",
    "orders_acf",
    "dedup_first_wins",
    "topk_per_group",
    "surrogate_ids",
    "agg_string_concat",
]

_PRICES = [0.0, 50.5, 99.99, 128.125, 128.125, 1000.0, None]
_DISCS = [0.0, 0.0, 0.005, 0.05, 0.5, 1.0, None]
_TAXES = [0.0, 0.02, 0.08, None]
_QTYS = [0.0, 1.0, 1.0, 5.0, 50.0, 500.0]
_DATES = [
    dt.datetime(2000, 1, 2),
    dt.datetime(2000, 1, 2),  # heavy ties on one day
    dt.datetime(2000, 1, 31),
    dt.datetime(2000, 2, 1),  # month rollover
    dt.datetime(2001, 12, 31),
    None,
]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
          "", None]
_STATUSES = ["O", "F", "P", None]
_FLAGS = ["N", "R", "A", None]
_LINESTATUS = ["O", "F", None]


def _pick(rng: np.random.RandomState, pool, n):
    return [pool[i] for i in rng.randint(0, len(pool), n)]


def _build_corpus(seed: int, d: str) -> None:
    rng = np.random.RandomState(seed)
    n_orders, n_lines = 120, 300
    # order keys: UNIQUE small ints (o_orderkey is the table's primary
    # key — duplicate PKs make per-(date,key)-ordered windows genuinely
    # undefined, not merely engine-divergent), ~5% replaced by NULL
    base_keys = rng.permutation(n_orders)
    okeys = [
        None if rng.rand() < 0.05 else int(k) for k in base_keys
    ]
    orders = pa.table(
        {
            "o_orderkey": pa.array(okeys, pa.int64()),
            "o_custkey": pa.array(
                [
                    None if rng.rand() < 0.05 else int(c)
                    for c in rng.randint(0, 25, n_orders)
                ],
                pa.int64(),
            ),
            "o_orderstatus": pa.array(
                _pick(rng, _STATUSES, n_orders), pa.string()
            ),
            "o_totalprice": pa.array(
                _pick(rng, _PRICES, n_orders), pa.float64()
            ),
            "o_orderdate": pa.array(
                _pick(rng, _DATES, n_orders), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                _pick(rng, _PRIOS, n_orders), pa.string()
            ),
        }
    )
    lkeys = [
        None if rng.rand() < 0.05 else int(k)
        # mostly resolvable, some dangling (>= n_orders)
        for k in rng.randint(0, n_orders + 20, n_lines)
    ]
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(lkeys, pa.int64()),
            "l_partkey": pa.array(
                [int(p) for p in rng.randint(0, 200, n_lines)], pa.int64()
            ),
            "l_suppkey": pa.array(
                [int(s) for s in rng.randint(0, 10, n_lines)], pa.int64()
            ),
            "l_linenumber": pa.array(
                [int(i) for i in rng.randint(1, 8, n_lines)], pa.int32()
            ),
            "l_quantity": pa.array(_pick(rng, _QTYS, n_lines), pa.float64()),
            "l_extendedprice": pa.array(
                _pick(rng, _PRICES, n_lines), pa.float64()
            ),
            "l_discount": pa.array(_pick(rng, _DISCS, n_lines), pa.float64()),
            "l_tax": pa.array(_pick(rng, _TAXES, n_lines), pa.float64()),
            "l_returnflag": pa.array(_pick(rng, _FLAGS, n_lines), pa.string()),
            "l_linestatus": pa.array(
                _pick(rng, _LINESTATUS, n_lines), pa.string()
            ),
            "l_shipdate": pa.array(
                _pick(rng, _DATES, n_lines), pa.timestamp("us")
            ),
        }
    )
    for name in TABLES:
        if name not in ("orders", "lineitem"):
            shutil.copy(f"{REAL_SF}/{name}.parquet", f"{d}/{name}.parquet")
    pq.write_table(orders, f"{d}/orders.parquet")
    pq.write_table(lineitem, f"{d}/lineitem.parquet")


@pytest.fixture(scope="module", params=[7, 1912])
def fuzz_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"fuzz_{request.param}")
    _build_corpus(request.param, str(d))
    return str(d)


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_survives_random_corpus(spark, fuzz_dir, name):
    assert_entry_matches(spark, name, fuzz_dir, "random fuzz corpus")
