"""Semantic invariants for the round-8 TPC-H completion batch —
brute-force recomputation in plain Python from the raw rows (no code
shared with the Spark or DuckDB forms), mirroring test_r7b_entries.

The six entries close the 22-query family: Q1 faithful, Q2/Q11/Q12/
Q16/Q20 adapted for the schema's missing partsupp / shipmode columns
(catalog_r8 module docstring documents each adaptation)."""

from __future__ import annotations

from collections import defaultdict

from data_engineering_project_capstone_spark.plans.catalog import CATALOG, t
from data_engineering_project_capstone_spark.plans.catalog_r8 import (
    _Q1_CUT,
    _Q2_REGION,
    _Q2_TYPE,
    _Q11_FRAC_DEN,
    _Q11_NATION,
    _Q12_FAST,
    _Q12_REG,
    _Q12_YEAR,
    _Q16_EXCL_BRAND,
    _Q16_EXCL_TYPE_PREFIX,
    _Q16_SIZES,
    _Q20_NAME_PREFIX,
    _Q20_NATION,
    _Q20_YEAR,
)

SF = "/root/testdata/sf0.001"


def _r(x: float) -> int:
    """Round half AWAY from zero — what BOTH engines do for doubles
    (pinned by test_scalar_edges::test_round_half_parity_with_duckdb).
    Python's round() is banker's (HALF_EVEN) and would diverge from
    both engines on exactly-representable .5 inputs like 128.125·100."""
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _li(spark):
    return [
        (
            r["l_orderkey"],
            r["l_partkey"],
            r["l_suppkey"],
            r["l_quantity"],
            r["l_extendedprice"],
            _r(r["l_discount"] * 100),
            _r(r["l_tax"] * 100),
            r["l_returnflag"],
            r["l_linestatus"],
            r["l_shipdate"].date(),
        )
        for r in t(spark, SF, "lineitem").collect()
    ]


def _dims(spark):
    nation = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in t(spark, SF, "nation").collect()
    }
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in t(spark, SF, "region").collect()
    }
    supplier = {
        r["s_suppkey"]: (r["s_name"], r["s_nationkey"], r["s_acctbal"])
        for r in t(spark, SF, "supplier").collect()
    }
    part = {
        r["p_partkey"]: (
            r["p_name"],
            r["p_brand"],
            r["p_type"],
            r["p_size"],
        )
        for r in t(spark, SF, "part").collect()
    }
    return nation, region, supplier, part


def test_q1_pricing_summary_matches_bruteforce(spark):
    import datetime as dt
    import math

    def ieee(x: float, scale: int = 2) -> float:
        # the exact readout op both engine forms apply (floor(x·m+0.5)/m
        # on IEEE doubles) — Python doubles run the identical ops, so
        # every derived column is asserted EXACTLY equal, not within a
        # tolerance that could hide a sub-50-cent fold bug
        m = float(10**scale)
        return math.floor(x * m + 0.5) / m

    cut = dt.date.fromisoformat(_Q1_CUT)
    acc: dict[tuple, list] = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for ok, pk, sk, qty, price, disc, tax, rf, ls, ship in _li(spark):
        if ship > cut:
            continue
        cents = _r(price * 100)
        du = cents * (100 - disc)
        a = acc[(rf, ls)]
        a[0] += _r(qty)
        a[1] += cents
        a[2] += du
        a[3] += du * (100 + tax)
        a[4] += disc
        a[5] += 1
    rows = CATALOG["q1_pricing_summary"].spark_fn(spark, SF).collect()
    assert len(rows) == len(acc)
    for r in rows:
        a = acc[(r["l_returnflag"], r["l_linestatus"])]
        assert r["sum_qty"] == a[0]
        assert r["count_order"] == a[5]
        n = a[5]
        assert r["sum_base_price"] == ieee(a[1] / 100.0)
        assert r["sum_disc_price"] == ieee(a[2] / 10000.0)
        assert r["sum_charge"] == ieee(a[3] / 1000000.0)
        assert r["avg_qty"] == ieee(a[0] / n)
        assert r["avg_price"] == ieee(a[1] / 100.0 / n)
        assert r["avg_disc"] == ieee(a[4] / 100.0 / n, 4)


def test_q2_rows_are_regional_minima(spark):
    nation, region, supplier, part = _dims(spark)
    # min observed unit cost per (part, supplier), EUROPE + SMALL scope
    cost: dict[tuple, float] = {}
    for ok, pk, sk, qty, price, *_ in _li(spark):
        if qty is None or qty <= 0 or pk not in part or sk not in supplier:
            continue
        if part[pk][2] != _Q2_TYPE:
            continue
        nk = supplier[sk][1]
        if nk not in nation or region.get(nation[nk][1]) != _Q2_REGION:
            continue
        c = _r(price * 100) / qty
        k = (pk, sk)
        cost[k] = min(cost.get(k, c), c)
    per_part_min: dict[int, float] = {}
    for (pk, sk), c in cost.items():
        per_part_min[pk] = min(per_part_min.get(pk, c), c)
    rows = CATALOG["q2_min_cost_supplier"].spark_fn(spark, SF).collect()
    assert rows, "Q2 scope empty at sf0.001 — widen the predicate"
    for r in rows:
        k = (r["p_partkey"], r["s_suppkey"])
        assert k in cost, f"row {k} not an observed supply pair in scope"
        assert cost[k] == per_part_min[r["p_partkey"]], (
            f"{k}: cost {cost[k]} is not the part minimum "
            f"{per_part_min[r['p_partkey']]}"
        )


def test_q11_threshold_is_exact(spark):
    nation, region, supplier, part = _dims(spark)
    scope = {
        sk
        for sk, (_, nk, _) in supplier.items()
        if nk in nation and nation[nk][0] == _Q11_NATION
    }
    per_part: dict[int, int] = defaultdict(int)
    for ok, pk, sk, qty, price, disc, *_ in _li(spark):
        if sk in scope:
            per_part[pk] += _r(price * 100) * (100 - disc)
    tot = sum(per_part.values())
    want = {pk for pk, v in per_part.items() if v * _Q11_FRAC_DEN > tot}
    got = {
        r["p_partkey"]
        for r in CATALOG["q11_important_share"].spark_fn(spark, SF).collect()
    }
    assert got == want


def test_q12_band_counts(spark):
    orders = {
        r["o_orderkey"]: (r["o_orderpriority"], r["o_orderdate"].date())
        for r in t(spark, SF, "orders").collect()
    }
    acc: dict[str, list] = defaultdict(lambda: [0, 0])
    for ok, pk, sk, qty, price, disc, tax, rf, ls, ship in _li(spark):
        if ship.year != _Q12_YEAR or ok not in orders:
            continue
        prio, od = orders[ok]
        delay = (ship - od).days
        band = (
            "FAST"
            if delay <= _Q12_FAST
            else ("REGULAR" if delay <= _Q12_REG else "SLOW")
        )
        hi = prio in ("1-URGENT", "2-HIGH")
        acc[band][0 if hi else 1] += 1
    rows = CATALOG["q12_priority_lateness"].spark_fn(spark, SF).collect()
    got = {
        r["delay_band"]: (r["high_line_count"], r["low_line_count"])
        for r in rows
    }
    assert got == {b: (h, lo) for b, (h, lo) in acc.items()}


def test_q16_distinct_supplier_counts(spark):
    nation, region, supplier, part = _dims(spark)
    excl = {sk for sk, (_, _, bal) in supplier.items() if bal is not None and bal < 0}
    per_triple: dict[tuple, set] = defaultdict(set)
    pairs = {(pk, sk) for ok, pk, sk, *_ in _li(spark)}
    for pk, sk in pairs:
        if sk in excl or pk not in part:
            continue
        _, brand, ptype, size = part[pk]
        if (
            brand == _Q16_EXCL_BRAND
            or brand is None
            or ptype is None
            or (ptype or "").startswith(_Q16_EXCL_TYPE_PREFIX)
            or size not in _Q16_SIZES
        ):
            continue
        per_triple[(brand, ptype, size)].add(sk)
    rows = CATALOG["q16_supplier_part_counts"].spark_fn(spark, SF).collect()
    got = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in rows
    }
    assert got == {k: len(v) for k, v in per_triple.items()}


def test_q20_half_volume_set(spark):
    nation, region, supplier, part = _dims(spark)
    nat_sup = {
        sk
        for sk, (_, nk, _) in supplier.items()
        if nk in nation and nation[nk][0] == _Q20_NATION
    }
    per_ps: dict[tuple, int] = defaultdict(int)
    for ok, pk, sk, qty, price, disc, tax, rf, ls, ship in _li(spark):
        if ship.year != _Q20_YEAR or pk not in part:
            continue
        name = part[pk][0]
        if name is None or not name.startswith(_Q20_NAME_PREFIX):
            continue
        per_ps[(pk, sk)] += _r(qty)
    per_p: dict[int, int] = defaultdict(int)
    for (pk, sk), q in per_ps.items():
        per_p[pk] += q
    want = {
        sk
        for (pk, sk), q in per_ps.items()
        if 2 * q > per_p[pk] and sk in nat_sup
    }
    got = {
        r["s_suppkey"]
        for r in CATALOG["q20_volume_share_suppliers"]
        .spark_fn(spark, SF)
        .collect()
    }
    assert got == want
