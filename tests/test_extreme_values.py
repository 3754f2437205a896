"""Extreme-value corpora against the DECIMAL(38,0) fold inventory
(SCALE.md "Integer-fold overflow policy"; round-10 verdict ask #7b).

The exact-money idiom's whole reason to exist is the regime where an
int64 fold would wrap — group sums past 2^63 — but every prior net runs
at TPC-H magnitudes (prices ≤ 1e5), where int64 never comes close. These
corpora push the money columns to the documented envelope edges and
require the two engines' 128-bit paths (Spark DECIMAL(38,0) vs DuckDB
HUGEINT) to agree EXACTLY:

The corpora are the FULL sf0.001 tables with every money column
rewritten to a cyclic 6-value magnitude pattern (r14 — the original
6-row-slice corpora left most of the unit-fold inventory VACUOUS:
probed live, q5/q7/q8/q9/q11/orders_acf returned zero rows and
q14/mann_whitney_u all-NULL rows at bigmoney because six rows of each
table share almost no join keys and miss every date window; a value
assertion that compares empty sets pins nothing). With the real join
topology every entry except q11 (empty at sf0.001 on REAL money too —
238 rows at sf0.01; a base-corpus scale artifact, not a money issue)
now folds thousands of extreme-magnitude rows.

- ``bigmoney``: prices ±2^43 (cents = 2^43·100 ≈ 8.8e14, exact in
  double: 25·2^45). Per-row charge units cents·(100−disc)·(100+tax)
  with disc=tax=0 are ≈ 8.8e18 — inside int64 (the per-row contract:
  Spark's unit multiply runs in LONG before the decimal cast) — while
  GROUP SUMS over the full corpus reach ~10^19-10^22, exceeding int64
  by up to four orders: exactly the sums the DECIMAL(38,0) fold was
  adopted for. Every 4th pattern value is negative, probing the ±
  sign envelope and keeping sums from telescoping.
- ``maxcents``: prices ±2^56 (cents = 2^56·100 ≈ 7.2e18, the int64
  EDGE — within 22% of 2^63−1, still an exact double: 25·2^58). Only
  orders_acf runs the VALUE-parity assertion here: it is the one
  entry of the inventory whose EVERY cents-touching step is an
  operand-cast decimal fold. The other 14 were re-audited live in r14
  (per the r13 verdict ask — the r12/r13 fold-discipline hardening
  changed READOUT folds to exact integers, not the per-row unit
  multiplies, so the LONG-stage contract below is unchanged) and
  split into two machine-pinned classes:
  * LOUD-ABORT (promoted from skip to assertion,
    test_out_of_contract_folds_abort_loudly_at_edge_cents, 13
    entries): the unit-fold family (per-row cents·100 multiply runs
    in LONG — exceeds 2^63 here), orders_gini/cusum_drift (deliberate
    int64 Σcents FIRST moment whose premise is cents-scale money),
    and mann_whitney_u/spearman_corr — previously mislabeled pure
    operand-cast: their shared _spend_by_group input SUMS a
    customer's order cents in int64 (same cents-scale premise), which
    the old single-order-per-customer 6-row corpus could never trip.
    ANSI Spark raises ARITHMETIC_OVERFLOW — a loud abort, never a
    wrong value — while DuckDB's HUGEINT path proceeds, so value
    parity is structurally impossible and fail-loud IS the contract.
  * VACUOUSLY EMPTY (exclusion re-affirmed, still skipped):
    q11_important_share only — empty at sf0.001 scale regardless of
    money magnitude (see above), so neither a value nor an abort
    assertion can bind.
  The kept-int64 family q6/q15/q10/q3 (cents-scale premise) stays out
  of both corpora as before.

Readout ratios divide exact integers through double casts; operands
here exceed 2^53, so the casts round — but both engines perform the
SAME round-to-nearest conversion of the SAME exact integer (Spark
Decimal.toDouble via BigDecimal, DuckDB hugeint→double), so results
stay bit-identical. This property is load-bearing for 100 TB (real
group sums exceed 2^53 long before they exceed 2^63) and is exercised
nowhere else in the suite.

1e308-double prices were probed and are NOT a corpus here: cents =
round(1e308·100) = +inf, and BOTH engines refuse the inf→int64
conversion loudly (ANSI-on Spark raises CAST_OVERFLOW — the session
runs ANSI engine-wide — and DuckDB raises its ConversionException):
a shared fail-loud boundary, never a silent wrong answer. Pinned by
test_hugedouble_boundary_is_structural below so an engine upgrade
that softens either side surfaces immediately.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import run_oracle
from test_oracle_differential import TABLES, _rowset

REAL_SF = "/root/testdata/sf0.001"

# money columns per table (doubles holding currency; quantities stay
# real so rank/weight folds keep realistic operands)
_MONEY = {
    "lineitem": ["l_extendedprice"],
    "orders": ["o_totalprice"],
    "part": ["p_retailprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
}
# zeroed so the unit folds' per-row LONG multiply keeps its documented
# headroom at bigmoney magnitudes (disc/tax grids would push
# cents·(100−disc)·(100+tax) past 2^63)
_ZERO = {"lineitem": ["l_discount", "l_tax"]}

# the full DECIMAL(38,0) unit-fold inventory (SCALE.md) — must agree
# exactly at bigmoney magnitudes
BIGMONEY_ENTRIES = [
    "q1_pricing_summary",
    "q5_local_volume",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_proxy",
    "q11_important_share",
    "q14_promo_revenue",
    "q19_disjunctive_join",
    "revenue_pareto",
    "abc_classification",
    # operand-cast rank/moment folds run at both magnitudes
    "orders_gini",
    "mann_whitney_u",
    "spearman_corr",
    "orders_acf",
    "cusum_drift",
]

# pure operand-cast family: every product AND sum over cents runs in
# decimal, so int64-edge cents are inside the documented envelope
# (mann_whitney_u/spearman_corr moved to the abort family in r14 —
# their _spend_by_group per-customer Σcents is int64; see module doc)
MAXCENTS_ENTRIES = [
    "orders_acf",
]


def _build(kind: str, out_dir: str) -> None:
    """The FULL sf0.001 tables with money columns rewritten to a cyclic
    magnitude pattern (mag, mag, mag/2, −mag, mag/4, mag — all exact
    doubles; the negative probes the sign envelope and keeps sums from
    telescoping, the halves keep groups from being all-tied). Full
    tables, not a slice: real join/filter topology is what makes the
    folds actually execute (see module doc)."""
    mag = {"bigmoney": float(2**43), "maxcents": float(2**56)}[kind]
    pattern = [mag, mag, mag / 2, -mag, mag / 4, mag]
    for t in TABLES:
        real = pq.read_table(f"{REAL_SF}/{t}.parquet")
        n = real.num_rows
        cols = {f.name: real.column(f.name) for f in real.schema}
        for c in _MONEY.get(t, []):
            cols[c] = pa.array(
                [pattern[i % 6] for i in range(n)], type=pa.float64()
            )
        for c in _ZERO.get(t, []):
            cols[c] = pa.array([0.0] * n, type=pa.float64())
        pq.write_table(
            pa.table([cols[f.name] for f in real.schema], schema=real.schema),
            f"{out_dir}/{t}.parquet",
        )


@pytest.fixture(scope="module")
def _money_builds(tmp_path_factory):
    """Module-shared corpus builder keyed by kind (advisor r14): the
    parity fixture and the abort fixture both need the maxcents corpus;
    building it once halves the shard's corpus-build I/O."""
    cache: dict[str, str] = {}

    def get(kind: str) -> str:
        if kind not in cache:
            d = tmp_path_factory.mktemp(f"money_{kind}")
            _build(kind, str(d))
            cache[kind] = str(d)
        return cache[kind]

    return get


@pytest.fixture(scope="module", params=["bigmoney", "maxcents"])
def money_dir(request, _money_builds):
    return request.param, _money_builds(request.param)


def _names_for(kind: str) -> list[str]:
    return BIGMONEY_ENTRIES if kind == "bigmoney" else MAXCENTS_ENTRIES


# empty at sf0.001 base scale regardless of money magnitude (see
# module doc) — the one entry whose extreme-corpus assertions are
# allowed to bind on zero rows
_VACUOUS_AT_BASE_SCALE = {"q11_important_share"}


@pytest.mark.parametrize("name", sorted(set(BIGMONEY_ENTRIES)))
def test_decimal_fold_exact_at_extreme_magnitude(spark, money_dir, name):
    kind, d = money_dir
    if name not in _names_for(kind):
        pytest.skip(f"{name}: outside the {kind} contract (see module doc)")
    entry = CATALOG[name]
    sdf = entry.spark_fn(spark, d)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if name not in _VACUOUS_AT_BASE_SCALE:
        # guard against the pre-r14 failure mode: a corpus whose join
        # topology never reaches the fold makes this parity assertion
        # vacuous (empty == empty proves nothing)
        assert spark_rows and any(
            v is not None for r in spark_rows for v in r
        ), f"{name}: vacuous {kind} corpus — the fold never executed"
    ddb_cols, ddb_rows = run_oracle(d, entry.sql)
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count differs on {kind} corpus "
        f"(spark={len(spark_rows)} duck={len(ddb_rows)})"
    )
    sset = _rowset(spark_rows, spark_cols)
    dset = _rowset(ddb_rows, ddb_cols)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:3]
    assert sset == dset, (
        f"{name}: values differ on {kind} corpus; first mismatches at "
        f"sorted idx {mism}: "
        + "; ".join(f"spark={sset[i]} duck={dset[i]}" for i in mism)
    )


def test_hugedouble_boundary_is_structural(spark):
    """1e308 money pins the shared fail-loud boundary: the cents
    extraction round(price·100) is +inf in double, and BOTH engines
    refuse inf→int64 loudly (the session runs Spark 4's ANSI default
    engine-wide — SCALE.md 'ansi_safe_casts'). Asserting both halves
    means an engine upgrade that softens either side (saturation or a
    silent NULL) surfaces here, not as a quiet oracle mismatch."""
    from pyspark.errors.exceptions.captured import ArithmeticException
    from pyspark.sql import functions as F

    with pytest.raises(ArithmeticException, match="CAST_OVERFLOW"):
        spark.range(1).select(
            F.round(F.lit(1e308) * 100, 0).cast("long").alias("cents")
        ).collect()

    import duckdb

    with pytest.raises(duckdb.ConversionException):
        duckdb.sql("SELECT CAST(round(1e308 * 100, 0) AS BIGINT)").fetchall()


# the maxcents exclusions whose int64 stage IS reached on the full
# corpus (per-row unit multiplies; int64 Σcents first moments for
# orders_gini/cusum_drift; the int64 per-customer spend sum for
# mann_whitney_u/spearman_corr) — promoted r14 from skips to
# loud-abort assertions (r13 verdict ask #4). Only q11_important_share
# stays a bare skip (vacuously empty at this base scale).
ABORT_AT_MAXCENTS = [
    "q1_pricing_summary",
    "q5_local_volume",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_proxy",
    "q14_promo_revenue",
    "q19_disjunctive_join",
    "revenue_pareto",
    "abc_classification",
    "orders_gini",
    "cusum_drift",
    "mann_whitney_u",
    "spearman_corr",
]


@pytest.fixture(scope="module")
def maxcents_dir(_money_builds):
    return _money_builds("maxcents")


@pytest.mark.parametrize("name", ABORT_AT_MAXCENTS)
def test_out_of_contract_folds_abort_loudly_at_edge_cents(
    spark, maxcents_dir, name
):
    """The flip side of the maxcents exclusions: every excluded entry
    whose int64 stage is actually reached on this corpus must ABORT
    (ANSI ARITHMETIC_OVERFLOW) at int64-edge cents, not produce a
    wrapped value. Loud-failure is the documented contract for
    magnitudes outside the cents-scale premise. Matched on the error
    class string, not the Python exception type: AQE can surface the
    task failure either as ArithmeticException directly or wrapped in
    STAGE_MATERIALIZATION_MULTIPLE_FAILURES (both observed live)."""
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        CATALOG[name].spark_fn(spark, maxcents_dir).collect()
