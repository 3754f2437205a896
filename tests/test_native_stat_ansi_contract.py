"""ANSI totality contract of the native statistical aggregates (r12).

The mixnull full-catalog sweep caught Spark 4's ANSI ``corr`` RAISING
DIVIDE_BY_ZERO on a zero-variance series (where DuckDB returns NULL) —
the only native statistical aggregate that throws rather than
degrading. agg_correlation consequently computes Pearson r from exact
integer sums with explicit guards, and the catalog keeps ZERO F.corr
call sites; the other natives (regr_*, stddev/var, covar) stay in use
because they are total: NULL at n=1, NULL (regr_*) or 0.0
(stddev/var/covar) on constant series.

This test pins BOTH halves on the live engine so a Spark upgrade that
changes either behavior fails loudly: if corr stops raising, the
agg_correlation workaround can be revisited; if regr_* start raising,
linreg_by_group / zipf_fit / two other regr consumers break on
degenerate groups and must grow guards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frames(spark):
    const = spark.createDataFrame([(1.0, 2.0)] * 4, "x double, y double")
    single = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    return const, single


def test_corr_raises_on_zero_variance_under_ansi(spark, frames):
    const, _ = frames
    with pytest.raises(Exception) as exc:
        const.agg(F.corr("x", "y")).collect()
    assert "DIVIDE_BY_ZERO" in str(exc.value)


def test_other_natives_are_total_on_zero_variance(spark, frames):
    const, single = frames
    [row] = const.agg(
        F.covar_samp("x", "y").alias("cv"),
        F.stddev_samp("x").alias("sd"),
        F.var_samp("x").alias("vr"),
        F.expr("regr_slope(y, x)").alias("sl"),
        F.expr("regr_intercept(y, x)").alias("ic"),
        F.expr("regr_r2(y, x)").alias("r2"),
    ).collect()
    assert (row["cv"], row["sd"], row["vr"]) == (0.0, 0.0, 0.0)
    assert row["sl"] is None and row["ic"] is None and row["r2"] is None

    [row1] = single.agg(
        F.stddev_samp("x").alias("sd"),
        F.covar_samp("x", "y").alias("cv"),
    ).collect()
    assert row1["sd"] is None and row1["cv"] is None


def test_catalog_has_no_corr_call_sites():
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data_engineering_project_capstone_spark",
    )
    hits = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            for i, line in enumerate(open(path), 1):
                if re.search(r"F\.corr\(|\bexpr\([\"']corr\(", line):
                    hits.append(f"{path}:{i}")
    assert not hits, (
        "F.corr is not total under ANSI (DIVIDE_BY_ZERO on zero "
        f"variance) — use the exact-sums form (agg_correlation): {hits}"
    )
