"""Compositional invariance: all session-scoped execution flips AT ONCE
(round 11).

The per-axis nets (AQE off, codegen off, vectorized reader off, radix
sort off, ObjectHashAggregate off) each prove independence from one
implementation choice while every other choice stays at the default.
This net flips ALL of them in one session — the maximally-degraded
execution mode: interpreted expressions over parquet-mr scans feeding
TimSort and sort-based aggregation with no runtime re-planning. If two
flips interact (a fallback path that is only correct because another
default compensates), the single-axis nets can't see it; this one does.
It also is a realistic cluster profile — conservative deployments turn
several of these off together after hitting a codegen or AQE bug.

Entry list shared with the partition-invariance net.
"""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from test_partition_invariance import ENTRIES, SF

FLIPS = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.codegen.wholeStage": "false",
    "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    "spark.sql.parquet.enableVectorizedReader": "false",
    "spark.sql.sort.enableRadixSort": "false",
    "spark.sql.execution.useObjectHashAggregateExec": "false",
}


@pytest.fixture(scope="module")
def spark_degraded(spark):
    s = spark.newSession()
    for k, v in FLIPS.items():
        s.conf.set(k, v)
    # the shared fixture session must be untouched
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    return s


def _rows(session, name):
    return sorted(
        (tuple(r) for r in CATALOG[name].spark_fn(session, SF).collect()),
        key=repr,
    )


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_under_all_flips(spark, spark_degraded, name):
    default = _rows(spark, name)
    degraded = _rows(spark_degraded, name)
    assert default == degraded, (
        f"{name}: result depends on an interaction of execution defaults"
    )
