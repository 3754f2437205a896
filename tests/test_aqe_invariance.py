"""AQE-off invariance: results must be identical with adaptive query
execution disabled — the third plan-level invariance axis (round 10),
alongside partition-count (test_partition_invariance) and physical
layout (test_schema_shape).

AQE rewrites the PHYSICAL plan at runtime: post-shuffle coalescing
changes partition counts mid-query, skew-join splitting replays one
partition's rows through several tasks, and broadcast-join demotion/
promotion changes join order side-effects. Every one of those is a
different float fold order and a different first-row-per-partition —
exactly the surfaces where a nondeterministic operator hides. The
engine runs AQE ON everywhere (session.py posture: the same plan must
survive a 100x scale-up without retuning), so any entry whose ANSWER
depends on AQE being on is partition-layout-dependent by definition
and would flake on a real cluster.

Spark scopes SQL confs per session: ``spark.newSession()`` shares the
SparkContext/JVM but takes its own conf, so flipping AQE off there
never touches the shared fixture session other tests use.

Entry list shared with the partition-invariance net — the same
shuffle-sensitive classes are the AQE-sensitive classes.
"""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from test_partition_invariance import ENTRIES, SF


@pytest.fixture(scope="module")
def spark_noaqe(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    assert s.conf.get("spark.sql.adaptive.enabled") == "false"
    # the shared fixture session must be untouched
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    return s


def _rows(session, name):
    return sorted(
        tuple(r) for r in CATALOG[name].spark_fn(session, SF).collect()
    )


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_without_aqe(spark, spark_noaqe, name):
    with_aqe = _rows(spark, name)
    without_aqe = _rows(spark_noaqe, name)
    assert with_aqe == without_aqe, f"{name}: result depends on AQE"
