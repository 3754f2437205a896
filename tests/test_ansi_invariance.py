"""ANSI-off invariance: on clean data, results must be identical with
``spark.sql.ansi.enabled=false`` — the Spark 3.x default mode a user
running this engine on an older cluster would get (round 11).

The engine's posture is ANSI ON (Spark 4 default; the extreme-value net
PINS that out-of-range money aborts loudly there). ANSI mode changes
failure semantics — error-on-overflow vs wrap, error-on-bad-cast vs
NULL, error-on-div-zero vs NULL — but on IN-CONTRACT data none of those
paths fire, so every catalog answer must be mode-independent: an entry
whose clean-data ANSWER differs under ANSI-off is silently relying on
an ANSI-only evaluation detail and would give that different answer on
every Spark 3.x deployment. (The loud-abort guarantees themselves are
deliberately NOT claimed under ANSI-off; that boundary lives in
test_extreme_values and is posture-specific.)

Entry list shared with the partition-invariance net; session-scoped
flip via spark.newSession() as in the other invariance nets.
"""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from test_partition_invariance import ENTRIES, SF


@pytest.fixture(scope="module")
def spark_nonansi(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "false")
    assert s.conf.get("spark.sql.ansi.enabled") == "false"
    # the shared fixture session must be untouched
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    return s


def _rows(session, name):
    return sorted(
        (tuple(r) for r in CATALOG[name].spark_fn(session, SF).collect()),
        key=repr,
    )


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_without_ansi(spark, spark_nonansi, name):
    ansi = _rows(spark, name)
    legacy = _rows(spark_nonansi, name)
    assert ansi == legacy, f"{name}: clean-data result depends on ANSI mode"
