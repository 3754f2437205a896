"""Run-to-run determinism: every catalog entry executed twice must produce
identical sorted values — the property the oracle hash-gate depends on
(and the class of bug a partition-order-dependent survivor introduces).

k-means (similarity_ivf_topk, check_ivf_topk) is seeded and deterministic
within one session; nothing is exempted. Runs at sf0.001 to keep the
double execution cheap.
"""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _fingerprint(df):
    rows = df.collect()
    return sorted(tuple(repr(v) for v in row) for row in rows)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_entry_is_deterministic(spark, name):
    fn = CATALOG[name].spark_fn
    assert _fingerprint(fn(spark, SF)) == _fingerprint(fn(spark, SF)), name
