"""Run-to-run determinism: every catalog entry executed twice must produce
identical sorted values — the property the oracle hash-gate depends on
(and the class of bug a partition-order-dependent survivor introduces).

k-means (similarity_ivf_topk, check_ivf_topk) is seeded and deterministic
within one session; nothing is exempted. Runs at sf0.001 to keep the
double execution cheap.

The sweep is THREADED (one shared SparkSession, concurrent actions from a
worker pool — a supported Spark pattern): 242 serial runs cost ~2 min of
mostly scheduler idle time, the pooled form ~4× less. Each entry's two
runs stay sequential inside one worker so the comparison itself is
unaffected. Target one entry with SPARK_GRAFT_DETERMINISM_ONLY=<name>.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _fingerprint(df):
    rows = df.collect()
    return sorted(tuple(repr(v) for v in row) for row in rows)


def _check_one(spark, name: str) -> str | None:
    fn = CATALOG[name].spark_fn
    try:
        if _fingerprint(fn(spark, SF)) != _fingerprint(fn(spark, SF)):
            return f"{name}: two runs differ"
    except Exception as exc:  # keep sweeping; report all failures at once
        return f"{name}: raised {type(exc).__name__}: {exc}"
    return None


def test_every_entry_is_deterministic(spark):
    only = os.environ.get("SPARK_GRAFT_DETERMINISM_ONLY")
    names = [only] if only else sorted(CATALOG)
    with ThreadPoolExecutor(max_workers=8) as pool:
        failures = [f for f in pool.map(lambda n: _check_one(spark, n), names) if f]
    assert not failures, "\n".join(failures)
