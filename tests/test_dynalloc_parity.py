"""Dynamic-allocation parity: results must be identical when executors
are RELEASED and RE-ACQUIRED between and during queries (round 11).

Dynamic allocation is the default posture on shared production
clusters: executors are given back after ``executorIdleTimeout`` and
re-requested when work arrives, with shuffle files outliving their
executor via shuffle tracking. That is a different lifecycle from both
the static fixture session and the executor-loss net (SIGKILL):
executors here decommission GRACEFULLY mid-workload, shuffle data must
be readable after its producer executor is gone (shuffleTracking), and
each re-acquired executor starts cold (fresh codegen cache, fresh
broadcast fetch).

The run happens in the local-cluster subprocess runner with aggressive
timeouts (idle 2s, sleep 3s between entries) so churn actually occurs;
the test PROVES it occurred by reading the Spark event log —
ExecutorRemoved/ExecutorAdded events beyond the initial grants — and
then compares every fingerprint against the fixture session. A green
run with zero removals would be vacuous and fails the churn assertion.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "local_cluster_run.py")
SF = "/root/testdata/sf0.001"

# representative shapes, kept small: each entry is followed by a 3s idle
# so executors release and the next entry re-acquires them cold
ENTRIES = [
    "dedup_first_wins",
    "topk_per_group",
    "events_sessionize",
    "q15_top_supplier",
    "simjoin_prefix",
    "check_multimodal",
]

DYN_CONF = {
    "spark.dynamicAllocation.enabled": "true",
    "spark.dynamicAllocation.shuffleTracking.enabled": "true",
    "spark.dynamicAllocation.minExecutors": "0",
    "spark.dynamicAllocation.maxExecutors": "2",
    "spark.dynamicAllocation.executorIdleTimeout": "2s",
    "spark.dynamicAllocation.shuffleTracking.timeout": "2s",
    "spark.dynamicAllocation.schedulerBacklogTimeout": "1s",
    "spark.eventLog.enabled": "true",
}


def _event_log_text(log_dir: str) -> str:
    chunks = []
    for root, _, files in os.walk(log_dir):
        for f in files:
            if not f.startswith(("events_", "local-", "app-")):
                continue
            path = os.path.join(root, f)
            if f.endswith(".zstd"):
                chunks.append(
                    subprocess.run(
                        ["zstd", "-dc", path], capture_output=True, text=True
                    ).stdout
                )
            else:
                with open(path, errors="replace") as fh:
                    chunks.append(fh.read())
    return "\n".join(chunks)


@pytest.fixture(scope="module")
def dyn_run(tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("eventlog"))
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
        {**DYN_CONF, "spark.eventLog.dir": log_dir}
    )
    env["SPARK_GRAFT_SLEEP_BETWEEN"] = "3"
    out = subprocess.run(
        [sys.executable, SCRIPT, SF, *ENTRIES],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
        env=env,
    )
    assert out.returncode == 0, (
        f"dynalloc run failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )
    results = {}
    for line in out.stdout.strip().splitlines():
        if "\t" in line:
            name, n, h = line.split("\t")
            results[name] = (int(n), h)
    assert sorted(results) == sorted(ENTRIES)
    events = _event_log_text(log_dir)
    removed = events.count("SparkListenerExecutorRemoved")
    added = events.count("SparkListenerExecutorAdded")
    # vacuous-green guard: churn must actually have happened
    assert removed >= 1 and added >= 3, (
        f"no executor churn observed (added={added}, removed={removed}) — "
        "the parity claim would be vacuous"
    )
    return results


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_invariant_under_executor_churn(spark, dyn_run, name):
    rows = CATALOG[name].spark_fn(spark, SF).collect()
    reprs = sorted(repr(tuple(r)) for r in rows)
    local = (len(reprs), hashlib.sha256("\n".join(reprs).encode()).hexdigest())
    assert dyn_run[name] == local, (
        f"{name}: result changed under dynamic-allocation executor churn"
    )
