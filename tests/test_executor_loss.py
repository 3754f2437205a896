"""Executor-loss fault injection: SIGKILL one executor JVM mid-query on
a real local-cluster and require the recovered result to be identical
to the undisturbed local run (round 11).

At the 100 TB design point executor loss is routine (preemption, OOM
kills, spot reclamation), and Spark's recovery story — task retry,
stage re-attempt on FetchFailed, executor replacement — recomputes
lineage. Recomputation is only CORRECT if every operator is
deterministic under partial re-execution, which is exactly the
discipline the determinism + partition-invariance nets enforce; this
test closes the loop by exercising the actual recovery machinery.

One probe entry in the suite (simjoin_prefix at sf0.1: multi-stage,
shuffle-heavy, long enough that the kill lands mid-query); the r11
session also probed dbscan_customers (iterative CC) and
check_multimodal (executor-side Python workers) — all bit-identical
after recovery (BENCH_NOTES).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "executor_loss_probe.py")
SF = "/root/testdata/sf0.1"
ENTRY = "simjoin_prefix"


def test_result_identical_after_executor_loss(spark):
    rows = CATALOG[ENTRY].spark_fn(spark, SF).collect()
    reprs = sorted(repr(tuple(r)) for r in rows)
    local = (
        len(reprs),
        hashlib.sha256("\n".join(reprs).encode()).hexdigest(),
    )

    out = subprocess.run(
        [sys.executable, SCRIPT, SF, ENTRY, "3"],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert out.returncode == 0, (
        f"probe failed (rc={out.returncode}; rc=2 means no kill landed "
        f"inside the collect() window — the query finished before the "
        f"SIGKILL, so no recovery path ran):"
        f"\n{out.stdout[-1000:]}\n{out.stderr[-3000:]}"
    )
    lines = dict(
        (l.split("\t")[0], l.split("\t")[1:])
        for l in out.stdout.strip().splitlines()
        if "\t" in l
    )
    assert lines["KILLED"][0] != "None", "no executor was killed"
    assert lines["MIDQUERY"][0] == "1", "kill landed outside the query window"
    got = (int(lines[ENTRY][0]), lines[ENTRY][1])
    assert got == local, (
        f"{ENTRY}: result changed after executor loss + recovery"
    )
