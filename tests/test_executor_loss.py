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

Two probe entries in the suite: simjoin_prefix at sf0.1 (multi-stage,
shuffle-heavy, long enough that the kill lands mid-query) on the
default lineage path, and split_assign (a connected-components
consumer) with PROBE_CHECKPOINT_DIR set, which switches the iterative
operators' lineage cuts (operators/lineage.py) onto the RELIABLE
checkpoint path — without it an executor loss landing after a
localCheckpoint cut fail-stops the job by design (advisor r12: blocks
live only on executors, lineage truncated), which is loud but not
recovery. The r11 session also probed dbscan_customers (iterative CC)
and check_multimodal (executor-side Python workers) — all bit-identical
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


def _local_fingerprint(spark, entry):
    rows = CATALOG[entry].spark_fn(spark, SF).collect()
    reprs = sorted(repr(tuple(r)) for r in rows)
    return (
        len(reprs),
        hashlib.sha256("\n".join(reprs).encode()).hexdigest(),
    )


def _run_probe(entry, kill_after, env=None):
    out = subprocess.run(
        [sys.executable, SCRIPT, SF, entry, str(kill_after)],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
        env={**os.environ, **(env or {})},
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
    return (int(lines[entry][0]), lines[entry][1])


def test_result_identical_after_executor_loss(spark):
    entry = "simjoin_prefix"
    local = _local_fingerprint(spark, entry)
    assert _run_probe(entry, 3) == local, (
        f"{entry}: result changed after executor loss + recovery"
    )


def test_cc_consumer_recovers_with_reliable_checkpoint(spark, tmp_path):
    """split_no_leakage = MinHash LSH → connected components → rep join
    (NOT split_assign, which is the map-only content-addressed split
    with no lineage cuts — probing it would be vacuously green): its
    cuts go through operators/lineage.materialize, so with a checkpoint
    dir the cut blocks are re-readable from storage and a mid-query
    executor SIGKILL must recover to the identical result (the 100 TB
    recovery story for the iterative operators)."""
    entry = "split_no_leakage"
    local = _local_fingerprint(spark, entry)
    got = _run_probe(
        entry, 4, env={"PROBE_CHECKPOINT_DIR": str(tmp_path / "ckpt")}
    )
    assert got == local, (
        f"{entry}: result changed after executor loss + recovery on the "
        f"reliable-checkpoint path"
    )
