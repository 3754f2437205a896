"""Executor-loss fault injection on a local-cluster session.

Runs a catalog entry on ``local-cluster[2,8,4096]`` and SIGKILLs one
executor JVM mid-query. Spark must recover — task retry, stage
re-attempt on FetchFailed, executor replacement by the standalone
worker — and the final result must be IDENTICAL to an undisturbed run
(the catalog's determinism + partition-invariance discipline is exactly
what makes recomputed lineage safe). At the 100 TB design point
executor loss is not an edge case: preemption, OOM kills, and spot
reclamation make it routine, so "same answer after losing an executor"
is part of correctness, not ops.

Usage: python scripts/executor_loss_probe.py SF_DIR ENTRY [KILL_AFTER_S]
       [N_KILLS]
``N_KILLS > 1`` keeps killing a live executor every KILL_AFTER_S —
sustained churn (rolling preemption) rather than a single loss.
Prints ``name\tn_rows\tsha256`` (same fingerprint contract as
local_cluster_run.py) plus a KILLED line confirming the injections.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from local_cluster_run import fingerprint, _package_zip  # noqa: E402


def _executor_pids(app_id: str) -> list[int]:
    """PIDs of THIS cluster's executor JVMs only.

    The ps scan must filter on this session's applicationId (present in
    the executor command line as ``--app-id``): pytest shards run
    concurrently and several sibling tests spawn their own
    local-cluster executors, so an unfiltered match could SIGKILL
    another shard's executor — flaking that shard while leaving this
    probe's cluster undisturbed (a vacuously green recovery test)."""
    out = subprocess.run(
        ["ps", "axo", "pid,args"], capture_output=True, text=True
    ).stdout
    return [
        int(line.split(None, 1)[0])
        for line in out.splitlines()
        if "CoarseGrainedExecutorBackend" in line and app_id in line
    ]


def main() -> int:
    sf_dir, name = sys.argv[1], sys.argv[2]
    kill_after = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    n_kills = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    from data_engineering_project_capstone_spark.plans.catalog import CATALOG
    from data_engineering_project_capstone_spark.session import get_spark

    spark = get_spark(
        app_name="executor_loss_probe", master="local-cluster[2,8,4096]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addPyFile(_package_zip())
    # PROBE_CHECKPOINT_DIR switches the iterative operators' lineage
    # cuts (operators/lineage.py) onto the RELIABLE checkpoint path —
    # blocks re-readable after executor loss. Without it, a kill landing
    # after a localCheckpoint cut fail-stops the job by design (loud,
    # never a wrong answer) instead of recovering.
    ckpt = os.environ.get("PROBE_CHECKPOINT_DIR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)

    app_id = spark.sparkContext.applicationId
    state = {"killed": [], "kill_ts": []}

    def killer():
        deadline = time.time() + 60
        while time.time() < deadline and not _executor_pids(app_id):
            time.sleep(0.5)
        for _ in range(n_kills):
            time.sleep(kill_after)
            pids = _executor_pids(app_id)
            if pids:
                os.kill(pids[0], 9)
                state["killed"].append(pids[0])
                state["kill_ts"].append(time.time())

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    t_start = time.time()
    rows = CATALOG[name].spark_fn(spark, sf_dir).collect()
    t_end = time.time()
    t.join(timeout=5)
    n, h = fingerprint(rows)
    killed = ",".join(map(str, state["killed"])) or "None"
    # a kill proves recovery only if it landed strictly INSIDE the
    # collect() window: on a fast host the query can finish before
    # KILL_AFTER_S elapses, the SIGKILL then hits an idle executor and
    # the run exercises no recovery path at all.
    mid_query = any(t_start < ts < t_end for ts in state["kill_ts"])
    print(f"KILLED\t{killed}", flush=True)
    print(f"MIDQUERY\t{int(mid_query)}", flush=True)
    print(f"{name}\t{n}\t{h}", flush=True)
    spark.stop()
    # the probe only proves something if at least one kill landed mid-query
    return 0 if mid_query else 2


if __name__ == "__main__":
    raise SystemExit(main())
