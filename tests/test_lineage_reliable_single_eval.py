"""Reliable-path evaluation-count contract for lineage.materialize
(advisor r13): the classic Spark folklore says an eager reliable
``df.checkpoint()`` runs TWO jobs over the upstream plan — the eager
count, then a checkpoint-file write that recomputes the plan unless it
is persisted — i.e. a 2x re-execution of exactly the cost class the
r13 census closed for the local path. On THIS runtime (Spark 4.1.2)
that is no longer true: the eager reliable checkpoint runs as ONE job
and evaluates the upstream exactly once (the StatusTracker shows a
single job id; a sleep-UDF upstream shows 1x wall time; persisting
first is measurably SLOWER because it adds an InMemoryRelation
materialization). materialize() therefore deliberately does not
persist — and this test pins the one-evaluation contract so a future
Spark or config change that reintroduces the write-job recompute goes
red here instead of silently doubling every iterative operator's
upstream cost on checkpoint-dir deployments.

The counter is a side-effect UDF appending one line per call to a
local file (test harness only — the package itself stays UDF-free). A
plain accumulator cannot discriminate: Spark drops duplicate
accumulator updates for recomputed tasks, so even a genuine 2x would
read as 1x through an accumulator. The probe runs in a SUBPROCESS
because ``setCheckpointDir`` cannot be unset on the shared session and
would silently flip every later materialize() in the shard onto the
reliable path.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import os
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udf

from data_engineering_project_capstone_spark.operators.lineage import materialize

ckpt_dir, touch_path = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("lineage_eval_count_probe")
    .getOrCreate()
)
sc = spark.sparkContext
sc.setLogLevel("ERROR")
sc.setCheckpointDir(ckpt_dir)

@udf("long")
def bump(x):
    # one line per evaluation; local mode, so the file is host-local.
    # os.O_APPEND single-write is atomic for these short lines.
    fd = os.open(touch_path, os.O_WRONLY | os.O_CREAT | os.O_APPEND)
    try:
        os.write(fd, b"x\\n")
    finally:
        os.close(fd)
    return x

N = 100
df = spark.range(N, numPartitions=2).select(bump("id").alias("id"))
out = materialize(df, eager=True)
n_jobs = len(set(sc.statusTracker().getJobIdsForGroup(None) or []))
assert out.count() == N
# consume twice more: the cut frame must never touch the upstream again
assert out.agg(F.sum("id")).collect()[0][0] == N * (N - 1) // 2
print("EVALS", sum(1 for _ in open(touch_path)), flush=True)
print("CKPT_JOBS", n_jobs, flush=True)
spark.stop()
"""


def test_reliable_eager_materialize_evaluates_upstream_once(tmp_path):
    touch = tmp_path / "evals.txt"
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, str(tmp_path / "ckpt"), str(touch)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env={**os.environ},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = dict(
        l.split(None, 1) for l in out.stdout.splitlines() if " " in l
    )
    assert "EVALS" in lines, out.stdout
    # exactly one evaluation per row: Spark 4 checkpoints inside the
    # eager action's job, and every later consumer reads the checkpoint
    # files. 2N here means the runtime regressed to the classic
    # two-job recompute — the remedy is a persist → checkpoint →
    # unpersist guard in lineage.materialize (see its docstring).
    evals = int(lines["EVALS"])
    assert evals == 100, f"upstream evaluated {evals / 100:.1f}x"
    # and the eager cut itself was a single job, not count + write
    assert int(lines["CKPT_JOBS"]) == 1, lines


_LAZY_PROBE = """
import glob
import os
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udf

from data_engineering_project_capstone_spark.operators.lineage import materialize

ckpt_dir, touch_path, mode = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("lineage_lazy_probe")
    .getOrCreate()
)
sc = spark.sparkContext
sc.setLogLevel("ERROR")
sc.setCheckpointDir(ckpt_dir)

@udf("long")
def bump(x):
    fd = os.open(touch_path, os.O_WRONLY | os.O_CREAT | os.O_APPEND)
    try:
        os.write(fd, b"x\\n")
    finally:
        os.close(fd)
    return x

def evals():
    return sum(1 for _ in open(touch_path)) if os.path.exists(touch_path) else 0

N = 100
df = spark.range(N, numPartitions=2).select(bump("id").alias("id"))
if mode == "raw":
    out = df.checkpoint(eager=False)
else:
    out = materialize(df, eager=False)
print("EVALS_AT_CUT", evals(), flush=True)
assert out.count() == N
print("EVALS_AFTER_FIRST_ACTION", evals(), flush=True)
assert out.agg(F.sum("id")).collect()[0][0] == N * (N - 1) // 2
print("EVALS_FINAL", evals(), flush=True)
ckpt_files = [
    f
    for f in glob.glob(os.path.join(ckpt_dir, "**"), recursive=True)
    if os.path.isfile(f)
]
print("CKPT_FILES", len(ckpt_files), flush=True)
spark.stop()
"""


def _run_lazy(tmp_path, mode: str) -> dict[str, int]:
    touch = tmp_path / f"evals_{mode}.txt"
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            _LAZY_PROBE,
            str(tmp_path / f"ckpt_{mode}"),
            str(touch),
            mode,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env={**os.environ},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return {
        k: int(v)
        for k, v in (
            l.split(None, 1) for l in out.stdout.splitlines() if " " in l
        )
    }


def test_raw_lazy_reliable_checkpoint_pays_the_recompute(tmp_path):
    """Pins WHY materialize() forces eager on the reliable path
    (advisor r14): a raw lazy reliable checkpoint defers to the first
    action, whose job computes the plan once and whose doCheckpoint
    write then RE-EXECUTES it — 2x upstream evaluations. If a future
    Spark makes the lazy write single-pass, this pin goes red and the
    force-eager in lineage.materialize can be relaxed."""
    lines = _run_lazy(tmp_path, "raw")
    assert lines["EVALS_AT_CUT"] == 0, lines  # lazy: nothing ran yet
    assert lines["EVALS_AFTER_FIRST_ACTION"] == 200, (
        f"raw lazy reliable checkpoint evaluated upstream "
        f"{lines['EVALS_AFTER_FIRST_ACTION'] / 100:.1f}x on the first "
        f"action (expected the classic 2x recompute this pin documents)"
    )
    # after the write, consumers read checkpoint files — no re-eval
    assert lines["EVALS_FINAL"] == 200, lines
    assert lines["CKPT_FILES"] > 0, lines


def test_materialize_lazy_reliable_is_forced_eager_single_eval(tmp_path):
    """materialize(df, eager=False) on the reliable path: the eager
    force makes the cut single-evaluation (at the materialize call,
    not the first consumer action) and guarantees the checkpoint files
    actually exist — the lazy in-loop cadence marks would otherwise
    drop all but the nearest mark under Spark's default
    checkpointAllMarkedAncestors=false, silently losing the recovery
    coverage the reliable path exists for."""
    lines = _run_lazy(tmp_path, "materialize")
    assert lines["EVALS_AT_CUT"] == 100, (
        f"expected the reliable-path eager force to evaluate once at "
        f"the cut; saw {lines['EVALS_AT_CUT']}"
    )
    assert lines["EVALS_AFTER_FIRST_ACTION"] == 100, lines
    assert lines["EVALS_FINAL"] == 100, lines
    assert lines["CKPT_FILES"] > 0, lines
