"""Run catalog entries on a local-cluster master and print fingerprints.

``local-cluster[2,8,4096]`` spawns two REAL executor JVMs: tasks,
closures, and broadcasts are serialized across process boundaries and
shuffle blocks are fetched between JVMs — the behaviors ``local[32]``
(one shared JVM) can never exercise. This is the closest local stand-in
for "does this catalog actually run on a multi-executor cluster".

Must run in a FRESH process: SparkSession.getOrCreate would return an
existing local-mode context, so the pytest side (tests/
test_local_cluster_parity.py) invokes this as a subprocess and compares
the printed fingerprints against the in-process fixture session.

Usage: python scripts/local_cluster_run.py SF_DIR ENTRY [ENTRY...]
Prints one line per entry: ``name\tn_rows\tsha256(sorted row reprs)``.

``SPARK_GRAFT_EXTRA_CONF`` (JSON object) adds context-level conf the
session-scoped nets can't flip. ``SPARK_GRAFT_SLEEP_BETWEEN`` (float
seconds) idles between entries — long enough idles let dynamic
allocation release executors so the next entry re-acquires them.
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fingerprint(rows) -> tuple[int, str]:
    """Order-insensitive digest of collected rows (shared with the test)."""
    reprs = sorted(repr(tuple(r)) for r in rows)
    h = hashlib.sha256("\n".join(reprs).encode()).hexdigest()
    return len(reprs), h


def _package_zip() -> str:
    """Zip the engine package for executor-side Python workers.

    local[*] hides a real deployment step: executor Python workers
    inherit the driver's sys.path only when they ARE the driver's
    children. On a real cluster the package must be shipped
    (``spark-submit --py-files`` / ``sc.addPyFile``) or preinstalled on
    every node — without it, any cloudpickled mapInPandas function that
    references the package by module name fails with
    ModuleNotFoundError on the executor (observed on first contact with
    local-cluster mode; see SCALE.md deployment notes)."""
    import tempfile
    import zipfile

    zip_path = os.path.join(
        tempfile.mkdtemp(prefix="engine_pkg_"), "engine_pkg.zip"
    )
    pkg = os.path.join(REPO, "data_engineering_project_capstone_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zip_path


def main() -> int:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    from data_engineering_project_capstone_spark.plans.catalog import CATALOG
    from data_engineering_project_capstone_spark.session import get_spark

    import json

    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    spark = get_spark(
        app_name="local_cluster_parity",
        master="local-cluster[2,8,4096]",
        extra_conf=extra or None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addPyFile(_package_zip())
    # PROBE_CHECKPOINT_DIR (same contract as executor_loss_probe.py):
    # switches the iterative operators' lineage cuts onto the RELIABLE
    # checkpoint path (operators/lineage.py) so parity runs can cover
    # that code path too.
    ckpt = os.environ.get("PROBE_CHECKPOINT_DIR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)
    sleep_between = float(os.environ.get("SPARK_GRAFT_SLEEP_BETWEEN", "0"))
    try:
        for name in names:
            n, h = fingerprint(CATALOG[name].spark_fn(spark, sf_dir).collect())
            print(f"{name}\t{n}\t{h}", flush=True)
            if sleep_between:
                import time

                time.sleep(sleep_between)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
