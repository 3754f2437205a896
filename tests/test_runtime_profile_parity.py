"""Alternate-runtime-profile parity: results must be identical under a
production profile that swaps the serializer, memory arena, and
compression codec all at once (round 11).

Three context-level settings that real clusters flip and the
session-scoped nets can't reach:

- ``spark.serializer=KryoSerializer`` — closure/broadcast/task-result
  serialization through an entirely different codec (many shops set it
  fleet-wide for the RDD-path speedup);
- ``spark.memory.offHeap.enabled`` — Tungsten operators (hash maps,
  sort buffers) allocate from the off-heap arena instead of the JVM
  heap: same algorithms over a different memory path;
- ``spark.io.compression.codec=zstd`` — every shuffle block and
  broadcast compressed/decompressed by a different codec.

Each is answer-neutral BY CONTRACT; this net machine-checks that the
catalog doesn't accidentally observe any of them. Runs on the
local-cluster subprocess runner (real executor JVMs, so Kryo and zstd
actually sit on the wire between processes) against the fixture
session's fingerprints. Grouped as one profile deliberately: all three
are low-risk independents, and a failure is attributed by splitting
the profile locally. Entry list shared with the partition-invariance
net plus the mapInPandas multimodal checks.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from test_partition_invariance import ENTRIES, SF

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "local_cluster_run.py")

NAMES = sorted(set(ENTRIES) | {"check_multimodal", "check_png_pixels"})

PROFILE = {
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.memory.offHeap.enabled": "true",
    "spark.memory.offHeap.size": "1g",
    "spark.io.compression.codec": "zstd",
}


@pytest.fixture(scope="module")
def profile_results():
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(PROFILE)
    out = subprocess.run(
        [sys.executable, SCRIPT, SF, *NAMES],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
        env=env,
    )
    assert out.returncode == 0, (
        f"profile run failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )
    results = {}
    for line in out.stdout.strip().splitlines():
        if "\t" in line:
            name, n, h = line.split("\t")
            results[name] = (int(n), h)
    assert sorted(results) == NAMES
    return results


@pytest.mark.parametrize("name", NAMES)
def test_entry_invariant_under_runtime_profile(spark, profile_results, name):
    rows = CATALOG[name].spark_fn(spark, SF).collect()
    reprs = sorted(repr(tuple(r)) for r in rows)
    local = (len(reprs), hashlib.sha256("\n".join(reprs).encode()).hexdigest())
    assert profile_results[name] == local, (
        f"{name}: result changed under the Kryo/off-heap/zstd profile"
    )
