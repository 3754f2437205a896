"""Process-parallel test runner: same tests, ~N× the wall-clock.

The suite is a long tail of small Spark actions whose cost is scheduler
latency, not compute — single-process pytest spends most of its ~11:30
idle. There is no pytest-xdist in the image, so this script shards at
the FILE level: greedy bin-pack of test modules into N buckets by
measured weight, one pytest subprocess per bucket, each with its own
SparkSession JVM (UI disabled in session.get_spark, so no port fights;
no Hive/derby state anywhere in the suite).

Coverage is identical to `pytest tests/` by construction: the shard
union is exactly the `tests/test_*.py` glob, asserted before launch.

Usage: python scripts/pytest_shards.py [n_shards] [extra pytest args...]
Exit code is non-zero if any shard fails; each shard's tail is printed.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# measured call+setup seconds (round-7 full-suite --durations run);
# anything unlisted gets a default weight of 5.
WEIGHTS = {
    "test_determinism.py": 69,
    "test_oracle_differential.py": 95,
    "test_properties.py": 75,
    "test_plan_shapes.py": 45,
    "test_cc_memo.py": 37,
    "test_clusters.py": 38,
    "test_degenerate_docs.py": 25,
    "test_degenerate_orders.py": 60,
    "test_degenerate_customer.py": 40,
    "test_degenerate_lineitem.py": 41,
    "test_streaming.py": 25,
    "test_approx.py": 16,
    "test_dedup_similarity.py": 15,
    "test_csv_roundtrip.py": 8,
    "test_r6f_entries.py": 8,
    "test_pipeline_driver.py": 7,
    "test_r6h_entries.py": 35,
    "test_r7_entries.py": 25,
    "test_r7b_entries.py": 26,
    "test_r7c_entries.py": 20,
    "test_r7d_entries.py": 19,
    "test_r7g_entries.py": 19,
    "test_r7h_entries.py": 19,
    "test_r7i_entries.py": 23,
    "test_r7j_entries.py": 34,
    "test_r7k_entries.py": 17,
    "test_r7l_entries.py": 17,
    "test_png_pixels.py": 12,
    "test_pixels_multiformat.py": 58,
    "test_wav_samples.py": 14,
    "test_partition_invariance.py": 60,
}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4
    extra = sys.argv[2:] if len(sys.argv) > 1 and sys.argv[1].isdigit() else sys.argv[1:]
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    assert files, "no test files found"
    # greedy: heaviest first into the lightest bucket
    buckets: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in sorted(files, key=lambda f: -WEIGHTS.get(os.path.basename(f), 5)):
        i = loads.index(min(loads))
        buckets[i].append(f)
        loads[i] += WEIGHTS.get(os.path.basename(f), 5)
    assert sorted(f for b in buckets for f in b) == files  # exact coverage
    t0 = time.monotonic()
    procs = []
    for i, b in enumerate(buckets):
        if not b:
            continue
        procs.append(
            (
                i,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", *extra, *b],
                    cwd=REPO,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                ),
            )
        )
    rc = 0
    for i, p in procs:
        out, _ = p.communicate()
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- shard {i} (exit {p.returncode}) ---\n{tail}")
        if p.returncode not in (0, 5):  # 5 = no tests collected (empty -k)
            rc = 1
    print(f"total wall: {time.monotonic() - t0:.0f}s across {len(procs)} shards")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
