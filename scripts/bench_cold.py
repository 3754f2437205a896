"""Cold-JVM bench probe (r11 verdict ask #6b): one fresh SparkSession
per headline query, ONE rep, NO warm-up — quantifies how much of the
warm bench's steady-state numbers is JVM/codegen/page-cache warmth.

The standing bench (bench.py) deliberately measures steady-state
throughput: shared JVM, warm-up pass, min-of-2. That is the right
number for the 100 TB design point (a real cluster amortizes codegen
and JIT over hours), but the canary discipline compares ROUND-OVER-
ROUND numbers, and a uniform warm-cache bias could mask a real
first-run regression (e.g. a plan that newly compiles a giant codegen
method). This probe pins the per-query cold/warm ratio once, so future
drift investigations can tell "cold-start cost moved" apart from
"steady-state throughput moved".

Usage: python scripts/bench_cold.py [ENTRY ...]
    (defaults to the full bench.py HEADLINE list)
Writes scripts/bench_cold_out.json and prints one JSON line:
    {"metric": "cold_jvm_queries_total_sec", "value": N, ...,
     "queries": {name: {"cold_sec": t, "startup_sec": s}, ...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
t0 = time.perf_counter()
from data_engineering_project_capstone_spark.plans.catalog import CATALOG
from data_engineering_project_capstone_spark.session import get_spark
spark = get_spark(app_name="bench_cold")
spark.sparkContext.setLogLevel("ERROR")
startup = time.perf_counter() - t0
t0 = time.perf_counter()
CATALOG[%(name)r].spark_fn(spark, %(sf_dir)r).count()
cold = time.perf_counter() - t0
print(json.dumps({"startup_sec": round(startup, 3),
                  "cold_sec": round(cold, 3)}), flush=True)
spark.stop()
"""


def main() -> int:
    from bench import HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEADLINE
    results: dict[str, dict] = {}
    for name in names:
        child = _CHILD % {"repo": REPO, "name": name, "sf_dir": sf_dir}
        out = subprocess.run(
            [sys.executable, "-c", child],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            results[name] = {"error": out.stderr[-500:]}
        print(f"# {name}\t{results[name]}", file=sys.stderr, flush=True)

    # errored children must not silently deflate the headline total
    # (advisor r12): exclude them from the sum and surface the count.
    n_errors = sum(1 for r in results.values() if "cold_sec" not in r)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None  # SPARK_GRAFT_SF_DIR doesn't end in sf<number>
    payload = {
        "metric": "cold_jvm_queries_total_sec",
        "value": round(
            sum(r["cold_sec"] for r in results.values() if "cold_sec" in r),
            3,
        ),
        "unit": "sec",
        "queries": results,
        "n_errors": n_errors,
        "sf": sf,
    }
    with open(os.path.join(REPO, "scripts", "bench_cold_out.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
