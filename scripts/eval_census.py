"""Unmemoized-evaluation census for iterative/memoized entries (r12
verdict ask #7b): how many times does each base parquet table get
SCANNED, end-to-end, for one cold evaluation of an entry?

The r12 CC bug (edge list re-executing the whole MinHash pipeline once
per propagation round) was invisible to plan-shape tests — the final
plan looked fine; the re-execution happened across the SEPARATE JOBS
that per-round localCheckpoints spawn. This census therefore measures
at the session level, not the plan level: run the entry in a FRESH
subprocess (so session memos can't hide evaluations) with the Spark
event log enabled, then count per-table scan nodes across every
SQLExecutionStart in the log — each checkpoint materialization and
each action is its own execution, so loop re-evaluations show up as
repeated scans.

Usage: python scripts/eval_census.py [ENTRY ...]
    (defaults to the iterative/memoized family)
Prints one JSON line per entry:
    {"entry": name, "n_executions": j, "scans": {"documents": 2, ...}}
Findings are recorded in BENCH_NOTES.md; regressions in the CC family
are guarded by the accumulator eval-count tests
(tests/test_clusters.py, tests/test_graph.py).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the full censused family (r13 batches 1-3: iterative/memoized entries
# plus every localCheckpoint-bearing entry; expected multiplicities in
# BENCH_NOTES.md "Round 13" sections)
DEFAULT_ENTRIES = [
    "pagerank_event_graph",
    "dbscan_customers",
    "er_golden_records",
    "kmeans_embeddings",
    "dedup_minhash_lsh",
    "dedup_resolve_clusters",
    "graph_triangles",
    "simjoin_prefix",
    "recursive_reachability",
    "graph_core_peel",
    "bpe_merge_pairs",
    "dedup_simhash",
    "check_simhash_invariants",
    "semdedup_prune",
    "dedup_jaccard_pairs",
    "knn_graph_radius",
    "join_asof_tolerance",
    "ewma_control",
    "bloom_prefilter_join",
    "q16_supplier_part_counts",
    "q20_volume_share_suppliers",
    "q17_small_qty_revenue",
    "q21_sole_late_supplier",
    "two_phase_quantiles",
    "weighted_median",
    "events_burst_hours",
    "forecast_mase",
    "hierarchy_share",
    "geo_grid_join",
    "conformal_interval",
    "cohens_kappa",
    "orders_acf",
    "langid_confusion",
    "split_no_leakage",
]

_CHILD = r"""
import sys
sys.path.insert(0, %(repo)r)
from data_engineering_project_capstone_spark.plans.catalog import CATALOG
from data_engineering_project_capstone_spark.session import get_spark
spark = get_spark(
    app_name="eval_census",
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": %(log_dir)r,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
# collect(), not count(): under count() Catalyst can eliminate whole
# subtrees (e.g. a left join whose right side is provably unique and
# unreferenced — split_assign's component map), censusing a plan the
# driver never runs. collect() evaluates every output column.
CATALOG[%(name)r].spark_fn(spark, %(sf_dir)r).collect()
spark.stop()
"""


def census(name: str, sf_dir: str) -> dict:
    with tempfile.TemporaryDirectory() as log_dir:
        child = _CHILD % {"repo": REPO, "log_dir": log_dir,
                          "name": name, "sf_dir": sf_dir}
        out = subprocess.run(
            [sys.executable, "-c", child],
            capture_output=True, text=True, timeout=900, cwd=REPO,
        )
        if out.returncode != 0:
            return {"entry": name, "error": out.stderr[-500:]}
        scans: dict[str, int] = {}
        n_exec = 0
        log_files = [
            os.path.join(root, fn)
            for root, _dirs, files in os.walk(log_dir)
            for fn in files
            if not fn.startswith(".")
        ]
        for path in log_files:
            for line in open(path):
                if "SparkListenerSQLExecutionStart" not in line:
                    continue
                ev = json.loads(line)
                n_exec += 1
                desc = ev.get("physicalPlanDescription", "")
                # one "Location: ...<table>.parquet" per scan node.
                # The capture group accepts digits/uppercase (advisor
                # r13: a future table like events2.parquet must not
                # silently read as "no scans"), and any Location line
                # the name pattern still misses is surfaced as an
                # _unmatched_locations counter instead of dropped.
                n_loc = len(re.findall(r"Location:", desc))
                matched = re.findall(
                    r"Location:[^\n]*?/([A-Za-z0-9_\-]+)\.parquet", desc
                )
                for tbl in matched:
                    scans[tbl] = scans.get(tbl, 0) + 1
                if n_loc > len(matched):
                    scans["_unmatched_locations"] = (
                        scans.get("_unmatched_locations", 0)
                        + n_loc - len(matched)
                    )
        return {"entry": name, "n_executions": n_exec,
                "scans": dict(sorted(scans.items()))}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or DEFAULT_ENTRIES
    for name in names:
        print(json.dumps(census(name, sf_dir)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
