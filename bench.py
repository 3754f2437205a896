"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over the headline set (excluding Spark
startup); per-query times are action-to-completion (count() to drain the
plan without driver-side collect overhead dominating).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_project_capstone_spark.plans.catalog import CATALOG
from data_engineering_project_capstone_spark.session import get_spark

HEADLINE = [
    "agg_stats_summary",      # TPC-H Q1 hash-agg workload
    "join_multiway_revenue",  # 4-hop broadcast join chain + agg
    "q3_pct_of_total",        # capstone flagship shape
    "topk_per_group",         # window ranking
    "dedup_first_wins",       # per-key window dedup
    "dedup_exact",            # fingerprint dedup on documents
    "text_token_stats",       # text analysis
    "events_hourly",          # time-bucket aggregation
    "events_sessionize",      # lag+cumsum sessionization
    "dedup_minhash_lsh",      # banded MinHash near-dup
    "similarity_topk",        # brute-force cosine ANN baseline
    "join_asof_events",       # as-of join composition
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure the plans
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = CATALOG[name].spark_fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
