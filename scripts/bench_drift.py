"""Bench-drift bisection (round 6, VERDICT r5 'What's wrong #1').

BENCH_r05's shared-17 subtotal drifted ~+25% vs BENCH_r03 uniformly across
trivial and heavy queries. Candidates: (a) machine noise between rounds,
(b) the InferFiltersFromGenerate exclusion added in r5 taxing all plans,
(c) registry/session growth. This script quantifies (a) and (b) directly:
it runs the EXACT r3 17-query list under the current code, N repetitions,
once with the r5 session conf and once with the exclusion removed, and
prints per-config totals + per-query spreads.

Usage: python scripts/bench_drift.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R3_LIST = [
    "agg_stats_summary",
    "join_multiway_revenue",
    "q3_pct_of_total",
    "topk_per_group",
    "dedup_first_wins",
    "dedup_exact",
    "text_token_stats",
    "events_hourly",
    "events_sessionize",
    "dedup_minhash_lsh",
    "similarity_topk",
    "join_asof_events",
    "pack_sequences",
    "chunk_documents",
    "decontaminate",
    "window_value_functions",
    "subquery_correlated_avg",
]

R3_TIMES = {  # BENCH_r03 parsed.queries — the reference point
    "agg_stats_summary": 0.362, "join_multiway_revenue": 0.746,
    "q3_pct_of_total": 0.394, "topk_per_group": 0.402,
    "dedup_first_wins": 0.296, "dedup_exact": 0.223,
    "text_token_stats": 0.122, "events_hourly": 0.198,
    "events_sessionize": 0.348, "dedup_minhash_lsh": 0.8,
    "similarity_topk": 0.424, "join_asof_events": 0.181,
    "pack_sequences": 0.352, "chunk_documents": 0.137,
    "decontaminate": 0.534, "window_value_functions": 0.115,
    "subquery_correlated_avg": 0.18,
}


def run_config(label: str, extra_conf: dict[str, str], reps: int) -> dict:
    from data_engineering_project_capstone_spark.plans.catalog import CATALOG
    from data_engineering_project_capstone_spark.session import get_spark
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"bench_drift_{label}", extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.select(F.md5("text").alias("h")).filter(F.col("h").isNotNull()).count()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    per_query: dict[str, list[float]] = {n: [] for n in R3_LIST}
    for _ in range(reps):
        for name in R3_LIST:
            fn = CATALOG[name].spark_fn
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            per_query[name].append(time.perf_counter() - t0)
    spark.stop()

    mins = {n: round(min(v), 3) for n, v in per_query.items()}
    return {
        "label": label,
        "total_min_sec": round(sum(mins.values()), 3),
        "queries_min": mins,
        "queries_all": {n: [round(x, 3) for x in v] for n, v in per_query.items()},
        "vs_r3": {n: round(mins[n] / R3_TIMES[n], 2) for n in R3_LIST},
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results = []
    # config A: current session conf exactly as bench.py uses it
    results.append(run_config("r5_conf", {}, reps))
    # config B: re-enable InferFiltersFromGenerate (the r5 conf delta)
    results.append(
        run_config("no_exclusion", {"spark.sql.optimizer.excludedRules": ""}, reps)
    )
    for r in results:
        print(json.dumps({k: r[k] for k in ("label", "total_min_sec", "vs_r3")}))
    with open(os.path.join(os.path.dirname(__file__), "bench_drift_out.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("r3 total:", round(sum(R3_TIMES.values()), 3))


if __name__ == "__main__":
    main()
