"""Per-query profiling for the r19 optimization round.

For each headline query (or the names passed as argv): warm the session,
run the query twice with the noop sink (guide §1.4 — computes every
column, no driver collect), record wall times, Spark job/stage/task
counts via the StatusTracker delta, and dump .explain('formatted') to
plans/r18/<name>_<tag>.txt.

Usage: python3 scripts/profile_r19.py [tag] [name ...]
  tag defaults to 'before'. Names default to the bench HEADLINE list.
Output: one JSON line per query on stdout (times, jobs, stages, tasks).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from data_engineering_project_capstone_spark.plans.catalog import (  # noqa: E402
    CATALOG,
    _CC_MEMO_ATTR,
)
from data_engineering_project_capstone_spark.session import get_spark  # noqa: E402


def _tracker_counts(sc) -> tuple[int, int]:
    st = sc.statusTracker()
    jobs = st.getJobIdsForGroup(None) or []
    return (max(jobs, default=-1), 0)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r19",
    )
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(app_name="profile_r19")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from pyspark.sql import functions as F

    # same warmup as bench.py
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.select(F.md5("text").alias("h")).filter(F.col("h").isNotNull()).count()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    for name in names:
        if name == "dedup_minhash_lsh":
            memo = getattr(spark, _CC_MEMO_ATTR, None)
            if memo is not None:
                for key in [k for k in memo if isinstance(k, str)]:
                    del memo[key]
        fn = CATALOG[name].spark_fn
        sc.setJobDescription(f"profile:{name}")
        times = []
        job_counts = []
        for rep in range(2):
            st = sc.statusTracker()
            jobs_before = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            # same timed action as bench.py (count), so numbers are
            # directly comparable to the official per-query ledger
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            jobs_after = len(st.getJobIdsForGroup(None) or [])
            times.append(round(dt, 3))
            job_counts.append(jobs_after - jobs_before)
        sc.setJobDescription(None)
        # plan dump (fresh frame; memo state as after the runs)
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(
            json.dumps(
                {
                    "name": name,
                    "times": times,
                    "min": min(times),
                    "jobs": job_counts,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
