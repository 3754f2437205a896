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

# measured call+setup+teardown seconds per file (round-8 LATE re-run
# after the NULL-key net growth; --durations=0 aggregation across 4
# shards). test_properties is hand-set to its post-cap value (the CC
# hypothesis test now runs 10 examples); test_pixels_multiformat's
# durations are swallowed by the report, so its weight is a
# standalone wall measurement. Anything unlisted defaults to 5.
WEIGHTS = {
    # 247 entries × 6 limit corpora (r11: +onerow/alldup/mixdup/dupnull
    # since the 130-weight measurement); ~65s per corpus sweep + startup,
    # measured from a single-corpus -k run on an otherwise idle host
    "test_degenerate_empty_allnull.py": 450,
    "test_extreme_values.py": 38,  # 2 money corpora over the fold inventory
    "test_weirdtext.py": 105,  # 68 docs consumers × control-char corpus
    "test_aqe_invariance.py": 200,  # 32 shuffle-sensitive entries × 2 sessions
    "test_codegen_invariance.py": 75,  # same entry list × interpreted session
    "test_reader_invariance.py": 300,  # 247 entries × parquet-mr session
    "test_sortagg_impl_invariance.py": 65,  # 43 entries × fallback operators
    "test_allflips_invariance.py": 70,  # 36 entries × all flips at once
    "test_ansi_invariance.py": 78,  # 36 entries × ANSI-off (Spark 3.x default) session
    "test_output_roundtrip.py": 260,  # 247 entry outputs × write+readback
    "test_stream_checkpoint_restart.py": 16,
    "test_local_cluster_parity.py": 120,  # 38 entries × real 2-JVM cluster subprocess
    "test_executor_loss.py": 45,  # kill an executor mid-query, compare result
    "test_dynalloc_parity.py": 112,  # 6 entries × dynamic-allocation churn cluster
    "test_runtime_profile_parity.py": 134,  # 38 entries × Kryo/off-heap/zstd cluster
    "test_schema_shape.py": 260,  # 247 entries × 2 physical layouts, sf0.001
    "test_degenerate_docs.py": 189,
    "test_oracle_differential.py": 150,
    "test_oracle_fold_stability.py": 50,  # 239 oracles × 2 DuckDB thread counts
    "test_fuzz_differential.py": 72,  # 27 entries × 2 seeded corpora
    "test_fuzz_events.py": 110,  # 36 events consumers × 3 seeded corpora
    "test_fuzz_docs.py": 130,  # 67 docs consumers × 2 seeded corpora
    "test_fuzz_dims.py": 75,  # 60 dims consumers × 2 seeded corpora
    "test_fuzz_embeddings.py": 55,  # 14 vector consumers × 2 seeded corpora
    "test_fuzz_combined.py": 75,  # 45 multi-table entries × 3 all-random corpora
    "test_plan_shapes.py": 148,
    "test_properties.py": 130,
    "test_determinism.py": 108,
    "test_partition_invariance.py": 58,
    "test_cc_memo.py": 47,
    "test_clusters.py": 43,
    "test_degenerate_orders.py": 40,
    "test_dedup_similarity.py": 35,
    "test_degenerate_customer.py": 24,
    "test_streaming.py": 22,
    "test_events_layout.py": 21,
    "test_degenerate_lineitem.py": 19,
    "test_graph.py": 19,
    "test_degenerate_events.py": 17,
    "test_degenerate_embeddings.py": 13,
    "test_r5_entries.py": 13,
    "test_pixels_multiformat.py": 13,
    "test_r6f_entries.py": 11,
    "test_flagship_sql_forms.py": 11,
    "test_r6c_entries.py": 10,
    "test_r6b_entries.py": 10,
    "test_r6h_entries.py": 10,
    "test_degenerate_supplier.py": 10,
    "test_degenerate_part.py": 9,
    "test_pipeline_driver.py": 9,
    "test_csv_roundtrip.py": 8,
    "test_degenerate_nation_region.py": 8,
    "test_r7i_entries.py": 8,
    "test_approx.py": 7,
    "test_capstone_pipeline.py": 6,
    "test_r7b_entries.py": 6,
    "test_zorder_layout.py": 6,
    "test_r7_entries.py": 5,
    "test_r6j_entries.py": 5,
    "test_watermark_late_data.py": 4,
    "test_r6l_entries.py": 4,
    "test_stateful_skew_partition.py": 4,
    "test_r6_entries.py": 4,
    "test_r6d_entries.py": 4,
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
    # 12g driver heap per shard JVM (4 shards = 48g of the 128g box):
    # the plan-shapes shard builds every catalog plan, several with
    # eager localCheckpoint blocks that accumulate ahead of the
    # ContextCleaner — at 8g that shard died in BroadcastExchange with
    # "Not enough memory to build and broadcast" (see BENCH_NOTES
    # round-8 post-mortem).
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
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
                    env=env,
                ),
            )
        )
    rc = 0
    for i, p in procs:
        out, _ = p.communicate()
        with open(f"/tmp/pytest_shard_{i}.log", "w") as fh:
            fh.write(out)  # full log for post-mortem (tail below)
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- shard {i} (exit {p.returncode}) ---\n{tail}")
        if p.returncode not in (0, 5):  # 5 = no tests collected (empty -k)
            rc = 1
    print(f"total wall: {time.monotonic() - t0:.0f}s across {len(procs)} shards")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
