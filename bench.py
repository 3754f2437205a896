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
    # r14: the memoized-CC consumer readout, timed immediately after
    # dedup_minhash_lsh so its first rep measures the consumer path
    # over already-materialized component labels (a regression in the
    # materialized-pairs path shows here as a jump from ~0.1s to the
    # full-pipeline cost)
    "dedup_resolve_clusters",
    "similarity_topk",        # brute-force cosine ANN baseline
    "join_asof_events",       # as-of join composition
    # r2 additions: heaviest post-r1 entries, so regressions are catchable
    "pack_sequences",         # two-pass chunked running-sum packing
    "chunk_documents",        # RAG chunk explode
    "decontaminate",          # broadcast n-gram decontamination
    "window_value_functions", # first/last/nth_value frames
    "subquery_correlated_avg",# correlated-subquery decorrelation
    # r5 additions: the heaviest of the new LLM-pipeline entries
    "dup_passage_docs",       # 5-gram shingle explode + count shuffle
    "token_bigram_pmi",       # unigram+bigram counts, vocab broadcast
    "bm25_scores",            # per-row tf folds + broadcast stats
    "embedding_quantize",     # array folds over the embedding corpus
    # r5 optimization targets, kept timed so they can't silently regress
    "dedup_jaccard_pairs",    # non-null block key (isnotnull-pushdown fix)
    "dedup_embedding_cosine", # norm-column pairwise cosine (3x fix)
    # r6 additions: corpus-statistics entries (all count-shuffle shapes)
    "kl_source_drift",        # per-source token-distribution KL drift
    "dsir_importance",        # DSIR log-ratio importance weights
    "exact_substr_spans",     # window-hash duplicated-span profiling
    # r6b additions: heaviest of the second round-6 batch
    "semdedup_prune",         # within-cluster pairwise + centroid cosines
    "boilerplate_windows",    # per-source window-hash df thresholding
    # r6c-e additions: the heaviest of the sketch/graph/skew families,
    # timed so they can't silently regress
    "sketch_cms_topk",        # count-min build + broadcast readout
    "skew_salted_join",       # differential hot-key salting + union
    "pagerank_event_graph",   # 5 join+agg iterations, lineage cuts
    # r6h additions: the two heaviest of the similarity/graph batch
    "simjoin_prefix",         # prefix-filtered exact similarity join
    "graph_triangles",        # per-edge adjacency-intersect triangles
    # r7 additions: the heaviest of the rank-statistics + TPC-H batches
    "mann_whitney_u",         # value-domain rank window over spend
    "q21_sole_late_supplier", # li join + double agg decorrelated EXISTS
    "q18_large_orders",       # fact groupBy-HAVING + survivor joins
    # r7h/r7i additions: the spatial family's two heavies. dbscan's
    # ~5-6s at sf0.1 is 10 fixed label-propagation rounds of scheduler
    # round-trips on tiny shuffles (stage-latency-bound, like pagerank);
    # on a real cluster the same rounds amortize over real data.
    "dbscan_customers",       # grid DBSCAN + bounded min-label CC
    "knn_graph_radius",       # bounded-radius kNN graph + top-k window
    # r8 additions: the TPC-H-family closers (Q1 is THE classic
    # scan-bound benchmark; Q2 is the heaviest of the adapted five)
    "q1_pricing_summary",     # faithful Q1: scan + 4-key hash agg
    "q2_min_cost_supplier",   # decorrelated min + tie join, dims bcast
    # r14 addition: the ER end-to-end pipeline (blocked levenshtein
    # pairs -> CC -> survivorship). NOT session-memoized — every rep
    # re-runs the full pipeline over its one materialize() cut, so its
    # first-rep aux field watches the r13 pair-materialization fix.
    "er_golden_records",
]

# The aux.dedup_minhash_lsh_unmemoized_warm_sec reading is only honest
# if dedup_minhash_lsh is the FIRST _minhash_components consumer to run
# (advisor r13: a reorder or an earlier memo-consumer addition would
# silently turn it into a memo-hit time). The session memo is also
# cleared explicitly before its first rep (belt), and this assertion
# pins the ordering (suspenders) so dedup_resolve_clusters's first rep
# stays a memo-HIT consumer readout as labeled.
# The previous round's HEADLINE set (r15 verdict ask #4): the headline
# grows over rounds, so the total alone can't be compared round-over-
# round. aux.prior_headline_subtotal_sec sums the current run's times
# over LAST round's query set, making the like-for-like delta
# mechanical (BENCH_r{N}.value vs BENCH_r{N+1}.aux subtotal). Update
# this freeze whenever HEADLINE changes: set it to the HEADLINE list as
# it stood in the round being shipped, BEFORE this round's additions.
_PRIOR_HEADLINE = [
    # r14's headline set (42 queries, BENCH_r14.json) — r15 adds none,
    # so this round's subtotal equals the total by construction.
    "agg_stats_summary", "join_multiway_revenue", "q3_pct_of_total",
    "topk_per_group", "dedup_first_wins", "dedup_exact",
    "text_token_stats", "events_hourly", "events_sessionize",
    "dedup_minhash_lsh", "dedup_resolve_clusters", "similarity_topk",
    "join_asof_events", "pack_sequences", "chunk_documents",
    "decontaminate", "window_value_functions", "subquery_correlated_avg",
    "dup_passage_docs", "token_bigram_pmi", "bm25_scores",
    "embedding_quantize", "dedup_jaccard_pairs", "dedup_embedding_cosine",
    "kl_source_drift", "dsir_importance", "exact_substr_spans",
    "semdedup_prune", "boilerplate_windows", "sketch_cms_topk",
    "skew_salted_join", "pagerank_event_graph", "simjoin_prefix",
    "graph_triangles", "mann_whitney_u", "q21_sole_late_supplier",
    "q18_large_orders", "dbscan_customers", "knn_graph_radius",
    "q1_pricing_summary", "q2_min_cost_supplier", "er_golden_records",
]
assert set(_PRIOR_HEADLINE) <= set(HEADLINE), (
    "prior-round headline entries must never be dropped from HEADLINE "
    "(regressions would become invisible); retire an entry only with a "
    "BENCH_NOTES rationale and a pin update here"
)

_MINHASH_MEMO_CONSUMERS = {
    "dedup_minhash_lsh",
    "dedup_resolve_clusters",
    "check_minhash_containment",
    "check_cluster_consistency",
    "split_no_leakage",
    "dup_graph_degree",
}
assert HEADLINE.index("dedup_minhash_lsh") == min(
    HEADLINE.index(n) for n in _MINHASH_MEMO_CONSUMERS if n in HEADLINE
), "dedup_minhash_lsh must precede every other _minhash_components consumer"


def _cpu_probe() -> float:
    """Single-thread deterministic CPU calibration: wall time of a fixed
    2M-iteration integer loop. Attribution evidence for a failure mode
    the r18 session measured directly: on this virtualized host,
    hypervisor-level contention is INVISIBLE to both loadavg and
    /proc/stat steal (a 49.6s capture ran with 1-min loadavg 0.06 at
    the gate, ~90% guest idle and steal=0.0% sampled every 5s
    throughout — yet wall time inflated ~40% vs the quiet-host value).
    The probe exposes that time dilation directly: readings materially
    above the quiet-host band (~0.18-0.21s on this image, recorded in
    BENCH_NOTES r18) mean the capture ran time-dilated and the headline
    is NOT comparable value-vs-value, whatever the loadavg said.
    Used two ways, neither touching the measurement protocol itself:
    as a retry signal in the capture-start gate (alongside loadavg),
    and as per-pass evidence in aux.cpu_probe_sec."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFF
    assert acc >= 0  # keep the loop un-elidable
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Load-aware capture, part 1 (r15 verdict ask #1, hardened per r17
    # verdict ask #2): BENCH_r15's +14% and BENCH_r17's +10% headline
    # inflations were both pure host load. The original single-sleep
    # gate admitted r17's capture at loadavg 1.98 — 1% under the old
    # 2.0 threshold and climbing. Hardened form: bounded retry loop —
    # keep sleeping 60s until the 1-min loadavg drops below 1.5, up to
    # 5 sleeps. All readings land in aux.loadavg_gate_readings so the
    # artifact shows the full gate history (N+1 readings = N sleeps; a
    # final reading >= 1.5 = retries exhausted on a sustained-busy
    # host). Only WHEN the capture starts changes — the measurement
    # protocol below (warmup, 2 passes x 2 reps, min-of-4) is
    # untouched, so round-over-round value-vs-value comparability is
    # preserved. Retries exhausting doesn't abort (the min-of-2 full
    # passes below is still the main noise filter); it just leaves the
    # evidence for drift attribution.
    # The gate retries on EITHER signal being hot (r18 session
    # measurement): a capture that started at 1-min loadavg 0.06 ran
    # 42.8s vs the 35.9s quiet value because the host was time-dilated
    # by hypervisor-level contention loadavg cannot see — but the CPU
    # probe read 0.304s (+52% over the 0.18-0.21s quiet band) BEFORE
    # any Spark work started. Probe-out-of-band therefore also trips
    # the retry; both series land in aux.
    GATE_THRESHOLD = 1.5
    GATE_MAX_SLEEPS = 5
    PROBE_GATE_THRESHOLD = 0.25  # quiet band ~0.18-0.21s + margin
    gate_readings = [round(os.getloadavg()[0], 2)]
    probe_gate_readings = [_cpu_probe()]
    for _ in range(GATE_MAX_SLEEPS):
        if (
            gate_readings[-1] < GATE_THRESHOLD
            and probe_gate_readings[-1] < PROBE_GATE_THRESHOLD
        ):
            break
        time.sleep(60)
        gate_readings.append(round(os.getloadavg()[0], 2))
        probe_gate_readings.append(_cpu_probe())
    # capture-start probe = the gate's final reading; two more follow,
    # one after each pass
    cpu_probes = [probe_gate_readings[-1]]
    load_start = os.getloadavg()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    # PROBE_CHECKPOINT_DIR (same contract as scripts/executor_loss_probe
    # .py): set it to bench the RELIABLE-checkpoint path — every
    # lineage.materialize cut becomes an eager reliable checkpoint
    # instead of a localCheckpoint (r15 verdict ask #3: the steady-state
    # storage-round-trip overhead a 100 TB deployment decision needs;
    # see BENCH_NOTES.md for the measured per-query deltas). Unset =
    # the default local path the driver records.
    ckpt = os.environ.get("PROBE_CHECKPOINT_DIR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)

    # Warm the JVM once so timings measure plans, not first-touch costs:
    # a shuffle (exchange + hash-agg codegen), a parquet scan of each hot
    # table, and one string-hash pass (md5/regex codegen).
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # filter on the hash so count() can't prune the md5 away
    docs.select(F.md5("text").alias("h")).filter(F.col("h").isNotNull()).count()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    # Load-aware capture, part 2 (r15 verdict ask #1): TWO full passes
    # over the headline set, per-query result = min across passes (each
    # pass is itself the standing 2-rep min, so a query's recorded time
    # is min-of-4 with the reps split ~2 minutes apart). A transient
    # host-load episode that inflates one pass leaves the other clean;
    # sustained load shows up as near-equal inflated pass totals in
    # aux.pass_totals_sec plus hot loadavg readings — honestly
    # distinguishable from a code regression (which inflates the SAME
    # queries in BOTH passes). The session memo is re-cleared before
    # dedup_minhash_lsh in each pass, so both rep-0 readings stay
    # honest unmemoized costs and the aux first-rep fields below take
    # the cross-pass min.
    times: dict[str, float] = {}
    first_rep: dict[str, float] = {}
    pass_totals: list[float] = []
    pass_loads: list[float] = []
    for _pass in range(2):
        pass_loads.append(round(os.getloadavg()[0], 2))
        pass_best: dict[str, float] = {}
        for name in HEADLINE:
            if name == "dedup_minhash_lsh":
                # clear the MINHASH keys of the session CC memo so rep 0
                # is the honest warm UNMEMOIZED cost of the full LSH ->
                # CC pipeline even if a future HEADLINE edit puts
                # another consumer first. Only the minhash entries
                # (plain sf_dir keys) are dropped — delattr-ing the
                # whole memo dict would also evict the
                # ("simhash_sig", sf_dir) entry and silently re-charge
                # the simhash pipeline cost to a later consumer's
                # timing (advisor r14).
                from data_engineering_project_capstone_spark.plans.catalog import (
                    _CC_MEMO_ATTR,
                )

                memo = getattr(spark, _CC_MEMO_ATTR, None)
                if memo is not None:
                    for key in [k for k in memo if isinstance(k, str)]:
                        del memo[key]
            fn = CATALOG[name].spark_fn
            best = float("inf")
            for rep in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                if rep == 0:
                    first_rep[name] = min(first_rep.get(name, dt), dt)
                best = min(best, dt)
            pass_best[name] = best
            # keep the raw float across passes; round ONCE when building
            # the output dict below, mirroring pass_best/pass_totals
            # (advisor r16: min(rounded, raw) could differ from the true
            # cross-pass min by up to 0.0005s per query)
            times[name] = min(times.get(name, best), best)
        pass_totals.append(round(sum(pass_best.values()), 3))
        cpu_probes.append(_cpu_probe())

    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(times.values()), 3),  # summed raw, rounded once
        "unit": "sec",
        "queries": {name: round(t, 3) for name, t in times.items()},
        # Standing dual number for the session-memoized CC-consumer
        # family (r12 verdict ask #4): its min-of-2 times the memo hit,
        # so a regression in the UNMEMOIZED pipeline (the r12 CC
        # edge-materialization bug class) would be invisible in
        # `queries`. The first rep of dedup_minhash_lsh is the first
        # touch of the session memo — the honest warm unmemoized cost
        # of the full LSH → CC pipeline.
        "aux": {
            "dedup_minhash_lsh_unmemoized_warm_sec": round(
                first_rep["dedup_minhash_lsh"], 3
            ),
            # r14 (r13 verdict ask #3): first-rep twins for the other
            # materialized-pairs consumers. dedup_resolve_clusters runs
            # right after the memo fill — its first rep is the memo-HIT
            # consumer readout (regression here = the components/pairs
            # stopped being materialized). er_golden_records is
            # unmemoized — its first rep is the full warm ER pipeline
            # over its single materialize() cut.
            "dedup_resolve_clusters_first_rep_sec": round(
                first_rep["dedup_resolve_clusters"], 3
            ),
            "er_golden_records_first_rep_sec": round(
                first_rep["er_golden_records"], 3
            ),
            # like-for-like subtotal over LAST round's headline set
            # (r15 verdict ask #4): compare against the previous
            # BENCH_r{N}.value directly, no prose arithmetic
            "prior_headline_subtotal_sec": round(
                sum(times[n] for n in _PRIOR_HEADLINE), 3
            ),
            # host-load context for round-over-round drift attribution:
            # the r8-r12 inflation episodes were all host, not code
            # (BENCH_NOTES drift protocol) — recording the 1/5/15-min
            # loadavg around the run lets the canary A/B start from the
            # ledger instead of a fresh probe.
            "loadavg_start": [round(x, 2) for x in load_start],
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            # load-aware capture evidence (r15 ask #1, r17 ask #2): the
            # full gate history (N+1 readings = N 60s sleeps; a final
            # reading >= 1.5 means the bounded retries exhausted on a
            # sustained-busy host), each full pass's subtotal of
            # per-pass bests, and the 1-min loadavg at each pass start.
            # Near-equal pass totals + quiet loads = trustworthy
            # headline; a divergent pair shows exactly which pass a
            # load episode hit.
            "loadavg_gate_readings": gate_readings,
            # the gate's probe series, parallel to loadavg_gate_readings
            # (r18): a final reading >= 0.25 = retries exhausted on a
            # sustained-dilated host.
            "probe_gate_readings": probe_gate_readings,
            "pass_totals_sec": pass_totals,
            "pass_loadavg_1min": pass_loads,
            # deterministic single-thread calibration (r18): [start,
            # after pass 1, after pass 2]. Quiet-host band ~0.18-0.21s
            # on this image (BENCH_NOTES r18); readings materially above
            # it = hypervisor-level time dilation that loadavg and
            # steal accounting both miss — the capture is contaminated
            # even if every loadavg field reads quiet.
            "cpu_probe_sec": cpu_probes,
            # advisor r15: make a reliable-path run's output line
            # distinguishable from a default local-path line, so an
            # env-polluted capture can't silently conflate the two
            # configurations in the round-over-round ledger.
            "reliable_checkpoint_path": ckpt or None,
        },
        "sf": float(sf),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
