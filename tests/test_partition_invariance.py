"""Partition-count invariance: results must be identical when the
shuffle partition count changes — the local stand-in for 'same answer on
a 32-core laptop and a 1000-executor cluster'.

Covers the entry classes where partitioning is most tempting to leak
into results: window dedup (per-partition order), top-k (partial heaps),
sessionization (per-user windows), hash-keyed sampling, iterative ML
(float fold order), and the XOR fingerprint (commutative fold).
"""

from __future__ import annotations

import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"

ENTRIES = [
    "dedup_first_wins",
    "topk_per_group",
    "events_sessionize",
    "sample_weighted",
    "kmeans_embeddings",
    "table_fingerprints",
    "pagerank_event_graph",
    "sketch_cms_topk",
    "simjoin_prefix",
    "graph_triangles",
    "q15_top_supplier",
    "rfm_segments",
    "quantile_norm_lengths",
    # r7: rank statistics + two-phase quantiles — argmax/ntile/rank
    # positions are exactly where a partition-order dependence would bite
    "ks_two_sample",
    "mann_whitney_u",
    "calibration_curve",
    "two_phase_quantiles",
    "weighted_median",
    "q21_sole_late_supplier",
    # r7f: cumulative sweep over the score histogram + lag over the day
    # series — both windows where partition-order dependence would bite
    "roc_auc_eval",
    "ewma_control",
    # r7h: 3×3 cell-probe blocking and B-fold Poisson explode — the pair
    # emission and per-resample sums must not depend on layout
    "geo_grid_join",
    "bootstrap_ci_mean",
    # r7i: iterative min-label propagation and per-point top-k ranking
    "dbscan_customers",
    "knn_graph_radius",
    # r7j: per-group nearest-rank quantile + hash-fold sums
    "target_encode_oof",
    "conformal_interval",
    # r7k: decorrelated lateral top-1 and trim-boundary ranking
    "lateral_topk",
    "trimmed_mean_price",
    # r7l: carry-forward fill + tolerance post-filter, recursive frontier
    "join_asof_tolerance",
    "recursive_reachability",
    # r8: min-equality tie join + LIMIT-100 total order — the kept set
    # must not depend on which partition saw a tying supplier first
    "q2_min_cost_supplier",
    # r11: entries whose shuffle structure changed this round — the
    # duplicate-identity distincts (new hash agg before a window / the
    # asof union-window) and the de-hinted flagship shapes now
    # stats/AQE-decided
    "dup_passage_docs",
    "join_asof_events",
    "q1_avg_price_by_nation",
    "join_multiway_revenue",
]


def _rows(spark, name):
    return sorted(
        tuple(r) for r in CATALOG[name].spark_fn(spark, SF).collect()
    )


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_under_shuffle_partition_count(spark, name):
    base_conf = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        seven = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        thirty_two = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_conf)
    assert seven == thirty_two, f"{name}: result depends on partition count"
