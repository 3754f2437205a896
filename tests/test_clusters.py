"""Connected components vs a reference union-find, and end-to-end dedup."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators.clusters import (
    connected_components,
    dedup_by_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_components_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(40)
        }
    )
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }
    expect = _union_find(edges)
    assert got == expect


def test_chain_converges(spark):
    # worst case for propagation: a long path graph
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = connected_components(df, max_iterations=40).collect()
    assert all(r["component"] == 0 for r in got)


def test_long_path_exceeding_budget_warns_and_undermerges(spark):
    """A budget too small for the diameter must surface a
    RuntimeWarning, and the partial labels are under-merged subsets
    (never a mix of two true components). With the r8 pointer-jump
    rounds, reach per round is multiplicative — a 1-round budget on a
    diameter-20 path reaches ~4 hops (1 edge + jump, then the confirm
    round's extra pair), still far short of converged."""
    edges = [(i, i + 1) for i in range(20)]  # path 0-…-20, diameter 20
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    with pytest.warns(RuntimeWarning, match="under-merged"):
        got = {
            r["id"]: r["component"]
            for r in connected_components(df, max_iterations=1).collect()
        }
    # every label must itself be a node of the (single) true component and
    # be ≤ the node id (min-label invariant) — subsets, not mixtures
    assert all(0 <= comp <= node for node, comp in got.items())
    # and it genuinely under-merged: not everything reached 0 in 5 hops
    assert any(comp != 0 for comp in got.values())


def test_long_path_with_budget_converges_quietly(spark):
    import warnings

    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = connected_components(df, max_iterations=30).collect()
    assert all(r["component"] == 0 for r in got)


def test_split_no_leakage_distribution(spark):
    """The leakage-safe split keeps roughly the 80/10/10 shape (cluster-
    level assignment shifts it only by cluster-size granularity) and the
    invariant row reports zero leaky clusters."""
    from data_engineering_project_capstone_spark.plans.catalog import (
        _split_assignments,
        split_no_leakage,
    )

    row = split_no_leakage(spark, "/root/testdata/sf0.01").collect()[0]
    assert row["n_leaky_clusters"] == 0
    assert row["n_coverage_violations"] == 0
    assert row["n_docs"] == 500
    # 3-way coverage is a DATA-dependent property (false on a 6-doc
    # corpus), so it lives here at real scale, not in the oracle row
    by_split = dict(
        _split_assignments(spark, "/root/testdata/sf0.01")
        .groupBy("split")
        .count()
        .collect()
    )
    assert set(by_split) == {"train", "val", "test"}
    # cluster-granularity 80/10/10: generous envelopes
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]


def test_dedup_by_components(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
    )
    kept = {r["doc_id"] for r in dedup_by_components(docs, pairs).collect()}
    # components {1,2,3} -> keep 1; {5,6} -> keep 5; singletons stay
    assert kept == {0, 1, 4, 5, 7}


def test_cc_evaluates_pairs_input_exactly_once(spark):
    """The edge list must be materialized ONCE before the propagation
    loop (r12): every round joins edges against the labels, and the
    per-probe label checkpoints are separate jobs, so an unmaterialized
    edge list re-executes the caller's entire pair-generation pipeline
    (MinHash LSH at the call sites) once per probe round — measured 40s
    vs 7s at sf0.1 and O(rounds × upstream-pipeline) at scale. A
    per-row accumulator UDF on the pairs input counts evaluations: the
    symmetric union reads pairs twice, and nothing else may."""
    from pyspark.sql import types as T

    n = 200
    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return x

    bump_udf = F.udf(bump, T.LongType())
    pairs = spark.range(n).select(
        bump_udf(F.col("id")).alias("id_a"),
        (F.col("id") + 1).alias("id_b"),
    )
    comps = connected_components(
        pairs, max_iterations=4, check_convergence=False
    )
    comps.count()
    # upper bound carries n//2 slack: a (rare) retried task re-adds its
    # partition's accumulator count even with speculation pinned off
    # (advisor r12) — the guarded regression signal is >= 3x.
    assert n <= acc.value <= 2 * n + n // 2, (
        f"pairs input evaluated {acc.value / n:.1f}x — the edge list is "
        f"being recomputed inside the propagation loop (expected <= 2x "
        f"+ retry slack; retried/speculative tasks re-add counts)"
    )
