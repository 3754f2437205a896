"""operators.cc_fast.components_from_edges vs a reference union-find.

The r18 contraction CC replaces bounded-round propagation at the
dbscan/minhash/ER call sites; unlike those, it promises the EXACT
fixpoint at every scale and under every input layout. These tests pin
that contract directly: random graphs, a deep path (diameter far above
any sane round budget), negative ids (the xxhash64 domain), duplicate
and reversed edges, an empty edge list, and a many-partition input that
forces the multi-level merge path (partition count > _FANIN).
"""

from __future__ import annotations

import random

import pytest

from data_engineering_project_capstone_spark.operators.cc_fast import (
    components_from_edges,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_matches_union_find_random(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(-40, 40))  # negative ids: the xxhash64 key domain
    edges = sorted(
        {tuple(rng.sample(nodes, 2)) for _ in range(70)}
    )  # unordered pairs, may contain (b, a) duplicates of (a, b)
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["id"]: r["component"]
        for r in components_from_edges(df).collect()
    }
    assert got == _union_find(edges)


def test_deep_path_converges_exactly(spark):
    # diameter 200 — far beyond any fixed round budget; exactness must
    # not depend on depth
    edges = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(edges, ["a", "b"])
    got = components_from_edges(df).collect()
    assert len(got) == 201
    assert all(r["component"] == 0 for r in got)


def test_multilevel_merge_path(spark):
    """Force partition count > _FANIN so at least two contraction levels
    run (the fold-back join path), on a graph whose components straddle
    partitions heavily."""
    edges = [(i, i + 1) for i in range(300)] + [
        (1000 + i, 1000 + ((i + 1) % 50)) for i in range(50)
    ]
    df = spark.createDataFrame(edges, ["a", "b"]).repartition(130)
    got = {
        r["id"]: r["component"]
        for r in components_from_edges(df).collect()
    }
    assert got == _union_find(edges)


def test_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 4)]
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["id"]: r["component"]
        for r in components_from_edges(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert components_from_edges(df).count() == 0


def test_custom_column_names(spark):
    df = spark.createDataFrame([(7, 9), (9, 11)], ["name_a", "name_b"])
    got = {
        r["id"]: r["component"]
        for r in components_from_edges(df, "name_a", "name_b").collect()
    }
    assert got == {7: 7, 9: 7, 11: 7}
