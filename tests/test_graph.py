"""PageRank operator invariants: a Python reference implementation on
small graphs, mass conservation on the catalog's bipartite graph."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators.graph import pagerank
from data_engineering_project_capstone_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _py_pagerank(edges, iterations=5, damping=0.85):
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    outdeg = defaultdict(int)
    for a, _ in edges:
        outdeg[a] += 1
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        s = defaultdict(float)
        for a, b in edges:
            s[b] += ranks[a] / outdeg[a]
        ranks = {n: (1 - damping) + damping * s[n] for n in nodes}
    return ranks


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["id"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_two_cycle_is_fixed_point(spark):
    got = _run(spark, [("a", "b"), ("b", "a")])
    assert abs(got["a"] - 1.0) < 1e-12 and abs(got["b"] - 1.0) < 1e-12


def test_matches_python_reference_on_star_graph(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("c", "b")]
    want = _py_pagerank(edges)
    got = _run(spark, edges)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n


def test_dangling_node_leaks_mass(spark):
    # c has no out-edges: its mass leaks, total < N
    got = _run(spark, [("a", "b"), ("b", "c")])
    assert sum(got.values()) < 3.0
    # a receives nothing: settles at exactly (1 - damping)
    assert abs(got["a"] - 0.15) < 1e-12


def test_bipartite_entry_conserves_mass(spark):
    """The catalog graph has edges in both directions (no dangling), so
    Σ rank == N at every iteration; also every node ≥ (1 - damping)."""
    from data_engineering_project_capstone_spark.plans.catalog import (
        events_table,
    )

    ev = events_table(spark, SF)
    pairs = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).distinct()
    edges = pairs.select(
        F.col("u").alias("src"), F.col("t").alias("dst")
    ).union(pairs.select(F.col("t").alias("src"), F.col("u").alias("dst")))
    ranks = pagerank(edges, iterations=5)
    n = ranks.count()
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - n) < 1e-6 * n
    assert ranks.filter(F.col("rank") < 0.15 - 1e-12).count() == 0
    got = CATALOG["pagerank_event_graph"].spark_fn(spark, SF).collect()
    assert len(got) > 0 and all(r["rank"] > 0.15 for r in got)
