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


# ---------------------------------------------------------------------------
# kmeans_embeddings (catalog_r6e) — Lloyd's-algorithm invariants
# ---------------------------------------------------------------------------


def _lloyd_inertia(spark, iters):
    """Replicate the entry's long-form Lloyd steps with UNROUNDED
    distances and return total inertia after ``iters`` iterations."""
    from data_engineering_project_capstone_spark.plans.catalog import t
    from data_engineering_project_capstone_spark.plans.catalog_r6e import (
        _KM_K,
    )

    emb = t(spark, SF, "embeddings").filter(F.col("embedding").isNotNull())
    pts = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        ),
    )
    seeds = emb.select("vec_id").orderBy("vec_id").limit(_KM_K)
    cent = pts.join(F.broadcast(seeds), "vec_id").select(
        F.col("vec_id").alias("cid"), "pos", F.col("x").alias("cx")
    )
    assign = None
    for _ in range(iters):
        d = (
            pts.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("x") - F.col("cx")) ** 2).alias("d"))
        )
        assign = (
            d.groupBy("vec_id")
            .agg(F.min(F.struct("d", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.d").alias("d"))
        )
        cent = (
            pts.join(assign.select("vec_id", "cid"), "vec_id")
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("cx"))
        )
    return assign.agg(F.sum("d")).collect()[0][0]


def test_kmeans_inertia_monotone_nonincreasing(spark):
    """Lloyd's defining property: total inertia never increases with
    more iterations (each assignment and each centroid update is a
    local optimum step)."""
    i1 = _lloyd_inertia(spark, 1)
    i2 = _lloyd_inertia(spark, 2)
    assert i2 <= i1 + 1e-9, (i1, i2)


def test_kmeans_assigns_every_point(spark):
    from data_engineering_project_capstone_spark.plans.catalog import (
        CATALOG,
        t,
    )
    from data_engineering_project_capstone_spark.plans.catalog_r6e import (
        _KM_K,
    )

    rows = CATALOG["kmeans_embeddings"].spark_fn(spark, SF).collect()
    n_vec = (
        t(spark, SF, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .count()
    )
    assert sum(r["n_points"] for r in rows) == n_vec
    assert 1 <= len(rows) <= _KM_K
    assert all(r["inertia"] >= 0 for r in rows)


# ---------------------------------------------------------------------------
# nb_source_classifier (catalog_r6e) — pipeline structural invariants
# ---------------------------------------------------------------------------


def test_nb_classifies_every_test_doc_exactly_once(spark):
    """Confusion-matrix mass must equal the number of test-split docs
    with >= 1 token, and predictions must come from the train-source
    set — i.e. the split/score/argmax plumbing loses nothing."""
    from data_engineering_project_capstone_spark.plans.catalog import (
        CATALOG,
        t,
    )
    from data_engineering_project_capstone_spark.plans.catalog_r5 import _toks

    rows = CATALOG["nb_source_classifier"].spark_fn(spark, SF).collect()
    docs = t(spark, SF, "documents").filter(F.col("source").isNotNull())
    bucket = (
        F.conv(
            F.substring(F.md5(F.coalesce(F.col("text"), F.lit(""))), 1, 15),
            16,
            10,
        ).cast("long")
        % 100
    )
    with_tok = docs.filter(
        F.size(F.filter(_toks(), lambda x: x != "")) > 0
    )
    n_test = with_tok.filter(bucket >= 80).count()
    assert sum(r["n_docs"] for r in rows) == n_test
    train_sources = {
        r["source"]
        for r in with_tok.filter(bucket < 80).select("source").distinct().collect()
    }
    assert {r["predicted"] for r in rows} <= train_sources


# ---------------------------------------------------------------------------
# logreg_gd_weights (catalog_r6e) — gradient-descent invariants
# ---------------------------------------------------------------------------


def test_logreg_gd_decreases_log_loss(spark):
    """Two GD steps from w=0 must not increase the training log-loss
    (small fixed rate on a convex objective), and the weights must
    match a pure-Python replication of the two GD steps."""
    import math

    from data_engineering_project_capstone_spark.plans.catalog import (
        CATALOG,
        t,
    )
    from data_engineering_project_capstone_spark.plans.catalog_r5 import _toks
    from data_engineering_project_capstone_spark.plans.catalog_r6e import (
        _LR_RATE,
    )

    docs = t(spark, SF, "documents")
    top = (
        docs.filter(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "lang")
        .first()["lang"]
    )
    rows = docs.select(
        F.coalesce(F.col("lang") == F.lit(top), F.lit(False))
        .cast("int")
        .alias("y"),
        (F.col("n_chars") / 1000.0).alias("x1"),
        (F.size(F.filter(_toks(), lambda s: s != "")) / 100.0).alias("x2"),
    ).collect()
    w = {
        r["feature"]: r["weight"]
        for r in CATALOG["logreg_gd_weights"].spark_fn(spark, SF).collect()
    }
    assert set(w) == {0, 1, 2}

    def loss(w0, w1, w2):
        s = 0.0
        for r in rows:
            z = w0 + w1 * r["x1"] + w2 * r["x2"]
            p = 1.0 / (1.0 + math.exp(-z))
            p = min(max(p, 1e-12), 1 - 1e-12)
            s += -(r["y"] * math.log(p) + (1 - r["y"]) * math.log(1 - p))
        return s / len(rows)

    assert loss(w[0], w[1], w[2]) <= loss(0.0, 0.0, 0.0) + 1e-9

    # step-1 bias gradient closed form (p == 0.5 for every doc at w=0):
    # after ONE step, bias = rate * mean(y - 0.5). Recompute one python
    # GD step for all three weights and take step 2's direction on
    # trust: here we check only the step-1 value by re-deriving it.
    # full python replication of both steps:
    def gd(iters):
        ws = [0.0, 0.0, 0.0]
        for _ in range(iters):
            g = [0.0, 0.0, 0.0]
            for r in rows:
                z = ws[0] + ws[1] * r["x1"] + ws[2] * r["x2"]
                e = r["y"] - 1.0 / (1.0 + math.exp(-z))
                g[0] += e
                g[1] += r["x1"] * e
                g[2] += r["x2"] * e
            ws = [
                ws[j] + _LR_RATE * g[j] / len(rows) for j in range(3)
            ]
        return ws
    ref = gd(2)
    for j in range(3):
        assert abs(w[j] - ref[j]) < 1e-5, (j, w[j], ref[j])


def test_pagerank_checkpoint_regime_evaluates_edges_once(spark):
    """Once a mid-loop checkpoint fires (iterations > checkpoint_every),
    each checkpoint is a separate job, so unmaterialized loop-invariant
    inputs (edges/nodes/outdeg) would be re-executed per cut — the CC
    bug class (r12, clusters.py). An accumulator UDF on the edges input
    counts evaluations: the up-front materialization reads it once, and
    nothing else may (below the budget the single terminal action +
    ReusedExchange already guarantee this; the guard pins the
    checkpointing regime)."""
    from pyspark.sql import types as T

    n = 100
    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return x

    bump_udf = F.udf(bump, T.LongType())
    edges = spark.range(n).select(
        bump_udf(F.col("id")).alias("src"),
        ((F.col("id") + 1) % n).alias("dst"),
    )
    ranks = pagerank(edges, iterations=8, checkpoint_every=3)
    assert ranks.count() == n
    # upper bound carries n//2 slack: a (rare) retried task re-adds its
    # partition's accumulator count even with speculation pinned off
    # (advisor r12) — the guarded regression signal is >= 3x.
    assert n <= acc.value <= 2 * n + n // 2, (
        f"edges input evaluated {acc.value / n:.1f}x — loop-invariant "
        f"inputs are being recomputed inside the checkpointed loop "
        f"(expected <= 2x + retry slack; retried/speculative tasks "
        f"re-add counts)"
    )
