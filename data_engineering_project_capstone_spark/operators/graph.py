"""Join-based PageRank — the second iterative graph operator (connected
components lives in ``operators/clusters.py``).

PageRank on a DataFrame edge list, fixed iteration count, the classic
formulation r(v) = (1-d) + d·Σ_{u→v} r(u)/outdeg(u) (Page et al., 1999,
non-normalized variant: with no dangling nodes total mass is invariant
at N, so Σr is a built-in convergence diagnostic).

Scale shape per iteration: one join ranks⋈edges on src (broadcast the
rank vector only if the node set is small — by default both sides
shuffle-partition on the join key, the right choice for web-scale
graphs), one groupBy dst (map-side combined). Lineage is cut with
``lineage.materialize`` (reliable checkpoint when a checkpoint dir is
set, localCheckpoint otherwise — see operators/lineage.py for the
executor-loss fail-stop trade-off) every ``checkpoint_every``
iterations — needed on
DEEP runs, where the plan doubles per round and the optimizer chokes
by iteration ~8 (same hazard as clusters.py's label propagation). On
shallow runs the cut is pure overhead and is skipped: within one
uncut DAG Spark's ReusedExchange shares the edge/outdeg shuffles
across iterations, so 5 uncut iterations measured 0.6s vs 2.1s with
an eager cut every 2 (sf0.1 event graph) — hence the default cadence
of 6, which leaves runs at ≤6 iterations uncut. Fixed iterations, no
data-dependent driver loop: the iteration count is a hyperparameter,
so the whole run is a statically known dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import materialize


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 6,
) -> DataFrame:
    """Directed edges (src, dst) → (id, rank) after ``iterations`` rounds.

    Nodes are the union of endpoints; every rank starts at 1.0. Nodes
    with no out-edges contribute nothing (their mass leaks — standard
    for the non-normalized variant); nodes with no in-edges settle at
    (1 - damping). Deterministic given the edge multiset: no sampling,
    no rand, float-sum ordering is the only nondeterminism and is
    absorbed by caller-side rounding."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # Loop-invariant inputs: below the checkpoint budget the whole loop
    # is ONE terminal action, so ReusedExchange dedups the repeated
    # e/nodes/outdeg subtrees inside a single plan and materializing
    # them would only add jobs (the ledgered 3x regression from eager
    # per-round cuts). But once a MID-LOOP checkpoint fires, every
    # subsequent checkpoint is a separate job that re-plans — and
    # re-executes — the caller's whole edge pipeline per cut (the CC
    # bug class, r12: clusters.py materializes its edge list for
    # exactly this reason). Materialize the invariants up front only
    # when that regime is reachable.
    if iterations > checkpoint_every:
        e = materialize(e, eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    if iterations > checkpoint_every:
        nodes = materialize(nodes, eager=True)
        outdeg = materialize(outdeg, eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(iterations):
        contribs = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(outdeg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contribs, nodes["id"] == contribs["dst"], "left"
        ).select(
            "id",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = materialize(ranks, eager=True)
    return ranks
