"""Contraction-based EXACT connected components (r18 optimization).

Replaces bounded-round min-label propagation for call sites that need
the CONVERGED labels (component = min node id reachable). The propagation
form pays K passes over the FULL edge list — at sf0.1 the dbscan loop was
16 unrolled (edge-join + pointer-jump) round pairs ≈ 96 AQE stage-jobs of
pure scheduler latency, and at 100 TB it is 16 shuffles of the complete
edge list. This operator touches the edge list ONCE:

1. **Partition-local contraction** (guide §4.2's batch-native escape
   hatch): a ``mapInPandas`` union-find over each partition of the edge
   list emits ``(id, root)`` with root = min node id of the node's
   partition-local component. No shuffle — the pass runs on the edge
   list's existing layout, and only two long columns cross the Arrow
   boundary.
2. **Root merge, driver-bounded**: a node seen in several partitions may
   get different roots; ``groupBy(id).min(root)`` plus edges connecting
   each node's other roots to its min root form a CONTRACTED graph over
   roots (node-count-sized at worst, usually far smaller). Recurse on it
   with the partition count divided by ``_FANIN`` per level, so the level
   count is ≤ log_FANIN(P) + 1 and the last level is a single-partition
   union-find — exact by construction.
3. **Label fold-back**: each level's ``(id, min-root)`` mapping left-joins
   the next level's component labels; absent roots are already final.

Exactness: a partition-local union-find with union-by-min yields, per
local tree, the min id of the local component. For a component whose
global min is ``g``, every local root of ``g`` is ``g`` itself (a root is
≤ its members' ids and is itself a member id, and ``g`` is the global
min), so ``g`` survives as a root at every level and the single-partition
base case labels the whole contracted component ``g``. Components that
never straddle a partition short-circuit at their level (their min root
IS ``g`` and never appears in the contracted graph). The result is the
true fixpoint at EVERY scale — no round budget, no under-convergence
risk, and therefore deterministic and partition-layout-invariant even
though the intermediate local forests are layout-dependent.

Scale shape at 100 TB: one linear pass over the edges (parallel Python
union-find per ~64 MB task), then log-many passes over data that shrinks
from node-count-sized to nothing. Compare: K-round propagation is
K × (full edge shuffle + label join). Worker memory per task is bounded
by the task's distinct-node count (compacted int64 arrays), which
partition sizing already bounds.

NULL policy: callers must not pass NULL keys (every current call site
joins on non-null key columns by construction).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import materialize

# Partition fan-in per merge level: each level runs on at most
# ceil(previous/_FANIN) partitions, so levels ≤ log_FANIN(P) + 1.
_FANIN = 64

_CC_SCHEMA = "id long, root long"


def _uf_partition(batches: Iterator) -> Iterator:
    """Union-find over one partition's edges → (id, root) per distinct
    node, root = min id of the partition-local component. Heavy state
    (the parent table) lives once per task; batches only append edges."""
    import numpy as np
    import pandas as pd

    srcs: list = []
    dsts: list = []
    for pdf in batches:
        if len(pdf):
            srcs.append(pdf["a"].to_numpy(dtype="int64", copy=False))
            dsts.append(pdf["b"].to_numpy(dtype="int64", copy=False))
    if not srcs:
        return
    a = np.concatenate(srcs)
    b = np.concatenate(dsts)
    # compact ids -> [0, n) so the parent table is a flat list
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(nodes)
    ia = inv[: len(a)].tolist()
    ib = inv[len(a) :].tolist()
    parent = list(range(n))
    # nodes[] is sorted ascending, so smaller index == smaller id;
    # union-by-min on indices is union-by-min on ids.
    for x, y in zip(ia, ib):
        while parent[x] != x:  # find with path halving
            parent[x] = parent[parent[x]]
            x = parent[x]
        while parent[y] != y:
            parent[y] = parent[parent[y]]
            y = parent[y]
        if x != y:
            if y < x:
                x, y = y, x
            parent[y] = x
    roots = np.empty(n, dtype="int64")
    for i in range(n):
        x = i
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        roots[i] = x
    yield pd.DataFrame({"id": nodes, "root": nodes[roots]})


def components_from_edges(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Edges ``(src, dst)`` → ``(id, component)`` with component = min id
    reachable, for every node appearing in at least one edge. Exact (true
    fixpoint) at any scale; see module docstring for the algorithm.

    The caller should pass a MATERIALIZED edge list (every current call
    site already cuts it); this function cuts only its own per-level
    intermediates (via lineage.materialize: reliable checkpoints when the
    session has a checkpoint dir, localCheckpoint otherwise)."""
    cur = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    fold_back: list[DataFrame] = []
    # partition count is probed ONCE on the (materialized) input; later
    # levels derive it arithmetically from the coalesce target, so no
    # .rdd access ever finalizes an un-executed adaptive plan
    nparts = cur.rdd.getNumPartitions()
    while True:
        mapped = cur.mapInPandas(_uf_partition, _CC_SCHEMA)
        if nparts <= 1:
            # single-partition union-find: exact labels for this level
            comp = mapped.select("id", F.col("root").alias("component"))
            break
        # two consumers (node_min + contracted) -> cut once
        mapped = materialize(mapped, eager=True)
        node_min = mapped.groupBy("id").agg(F.min("root").alias("m"))
        contracted = (
            mapped.join(node_min, "id")
            .filter(F.col("root") != F.col("m"))
            .select(F.col("m").alias("a"), F.col("root").alias("b"))
            .distinct()
        )
        fold_back.append(node_min)
        # strictly decreasing partition count -> termination in
        # ≤ log_FANIN(P) + 1 levels; coalesce is narrow (no shuffle)
        nparts = max(1, nparts // _FANIN)
        cur = contracted.coalesce(nparts)
    for node_min in reversed(fold_back):
        comp = (
            node_min.join(comp, node_min["m"] == comp["id"], "left_outer")
            .select(
                node_min["id"].alias("id"),
                F.coalesce(comp["component"], node_min["m"]).alias(
                    "component"
                ),
            )
        )
    # Labels are two longs per node and every call site consumes them at
    # least once (several consume them many times: dbscan's border/member
    # readouts, the session-memoized minhash components) — cut once here
    # so consumers read a leaf instead of re-running the fold-back joins
    # and the base-level union-find pass.
    return materialize(comp, eager=True)
