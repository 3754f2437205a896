"""Near-dup cluster resolution: pair edges → connected components.

Pairwise near-dup detection (MinHash/SimHash/Jaccard) emits EDGES; an
actual dedup decision needs COMPONENTS (keep one doc per component). This
is the large-scale union-find: iterative min-label propagation over the
edge list, converging in O(log(diameter)) joins — the standard Spark
formulation (no GraphFrames dependency, plain DataFrame ops).

Iterative dataflow is a showcase of a genuinely non-single-SQL-expressible
operator: the driver's oracle records a rows-only check; tests verify
against a Python union-find on small graphs.

Scale notes: each iteration is one shuffle (groupBy min over neighbor
labels); near-dup graphs are overwhelmingly tiny stars/cliques, so 3-4
iterations close almost any real corpus. Label = min(doc_id) of the
component → deterministic canonical representative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import materialize


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 10,
    id_a: str = "id_a",
    id_b: str = "id_b",
    check_convergence: bool = True,
    probe_every: int = 2,
) -> DataFrame:
    """Edges (id_a, id_b) → (id, component) with component = min id
    reachable. Nodes appearing in no edge are absent (callers union
    singletons back if needed).

    Min-label propagation: every node repeatedly adopts the smallest label
    in its closed neighborhood until a full pass changes nothing.

    Convergence is detected by the label-sum invariant: the sum of labels
    is strictly decreasing until the fixpoint. Each probe is a scalar agg
    action — cheap, but at 100 TB still a full pass over the labels — so
    probes run every ``probe_every``-th iteration (the sum being unchanged
    across the probe gap still implies the fixpoint, since it decreases
    monotonically while anything changes). ``check_convergence=False``
    runs exactly ``max_iterations`` passes with no actions at all — the
    right mode when the graph is known to be shallow (near-dup graphs are
    stars/cliques that close in 2-3 rounds).

    Each iteration is an edge-propagation round (one hop) followed by a
    pointer-doubling jump (adopt my label's label), so reach grows
    multiplicatively rather than linearly in the iteration count — deep
    chains that plain propagation could never finish inside a fixed
    budget now converge in O(log-ish diameter) rounds (r8; the DBSCAN
    fixpoint probe proved the plain form under-converges at bench
    scale). If ``max_iterations`` is exhausted
    without a confirmed fixpoint (long paths/chains), ONE extra confirm
    round runs (so up to ``max_iterations + 1`` propagation rounds total
    with ``check_convergence``): an unchanged label sum proves the final
    round was already the fixpoint (labels are monotone non-increasing)
    and returns quietly; otherwise the extra round's progress is kept and
    a RuntimeWarning is raised — labels are then an under-merged partition
    (each emitted component is a subset of a true component, never a mix
    of two).
    """
    import warnings

    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
    )
    # Materialize the edge list ONCE before the loop. Every round joins
    # `edges` against the current labels, so an unmaterialized edge list
    # re-executes the caller's whole pair-generation pipeline (MinHash
    # LSH: shingle explode, signature agg, band shuffle, verify joins)
    # once per round — O(rounds × upstream-pipeline), measured 40s vs 7s
    # on the sf0.1 near-dup graph (r12, BENCH_NOTES) and catastrophic at
    # the 100 TB design point. (Cuts go through lineage.materialize:
    # reliable checkpoint when a checkpoint dir is configured, else
    # localCheckpoint — see operators/lineage.py for the executor-loss
    # fail-stop trade-off.) The labels' per-probe cuts cut
    # the LABEL lineage but never the edge lineage; this cut is the edge
    # twin. Edge lists are pair-count-sized (two longs per edge), so the
    # materialization is small at any SF.
    edges = materialize(edges, eager=True)
    # label(node) = min(node, min neighbor) to start
    labels = edges.groupBy("a").agg(F.min("b").alias("nbr_min")).select(
        F.col("a").alias("id"),
        F.least(F.col("a"), F.col("nbr_min")).alias("component"),
    )
    def _one_round(lbl: DataFrame) -> DataFrame:
        # propagate: node's new label = min(own label, neighbors' labels)
        nbr_labels = (
            edges.join(lbl, edges["b"] == lbl["id"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = lbl.join(
            nbr_labels, lbl["id"] == nbr_labels["a"], "left"
        ).select(
            "id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        # pointer-doubling jump: adopt my LABEL'S label. Every label is
        # itself a node id (the min id seen so far), so this is a
        # self-join of the label table — cheap next to the edge join,
        # and it turns K rounds of 1-hop reach into multiplicative
        # reach (r8: the DBSCAN fixpoint probe proved plain K-hop
        # propagation under-converges on deep components; same physics
        # here, so the same fix — the iteration budget now exhausts
        # only on pathologically deep label trees, and the confirm
        # round still catches exactly-at-budget convergence).
        par = stepped.select(
            F.col("id").alias("pid"), F.col("component").alias("pcomp")
        )
        return stepped.join(
            par, stepped["component"] == par["pid"], "left"
        ).select(
            "id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("pcomp"), F.col("component")),
            ).alias("component"),
        )

    def _label_sum(lbl: DataFrame):
        # decimal(38,0): labels may be full-range 64-bit hashes (graphs
        # keyed on xxhash64 ids) whose long sum overflows under ANSI;
        # the decimal sum is exact, so the monotone-decrease convergence
        # argument is unchanged
        return lbl.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum: int | None = None
    converged = False
    for it in range(max_iterations):
        labels = _one_round(labels)
        last_iter = it == max_iterations - 1
        probing = check_convergence and (
            (it + 1) % probe_every == 0 or last_iter
        )
        # Cut lineage only on probe rounds (the probe's action materializes
        # the checkpoint anyway, so the cut is free there). Between probes
        # lineage grows by one join — tolerable — while an eager cut every
        # round costs a full materialization per iteration (measured 3×
        # on the shallow-graph entries; same finding as operators/graph.py
        # pagerank, where uncut 5-iteration DAGs ran 0.6s vs 2.1s).
        if probing or (not check_convergence and (it + 1) % probe_every == 0):
            labels = materialize(labels, eager=True)
        if probing:
            cur = _label_sum(labels)
            if cur is None:
                # empty label set (no edges survived upstream filters):
                # a vacuous fixpoint, not a stalled propagation. Without
                # this, NULL sums never compare equal under the
                # prev_sum-is-not-None guard and an EMPTY graph warned
                # "no confirmed fixpoint" — caught by the degenerate-part
                # net via check_er_mass on a pairless corpus.
                converged = True
                break
            if prev_sum is not None and cur == prev_sum:
                converged = True
                break
            prev_sum = cur
    if check_convergence and not converged and prev_sum is None:
        # max_iterations == 0 (or no probe ever ran): nothing to confirm
        # against, and the caller budgeted zero propagation rounds — warn
        # without spending a confirm round.
        warnings.warn(
            "connected_components: zero propagation rounds ran; labels "
            "are the initial min-neighbor seed, not components",
            RuntimeWarning,
            stacklevel=2,
        )
        return labels
    if check_convergence and not converged:
        # Ambiguous exit: the sum was still decreasing at the last probe.
        # That covers BOTH "genuinely under-merged" and "converged exactly
        # at the budget" (a path of diameter == max_iterations finishes on
        # the final round, with no later probe to confirm it). One extra
        # confirm round disambiguates: labels are monotone non-increasing,
        # so an unchanged sum proves no label moved — return quietly (the
        # extra round's labels are identical by that same argument).
        confirm = materialize(_one_round(labels), eager=True)
        if _label_sum(confirm) == prev_sum:
            return confirm
        labels = confirm  # one more round of real progress: keep it
        warnings.warn(
            f"connected_components: no confirmed fixpoint within "
            f"{max_iterations} iterations (graph diameter likely exceeds "
            f"the budget); labels may be under-merged",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 10,
    check_convergence: bool = True,
) -> DataFrame:
    """Keep one row per near-dup component (the min-id representative) and
    every row not in any component. The end-to-end dedup decision."""
    comps = connected_components(
        pairs, max_iterations=max_iterations, check_convergence=check_convergence
    )
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
