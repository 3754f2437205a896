"""Round-7i catalog entries — density clustering and kNN graphs on the
grid-blocked integer geometry introduced by ``catalog_r7h``:

- ``dbscan_customers``: full DBSCAN (eps=25, minPts=4) over the
  content-addressed customer coordinates. Every stage is the
  distributed form: neighbor degrees from the radius-sized-cell 3×3
  probe (provably lossless for eps ≤ cell size), core flags, an edge
  list between core points, and connected components via EXACT
  contraction-based union-find (r18: ``operators.cc_fast`` — one
  partition-local union-find pass over the edge list + a
  driver-bounded root merge; see that module for the exactness proof
  and 100 TB shape). The r8–r17 form was K=16 unrolled
  (edge-propagate + pointer-jump) round PAIRS — correct (proven
  converged at every driver SF) but ~96 AQE stage-jobs of scheduler
  latency at sf0.1 and 16 full-edge-list shuffles at scale. The
  DuckDB oracle keeps the unrolled-CTE structure (the engine
  precedent for iterative algorithms); at its proven-converged SFs
  its labels ARE the true fixpoint, which is what cc_fast computes
  directly, so the cross-engine hashes are unchanged (re-verified
  this round at sf0.001/0.01/0.1). check_dbscan_fixpoint still runs
  one extra propagation round over the labels and must report 0.
  Border points attach to the MIN core-neighbor label
  (the deterministic resolution of DBSCAN's classic border ambiguity).
  All counts are exact integers. The Python twin computes TRUE
  fixpoint components with union-find at test SFs — the bounded-round
  contract is verified three ways, not assumed.
- ``knn_graph_radius``: bounded-radius k-nearest-neighbor graph
  (k=3, within eps=25) — the kNN-graph construction step of graph
  clustering / SemDeDup-style pipelines, here with the grid probe as
  the candidate generator. Exact for all neighbors within eps
  (documented bound: farther true neighbors are out of contract by
  construction). Ranking ties break on (d2, neighbor key) — total
  order, partition-invariant. The ledger reports the neighbor-count
  histogram and the exact BIGINT sum of 1-NN squared distances.

Scale: one shuffle on the cell key for candidates; components iterate
on the (small) core-edge list only; at 100 TB the iteration cost is
edges×rounds, never points×rounds — and the probe guarantees in-cell
work is density-bounded, not corpus-quadratic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.lineage import materialize
from .catalog import Entry, t
from .catalog_r7h import _GRID, _RADIUS, _coords

_EPS2 = _RADIUS * _RADIUS
_MIN_PTS = 4  # incl. the point itself
# ORACLE-ONLY since r18: the DuckDB oracle still unrolls 16
# (edge + pointer-jump) round pairs as chained CTEs; at that depth it is
# proven converged at every driver SF (r8 measurement: 14 pairs suffice
# at sf0.1; plain 10-round propagation left 2068 labels moving). The
# Spark side now computes the exact fixpoint directly (cc_fast), so this
# constant no longer bounds anything on the engine side.
_CC_ROUNDS = 16


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a NULL custkey has no synthetic position (md5(NULL) is NULL, and
    # the oracle's '0x'||NULL cast would crash outright) — excluded on
    # both sides. Caught by the degenerate-customer net's NULL-key row.
    x, y = _coords(F.col("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").isNotNull())
        .select(F.col("c_custkey").alias("k"), x.alias("x"), y.alias("y"))
        .withColumn("cx", (F.col("x") / _RADIUS).cast("long"))
        .withColumn("cy", (F.col("y") / _RADIUS).cast("long"))
    )


def _directed_pairs(pts: DataFrame) -> DataFrame:
    """All DIRECTED in-radius pairs (a≠b) via the 3×3 probe."""
    probe = (
        pts.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("k").alias("ka"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    return (
        probe.join(
            pts.select(
                F.col("k").alias("kb"),
                F.col("x").alias("xb"),
                F.col("y").alias("yb"),
                "cx",
                "cy",
            ),
            ["cx", "cy"],
        )
        .filter(F.col("ka") != F.col("kb"))
        .withColumn("d2", d2.cast("long"))
        .filter(F.col("d2") <= _EPS2)
        .select("ka", "kb", "d2")
    )


def _core_and_edges(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(pts, pairs, core, edges) — the shared DBSCAN front half.

    Loop-invariant inputs are cut through ``lineage.materialize``
    (r14, the r13 queued follow-up): reliable checkpoint when the
    session has a checkpoint dir (the 100 TB recovery story — an
    executor loss mid-CC-loop re-reads the cut from storage instead of
    fail-stopping), localCheckpoint fallback otherwise (bit-identical
    to the pre-r14 behavior on test/bench sessions)."""
    pts = materialize(_points(spark, sf_dir))
    pairs = materialize(_directed_pairs(pts))  # degree + edges + border
    deg = pairs.groupBy("ka").agg((F.count("*") + 1).alias("deg"))
    core = (
        pts.join(deg, pts.k == deg.ka, "left_outer")
        .select("k", F.coalesce(F.col("deg"), F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= _MIN_PTS)
        .select("k")
    )
    core = materialize(core)
    core_a = core.select(F.col("k").alias("ka"))
    core_b = core.select(F.col("k").alias("kb"))
    edges = pairs.join(core_a, "ka").join(core_b, "kb").select("ka", "kb")
    edges = materialize(edges)  # consumed every CC round
    return pts, pairs, core, edges


def _propagate_round(edges: DataFrame, lab: DataFrame) -> DataFrame:
    """One min-label propagation round over the core-edge list."""
    nbr_min = (
        edges.join(lab.select(F.col("k").alias("kb"), "lab"), "kb")
        .groupBy("ka")
        .agg(F.min("lab").alias("nlab"))
    )
    return lab.join(nbr_min, lab.k == nbr_min.ka, "left_outer").select(
        "k",
        F.least(
            F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
        ).alias("lab"),
    )


def _min_labels(core: DataFrame, edges: DataFrame) -> DataFrame:
    """EXACT min-label components of the core graph (r18 optimization:
    operators.cc_fast — one partition-local union-find pass over the
    edge list plus a driver-bounded root merge). The r8–r17 form was
    16 unrolled (edge-propagate + pointer-jump) round pairs ≈ 96 AQE
    stage-jobs of scheduler latency at sf0.1 (measured ~9s of the
    entry's ~13s on the r18 host) and, at 100 TB, 16 shuffled joins of
    the COMPLETE core-edge list. The contraction form touches the edge
    list once and is exact at every scale, so the bounded-round
    convergence margin (and its fixpoint risk) disappears entirely —
    check_dbscan_fixpoint still runs one extra propagation round on
    these labels and now proves 0 moved labels structurally rather
    than by measured-K margin. Results are the true fixpoint = the
    same labels the converged 16-round oracle computes at every
    driver SF (oracle parity re-proven at sf0.001/0.01/0.1 in r18).

    Isolated cores (no core neighbor within eps) appear in no edge and
    keep their own key as label, exactly as the propagation form's
    left-outer joins did."""
    from ..operators.cc_fast import components_from_edges

    comp = components_from_edges(edges, "ka", "kb")
    return core.join(comp, core["k"] == comp["id"], "left_outer").select(
        core["k"].alias("k"),
        F.coalesce(F.col("component"), core["k"]).alias("lab"),
    )


def dbscan_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row DBSCAN ledger: point/core/border/noise counts, number of
    clusters, and the largest cluster's size (core + attached border).
    See module docstring for the algorithm and determinism contract."""
    pts, pairs, core, edges = _core_and_edges(spark, sf_dir)
    lab = _min_labels(core, edges)
    # border: non-core with a core in-radius neighbor -> min core label
    border = (
        pairs.join(core.select(F.col("k").alias("kb")), "kb")
        .join(core.select(F.col("k").alias("ka")), "ka", "left_anti")
        .join(lab.select(F.col("k").alias("kb"), "lab"), "kb")
        .groupBy("ka")
        .agg(F.min("lab").alias("lab"))
    )
    # r18: ONE rollup over the flagged member list replaces the four
    # crossJoined scalar aggregates (n_core/n_border/n_clusters/max —
    # each was its own AQE stage-job): lab covers exactly the core set
    # and border exactly the border set, so per-cluster core counts fall
    # out of the same groupBy that sizes the clusters. Only n_points
    # still needs its own (different-table) aggregate.
    members = lab.select("lab", F.lit(1).alias("is_core")).union(
        border.select("lab", F.lit(0).alias("is_core"))
    )
    sizes = members.groupBy("lab").agg(
        F.count("*").alias("sz"), F.sum("is_core").alias("n_core_in")
    )
    stats = sizes.agg(
        F.count("*").alias("n_clusters"),
        F.coalesce(F.max("sz"), F.lit(0)).alias("max_cluster"),
        F.coalesce(F.sum("n_core_in"), F.lit(0)).alias("n_core"),
        F.coalesce(F.sum("sz"), F.lit(0)).alias("n_members"),
    )
    return (
        pts.agg(F.count("*").alias("n_points"))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("n_points").cast("long").alias("n_points"),
            F.col("n_core").cast("long").alias("n_core"),
            (F.col("n_members") - F.col("n_core"))
            .cast("long")
            .alias("n_border"),
            (F.col("n_points") - F.col("n_members"))
            .cast("long")
            .alias("n_noise"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            F.col("max_cluster").cast("long").alias("max_cluster_size"),
        )
    )


def _dbscan_sql() -> str:
    """Oracle with the identical K unrolled (edge + pointer-jump)
    round pairs — each Spark round maps to TWO chained CTEs: the
    neighbor-min edge round, then the adopt-my-label's-label jump."""
    rounds = []
    prev = "lab0"
    for i in range(1, _CC_ROUNDS + 1):
        rounds.append(
            f"""lab{i}e AS MATERIALIZED (
    SELECT l.k,
           least(l.lab, coalesce(min(n.lab), l.lab)) AS lab
    FROM {prev} l
    LEFT JOIN edges e ON e.ka = l.k
    LEFT JOIN {prev} n ON n.k = e.kb
    GROUP BY l.k, l.lab
),
lab{i} AS MATERIALIZED (
    SELECT l.k,
           least(l.lab, coalesce(p.lab, l.lab)) AS lab
    FROM lab{i}e l
    LEFT JOIN lab{i}e p ON p.k = l.lab
)"""
        )
        prev = f"lab{i}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH pts AS MATERIALIZED (
    SELECT c_custkey AS k,
           CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                1, 15)) AS BIGINT) % {_GRID} AS x,
           CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                16, 15)) AS BIGINT) % {_GRID} AS y
    FROM customer
    WHERE c_custkey IS NOT NULL
),
pairs AS MATERIALIZED (
    SELECT a.k AS ka, b.k AS kb,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM pts a JOIN pts b
      ON a.k <> b.k
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_EPS2}
),
core AS MATERIALIZED (
    SELECT ka AS k FROM pairs GROUP BY ka HAVING count(*) + 1 >= {_MIN_PTS}
),
edges AS MATERIALIZED (
    SELECT p.ka, p.kb FROM pairs p
    WHERE p.ka IN (SELECT k FROM core) AND p.kb IN (SELECT k FROM core)
),
lab0 AS MATERIALIZED (SELECT k, k AS lab FROM core),
{rounds_sql},
border AS (
    SELECT p.ka, min(l.lab) AS lab
    FROM pairs p
    JOIN {prev} l ON l.k = p.kb
    WHERE p.ka NOT IN (SELECT k FROM core)
    GROUP BY p.ka
),
members AS (
    SELECT k, lab FROM {prev}
    UNION ALL
    SELECT ka AS k, lab FROM border
),
sizes AS (SELECT lab, count(*) AS sz FROM members GROUP BY lab)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM pts) AS n_points,
       (SELECT CAST(count(*) AS BIGINT) FROM core) AS n_core,
       (SELECT CAST(count(*) AS BIGINT) FROM border) AS n_border,
       (SELECT CAST(count(*) AS BIGINT) FROM pts)
         - (SELECT count(*) FROM core)
         - (SELECT count(*) FROM border) AS n_noise,
       (SELECT CAST(count(*) AS BIGINT) FROM sizes) AS n_clusters,
       (SELECT CAST(coalesce(max(sz), 0) AS BIGINT) FROM sizes)
           AS max_cluster_size
"""


DBSCAN_CUSTOMERS_SQL = _dbscan_sql()

_KNN_K = 3


def knn_graph_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius kNN ledger: how many of the k=3 slots each point
    fills within eps (histogram rows: neighbors_found, n_points) plus
    the exact sum of 1-NN squared distances folded into every row (the
    determinism handle). Ties rank by (d2, kb) — a total order."""
    pts = materialize(_points(spark, sf_dir))
    pairs = _directed_pairs(pts)
    w = Window.partitionBy("ka").orderBy("d2", "kb")
    top = pairs.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= _KNN_K
    )
    # r18: ONE aggregation pass over `top` computes the slot count AND
    # the per-point 1-NN distance (every ka in top has exactly one
    # r == 1 row), so the old second read of a materialized `top` for
    # the global 1-NN sum — plus its lineage cut and the broadcast
    # crossJoin — disappears; `top` now has a single consumer and needs
    # no cut. The global sum folds over the histogram itself (≤ k+1
    # rows by construction, so the single-partition window is scale-free).
    found = top.groupBy("ka").agg(
        F.count("*").alias("nf"),
        F.sum(F.when(F.col("r") == 1, F.col("d2"))).alias("d1"),
    )
    hist = (
        pts.join(found, pts.k == found.ka, "left_outer")
        .select(
            F.coalesce(F.col("nf"), F.lit(0)).alias("neighbors_found"),
            F.col("d1"),
        )
        .groupBy("neighbors_found")
        .agg(F.count("*").alias("n_points"), F.sum("d1").alias("_sd1"))
    )
    total = Window.partitionBy()
    return (
        hist.select(
            F.col("neighbors_found").cast("long").alias("neighbors_found"),
            F.col("n_points").cast("long").alias("n_points"),
            F.coalesce(F.sum("_sd1").over(total), F.lit(0))
            .cast("long")
            .alias("sum_nn1_d2"),
        )
        .orderBy("neighbors_found")
    )


KNN_GRAPH_RADIUS_SQL = f"""
WITH pts AS MATERIALIZED (
    SELECT c_custkey AS k,
           CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                1, 15)) AS BIGINT) % {_GRID} AS x,
           CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                16, 15)) AS BIGINT) % {_GRID} AS y
    FROM customer
    WHERE c_custkey IS NOT NULL
),
pairs AS MATERIALIZED (
    SELECT a.k AS ka, b.k AS kb,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM pts a JOIN pts b
      ON a.k <> b.k
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         <= {_EPS2}
),
top AS (
    SELECT ka, kb, d2,
           row_number() OVER (PARTITION BY ka ORDER BY d2, kb) AS r
    FROM pairs
),
kept AS (SELECT * FROM top WHERE r <= {_KNN_K}),
found AS (SELECT ka, count(*) AS nf FROM kept GROUP BY ka),
hist AS (
    SELECT coalesce(f.nf, 0) AS neighbors_found, count(*) AS n_points
    FROM pts p LEFT JOIN found f ON p.k = f.ka
    GROUP BY 1
),
nn1 AS (
    SELECT CAST(coalesce(sum(d2), 0) AS BIGINT) AS s FROM kept WHERE r = 1
)
SELECT CAST(neighbors_found AS BIGINT) AS neighbors_found,
       CAST(n_points AS BIGINT) AS n_points,
       s AS sum_nn1_d2
FROM hist CROSS JOIN nn1
ORDER BY neighbors_found
"""


def check_dbscan_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible convergence proof for ``dbscan_customers``'s
    bounded K=10 min-label rounds (the round-7 verdict's one perf-weak
    watch): run the SAME K rounds, then one EXTRA propagation round, and
    count labels that change. At a true fixpoint the answer is exactly 0
    (constant oracle) — so if the data's component diameter ever exceeds
    K at the driver's scale, this row goes red instead of the
    under-convergence silently skewing cluster counts. The union-find
    differential test keeps guarding the small scale; this guards the
    driver's."""
    _pts, _pairs, core, edges = _core_and_edges(spark, sf_dir)
    lab = materialize(_min_labels(core, edges))  # consumed twice
    extra = _propagate_round(edges, lab.select("k", "lab"))
    changed = lab.select(
        F.col("k").alias("k0"), F.col("lab").alias("lab0")
    ).join(extra, F.col("k0") == F.col("k"))
    return changed.agg(
        F.coalesce(
            F.sum(F.when(F.col("lab") != F.col("lab0"), 1).otherwise(0)),
            F.lit(0),  # empty core set (tiny SF): vacuous fixpoint, not NULL
        )
        .cast("long")
        .alias("changed_labels")
    )


CHECK_DBSCAN_FIXPOINT_SQL = "SELECT CAST(0 AS BIGINT) AS changed_labels"


R7I_ENTRIES: dict[str, Entry] = {
    "dbscan_customers": Entry(dbscan_customers, DBSCAN_CUSTOMERS_SQL),
    "knn_graph_radius": Entry(knn_graph_radius, KNN_GRAPH_RADIUS_SQL),
    "check_dbscan_fixpoint": Entry(
        check_dbscan_fixpoint, CHECK_DBSCAN_FIXPOINT_SQL
    ),
}
