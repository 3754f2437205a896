"""Round-6e catalog entries — iterative analytics (graph + ML) with
fully SQL-expressible oracles. Iterative dataflow is oracle-checkable
when the iteration count is fixed: the DuckDB twin UNROLLS the
iterations into chained CTEs, which is exactly how the engine runs them
(fixed-iteration hyperparameters, no data-dependent driver loop).

- ``pagerank_event_graph``: 5 iterations of PageRank on the bipartite
  user ↔ event-type graph (edges both directions from the distinct
  (user, type) incidence), read out at the type nodes.
- ``kmeans_embeddings``: 2 Lloyd iterations of k-means over the
  embedding corpus in LONG FORM (point, dimension, value) — assignment
  is a join+argmin, the centroid update a groupBy-avg; deterministic
  seeding (k smallest vec_ids) and 6dp-rounded distances with (d, cid)
  tie-break make the argmin cross-engine stable.

Same contract as ``plans.catalog``: identical column aliases, floats
through the shared IEEE rounding helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from ..operators.graph import pagerank
from .catalog import Entry, events_table, sql_ieee_round, t

_PR_ITERS = 5
_PR_DAMPING = 0.85


def pagerank_event_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the user↔event-type bipartite graph, type nodes out.

    Scale shape: the graph build is one distinct over (user, type) —
    data-sized but map-side combinable; each PageRank round is one
    join + one groupBy on node id (operators/graph.py docstring for the
    lineage-cut discipline). The type-node readout is a prefix filter.
    Bipartite both-ways edges mean no dangling nodes, so total mass is
    invariant at N — asserted in tests/test_graph.py."""
    ev = events_table(spark, sf_dir)
    pairs = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).distinct()
    edges = pairs.select(
        F.col("u").alias("src"), F.col("t").alias("dst")
    ).union(pairs.select(F.col("t").alias("src"), F.col("u").alias("dst")))
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMPING)
    return (
        ranks.filter(F.col("id").startswith("t:"))
        .select(
            F.col("id").alias("node"),
            ieee_round(F.col("rank"), 6).alias("rank"),
        )
        .orderBy("node")
    )


def _pagerank_sql() -> str:
    head = """
WITH pairs AS (
    SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
                    't:' || event_type AS t
    FROM events
), edges AS (
    SELECT u AS src, t AS dst FROM pairs
    UNION ALL
    SELECT t AS src, u AS dst FROM pairs
), nodes AS (
    SELECT src AS id FROM edges UNION SELECT dst FROM edges
), deg AS (
    SELECT src, count(*) AS d FROM edges GROUP BY src
), r0 AS (
    SELECT id, 1.0 AS r FROM nodes
)"""
    body = []
    for i in range(1, _PR_ITERS + 1):
        body.append(
            f""", c{i} AS (
    SELECT e.dst AS id, sum(p.r / deg.d) AS s
    FROM edges e
    JOIN r{i - 1} p ON p.id = e.src
    JOIN deg ON deg.src = e.src
    GROUP BY e.dst
), r{i} AS (
    SELECT n.id,
           {1.0 - _PR_DAMPING} + {_PR_DAMPING} * coalesce(c{i}.s, 0.0) AS r
    FROM nodes n LEFT JOIN c{i} ON c{i}.id = n.id
)"""
        )
    tail = f"""
SELECT id AS node, {sql_ieee_round('r', 6)} AS rank
FROM r{_PR_ITERS}
WHERE id LIKE 't:%'
ORDER BY node
"""
    return head + "".join(body) + tail


# ---------------------------------------------------------------------------
# 2. k-means (Lloyd's algorithm) in long form
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_ITERS = 2


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 Lloyd iterations of k-means over the embedding corpus, reported
    as per-cluster size + within-cluster squared-distance inertia.

    Long-form layout (vec_id, pos, x): the assignment step is a join on
    ``pos`` with the centroid table (k·dim rows — broadcast) followed by
    a (point, centroid) groupBy-sum for squared distance and a
    struct-min argmin; the update step is a (cid, pos) groupBy-avg.
    Each iteration is therefore two shuffles of the point-dimension
    table — no driver-side centroids, no ml-lib dependency, and the
    whole run is a statically known dataflow (iterations fixed). At
    100 TB the centroid side stays k·dim rows regardless of data.

    Determinism: seeding is the k smallest vec_ids; distances round to
    6dp before the argmin and ties break by cid, so the assignment is
    identical across engines (residual ulp noise in the avg-built
    centroids is ~1e-14 against a 1e-6 rounding grid). NULL vectors are
    excluded on both sides (ANN-family NULL policy,
    operators/similarity.py)."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    pts = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        ),
    )
    seeds = emb.select("vec_id").orderBy("vec_id").limit(_KM_K)
    cent = (
        pts.join(F.broadcast(seeds), "vec_id")
        .select(F.col("vec_id").alias("cid"), "pos", F.col("x").alias("cx"))
    )
    assign = None
    for _ in range(_KM_ITERS):
        d = (
            pts.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(
                ieee_round(
                    F.sum((F.col("x") - F.col("cx")) ** 2), 6
                ).alias("d")
            )
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
    return (
        assign.groupBy("cid")
        .agg(
            F.count("*").alias("n_points"),
            ieee_round(F.sum("d"), 4).alias("inertia"),
        )
        .orderBy("cid")
    )


def _kmeans_sql() -> str:
    head = f"""
WITH pts AS (
    SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
    FROM embeddings, unnest(range(1, len(embedding) + 1)) r(i)
    WHERE embedding IS NOT NULL
), seeds AS (
    SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL
    ORDER BY vec_id LIMIT {_KM_K}
), cent0 AS (
    SELECT p.vec_id AS cid, pos, x AS cx FROM pts p JOIN seeds USING (vec_id)
)"""
    body = []
    for i in range(1, _KM_ITERS + 1):
        body.append(
            f""", d{i} AS (
    SELECT p.vec_id, c.cid,
           {sql_ieee_round("sum((p.x - c.cx) * (p.x - c.cx))", 6)} AS d
    FROM pts p JOIN cent{i - 1} c USING (pos)
    GROUP BY p.vec_id, c.cid
), a{i} AS (
    SELECT vec_id, cid, d FROM (
        SELECT vec_id, cid, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d{i}
    ) WHERE rn = 1
), cent{i} AS (
    SELECT a.cid, p.pos, avg(p.x) AS cx
    FROM a{i} a JOIN pts p USING (vec_id)
    GROUP BY a.cid, p.pos
)"""
        )
    tail = f"""
SELECT cid, count(*) AS n_points,
       {sql_ieee_round("sum(d)", 4)} AS inertia
FROM a{_KM_ITERS}
GROUP BY cid
ORDER BY cid
"""
    return head + "".join(body) + tail


R6E_ENTRIES: dict[str, Entry] = {
    "pagerank_event_graph": Entry(pagerank_event_graph, _pagerank_sql()),
    "kmeans_embeddings": Entry(kmeans_embeddings, _kmeans_sql()),
}
