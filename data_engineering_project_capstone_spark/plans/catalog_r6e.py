"""Round-6e catalog entries — iterative graph analytics with a fully
SQL-expressible oracle:

- ``pagerank_event_graph``: 5 iterations of PageRank on the bipartite
  user ↔ event-type graph (edges both directions from the distinct
  (user, type) incidence), read out at the type nodes. The DuckDB twin
  UNROLLS the five iterations into five chained CTEs — iterative
  dataflow is oracle-checkable when the iteration count is fixed, which
  is exactly how the engine runs it (operators/graph.py pagerank takes
  ``iterations`` as a hyperparameter, no data-dependent driver loop).

Same contract as ``plans.catalog``: identical column aliases, floats
through the shared IEEE rounding helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import ieee_round
from ..operators.graph import pagerank
from .catalog import Entry, events_table, sql_ieee_round

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


R6E_ENTRIES: dict[str, Entry] = {
    "pagerank_event_graph": Entry(pagerank_event_graph, _pagerank_sql()),
}
