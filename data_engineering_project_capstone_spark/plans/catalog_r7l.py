"""Round-7l catalog entries — as-of tolerance and data-dependent
recursion:

- ``join_asof_tolerance``: the pandas ``merge_asof(tolerance=...)``
  parity case — each purchase matched to the user's latest click
  AT-OR-BEFORE it, but only if the click is within 1 hour; older
  matches are nulled. The operator extension (operators/asof.py
  ``tolerance_seconds``) keeps the SAME one-shuffle union-window plan:
  the right timestamp rides inside the carried struct and the bound is
  a post-filter — no range join, no second shuffle. The gap comes back
  as exact integer microseconds (``unix_micros`` ↔ DuckDB
  ``epoch_us``), so the hash gate needs no float rounding.
- ``recursive_reachability``: WITH RECURSIVE over a DATA-DEPENDENT
  graph — BFS from the minimum customer key through the
  bounded-radius kNN graph (catalog_r7i), depth ≤ 4, reporting how
  many nodes are first reached at each depth. The month-spine entry
  proved constant-depth recursion; this one recurses over joins whose
  frontier depends on the data, on BOTH engines (Spark 4 WITH
  RECURSIVE ↔ DuckDB WITH RECURSIVE, identical text shape). Path
  explosion is bounded by k^depth = 3⁴ per node; min-depth dedup
  happens after the recursion, exactly as written in the SQL. On the
  uniform synthetic coordinates the kNN components are SMALL, so test
  SFs populate only depths 0-1 — the Python BFS twin proves those
  counts exact, and all 4 recursion rounds still execute (that
  emptiness-at-depth is itself data-derived, not short-circuited). A
  dense graph (e.g. the user↔type bipartite one) is deliberately NOT
  used: UNION ALL recursion on a dense graph explodes in paths, and
  cross-engine UNION-distinct recursion semantics are not identical —
  the bounded kNN graph is the honest, scale-safe choice.

Scale: the as-of tolerance adds zero shuffles to the as-of plan; the
BFS frontier join is edges-sized per round with recursion depth a
fixed constant (4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Entry, events_table, t

_TOL_S = 3600


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases with the latest click ≤ 1h before (per user): click id
    and the exact microsecond gap; NULLs where the nearest click is too
    old or absent."""
    from ..operators.asof import asof_join

    ev = events_table(spark, sf_dir)
    # keyless purchases excluded on both engines: the output row is
    # identified by purchase event_id and the oracle's PARTITION BY
    # p.event_id collapses NULL ids; distinct collapses duplicate-id
    # physical copies the same way (mixdup corpus — see
    # join_asof_events for both policies)
    purchases = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("event_id").isNotNull()
        )
        .select("event_id", "user_id", "ts")
        .distinct()
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        right_cols=["event_id", "ts"],
        prefix="click_",
        tiebreak="event_id",
        tolerance_seconds=_TOL_S,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("click_event_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))).alias(
            "gap_us"
        ),
    ).orderBy("event_id")


JOIN_ASOF_TOLERANCE_SQL = f"""
SELECT event_id, user_id, ts, click_event_id, gap_us
FROM (
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS click_event_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
           row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY c.ts DESC, c.event_id DESC
           ) AS rn
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase' AND event_id IS NOT NULL) p
    LEFT JOIN (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click' AND event_id IS NOT NULL
                 AND user_id IS NOT NULL AND ts IS NOT NULL) c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND epoch_us(p.ts) - epoch_us(c.ts) <= CAST({_TOL_S} AS BIGINT) * 1000000
)
WHERE rn = 1
ORDER BY event_id
"""


_BFS_DEPTH = 4


def recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per BFS depth (0..4): how many kNN-graph nodes are FIRST reached
    at that depth from the min-custkey seed. The recursion itself runs
    through spark.sql WITH RECURSIVE over a temp view of the kNN edge
    list (the catalog's only data-dependent recursive plan)."""
    from .catalog import _ensure_session_conf
    from .catalog_r7i import _KNN_K, _directed_pairs, _points
    from pyspark.sql import Window

    _ensure_session_conf(spark)
    pts = _points(spark, sf_dir)
    pairs = _directed_pairs(pts)
    w = Window.partitionBy("ka").orderBy("d2", "kb")
    kept = pairs.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= _KNN_K
    )
    # edges + seed consumers; the recursion re-reads the edge view every
    # BFS round, so this cut routes through lineage.materialize (r14):
    # reliable checkpoint when a dir is set, localCheckpoint fallback.
    from ..operators.lineage import materialize

    kept = materialize(kept)
    kept.select("ka", "kb").createOrReplaceTempView("knn_edges_r7l")
    # seed = the left node of the globally tightest pair (deterministic
    # total order; lands in the densest region so the BFS actually has
    # frontier to explore — a min-key seed is usually isolated)
    seed = (
        kept.orderBy("d2", "ka", "kb").limit(1).select(F.col("ka").alias("s"))
    )
    seed.createOrReplaceTempView("bfs_seed_r7l")
    return spark.sql(
        f"""
WITH RECURSIVE reach AS (
    SELECT s AS node, 0 AS depth FROM bfs_seed_r7l
    UNION ALL
    SELECT e.kb AS node, r.depth + 1 AS depth
    FROM reach r JOIN knn_edges_r7l e ON e.ka = r.node
    WHERE r.depth < {_BFS_DEPTH}
),
first_reach AS (
    SELECT node, min(depth) AS depth FROM reach GROUP BY node
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_first_reached
FROM first_reach GROUP BY depth ORDER BY depth
"""
    )


def _reach_sql() -> str:
    from .catalog_r7h import _GRID
    from .catalog_r7i import _EPS2, _KNN_K

    return f"""
WITH RECURSIVE pts AS MATERIALIZED (
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
kept AS MATERIALIZED (
    SELECT ka, kb, d2 FROM (
        SELECT ka, kb, d2,
               row_number() OVER (PARTITION BY ka ORDER BY d2, kb) AS r
        FROM pairs
    ) WHERE r <= {_KNN_K}
),
edges AS (SELECT ka, kb FROM kept),
seed AS (
    SELECT ka AS s FROM kept ORDER BY d2, ka, kb LIMIT 1
),
reach AS (
    SELECT s AS node, 0 AS depth FROM seed
    UNION ALL
    SELECT e.kb AS node, r.depth + 1 AS depth
    FROM reach r JOIN edges e ON e.ka = r.node
    WHERE r.depth < {_BFS_DEPTH}
),
first_reach AS (
    SELECT node, min(depth) AS depth FROM reach GROUP BY node
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_first_reached
FROM first_reach GROUP BY depth ORDER BY depth
"""


RECURSIVE_REACHABILITY_SQL = _reach_sql()


R7L_ENTRIES: dict[str, Entry] = {
    "join_asof_tolerance": Entry(
        join_asof_tolerance, JOIN_ASOF_TOLERANCE_SQL
    ),
    "recursive_reachability": Entry(
        recursive_reachability, RECURSIVE_REACHABILITY_SQL
    ),
}
