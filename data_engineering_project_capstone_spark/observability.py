"""In-flight audit metrics via ``DataFrame.observe`` — row counts and
aggregate checks collected DURING an action, with zero extra passes.

The reference prints validation counts by re-running ``SELECT count(*)``
per table (``sql_queries.py:261-272``) — at 100 TB every such re-count is
another full scan. ``observe`` attaches named aggregates to a point in the
plan; Spark accumulates them while the main action runs, so an audit
(rows written, nulls seen, sum of a money column) costs nothing beyond the
job you were already running.

Batch usage::

    audited, obs = observe_counts(df, "stage3", null_cols=["gender"])
    audited.write.parquet(out)          # or any other action
    m = obs.get                         # blocks until the action completes
    assert m["n_rows"] > 0 and m["n_null_gender"] == 0

The :class:`pyspark.sql.Observation` handle is action-scoped: metrics
come from whichever action first executes the observed plan (the
listener-backed batch API). Streaming: pass a plain string name to
``DataFrame.observe`` instead and read
``StreamingQueryProgress.observedMetrics`` per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame,
    name: str,
    null_cols: list[str] | None = None,
    extra: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach an observation point: total rows, per-column null counts,
    plus caller aggregates. Returns (same rows, observation handle) —
    only the plan gains a CollectMetrics node."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"n_null_{c}"))
    for alias, col in (extra or {}).items():
        aggs.append(col.alias(alias))
    obs = Observation(name)
    return df.observe(obs, *aggs), obs
