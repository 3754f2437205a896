"""Scalable top-k per group.

The textbook ``row_number() OVER (PARTITION BY g ORDER BY v)`` plan has a
hidden scale cliff: with few distinct groups (25 nations, 7 statuses...),
the window shuffle lands ALL data on n_groups tasks — at 100 TB that is 25
straggler tasks sorting terabytes each.

:func:`topk_per_group_scalable` is the two-phase fix:

    phase 1: window over (group, salt) — n_groups × n_salts parallel
             partitions, each keeps its local top-k
    phase 2: window over (group) on ≤ n_groups × n_salts × k rows — tiny

Top-k is salt-decomposable (the global top-k is contained in the union of
per-salt top-ks), so the result is EXACTLY the single-window answer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group_scalable(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    n_salts: int = 32,
    rank_col: str = "rk",
) -> DataFrame:
    """Exact top-k rows per group, parallelized across ``n_salts`` slices
    per group. ``order_by`` must be a deterministic total order (add a
    unique tiebreak column) for reproducible results."""
    group_cols = list(group_cols)
    order_by = list(order_by)
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)),
    )
    w_local = Window.partitionBy(*group_cols, "_salt").orderBy(*order_by)
    local = (
        salted.withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= k)
        .drop("_lrk", "_salt")
    )
    w_final = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        local.withColumn(rank_col, F.row_number().over(w_final))
        .filter(F.col(rank_col) <= k)
    )
