"""Surrogate-key generation.

The reference leans on Redshift ``BIGINT IDENTITY(1,1)`` columns
(``sql_queries.py:141,163,241``). Spark has no auto-increment, and the naive
substitutes are traps: ``monotonically_increasing_id`` is nondeterministic
across runs (breaks oracle hash-matching) and a global ``row_number`` window
funnels all data through one partition (breaks at 100 TB).

Two strategies, chosen by table size:

- :func:`surrogate_key` — dense 1..N ids via ``row_number`` over an explicit
  order. Deterministic. Use for *dimensions* (city, airports: ≤100k rows —
  a single-partition window over a dimension is cheap and happens once).
- :func:`hash_key` — ``xxhash64`` of the natural key. Deterministic,
  embarrassingly parallel, no shuffle; ids are sparse, which is fine for
  join keys. Use for *facts* at scale where dense ids buy nothing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surrogate_key(
    df: DataFrame, key_name: str, order_cols: Sequence[str]
) -> DataFrame:
    """Dense, deterministic 1..N surrogate key (dimension-sized inputs only)."""
    w = Window.orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
    return df.withColumn(key_name, F.row_number().over(w).cast("long"))


def hash_key(df: DataFrame, key_name: str, natural_cols: Sequence[str]) -> DataFrame:
    """Deterministic distributed surrogate key: xxhash64 over the natural key.

    No shuffle, no window — each partition computes independently, so this is
    the fact-table path at 100 TB. Collision odds for 64-bit over 10^10 rows
    are ~3e-3 per Birthday bound on *some* pair; acceptable for join keys
    derived from already-unique natural keys (collision only matters if two
    distinct natural keys collide AND both survive downstream joins).
    """
    return df.withColumn(
        key_name, F.xxhash64(F.concat_ws("\x1f", *[F.col(c) for c in natural_cols]))
    )
