"""Data-quality expectations: declarative row-level checks that split a
DataFrame into passing/quarantined rows and report per-rule metrics.

The reference's whole validation story is printed row counts
(``sql_queries.py:261-272``, ``etl.py:31-43``); this is the engine-grade
replacement: rules are Column predicates evaluated in one pass (a single
narrow projection — no per-rule scans, no shuffles), so the cost at 100 TB
is one read of the data regardless of rule count. Quarantine keeps the
failing rows (with the list of failed rule names) instead of dropping them
— a bad row must be inspectable, not silently gone.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FAILED = "_failed_expectations"


def check(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Annotate each row with the array of failed rule names (empty = clean).

    All rules evaluate in the same projection; a null predicate result
    counts as a failure (ANSI-safe: ``coalesce(cond, false)``).
    """
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in rules.items()
            ]
        )
    )
    return df.withColumn(_FAILED, failed)


def split(
    df: DataFrame, rules: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(passing, quarantined). Quarantined rows keep ``_failed_expectations``."""
    annotated = check(df, rules)
    passing = annotated.filter(F.size(_FAILED) == 0).drop(_FAILED)
    quarantined = annotated.filter(F.size(_FAILED) > 0)
    return passing, quarantined


def metrics(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """One row per rule: n_failed, n_total, fail_rate. Single aggregation
    pass (conditional sums), not one job per rule."""
    aggs = [
        F.sum(
            F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
        ).alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(F.count(F.lit(1)).alias("_n"), *aggs)
    pairs = ", ".join(f"'{name}', `{name}`" for name in rules)
    return wide.selectExpr(
        "_n", f"stack({len(rules)}, {pairs}) as (rule, n_failed)"
    ).select(
        "rule",
        F.col("n_failed").cast("long").alias("n_failed"),
        F.col("_n").cast("long").alias("n_total"),
        F.round(F.col("n_failed") / F.col("_n"), 6).alias("fail_rate"),
    )
