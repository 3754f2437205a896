"""Focused pins for operators/layout.spread_scan and its r19 call site
in dedup.embedding_dup_pairs (VERDICT r18 ask #2: the probe re-spread
must be conditional — an exact no-op on healthy at-scale layouts, never
a coalescing exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.operators.dedup import (
    embedding_dup_pairs,
)
from data_engineering_project_capstone_spark.operators.layout import (
    spread_scan,
)


def test_spread_scan_noop_on_healthy_layout(spark):
    """At or above session parallelism the helper returns the SAME
    frame object — zero plan change, zero exchange at scale."""
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, numPartitions=par + 2)
    assert spread_scan(df) is df
    df_eq = spark.range(0, 1000, 1, numPartitions=par)
    assert spread_scan(df_eq) is df_eq


def test_spread_scan_engages_below_parallelism(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, numPartitions=1)
    out = spread_scan(df)
    assert out is not df
    assert out.rdd.getNumPartitions() == par
    assert out.count() == 1000


def test_embedding_dup_pairs_no_respread_on_healthy_probe(spark):
    """On a probe layout already at session parallelism the pair plan
    must carry NO round-robin repartition (the r18 unconditional
    repartition would put one there and coalesce at-scale layouts)."""
    par = spark.sparkContext.defaultParallelism

    def frame(n_parts: int):
        return spark.range(0, 64, 1, numPartitions=n_parts).select(
            F.col("id"),
            F.array(
                (F.col("id") % 7).cast("double"), F.lit(1.0), F.lit(0.5)
            ).alias("v"),
        )

    def physical(df):
        return (
            embedding_dup_pairs(
                df, id_col="id", vec_col="v", block_col=None, dim=3
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    # healthy layout (range leaf with > parallelism partitions): the
    # pair plan must carry NO round-robin exchange at all
    assert "RoundRobinPartitioning" not in physical(frame(par + 3))
    # degenerate single-partition probe still spreads (locally useful)
    assert "RoundRobinPartitioning" in physical(frame(1))
