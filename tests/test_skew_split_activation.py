"""AQE skew-join split: ACTIVATION proof, not just invariance (round 12).

SCALE.md names three skew layers: AQE skew-join splitting, differential
salting (operators/skew.py), and bucket caps inside the dedup
operators. The salting and caps have activation tests; AQE splitting
was only ever covered by session conf (skewJoin.enabled=true) and the
AQE-off invariance net — which would stay green even if the split never
fired (the vacuous-green class the r11 dynalloc net closed with its
event-log churn proof). This test drives a deliberately skewed
sort-merge join under tuned thresholds and asserts THREE things:

1. the final adaptive plan marks the join ``SortMergeJoin(skew=true)``
   with ``AQEShuffleRead skewed`` children — the split actually ran;
2. the result is identical to the same query on the default session
   (broadcast allowed, default thresholds — a different physical plan);
3. the row count matches the closed-form expectation.

Probe notes (r12, kept for the next person tuning this): the split
granularity is MAP-OUTPUT ranges, so a single-mapper shuffle cannot
split no matter how skewed; shuffle compression shrinks constant-key
partitions dramatically, so thresholds must be set against COMPRESSED
sizes; and the skew check is max > max(threshold, factor x median) —
at the default factor 5.0 a modestly-skewed toy corpus does not
qualify, which is correct production behavior, not a bug.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _skew_frames(session):
    # Spark's AdaptiveQueryExecSuite shape: 250 rows pile on one key per
    # side (and 250 more on a key with no match on the right).
    df1 = session.range(0, 1000, 1, 10).select(
        F.when(F.col("id") < 250, 249)
        .when(F.col("id") >= 750, 1000)
        .otherwise(F.col("id"))
        .alias("key1"),
        F.col("id").alias("value1"),
    )
    df2 = session.range(0, 1000, 1, 10).select(
        F.when(F.col("id") < 250, 249).otherwise(F.col("id")).alias("key2"),
        F.col("id").alias("value2"),
    )
    return df1, df2


def _joined(session):
    df1, df2 = _skew_frames(session)
    return df1.join(df2, F.col("key1") == F.col("key2")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value1") + F.col("value2")).alias("v"),
    )


def test_skew_split_fires_and_result_invariant(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "100")
    s.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100"
    )
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "10")

    j = _joined(s)
    [skewed_row] = j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "SortMergeJoin(skew=true)" in plan, (
        "AQE skew-join split did not fire on a 250x-skewed key — "
        "the skew layer SCALE.md claims is not active:\n" + plan[:2000]
    )
    assert "AQEShuffleRead skewed" in plan

    # same query, default session: different physical plan, same rows
    [plain_row] = _joined(spark).collect()
    assert tuple(skewed_row) == tuple(plain_row)

    # closed form: key 249 has 250x250 matched pairs, keys 250..749
    # match 1:1, keys 750..999 pile on 1000 with no right-side match
    assert skewed_row["n"] == 250 * 250 + 500
