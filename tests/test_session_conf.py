"""Session factory posture: the configs SCALE.md promises must actually
be set — a silent default regression here invalidates every plan test."""

from __future__ import annotations


def test_session_scale_posture(spark):
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.ansi.enabled") == "true"
    assert conf.get("spark.sql.session.timeZone") == "UTC"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    # nanos events parquet readable (TESTDATA gotcha)
    assert conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    # the inferred size(e)>0 filter below explode re-derives collapsed
    # shingle/gram pipelines per row (quadratic with tokenizers inside
    # transform lambdas) — the rule must stay excluded (session.py)
    assert "InferFiltersFromGenerate" in conf.get("spark.sql.optimizer.excludedRules")
