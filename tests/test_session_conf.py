"""Session-factory pins.

1. The driver-JVM-flag merge (round-8 advice item): a caller's
   spark.driver.extraJavaOptions must survive alongside the GCLocker
   mitigation, never be clobbered by it, and a caller who sets their
   own GCLocker budget wins outright (with the diagnostic-unlock flag
   prepended if they forgot it — round-9 advice item).
2. The scale-posture configs SCALE.md promises (restored per round-9
   advice: these assertions were dropped in the round-8 refactor and
   nothing else guards a silent default regression in session.py)."""

from __future__ import annotations

from data_engineering_project_capstone_spark.session import (
    _GCLOCKER_OPTS,
    _merge_driver_java_opts,
)


def test_default_is_gclocker_mitigation():
    assert _merge_driver_java_opts(None) == _GCLOCKER_OPTS
    assert _merge_driver_java_opts("") == _GCLOCKER_OPTS


def test_caller_flags_kept_and_mitigation_appended():
    merged = _merge_driver_java_opts("-Xss4m -Dfoo=bar")
    assert merged.startswith("-Xss4m -Dfoo=bar ")
    assert "GCLockerRetryAllocationCount=64" in merged


def test_caller_gclocker_budget_wins():
    mine = "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=8"
    assert _merge_driver_java_opts(mine) == mine


def test_caller_gclocker_budget_without_unlock_gets_unlock_prepended():
    # GCLockerRetryAllocationCount is a diagnostic VM option: without
    # -XX:+UnlockDiagnosticVMOptions the JVM fails at launch. A caller
    # who sets only the count must still get a bootable driver.
    merged = _merge_driver_java_opts("-XX:GCLockerRetryAllocationCount=8")
    assert merged == (
        "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=8"
    )
    # ...and their count still wins (the mitigation's 64 is NOT added)
    assert "GCLockerRetryAllocationCount=64" not in merged


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
    assert "InferFiltersFromGenerate" in conf.get(
        "spark.sql.optimizer.excludedRules"
    )
