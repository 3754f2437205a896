"""Pin the SparkSession factory's driver-JVM-flag merge (round-8
advice item): a caller's spark.driver.extraJavaOptions must survive
alongside the GCLocker mitigation, never be clobbered by it, and a
caller who sets their own GCLocker budget wins outright."""

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
