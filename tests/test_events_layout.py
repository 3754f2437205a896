"""Events parquet-layout robustness — the r4 regression class, pinned.

The driver testdata has shipped ``events.ts`` two ways across rounds:
TIMESTAMP(NANOS) (which ``nanosAsLong`` surfaces as epoch-ns BIGINT) and
plain timestamp[us]. The r4 round lost its whole events window because
the helper assumed one layout. ``events_table`` now branches on the
actual read schema; this test makes the contract executable: the same
logical events rendered in BOTH layouts must produce IDENTICAL results
from every events-family entry (nanos truncate to micros exactly like
DuckDB).
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

REAL_SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ENTRIES = [
    "events_hourly",
    "events_sessionize",
    "events_session_window",
    "gapfill_resample",
    "join_asof_events",
    "join_asof_tolerance",
    "events_gap_stats",
    "events_multires_rollup",
    # r6c-f events consumers (all go through the same events_table
    # normalization; a layout regression must not silently skip them)
    "events_transition_matrix",
    "events_anomaly_zscore",
    "events_time_decay",
    "rolling_distinct_users",
    "join_range_buckets",
    "event_paths",
    "join_attribution_window",
    "pit_features",
    # r7d/r7e events consumers
    "events_burst_hours",
    "conversion_wilson_ci",
]


@pytest.fixture(scope="module")
def two_layouts(tmp_path_factory):
    """Two copies of sf0.001 differing ONLY in events.ts physical type:
    timestamp[us] vs int64 nanoseconds (ns values = us * 1000, so the
    micros truncation is lossless and the layouts are logically equal)."""
    src = pq.read_table(f"{REAL_SF}/events.parquet")
    ts = src.column("ts")
    if pa.types.is_timestamp(ts.type):
        us = ts.cast(pa.timestamp("us"))
    else:  # already int64 nanos
        us = pa.compute.divide(ts, 1000).cast(pa.timestamp("us"))
    ns_int = pa.compute.multiply(us.cast(pa.int64()), 1000)

    dirs = {}
    for label, col, typ in (
        ("us", us, pa.timestamp("us")),
        ("ns", ns_int.cast(pa.timestamp("ns")), pa.timestamp("ns")),
    ):
        d = tmp_path_factory.mktemp(f"events_{label}")
        for name in TABLES:
            if name != "events":
                shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
        tbl = src.set_column(
            src.schema.get_field_index("ts"), pa.field("ts", typ), col.cast(typ)
        )
        pq.write_table(tbl, str(d / "events.parquet"), store_schema=False)
        dirs[label] = str(d)
    return dirs


def test_layouts_actually_differ(spark, two_layouts):
    """Guard the fixture itself: the ns copy must surface as epoch-ns
    BIGINT under nanosAsLong (exercising events_table's LongType branch)
    and the us copy as a timestamp — otherwise every parametrized case
    below compares a layout to itself."""
    from pyspark.sql import types as T

    ns_type = spark.read.parquet(f"{two_layouts['ns']}/events.parquet").schema[
        "ts"
    ].dataType
    us_type = spark.read.parquet(f"{two_layouts['us']}/events.parquet").schema[
        "ts"
    ].dataType
    assert isinstance(ns_type, T.LongType), ns_type
    assert isinstance(us_type, (T.TimestampType, T.TimestampNTZType)), us_type


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_layout_invariant(spark, two_layouts, name):
    fn = CATALOG[name].spark_fn

    def fingerprint(sf_dir):
        rows = fn(spark, sf_dir).collect()
        return sorted(tuple(repr(v) for v in r) for r in rows)

    a = fingerprint(two_layouts["us"])
    b = fingerprint(two_layouts["ns"])
    assert a, f"{name}: empty result"
    assert a == b, f"{name}: results differ between timestamp[us] and nanos layouts"
