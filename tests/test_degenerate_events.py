"""Degenerate-input sweep over the events-family catalog entries — the
third leg of the degenerate trilogy (docs, embeddings, events).

Edge cases a real event stream will contain: NULL timestamps (a broken
producer), NULL user_id (anonymous traffic), duplicate timestamps for one
user (sessionize/lag tie handling), a single-event user, malformed and
NULL props JSON, and an event type no query anticipates. Every entry must
execute without throwing and, where an oracle exists, agree with DuckDB
row-for-row — NULL ordering inside window frames is exactly where engines
diverge.
"""

from __future__ import annotations

import datetime as dt
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_project_capstone_spark.plans.catalog import CATALOG

from degen_util import assert_entry_matches
from test_oracle_differential import TABLES

REAL_SF = "/root/testdata/sf0.001"

ENTRIES = [
    "events_hourly",
    "events_json",
    "events_json_struct",
    "events_sessionize",
    "events_session_window",
    "events_gap_stats",
    "events_multires_rollup",
    "gapfill_resample",
    "join_asof_events",
    "join_asof_tolerance",
    "events_funnel",
    "events_retention_cohorts",
    # r6c-e events consumers
    "events_transition_matrix",
    "events_anomaly_zscore",
    "events_time_decay",
    "rolling_distinct_users",
    "join_range_buckets",
    "agg_correlation",
    "pagerank_event_graph",
    "event_paths",
    "events_json_variant",
    "join_attribution_window",
    "user_activity_features",
    "pit_features",
    "churn_labels",
    "ab_test_analysis",
    "events_seasonality",
    "events_markov_stationary",
    "funnel_time_to_convert",
    "session_bounce_rate",
    "funnel_strict_sequence",
    "skew_profile",
    "survival_signup_purchase",
    "churn_feature_lift",
    # r7d/r7e events consumers
    "events_burst_hours",
    "conversion_wilson_ci",
]

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return None if minutes is None else T0 + dt.timedelta(minutes=minutes)


DEGENERATE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (0, _ts(0), 1, "click", 1.0, '{"k": 1}'),
    (1, _ts(0), 1, "click", 2.0, '{"k": 2}'),      # duplicate ts, same user
    (2, _ts(90), 1, "view", 3.0, "not json"),       # malformed props
    (3, _ts(None), 1, "click", 4.0, '{"k": 3}'),    # NULL ts
    (4, _ts(5), None, "click", 5.0, '{"k": 4}'),    # NULL user
    (5, _ts(10), 2, "purchase", None, None),        # NULL value + props
    (6, _ts(10_000), 3, "solo", 6.0, '{"k": 5}'),   # single-event user, far future
    (7, _ts(11), 2, "weird_type", 7.0, "{}"),       # unanticipated type
    # r8 NULL-key probes: a NULL event_type (type groupings/pivots and
    # transition pairs must treat the NULL group identically — and a
    # pivot must not silently invent or drop a "null" column) and a
    # NULL event_id (id-ordered ties and id-keyed joins)
    (8, _ts(12), 2, None, 8.0, "{}"),
    (None, _ts(13), 3, "click", 9.0, "{}"),
]


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degen_ev")
    for name in TABLES:
        if name != "events":
            shutil.copy(f"{REAL_SF}/{name}.parquet", d / f"{name}.parquet")
    cols = list(zip(*DEGENERATE_EVENTS))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_survives_degenerate_events(spark, degen_dir, name):
    assert_entry_matches(spark, name, degen_dir, "degenerate events")
