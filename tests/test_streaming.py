"""Structured Streaming surface: the streaming queries must complete via
the memory sink and agree with their batch twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_project_capstone_spark.plans.catalog import events_table
from data_engineering_project_capstone_spark.streaming.events import (
    click_purchase_funnel,
    dedup_stream,
    enrich_with_user_stats,
    read_events_stream,
    run_stream_to_memory,
    session_window_agg,
    sessionize_batch,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return events_table(spark, sf_dir).cache()


def test_tumbling_counts_stream_matches_batch(spark, sf_dir, batch_events):
    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_memory(
        tumbling_counts(stream), "tumbling_out", output_mode="append"
    ).collect()
    # batch twin: group on the same 1h windows
    expect = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    )
    key = lambda r: (r["window_start"], r["event_type"])
    got_m = {key(r): (r["n_events"], r["sum_value"]) for r in got}
    exp_m = {key(r): (r["n_events"], r["sum_value"]) for r in expect}
    # append mode with watermark may hold back the last (incomplete) windows;
    # every emitted window must match the batch result exactly
    assert got_m, "stream emitted nothing"
    for k, v in got_m.items():
        assert exp_m[k] == v
    assert len(got_m) >= len(exp_m) - 3


def test_sliding_counts_runs(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_memory(
        sliding_counts(stream), "sliding_out", output_mode="append"
    ).collect()
    assert got
    # 1h window / 15min slide → every event lands in 4 windows
    n = sum(r["n_events"] for r in got)
    assert n > 0


def test_session_window_stream_vs_batch(spark, sf_dir, batch_events):
    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_memory(
        session_window_agg(stream), "session_out", output_mode="append"
    ).collect()
    assert got, "no sessions emitted"
    batch = sessionize_batch(batch_events).collect()
    got_m = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in got
    }
    exp_m = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in batch
    }
    for k, v in got_m.items():
        assert exp_m.get(k) == v, f"session {k}: stream {v} != batch {exp_m.get(k)}"


def test_stream_dedup_within_watermark(spark, sf_dir, batch_events):
    # the same file staged twice = every event delivered twice
    stream = read_events_stream(spark, sf_dir, copies=2)
    got = run_stream_to_memory(
        dedup_stream(stream), "dedup_out", output_mode="append"
    )
    n_distinct = batch_events.count()
    assert got.count() == n_distinct


def test_stream_static_enrich(spark, sf_dir, batch_events):
    user_stats = batch_events.groupBy("user_id").agg(
        F.count("*").alias("user_total_events")
    )
    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_memory(
        enrich_with_user_stats(stream, user_stats), "enrich_out",
        output_mode="append",
    )
    rows = got.collect()
    assert len(rows) == batch_events.count()
    # every row enriched (all users exist in the dim by construction)
    assert all(r["user_total_events"] is not None for r in rows)


def test_stream_stream_funnel_matches_batch(spark, sf_dir, batch_events):
    clicks_b = batch_events.filter(F.col("event_type") == "click")
    purch_b = batch_events.filter(F.col("event_type") == "purchase")
    expect = {
        (r["click_id"], r["purchase_id"])
        for r in click_purchase_funnel(clicks_b, purch_b).collect()
    }
    assert expect, "batch funnel produced no attributed purchases"

    stream = read_events_stream(spark, sf_dir)
    got_df = run_stream_to_memory(
        click_purchase_funnel(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"),
        ),
        "funnel_out",
        output_mode="append",
    )
    got = {(r["click_id"], r["purchase_id"]) for r in got_df.collect()}
    # inner interval join with watermarks emits every in-window pair; the
    # single-batch file source advances the watermark past all data
    assert got == expect


def test_funnel_late_arrival_state_eviction(spark, tmp_path):
    """Out-of-order purchases join as long as the watermark allows it;
    once both sides' watermarks pass, click state is evicted and a
    too-late purchase produces NOTHING — row count stays stable across
    further triggers (bounded state, the point of the interval join)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def add_file(name, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, src / f"{name}.parquet")

    m = dt.timedelta(minutes=1)
    h = dt.timedelta(hours=1)
    # batch 1: three clicks + one in-window purchase (user 1)
    add_file(
        "b1",
        [
            (1, 1, "click", t0, 0.0),
            (2, 2, "click", t0, 0.0),
            (3, 3, "click", t0, 0.0),
            (11, 1, "purchase", t0 + 10 * m, 5.0),
        ],
    )
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp, value double"
        ).parquet(str(src))
    )
    funnel = click_purchase_funnel(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        max_lag_minutes=60,
        watermark="2 hours",
    )
    q = (
        funnel.writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_late")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: an OUT-OF-ORDER purchase for user 2 (event time only
        # t0+20m) — still above the watermark, must join. Far-future
        # heartbeats on BOTH sides (distinct users, no pair) then push the
        # global watermark past t0, evicting the t0 click state.
        add_file(
            "b2",
            [
                (12, 2, "purchase", t0 + 20 * m, 6.0),
                (901, 901, "click", t0 + 10 * h, 0.0),
                (902, 902, "purchase", t0 + 10 * h, 0.0),
            ],
        )
        q.processAllAvailable()
        # batch 3: user 3's purchase is now BELOW the watermark → dropped,
        # its click state already evicted; no new rows may appear
        add_file(
            "b3",
            [
                (13, 3, "purchase", t0 + 30 * m, 7.0),
                (903, 903, "click", t0 + 11 * h, 0.0),
                (904, 904, "purchase", t0 + 11 * h, 0.0),
            ],
        )
        q.processAllAvailable()
        got = {
            (r["click_id"], r["purchase_id"])
            for r in spark.sql("SELECT * FROM funnel_late").collect()
        }
        assert got == {(1, 11), (2, 12)}, got
        n_before = spark.sql("SELECT count(*) c FROM funnel_late").collect()[0]["c"]
        # extra trigger with only heartbeats: count must be stable
        add_file(
            "b4",
            [
                (905, 905, "click", t0 + 12 * h, 0.0),
                (906, 906, "purchase", t0 + 12 * h, 0.0),
            ],
        )
        q.processAllAvailable()
        n_after = spark.sql("SELECT count(*) c FROM funnel_late").collect()[0]["c"]
        assert n_after == n_before == 2
    finally:
        q.stop()


def test_sessionize_batch_gap_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 100, 1.0),
        (2, t0 + dt.timedelta(minutes=10), 100, 2.0),   # same session
        (3, t0 + dt.timedelta(minutes=50), 100, 3.0),   # gap 40min → new
        (4, t0, 200, 4.0),                               # other user
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = sessionize_batch(df, gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[100]) == 2
    s1, s2 = sorted(by_user[100], key=lambda r: r["session_seq"])
    assert s1["n_events"] == 2 and s2["n_events"] == 1
    assert len(by_user[200]) == 1


def test_funnel_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter stream-stream join: an unconverted click must emit with
    NULL purchase columns — but only after the watermark proves no
    in-window purchase can still arrive. Before that proof, nothing."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def add_file(name, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, src / f"{name}.parquet")

    m = dt.timedelta(minutes=1)
    h = dt.timedelta(hours=1)
    # user 1 converts; user 2 never does
    add_file(
        "b1",
        [
            (1, 1, "click", t0, 0.0),
            (2, 2, "click", t0, 0.0),
            (11, 1, "purchase", t0 + 10 * m, 5.0),
        ],
    )
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).parquet(str(src))
    funnel = click_purchase_funnel(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        max_lag_minutes=60,
        watermark="2 hours",
        join_type="leftOuter",
    )
    q = (
        funnel.writeStream.outputMode("append")
        .format("memory")
        .queryName("funnel_outer")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            (r["user_id"], r["purchase_id"])
            for r in spark.sql("SELECT * FROM funnel_outer").collect()
        }
        # watermark has not passed: user 2's non-conversion is unproven
        assert rows == {(1, 11)}, rows
        # far-future heartbeats on both sides push the watermark past
        # t0 + 60min + 2h — user 2's click is now provably unmatched
        add_file(
            "b2",
            [
                (901, 901, "click", t0 + 10 * h, 0.0),
                (902, 902, "purchase", t0 + 10 * h, 0.0),
            ],
        )
        q.processAllAvailable()
        q.processAllAvailable()  # second trigger flushes eviction output
        rows = {
            (r["user_id"], r["purchase_id"])
            for r in spark.sql("SELECT * FROM funnel_outer").collect()
        }
        assert (2, None) in rows, rows
        assert (1, 11) in rows
        # the matched click must NOT additionally emit a null-match row
        assert (1, None) not in rows
    finally:
        q.stop()
